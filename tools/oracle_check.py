"""Local twin of the driver's DuckDB-oracle correctness gate.

Runs every entry in the query registry on Spark AND DuckDB at sf0.01,
compares row count, column names, and an order-insensitive value multiset
(columns sorted by name, floats rounded, NaN/None normalized).

Usage: python3 tools/oracle_check.py [sf_dir] [name-substr]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        if v == int(v) and abs(v) < 2**53:
            return int(v)
        return round(v, 9)
    if isinstance(v, bool):
        return bool(v)
    return v


def _sort_key(cell):
    # total order over mixed None/str/num cells — Python's < is partial
    # and a nullable column would TypeError the whole gate otherwise
    if cell is None:
        return (0, "")
    if isinstance(cell, (int, float, bool)):
        return (1, "", float(cell))
    return (2, str(cell))


def canon(rows: list[dict]) -> tuple:
    cols = sorted(rows[0].keys()) if rows else []
    multiset = sorted(
        (tuple(norm_cell(r[c]) for c in cols) for r in rows),
        key=lambda t: tuple(_sort_key(c) for c in t),
    )
    return cols, multiset


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else SF_DIR
    name_filter = sys.argv[2] if len(sys.argv) > 2 else None

    from unfurl_spark.operators.pipeline import session
    from unfurl_spark.operators.queries import QUERIES

    spark = session(master="local[8]")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = 0
    failures = []
    for name, (fn, sql) in QUERIES.items():
        if name_filter and name_filter not in name:
            continue
        import time
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [r.asDict() for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR {e}"))
            continue
        if sql is None:
            print(f"  {name}: rows-only  n={len(srows)}  "
                  f"({time.time()-t0:.1f}s)")
            if len(srows) > 0:
                n_pass += 1
            else:
                failures.append((name, "rows-only check returned 0 rows"))
            continue
        try:
            ddf = con.execute(sql).fetch_arrow_table()
            drows = ddf.to_pylist()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR {e}"))
            continue
        scols, sset = canon(srows)
        dcols, dset = canon(drows)
        ok = (len(srows) == len(drows) and scols == dcols and sset == dset)
        status = "OK " if ok else "FAIL"
        print(f"  {name}: {status} spark={len(srows)} duck={len(drows)}  "
              f"({time.time()-t0:.1f}s)")
        if ok:
            n_pass += 1
        else:
            detail = []
            if scols != dcols:
                detail.append(f"cols spark={scols} duck={dcols}")
            if sset != dset:
                diff_s = [r for r in sset if r not in set(dset)][:3]
                diff_d = [r for r in dset if r not in set(sset)][:3]
                detail.append(f"spark-only={diff_s} duck-only={diff_d}")
            failures.append((name, "; ".join(detail) or "row count"))

    print(f"\npass {n_pass}/{len([n for n in QUERIES if not name_filter or name_filter in n])}")
    for name, msg in failures:
        print(f"FAIL {name}: {msg[:600]}")
    spark.stop()


if __name__ == "__main__":
    main()
