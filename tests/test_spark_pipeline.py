"""Spark end-to-end: the fused extract stage over the synthetic parquet
corpus — span equality against the expected_spans table, zero failures,
and plan-shape assertions (Arrow UDF stage fed by a single repartition)."""

import pytest
from pyspark.sql import functions as F

from unfurl_spark.operators.pipeline import extract_spans
from unfurl_spark.sources.synthetic import write_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth")
    return write_corpus(str(out), 400, seed=42)


def test_extract_spans_matches_oracle(spark, corpus):
    docs = spark.read.parquet(corpus["documents_raw"])
    oem = spark.read.parquet(corpus["oembed_docs"])
    med = spark.read.parquet(corpus["media_payloads"])
    exp = spark.read.parquet(corpus["expected_spans"])

    res = extract_spans(docs, oembed_df=oem, media_df=med).cache()
    assert res.filter("ok <> 'ok'").count() == 0

    j = res.alias("a").join(exp.alias("b"), "doc_id", "full_outer")
    n_total = j.count()
    n_match = j.filter(F.col("a.spans") == F.col("b.spans")).count()
    assert n_total == 400
    assert n_match == n_total
    res.unpersist()


def test_plan_is_arrow_batched_single_shuffle(spark, corpus):
    docs = spark.read.parquet(corpus["documents_raw"])
    out = extract_spans(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the kernel must be an Arrow-batched python stage, not row-at-a-time
    assert ("MapInArrow" in plan or "MapInPandas" in plan
            or "ArrowEvalPython" in plan)
    assert "BatchEvalPython" not in plan  # no per-row Python anywhere
    # exactly one exchange: the salted repartition in front of the kernel
    assert plan.count("Exchange") == 1


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.limit(5).collect()
    assert {"doc_id", "kind", "text", "media_ref", "offset"} <= set(
        df.columns)
    assert len(rows) > 0
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20
