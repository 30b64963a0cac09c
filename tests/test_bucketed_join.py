"""Co-located (bucketed) joins: two tables written bucketBy the same key
join with no Exchange in the plan — the pay-the-shuffle-once pattern that
amortizes the 100 TB documents-table shuffle across every downstream
per-doc join (SCALE.md)."""

import pytest
from pyspark.sql import functions as F

from unfurl_spark.sources.tables import cobucketed_join, save_cobucketed


@pytest.fixture(scope="module")
def bucketed(spark):
    # spark.sql.warehouse.dir is static; tables land in the session's
    # default warehouse (./spark-warehouse, gitignored) and drop after
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scores = docs.select(
        "doc_id",
        (F.length("text") % 97).cast("double").alias("score"))
    save_cobucketed(docs.select("doc_id", "lang", "n_chars"),
                    "b_docs", "doc_id", n_buckets=8)
    save_cobucketed(scores, "b_scores", "doc_id", n_buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_scores")


def test_cobucketed_join_has_no_exchange(spark, bucketed):
    # at test scale AQE would broadcast the tiny side, hiding the property
    # under test — disable broadcast to land in the shuffle-join regime the
    # bucketing exists for (at 100 TB neither side broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = cobucketed_join(spark, "b_docs", "b_scores", "doc_id")
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString().split(
            "== Initial Plan ==", 1)[0]
        assert "Exchange" not in plan, plan[:2000]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, \
            plan[:800]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_cobucketed_join_correct(spark, bucketed):
    n_docs = spark.table("b_docs").count()
    joined = cobucketed_join(spark, "b_docs", "b_scores", "doc_id")
    assert joined.count() == n_docs
    # spot value equality against a plain (exchange-bearing) join
    plain = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
             .select("doc_id", "lang"))
    assert joined.select("doc_id", "lang").exceptAll(
        plain).count() == 0
