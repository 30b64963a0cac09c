"""Composable corpus-hygiene API (operators/corpus): at default
parameters it must reproduce the DuckDB-oracled registry queries
bit-for-bit, work over renamed columns, and keep scale-safe plans."""

from pyspark.sql import functions as F

from unfurl_spark.operators import corpus as C
from unfurl_spark.operators.queries import QUERIES, load_views

SF = "/root/testdata/sf0.01"


def _docs(spark):
    load_views(spark, SF)
    return spark.table("documents")


def test_minhash_signatures_match_registry(spark):
    api = C.minhash_signatures(_docs(spark)).collect()
    reg = QUERIES["dedup_minhash_signature"][0](spark, SF).collect()
    assert {tuple(r) for r in api} == {tuple(r) for r in reg}


def test_apply_dedup_matches_registry_keeper_query(spark):
    api = C.apply_dedup(_docs(spark)).select("doc_id", "lang", "source")
    reg = QUERIES["dedup_apply_keep"][0](spark, SF)
    assert ({tuple(r) for r in api.collect()}
            == {tuple(r) for r in reg.collect()})


def test_duplicate_groups_match_lsh_buckets(spark):
    sigs = C.minhash_signatures(_docs(spark))
    api = C.duplicate_groups(C.lsh_bands(sigs)).collect()
    reg = QUERIES["dedup_minhash_lsh_buckets"][0](spark, SF).collect()
    assert ({(r.band_key, r.n_docs, r.keeper) for r in api}
            == {(r.band_key, r.n_docs, r.keeper) for r in reg})


def test_renamed_columns_and_params(spark):
    df = _docs(spark).selectExpr("doc_id AS id", "text AS body")
    sigs = C.minhash_signatures(df, text_col="body", id_col="id",
                                k=4, n=2)
    assert sigs.columns == ["id", "h0", "h1", "h2", "h3"]
    assert sigs.count() == 500
    out = C.apply_dedup(df, text_col="body", id_col="id", k=4, n=2,
                        bands=2)
    assert 0 < out.count() <= 500
    assert C.exact_dedup(df, "body", "id").count() <= 500


def test_clean_corpus_recipe_plan_is_scale_safe(spark):
    out = C.clean_corpus(_docs(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    n = out.count()
    assert 0 < n <= 500


def test_quality_features_no_shuffle(spark):
    qf = C.quality_features(_docs(spark))
    plan = qf._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    row = qf.filter(F.col("doc_id") == qf.first().doc_id).first()
    assert row.n_chars_m > 0 and 0 <= row.punct_ratio <= 1
