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


def test_pii_scrub(spark):
    rows = [
        (1, "contact me at bob.smith+x@example.co.uk today"),
        (2, "server at 192.168.0.1 and 10.0.0.255 rebooted"),
        (3, "call +1 (415) 555-0123 or 020 7946 0958 now"),
        (4, "no pii here just words"),
        (5, "mixed a@b.io from 8.8.8.8 phone 415-555-0100"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: r for r in C.pii_scrub(df).collect()}
    assert out[1].n_pii_email == 1 and "<EMAIL>" in out[1].text
    assert "bob" not in out[1].text
    assert out[2].n_pii_ipv4 == 2 and out[2].text.count("<IP>") == 2
    assert out[3].n_pii_phone == 2 and out[3].text.count("<PHONE>") == 2
    assert out[4].text == "no pii here just words"
    assert out[4].n_pii_email == out[4].n_pii_ipv4 == out[4].n_pii_phone == 0
    r5 = out[5]
    assert "<EMAIL>" in r5.text and "<IP>" in r5.text and "<PHONE>" in r5.text
    # redaction into a separate column preserves the original
    kept = C.pii_scrub(df, out_col="clean").collect()[0]
    assert kept.text != kept.clean or "pii" in kept.text


def test_canonical_url(spark):
    pairs = [
        ("HTTPS://Example.COM:443/a/?utm_source=x&q=1#frag",
         "https://example.com/a?q=1"),
        ("http://example.com:80/path/", "http://example.com/path"),
        ("https://example.com/?gclid=abc", "https://example.com"),
        ("https://example.com/p?a=1&utm_medium=m&b=2",
         "https://example.com/p?a=1&b=2"),
        ("https://example.com/p?xutm_source=keep",
         "https://example.com/p?xutm_source=keep"),
        ("https://example.com/p", "https://example.com/p"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in pairs], "url string")
    got = [r.c for r in df.select(C.canonical_url("url").alias("c")).collect()]
    assert got == [want for _, want in pairs]


def test_url_dedup(spark):
    rows = [
        (3, "https://Example.com/a?utm_source=t"),
        (1, "https://example.com/a"),
        (2, "https://example.com/b"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, url string")
    kept = sorted(r.doc_id for r in C.url_dedup(df).collect())
    assert kept == [1, 2]
    plan = C.url_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_substring_dup_stats_matches_registry(spark):
    """Parameterized API twin of dedup_substring_windows[_hashed]:
    default window reproduces the oracled registry relation bit-for-bit
    in BOTH modes, on any (id, text) table."""
    from unfurl_spark.operators.corpus import substring_dup_stats
    from unfurl_spark.operators.queries import QUERIES

    sf = "/root/testdata/sf0.01"
    reg = sorted(map(tuple,
                     QUERIES["dedup_substring_windows"][0](spark, sf)
                     .collect()))
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    for hashed in (False, True):
        api = sorted(map(tuple,
                         substring_dup_stats(docs, hashed=hashed)
                         .collect()))
        assert api == reg, f"hashed={hashed}"


def test_substring_dup_stats_custom_columns(spark):
    from unfurl_spark.operators.corpus import substring_dup_stats

    passage = " ".join(f"p{i}" for i in range(20))
    rows = [(1, f"x0 x1 x2 {passage}"),
            (2, f"y0 {passage}"),
            (3, " ".join(f"u{i}" for i in range(30)))]
    df = spark.createDataFrame(rows, "rid long, body string")
    got = {r["rid"]: r for r in
           substring_dup_stats(df, text_col="body", id_col="rid",
                               window=16).collect()}
    assert got[1]["n_dup_windows"] == 5   # 20-word passage, 16-word wins
    assert got[2]["n_dup_windows"] == 5
    assert got[3]["n_dup_windows"] == 0
