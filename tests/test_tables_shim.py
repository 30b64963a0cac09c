"""Iceberg/parquet table shim: the no-Iceberg fallback must round-trip
catalog-style identifiers and must not leak session-wide config."""

import os

from unfurl_spark.sources.tables import (append_metrics, read_table,
                                         write_bucketed)


def test_catalog_identifier_roundtrips_without_iceberg(spark):
    """write_bucketed('db.metrics') → read_table('db.metrics') used to
    diverge (parquet write to ./db.metrics, read via spark.read.table →
    TABLE_OR_VIEW_NOT_FOUND). Both now agree on a deterministic
    warehouse-anchored path."""
    import shutil

    from unfurl_spark.sources.tables import _fallback_path
    df = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 1)], "id int, v string, bucket int")
    try:
        write_bucketed(df, "shimtest.spans")
        got = read_table(spark, "shimtest.spans")
        assert sorted(r.id for r in got.collect()) == [1, 2]
        local = _fallback_path(spark, "shimtest.spans") \
            .removeprefix("file:")
        assert os.path.isdir(local)

        append_metrics(df.drop("bucket"), "shimtest.metrics")
        append_metrics(df.drop("bucket"), "shimtest.metrics")
        assert read_table(spark, "shimtest.metrics").count() == 4
    finally:
        root = _fallback_path(spark, "shimtest").removeprefix("file:")
        shutil.rmtree(root, ignore_errors=True)


def test_write_bucketed_does_not_mutate_session_overwrite_mode(spark,
                                                               tmp_path):
    """The dynamic-overwrite setting must be scoped per write: a later
    plain partitioned overwrite by user code still truncates fully."""
    before = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    df = spark.createDataFrame([(1, 0), (2, 1)], "id int, bucket int")
    write_bucketed(df, str(tmp_path / "t"))
    assert spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode") == before
    # per-write semantics themselves still dynamic: overwrite bucket 0
    # only, bucket 1 survives
    df0 = spark.createDataFrame([(9, 0)], "id int, bucket int")
    write_bucketed(df0, str(tmp_path / "t"))
    got = sorted(r.id for r in
                 spark.read.parquet(str(tmp_path / "t")).collect())
    assert got == [2, 9]
