"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship: the fused extraction pipeline (tokenize → JSON-LD
               normalize → precedence-coalesce extract → ordered spans) over
               an interleaved-document table synthesized deterministically
               from sf0.001 documents.parquet.
queries()    — one entry per implemented operator family from SURVEY.md §2
               plus the training-data ops (dedup/similarity/text analysis).
oracle_sql() — DuckDB twins for every SQL-expressible query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from unfurl_spark.operators.queries import QUERIES

    fn, _ = QUERIES["extract_spans_full"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from unfurl_spark.operators.queries import spark_queries

    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    from unfurl_spark.operators.queries import oracle_sqls

    return oracle_sqls()
