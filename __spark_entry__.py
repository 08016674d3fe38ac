"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship extraction+evaluation pipeline smoke check.
``queries()`` — one entry per implemented operator (SURVEY.md §2 +
training-data ops); each callable takes (spark, sf_dir) → DataFrame.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL for every SQL-expressible
query (same column names/aliases; non-SQL kernels get rows-only checks,
their real oracles are the pytest golden/parity suites).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from docling_metrics_spark.plans import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: deterministic interleaved
    corpus → HTML boilerplate-strip extraction (Arrow UDF) → JVM-side
    span-sequence equality → per-document text/TEDS/mAP metrics."""
    return Q.extract_spans_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.all_queries()


def oracle_sql() -> dict[str, str]:
    return Q.all_oracles()
