"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design point and scaled down by the caller
for local testing:

- AQE on (adaptive shuffle partition coalescing + skew-join splitting),
- Arrow self-destruct + capped records-per-batch (512): bounds Python worker
  memory on giant documents, and keeps batches small enough that queries
  which still chain several pandas UDFs pipeline across their Python
  workers (the flagship itself is one fused UDF since round 3, so the cap
  there is purely a memory bound),
- shuffle partitions sized by the caller (tests: 8–32; cluster: 2–3× cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "docling-metrics-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_max_records: int = 512,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or (
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.selfDestruct.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_max_records)
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
