"""Checkpointed, resumable batch processing with per-partition lineage.

North-rule requirement: "every partition writes lineage + metric rows to a
checkpoint table so a killed job resumes without recomputation."

Design (batch-incremental, Iceberg-shaped; plain parquet in this sandbox —
with Iceberg the metric write + lineage append become one atomic snapshot):

- Documents hash-bucket by ``pmod(xxhash64(doc_id), n_buckets)`` — a
  deterministic, data-independent partitioning that survives re-runs and
  input reordering.
- Each bucket is one unit of work: metric rows land under
  ``out/metrics/bucket=K/`` (dynamic partition overwrite ⇒ idempotent on
  retry), then a lineage row ``(batch_id, bucket, n_docs, committed_at)``
  is appended to ``out/checkpoint/``. The lineage append is the commit
  point: a crash between metric write and lineage append re-does that
  bucket idempotently.
- Resume = read the checkpoint table, skip committed buckets
  (an anti-join; the checkpoint side is tiny ⇒ broadcast).
- ``batch_id`` is deterministic from (corpus fingerprint, bucket), so a
  resumed run and an uninterrupted run produce byte-identical lineage.

At 10^12 docs: n_buckets in the thousands; each bucket is an independent
job stage processing ~10^9 docs; failures cost one bucket, not the run.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from docling_metrics_spark.pipeline import run_pipeline

CHECKPOINT_SCHEMA = "batch_id string, bucket int, n_docs long, committed_at double"


def bucket_of(doc_id_col, n_buckets: int):
    return F.pmod(F.xxhash64(doc_id_col), F.lit(n_buckets)).cast("int")


def committed_buckets(spark: SparkSession, out_dir: str) -> set[int]:
    path = os.path.join(out_dir, "checkpoint")
    try:
        rows = spark.read.schema(CHECKPOINT_SCHEMA).parquet(path).select("bucket").collect()
    except Exception:
        return set()
    return {r.bucket for r in rows}


def run_checkpointed(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    n_buckets: int = 8,
    corpus_fingerprint: str = "corpus",
    fail_after_buckets: int | None = None,
) -> int:
    """Process all not-yet-committed buckets; returns #buckets processed.

    ``fail_after_buckets`` injects a crash for the resume test (kill after K
    commits, rerun, assert no recomputation and identical finals)."""
    metrics_dir = os.path.join(out_dir, "metrics")
    ckpt_dir = os.path.join(out_dir, "checkpoint")

    done = committed_buckets(spark, out_dir)
    bucketed = docs.withColumn("bucket", bucket_of(F.col("doc_id"), n_buckets))

    processed = 0
    for bucket in range(n_buckets):
        if bucket in done:
            continue
        if fail_after_buckets is not None and processed >= fail_after_buckets:
            raise RuntimeError(f"injected failure after {processed} buckets")
        subset = bucketed.filter(F.col("bucket") == bucket)
        per_doc = run_pipeline(subset.drop("bucket"))
        # Idempotent metric write: one directory per bucket, overwritten on retry.
        per_doc.write.mode("overwrite").parquet(
            os.path.join(metrics_dir, f"bucket={bucket}")
        )
        n_docs = per_doc.count()
        # Commit point: lineage row append.
        batch_id = f"{corpus_fingerprint}:{bucket}"
        spark.createDataFrame(
            [(batch_id, bucket, n_docs, time.time())], CHECKPOINT_SCHEMA
        ).write.mode("append").parquet(ckpt_dir)
        processed += 1
    return processed


def read_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    df = spark.read.option("basePath", os.path.join(out_dir, "metrics")).parquet(
        os.path.join(out_dir, "metrics", "bucket=*")
    )
    return df


def read_checkpoint(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.schema(CHECKPOINT_SCHEMA).parquet(
        os.path.join(out_dir, "checkpoint")
    )
