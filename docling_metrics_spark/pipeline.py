"""The flagship pipeline: extract → verify → score → aggregate.

Dataflow (all narrow until the final aggregation — zero shuffles before the
agg, which is the 100 TB design point):

    documents(doc_id, spans, raw_html, pred_spans, gt_boxes, pred_boxes)
      │  extract_spans_udf(raw_html)            [Arrow UDF, narrow]
      ├─ extracted == spans                     [JVM array<struct> equality]
      │  text metrics over span text            [Arrow UDF, narrow]
      │  TEDS over table spans                  [Arrow UDF, narrow]
      │  mAP over layout boxes                  [Arrow UDF, narrow]
      └─ salted two-stage aggregation           [the only shuffle]

Span text is concatenated JVM-side (filter + transform + array_join on the
spans array) so only the strings the kernels need cross the Arrow boundary
— nested-column pruning by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from docling_metrics_spark.operators.skew import salted_agg
from docling_metrics_spark.operators.udfs import (
    extract_spans_udf,
    map_core_doc_udf,
    teds_doc_udf,
    text_scores_udf,
)


def _span_text(col: str) -> F.Column:
    """Concatenated text of non-media spans, in offset order (JVM-side)."""
    ordered = F.array_sort(
        F.filter(F.col(col), lambda s: s.text.isNotNull()),
        lambda a, b: F.when(a.offset < b.offset, -1)
        .when(a.offset > b.offset, 1)
        .otherwise(0),
    )
    return F.array_join(F.transform(ordered, lambda s: s.text), " ")


def _table_htmls(col: str) -> F.Column:
    """Ordered list of table-span HTML strings (JVM-side nested pruning)."""
    tables = F.array_sort(
        F.filter(F.col(col), lambda s: s.kind == F.lit("table")),
        lambda a, b: F.when(a.offset < b.offset, -1)
        .when(a.offset > b.offset, 1)
        .otherwise(0),
    )
    return F.transform(tables, lambda s: s.text)


def extract_and_verify(docs: DataFrame) -> DataFrame:
    """Run extraction and assert span-sequence equality per document.

    ``span_equal`` is a JVM-native comparison of two array<struct> columns —
    exact on (kind, text, media_ref, offset) including order, no Python."""
    return docs.withColumn("extracted", extract_spans_udf("raw_html")).withColumn(
        "span_equal", F.col("extracted").eqNullSafe(F.col("spans"))
    )


def score_documents(docs: DataFrame) -> DataFrame:
    """Per-document quality metrics: text, tables, layout.

    GT side uses the *extracted* spans (the engine's own output), compared
    against the document's prediction spans — per the north rule the metric
    kernels grade extracted content; span_equal separately pins extraction
    to the reference."""
    scored = (
        docs.withColumn("gt_text", _span_text("extracted"))
        .withColumn("pred_text", _span_text("pred_spans"))
        .withColumn("gt_tables", _table_htmls("extracted"))
        .withColumn("pred_tables", _table_htmls("pred_spans"))
        .withColumn("text_scores", text_scores_udf("gt_text", "pred_text"))
        .withColumn("teds", teds_doc_udf("gt_tables", "pred_tables"))
        # core surface: only the fields kept below are computed — Catalyst
        # cannot prune inside a pandas UDF, so the kernel prunes itself
        # (the full-surface twin map_doc_udf serves the layout_map query)
        .withColumn("layout", map_core_doc_udf("gt_boxes", "pred_boxes"))
    )
    return scored.select(
        "doc_id",
        "span_equal",
        F.size("spans").alias("n_spans"),
        F.col("text_scores.*"),
        F.col("teds.teds_mean").alias("teds_mean"),
        F.col("teds.n_pairs").alias("teds_pairs"),
        F.col("teds.error_count").alias("teds_errors"),
        F.col("layout.map").alias("map"),
        F.col("layout.map_50").alias("map_50"),
        F.col("layout.map_75").alias("map_75"),
        F.col("layout.mar_100").alias("mar_100"),
    )


def run_pipeline(docs: DataFrame) -> DataFrame:
    """documents → per-document metric rows (narrow, shuffle-free)."""
    return score_documents(extract_and_verify(docs))


METRIC_COLS = [
    "f1_score",
    "edit_distance_score",
    "bleu_score",
    "teds_mean",
    "map",
]


def aggregate_metrics(per_doc: DataFrame, n_salts: int = 32) -> DataFrame:
    """Dataset-level summary via salted two-stage aggregation (skew-safe)."""
    with_flags = per_doc.withColumn(
        "span_equal_int", F.col("span_equal").cast("double")
    )
    return salted_agg(
        with_flags,
        group_cols=[],
        sum_cols=["span_equal_int"] + METRIC_COLS,
        n_salts=n_salts,
    )
