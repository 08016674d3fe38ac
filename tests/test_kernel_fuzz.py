"""Cross-kernel fuzz: every Arrow-batch kernel must, on arbitrary input,
either return a result or raise ValueError (the error-channel contract) —
never RecursionError / MemoryError / unbounded time. One bad row must
degrade one row, not the task (see README scale notes)."""

from hypothesis import given, settings
from hypothesis import strategies as st

import docling_metrics_spark.kernels.teds as T
from docling_metrics_spark.extraction.html_extract import extract_spans_from_html
from docling_metrics_spark.kernels.grits import grits_all, html_to_cells
from docling_metrics_spark.kernels.minhash import simhash
from docling_metrics_spark.kernels.textmetrics import evaluate_text_pair

html_soup = st.text(
    alphabet=st.sampled_from(list("<>/tabledivrspn=\"'0123456789 xyz&#;")),
    max_size=200,
)


@given(html_soup)
@settings(max_examples=120, deadline=None)
def test_extraction_never_crashes(s):
    spans = extract_spans_from_html(s)
    assert isinstance(spans, list)


@given(html_soup)
@settings(max_examples=120, deadline=None)
def test_table_parsers_raise_only_value_error(s):
    for fn in (T.html_to_bracket, html_to_cells):
        try:
            fn(s)
        except ValueError:
            pass


@given(
    st.text(alphabet=st.sampled_from(list('{}tagd:", []0123456789x')), max_size=120)
)
@settings(max_examples=120, deadline=None)
def test_bracket_parser_raises_only_value_error(s):
    try:
        T.bracket_to_tree(s)
    except ValueError:
        pass


@given(st.text(max_size=150), st.text(max_size=150))
@settings(max_examples=100, deadline=None)
def test_text_metrics_never_crash(a, b):
    scores = evaluate_text_pair(a, b)
    assert -1.0 <= scores.edit_distance_score <= 1.0 or scores.edit_distance_score == -1.0


@given(st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_simhash_total(s):
    assert 0 <= simhash(s.split()) < 1 << 64


@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "row_nums": st.lists(
                    st.integers(0, 30), min_size=1, max_size=3
                ),
                "column_nums": st.lists(
                    st.integers(0, 30), min_size=1, max_size=3
                ),
                "cell_text": st.text(max_size=10),
                "bbox": st.lists(
                    st.floats(0, 100, allow_nan=False), min_size=4, max_size=4
                ),
            }
        ),
        max_size=6,
    ),
    st.lists(
        st.fixed_dictionaries(
            {
                "row_nums": st.lists(
                    st.integers(0, 30), min_size=1, max_size=3
                ),
                "column_nums": st.lists(
                    st.integers(0, 30), min_size=1, max_size=3
                ),
                "cell_text": st.text(max_size=10),
                "bbox": st.lists(
                    st.floats(0, 100, allow_nan=False), min_size=4, max_size=4
                ),
            }
        ),
        max_size=6,
    ),
)
@settings(max_examples=50, deadline=None)
def test_grits_on_arbitrary_cells(cells_a, cells_b):
    r = grits_all(cells_a, cells_b)
    for v in r.values():
        assert 0.0 <= v <= 1.0


def test_map_udf_hostile_box_count_degrades_one_row(spark):
    """evaluate_map's 100k-box refusal must surface END-TO-END through
    map_doc_udf as the -1.0 sentinel row — one hostile document degrades
    one row, never the task (VERDICT r2 #8). The healthy sibling row in
    the same Arrow batch scores normally."""
    from pyspark.sql import functions as F

    from docling_metrics_spark.operators.udfs import (
        map_core_doc_udf,
        map_doc_udf,
    )

    def boxes(n, with_score):
        return F.transform(
            F.sequence(F.lit(1), F.lit(n)),
            lambda i: F.struct(
                F.pmod(i, F.lit(5)).cast("int").alias("category_id"),
                F.array(
                    F.lit(0.0), F.lit(0.0), F.lit(10.0), F.lit(10.0)
                ).alias("bbox"),
                *(
                    [(i.cast("double") / 1e6).alias("score")]
                    if with_score
                    else []
                ),
            ),
        )

    df = spark.range(2).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") == 0, boxes(60_000, False))
        .otherwise(boxes(1, False))
        .alias("gt_boxes"),
        F.when(F.col("id") == 0, boxes(60_000, True))
        .otherwise(boxes(1, True))
        .alias("pred_boxes"),
    ).repartition(1)

    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id", map_doc_udf("gt_boxes", "pred_boxes").alias("m")
        ).select("doc_id", "m.*").collect()
    }
    assert rows[0].map == -1.0 and rows[0].mar_100 == -1.0
    assert rows[0].map_per_class == "{}"  # sentinel JSON, not a crash
    assert rows[1].map == 1.0  # healthy doc in the same batch unaffected

    core = {
        r.doc_id: r
        for r in df.select(
            "doc_id", map_core_doc_udf("gt_boxes", "pred_boxes").alias("m")
        ).select("doc_id", "m.*").collect()
    }
    assert core[0].map == -1.0 and core[1].map == 1.0


def test_fused_flagship_udf_hostile_inputs_degrade_one_row(spark):
    """The FUSED flagship UDF inherits every kernel's error channel: a
    hostile box count emits the mAP sentinel while the same row's text and
    TEDS fields still score; a deeply-nested DOM extracts flattened instead
    of dying; the healthy sibling row in the same Arrow batch is
    untouched."""
    from pyspark.sql import functions as F

    from docling_metrics_spark.operators.udfs import flagship_doc_udf

    def boxes(n, with_score):
        return F.transform(
            F.sequence(F.lit(1), F.lit(n)),
            lambda i: F.struct(
                F.pmod(i, F.lit(5)).cast("int").alias("category_id"),
                F.array(
                    F.lit(0.0), F.lit(0.0), F.lit(10.0), F.lit(10.0)
                ).alias("bbox"),
                *(
                    [(i.cast("double") / 1e6).alias("score")]
                    if with_score
                    else []
                ),
            ),
        )

    deep_html = "<html><body>" + "<div>" * 500 + "hello world" + \
        "</div>" * 500 + "</body></html>"
    sane_html = "<html><body><p>hello world</p></body></html>"
    df = spark.range(2).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") == 0, F.lit(deep_html))
        .otherwise(F.lit(sane_html))
        .alias("raw_html"),
        F.lit("hello world").alias("pred_text"),
        F.array().cast("array<string>").alias("pred_tables"),
        F.when(F.col("id") == 0, boxes(60_000, False))
        .otherwise(boxes(1, False))
        .alias("gt_boxes"),
        F.when(F.col("id") == 0, boxes(60_000, True))
        .otherwise(boxes(1, True))
        .alias("pred_boxes"),
    ).repartition(1)

    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            flagship_doc_udf(
                "raw_html", "pred_text", "pred_tables",
                "gt_boxes", "pred_boxes",
            ).alias("r"),
        ).select("doc_id", "r.*").collect()
    }
    hostile, healthy = rows[0], rows[1]
    assert hostile.map == -1.0 and hostile.mar_100 == -1.0  # mAP sentinel
    assert hostile.f1_score == 1.0  # text still scored (deep DOM flattened)
    assert hostile.extracted is not None and len(hostile.extracted) >= 1
    assert healthy.map == 1.0 and healthy.f1_score == 1.0
