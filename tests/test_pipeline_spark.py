"""End-to-end Spark pipeline tests: extraction equality, metric parity vs
the single-process oracle, salted-agg correctness, checkpoint resume."""

import pytest
from pyspark.sql import functions as F

from docling_metrics_spark.datagen import gen_documents, generate_documents_df
from docling_metrics_spark.extraction import extract_spans_from_html
from docling_metrics_spark.kernels.layout import evaluate_map
from docling_metrics_spark.kernels.textmetrics import evaluate_text_pair
from docling_metrics_spark.operators.skew import salted_agg, salted_array_sum
from docling_metrics_spark.pipeline import (
    aggregate_metrics,
    extract_and_verify,
    run_pipeline,
)

N_DOCS = 120
REL = 1e-6


@pytest.fixture(scope="module")
def docs(spark):
    df = generate_documents_df(spark, N_DOCS, partitions=4).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def per_doc(spark, docs):
    df = run_pipeline(docs).cache()
    df.count()
    return df


def test_span_equality_all_docs(spark, docs):
    """North-rule gate: distributed extraction == reference spans, exactly."""
    ev = extract_and_verify(docs)
    n_total = ev.count()
    n_equal = ev.filter("span_equal").count()
    assert n_total == N_DOCS
    assert n_equal == N_DOCS


def test_metric_parity_vs_oracle(spark, per_doc):
    """Spark per-doc scores == single-process oracle at rel-tol 1e-6."""
    rows = {r.doc_id: r for r in per_doc.collect()}
    for doc in gen_documents(N_DOCS):
        spans = extract_spans_from_html(doc["raw_html"])
        gt_text = " ".join(s["text"] for s in spans if s["text"] is not None)
        pred_text = " ".join(
            s["text"] for s in doc["pred_spans"] if s["text"] is not None
        )
        oracle = evaluate_text_pair(gt_text, pred_text)
        got = rows[doc["doc_id"]]
        assert got.edit_distance_score == pytest.approx(
            oracle.edit_distance_score, rel=REL
        ), doc["doc_id"]
        assert got.f1_score == pytest.approx(oracle.f1_score, rel=REL)
        assert got.bleu_score == pytest.approx(oracle.bleu_score, rel=REL)

        gt_b = [(b["category_id"], b["bbox"]) for b in doc["gt_boxes"]]
        pr_b = [
            (b["category_id"], b["bbox"], b["score"]) for b in doc["pred_boxes"]
        ]
        om = evaluate_map(gt_b, pr_b)
        if om["map"] == om["map"]:  # not NaN
            assert got.map == pytest.approx(om["map"], rel=REL), doc["doc_id"]
        else:
            assert got.map is None or got.map != got.map

        # TEDS through the fused flagship UDF == the standalone kernel path
        from docling_metrics_spark.operators.udfs import _doc_teds

        def _tables(spans):
            ts = sorted(
                (s for s in spans if s["kind"] == "table"),
                key=lambda s: s["offset"],
            )
            return [s["text"] for s in ts]

        ot = _doc_teds(_tables(spans), _tables(doc["pred_spans"]))
        if ot["teds_mean"] is None:
            assert got.teds_mean is None, doc["doc_id"]
        else:
            assert got.teds_mean == pytest.approx(ot["teds_mean"], rel=REL)
        assert got.teds_pairs == ot["n_pairs"]
        assert got.teds_errors == ot["error_count"]


def test_span_equality_holds_for_any_corpus_seed(spark):
    """Extraction must round-trip the renderer exactly for ANY corpus seed
    — the north-rule invariant is a property of the extractor, not of the
    default fixture."""
    for seed in (7, 123):
        docs = generate_documents_df(spark, 300, seed=seed)
        r = run_pipeline(docs).agg(
            F.count("*").alias("n"),
            F.sum(F.col("span_equal").cast("int")).alias("eq"),
        ).collect()[0]
        assert r.eq == r.n == 300, seed


def test_pipeline_partition_invariance(spark, docs):
    """Per-document results must be bit-identical regardless of how the
    corpus is partitioned — the property that makes the job's output stable
    across cluster sizes, speculative re-execution, and resume (every
    kernel is a pure per-row function; any partition-dependent state would
    break this)."""
    a = {r.doc_id: r for r in run_pipeline(docs.repartition(2)).collect()}
    b = {r.doc_id: r for r in run_pipeline(docs.repartition(7)).collect()}
    assert set(a) == set(b) and len(a) == N_DOCS
    for k in a:
        assert a[k] == b[k], k


def test_aggregate_metrics_summary(spark, per_doc):
    row = aggregate_metrics(per_doc).collect()[0]
    assert row["sum_span_equal_int"] == N_DOCS  # all docs extracted exactly
    assert 0.0 <= row["avg_edit_distance_score"] <= 1.0
    assert row["cnt_f1_score"] == N_DOCS


def test_salted_agg_equals_unsalted(spark, per_doc):
    """SURVEY §5 point 4: two-stage salted agg == naive single-stage."""
    naive = per_doc.agg(
        F.sum("edit_distance_score").alias("s"),
        F.count("edit_distance_score").alias("c"),
        F.min("edit_distance_score").alias("mn"),
        F.max("edit_distance_score").alias("mx"),
    ).collect()[0]
    salted = salted_agg(
        per_doc, group_cols=[], sum_cols=["edit_distance_score"], n_salts=16
    ).collect()[0]
    assert salted["sum_edit_distance_score"] == pytest.approx(naive["s"], rel=1e-12)
    assert salted["cnt_edit_distance_score"] == naive["c"]
    assert salted["min_edit_distance_score"] == naive["mn"]
    assert salted["max_edit_distance_score"] == naive["mx"]


def test_salted_agg_grouped(spark, docs):
    """Grouped variant vs Spark's own groupBy on a skewed key."""
    df = docs.select(
        (F.length("doc_id") % 2).alias("k"), F.size("spans").alias("v")
    )
    naive = {
        r.k: (r.s, r.c)
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count("v").alias("c")).collect()
    }
    salted = {
        r.k: (r.sum_v, r.cnt_v)
        for r in salted_agg(df, group_cols=["k"], sum_cols=["v"], n_salts=8).collect()
    }
    assert naive == salted


def test_salted_array_sum(spark):
    import numpy as np

    data = [([1.0, 2.0, 3.0],), ([10.0, 20.0, 30.0],), ([100.0, 200.0, 300.0],)]
    df = spark.createDataFrame(data, "arr array<double>")
    got = salted_array_sum(df, "arr", n_salts=4).collect()[0].summed
    assert got == [111.0, 222.0, 333.0]

    # with_count: the row count rides the slot-sum job (no second count())
    row = salted_array_sum(df, "arr", n_salts=4, with_count=True).collect()[0]
    assert row.summed == [111.0, 222.0, 333.0]
    assert row.n_rows == 3
    empty = spark.createDataFrame([], "arr array<double>")
    row = salted_array_sum(empty, "arr", with_count=True).collect()[0]
    assert row.summed == [] and row.n_rows == 0


def test_checkpoint_resume(spark, docs, tmp_path):
    """Kill after K buckets, rerun, assert no recomputation + identical finals."""
    from docling_metrics_spark.checkpoint import (
        read_checkpoint,
        read_metrics,
        run_checkpointed,
    )

    out_full = str(tmp_path / "full")
    out_resume = str(tmp_path / "resume")

    n = run_checkpointed(spark, docs, out_full, n_buckets=4)
    assert n == 4

    with pytest.raises(RuntimeError, match="injected failure"):
        run_checkpointed(spark, docs, out_resume, n_buckets=4, fail_after_buckets=2)
    assert len(read_checkpoint(spark, out_resume).collect()) == 2

    # committed buckets' output must be untouched by the resumed run — the
    # resume filter excludes them from the single input pass, and dynamic
    # partition overwrite only replaces the buckets present in the data
    import os as _os

    committed = sorted(
        r.bucket for r in read_checkpoint(spark, out_resume).collect()
    )
    def _mtimes(bucket):
        d = f"{out_resume}/metrics/bucket={bucket}"
        return {f: _os.path.getmtime(_os.path.join(d, f))
                for f in _os.listdir(d) if f.endswith(".parquet")}
    before = {b: _mtimes(b) for b in committed}

    n2 = run_checkpointed(spark, docs, out_resume, n_buckets=4)
    assert n2 == 2  # only the 2 uncommitted buckets recomputed
    for b in committed:
        assert _mtimes(b) == before[b], f"bucket {b} was rewritten on resume"

    full = {r.doc_id: r for r in read_metrics(spark, out_full).collect()}
    resumed = {r.doc_id: r for r in read_metrics(spark, out_resume).collect()}
    assert set(full) == set(resumed) and len(full) == N_DOCS
    for k in full:
        assert full[k].edit_distance_score == resumed[k].edit_distance_score
        assert full[k].span_equal == resumed[k].span_equal

    ckpt = read_checkpoint(spark, out_resume)
    assert {r.batch_id for r in ckpt.collect()} == {
        f"corpus:{b}" for b in range(4)
    }


def test_teds_error_channel(spark):
    """Malformed table HTML inside spans must not kill the job — the UDF
    surfaces an error count (reference error_id channel analog)."""
    from docling_metrics_spark.operators.udfs import teds_doc_udf

    df = spark.createDataFrame(
        [(["<table><tr><td>a</td></tr></table>"], ["<table"],)],
        "gt array<string>, pred array<string>",
    )
    row = df.select(teds_doc_udf("gt", "pred").alias("t")).collect()[0].t
    assert row.error_count >= 0 and row.teds_mean is not None


def test_dataset_map_matches_local(spark):
    """Distributed pooled mAP == single-process merged oracle."""
    from docling_metrics_spark.datagen import gen_document
    from docling_metrics_spark.kernels.layout import merged_map_local
    from docling_metrics_spark.plans.queries import layout_map_dataset

    local_docs = [gen_document(i) for i in range(200)]
    args = [
        (
            [(b["category_id"], b["bbox"]) for b in d["gt_boxes"]],
            [(b["category_id"], b["bbox"], b["score"]) for b in d["pred_boxes"]],
        )
        for d in local_docs
    ]
    want = merged_map_local(args)
    # the query caps the corpus at 500 docs ≥ sf0.001's 500 rows → use a
    # matching 200-doc slice via a monkey-ish direct build instead
    from docling_metrics_spark.datagen import generate_documents_df
    from docling_metrics_spark.operators.udfs import (
        POOLED_AP_SCHEMA,
        match_stats_udf,
        pooled_ap_group,
    )
    from pyspark.sql import functions as F

    docs = generate_documents_df(spark, 200)
    parts = docs.select(
        F.explode(match_stats_udf("gt_boxes", "pred_boxes")).alias("s")
    ).select("s.*")
    aps = parts.groupBy("cls", "thr_idx", "area").applyInPandas(
        pooled_ap_group, schema=POOLED_AP_SCHEMA
    )

    def _area(col, area, thr=None):
        cond = F.col("area") == area
        if thr is not None:
            cond = cond & (F.col("thr_idx") == thr)
        return F.avg(F.when(cond, F.col(col)))

    got = aps.agg(
        _area("ap", "all").alias("map"),
        _area("ap", "all", 0).alias("map_50"),
        _area("ap", "all", 5).alias("map_75"),
        _area("ap", "small").alias("map_small"),
        _area("ap", "medium").alias("map_medium"),
        _area("ap", "large").alias("map_large"),
        _area("rec_1", "all").alias("mar_1"),
        _area("rec_10", "all").alias("mar_10"),
        _area("rec_100", "all").alias("mar_100"),
        _area("rec_100", "small").alias("mar_small"),
        _area("rec_100", "medium").alias("mar_medium"),
        _area("rec_100", "large").alias("mar_large"),
    ).collect()[0]
    for k in ("map", "map_50", "map_75", "map_small", "map_medium",
              "map_large", "mar_1", "mar_10", "mar_100", "mar_small",
              "mar_medium", "mar_large"):
        g = got[k]
        w = want[k]
        if w == -1.0:  # no in-range GT anywhere → null in Spark
            assert g is None, k
        else:
            assert g is not None and abs(g - w) < 1e-9, (k, g, w)

    # per-class means (area=all) from the same pooled frame
    per_cls = {
        r.cls: (r.m, r.r100)
        for r in aps.filter(F.col("area") == "all")
        .groupBy("cls")
        .agg(F.avg("ap").alias("m"), F.avg("rec_100").alias("r100"))
        .collect()
    }
    for cls, (m, r100) in per_cls.items():
        assert abs(m - want["map_per_class"][f"cat_{cls}"]) < 1e-9
        assert abs(r100 - want["mar_100_per_class"][f"cat_{cls}"]) < 1e-9


def test_dataset_map_single_doc_equals_per_doc(spark):
    """On a one-document corpus the pooled dataset path must equal the
    per-document full surface field-by-field (VERDICT r2 #6) — the same
    consistency pattern the reference's benchmark doubles as
    (edit_distance_benchmark.py:90-102). Dataset values are rounded to 6
    decimals in-query, hence the 1e-6 tolerance."""
    import json

    from docling_metrics_spark.operators.udfs import map_doc_udf
    from docling_metrics_spark.plans.queries import _dataset_map_df

    one = (
        generate_documents_df(spark, 30)
        .filter((F.size("gt_boxes") > 0) & (F.size("pred_boxes") > 0))
        .orderBy("doc_id")
        .limit(1)
        .cache()
    )
    assert one.count() == 1

    per = (
        one.select(map_doc_udf("gt_boxes", "pred_boxes").alias("m"))
        .select("m.*")
        .collect()[0]
    )
    ds = _dataset_map_df(one).collect()[0]

    for k in ("map", "map_50", "map_75", "map_small", "map_medium",
              "map_large", "mar_1", "mar_10", "mar_100", "mar_small",
              "mar_medium", "mar_large"):
        want = per[k]
        got = ds[k]
        if want == -1.0:  # per-doc sentinel ⇔ dataset null (empty pool)
            assert got is None, (k, got)
        else:
            assert got is not None and abs(got - want) < 1.01e-6, (k, got, want)

    for col in ("map_per_class", "mar_100_per_class"):
        want_d = json.loads(per[col])
        got_d = json.loads(ds[col])
        assert set(want_d) == set(got_d), col
        for cat, want in want_d.items():
            # dataset JSON values are "%.6f" strings; -1.000000 = empty
            # pool, matching the per-doc surface's -1.0 sentinel
            got = float(got_d[cat])
            assert abs(got - want) < 1.01e-6, (col, cat, got, want)
    one.unpersist()
