"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Extra keys: ``docs_per_sec`` (flagship end-to-end extraction+metric
throughput — the BASELINE.json north-star metric) and ``n_docs``.

``--scaling`` mode runs the flagship pipeline at two parallelism levels
(local[8] vs local[32] — the sandbox stand-in for N vs 4N executors) in
separate JVMs and reports throughput at both plus scaling efficiency;
``tools/bench_scaling.py`` wraps it and appends to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # module-level: pandas_udf resolves type hints here

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline queries: flagship UDF pipeline + one per operator family.
# Round-3 registry trim (VERDICT r2 #2): pricing_summary / events_hourly /
# user_sessions / regional_customer_volume / orders_no_big_lineitem were
# demo queries, now unregistered; their headline slots are taken by the
# merged dim_join_filters + order_stats_histogram (same operators, one
# plan). See BASELINE.md round-3 notes for the r2→r3 comparability map.
HEADLINE = [
    "extract_spans_pipeline",
    "extraction_summary",
    "dim_join_filters",
    "order_stats_histogram",
    "top_revenue_orders",
    "top_order_per_customer",
    "token_stats_by_lang",
    "exact_dedup",
    "minhash_lsh_dedup",
    "simhash_near_dup",
    "embedding_topk",
    "token_edit_distance_pairs",
    "teds_table_pairs",
    "teds_cells_pairs",
    "layout_map",
    "tore_confusion",
    "markush_quality",
    "embedding_lsh_topk",
]


def _force(df) -> None:
    """Force FULL execution of every column, including pandas-UDF outputs.

    ``df.count()`` is NOT enough: Catalyst prunes columns a count does not
    need, which silently skips ArrowEvalPython nodes — the timing then
    measures a bare parquet row count (CLAUDE.md pitfall; flagged in
    round-1 ADVICE). The noop sink materializes every column.
    """
    df.write.format("noop").mode("overwrite").save()


def run_bench(sf_dir: str, master: str, shuffle_partitions: int) -> dict:
    from docling_metrics_spark.session import build_session
    import __spark_entry__ as E

    spark = build_session(master=master, shuffle_partitions=shuffle_partitions)
    qs = E.queries()
    timings: dict[str, float] = {}
    n_docs = 0

    # Warm the JVM AND the Python worker pool (a pandas UDF forks one
    # worker per slot and pays pandas/numpy import once, here instead of
    # inside the first measured query).
    from pyspark.sql import functions as F

    @F.pandas_udf("double")
    def _warm(v: pd.Series) -> pd.Series:
        from docling_metrics_spark.kernels.textmetrics import evaluate_text_pair  # noqa: F401

        return v * 1.0

    n_slots = spark.sparkContext.defaultParallelism
    (
        spark.range(n_slots * 4, numPartitions=n_slots * 4)
        .select(F.sum(_warm(F.col("id").cast("double"))))
        .collect()
    )

    # Materialize the synthetic corpora OUTSIDE the timed loop — corpus
    # synthesis is table prep (a lake table in deployment), not query work.
    from docling_metrics_spark.plans.queries import CORPUS_CAPS, _corpus

    for cap in sorted({CORPUS_CAPS[q] for q in HEADLINE if q in CORPUS_CAPS}):
        _corpus(spark, sf_dir, cap=cap).count()

    # ANN index build (LSH signature table) is prep too — amortized over
    # every search at lake scale.
    from docling_metrics_spark.plans.queries import _lsh_sigs_table

    _lsh_sigs_table(spark, sf_dir).count()

    # Best-of-N per query (default 3): the sandbox microVM shares a host,
    # and CPU steal can inflate a single run ~5× (BASELINE.md) — round-3
    # clean reruns saw individual queries swing 1.8s ↔ 9s between
    # back-to-back bench invocations. The min of three runs samples past
    # most spikes. Reference benchmark harnesses emit per-run
    # min/max/mean/median stats; repeats>1 reproduces that surface in
    # "query_stats".
    repeats = max(int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")), 1)
    stats: dict[str, dict] = {}

    # Cached-intermediate transparency (VERDICT r4 #1/#2): queries built on
    # _cached_materialize tables share kernel cost — whichever consumer
    # runs first pays the build; later consumers (and later best-of-N
    # iterations) read the cache. Disclose every timed run that consumed a
    # pre-built table so per-query numbers are never silently credited.
    from docling_metrics_spark.plans import queries as Q

    shared: dict[str, list] = {}

    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        samples = []
        for _ in range(repeats):
            if name == "extract_spans_pipeline":
                # the flagship headline (docs/sec) must always price the
                # LIVE fused kernel, so every flagship iteration rebuilds
                # the shared per-doc table (extraction_summary then reuses
                # it — disclosed below). NOTE the timed region therefore
                # also includes the per-doc table's parquet write + a
                # noop read-back scan — the production checkpoint shape
                # the north rule requires, but a cost the r1-r4 flagship
                # numbers (pre-sharing, pure kernel) did NOT carry; the
                # r4→r5 flagship comparison in BASELINE.md notes this.
                Q.invalidate_cache(Q._FLAGSHIP_PERDOC_PATH)
            ev0 = len(Q.CACHE_EVENTS)
            t0 = time.time()
            df = fn(spark, sf_dir)
            _force(df)
            samples.append(time.time() - t0)
            reused = sorted(
                {p for p, kind in Q.CACHE_EVENTS[ev0:] if kind == "reuse"}
            )
            if reused:
                cur = set(shared.get(name, []))
                shared[name] = sorted(cur | set(reused))
        timings[name] = round(min(samples), 3)
        if repeats > 1:
            srt = sorted(samples)
            stats[name] = {
                "min": round(srt[0], 3),
                "max": round(srt[-1], 3),
                "mean": round(sum(srt) / len(srt), 3),
                "median": round(srt[len(srt) // 2], 3),
            }
        if name == "extract_spans_pipeline":
            # Row count for docs/sec, measured OUTSIDE the timed window
            # (the count() plan prunes UDF columns, so it is cheap).
            n_docs = fn(spark, sf_dir).count()

    total = round(sum(timings.values()), 3)
    flagship = timings.get("extract_spans_pipeline", 0.0)

    # "No silent caps": report any headline query whose synthetic corpus is
    # capped below the tier's document count.
    from docling_metrics_spark.plans.queries import CORPUS_CAPS

    try:
        import pyarrow.parquet as pq

        tier_docs = pq.ParquetFile(
            os.path.join(sf_dir, "documents.parquet")
        ).metadata.num_rows
    except Exception:
        tier_docs = None
    caps = {
        q: c
        for q, c in CORPUS_CAPS.items()
        if q in timings and tier_docs is not None and c < tier_docs
    }

    result = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "corpus_caps": caps,
        # queries whose timed run consumed a _cached_materialize table a
        # previous query/iteration already built (paths listed) — their
        # per-query numbers exclude that build cost (VERDICT r4 #1/#2)
        "shared_intermediates": shared,
        # correct-by-design bounds inside verification/grading queries
        # (declared, not silent — VERDICT r4 #5)
        "verification_caps": dict(Q.VERIFICATION_CAPS),
        # runtime counters (e.g. oracle-unencodable rows dropped — must
        # be 0 unless a warning also fired)
        "query_counters": dict(Q.QUERY_COUNTERS),
        "sf": sf_dir,
        "master": master,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / flagship, 2) if flagship else None,
    }
    if stats:
        result["_query_stats"] = stats  # stripped from the headline line
    spark.stop()
    return result


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = f"local[{cpus}]"
    shuffle = max(int(cpus) if cpus.isdigit() else 32, 8)
    result = run_bench(sf_dir, master, shuffle)
    # Detailed per-run stats go to a sidecar file; the FINAL stdout line is
    # the compact headline JSON only — round 2's single fat line overran the
    # driver's tail capture and BENCH_r02 recorded "parsed": null
    # (VERDICT r2 #4).
    details_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_details.json"
    )
    with open(details_path, "w") as fh:
        json.dump(result, fh, indent=1)
    headline = {k: v for k, v in result.items() if not k.startswith("_")}
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
