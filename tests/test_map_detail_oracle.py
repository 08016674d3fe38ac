"""The layout_map oracle re-derives the full per-document COCO surface
(12 scalars + per-class JSONs) in DuckDB from the materialized
per-(cls, thr_idx, area) AP/AR pool rows. This fuzz pins that SQL against
the kernel's own surface assembly (`evaluate_map`) on randomized box
sets, including empty documents (the −1.0 / "{}" sentinel path)."""

import random

import duckdb
import pandas as pd

from docling_metrics_spark.kernels.layout import evaluate_map, evaluate_map_detail
from docling_metrics_spark.operators.udfs import _fmt6_half_up, _sorted_json

SCALARS = [
    "map", "map_50", "map_75", "map_small", "map_medium", "map_large",
    "mar_1", "mar_10", "mar_100", "mar_small", "mar_medium", "mar_large",
]


def _rand_docs(seed=99, n=30):
    rng = random.Random(seed)
    docs = {}
    for d in range(n):
        gt = []
        for _ in range(rng.randint(0, 12)):
            x0, y0 = rng.uniform(0, 800), rng.uniform(0, 800)
            w, h = rng.uniform(0.5, 400), rng.uniform(0.5, 400)
            gt.append((rng.randint(1, 4), [x0, y0, x0 + w, y0 + h]))
        pred = []
        for _ in range(rng.randint(0, 15)):
            if gt and rng.random() < 0.6:
                c, b = rng.choice(gt)
                b = [v + rng.uniform(-20, 20) for v in b]
            else:
                x0, y0 = rng.uniform(0, 800), rng.uniform(0, 800)
                b = [x0, y0, x0 + rng.uniform(0.5, 300),
                     y0 + rng.uniform(0.5, 300)]
                c = rng.randint(1, 4)
            pred.append(
                (c, [min(b[0], b[2]), min(b[1], b[3]),
                     max(b[0], b[2]), max(b[1], b[3])], rng.random())
            )
        docs[f"d{d}"] = (gt, pred)
    docs["dempty"] = ([], [])
    return docs


def test_map_detail_oracle_matches_surface(tmp_path):
    from docling_metrics_spark.plans.queries import (
        _MAP_DOC_POOLS_PATH,
        _map_doc_oracle,
    )

    docs = _rand_docs()
    rows = []
    for did, (gt, pred) in docs.items():
        detail = evaluate_map_detail(gt, pred)
        if not detail:  # explode_outer's null row for an empty document
            rows.append(
                {"doc_id": did, "cls": None, "thr_idx": None, "area": None,
                 "ap": None, "ar_1": None, "ar_10": None, "ar_100": None}
            )
        for r in detail:
            rows.append({"doc_id": did, **r})
    df = pd.DataFrame(rows)
    # Spark writes int32 pool keys; pandas must not widen them to float
    df["cls"] = df["cls"].astype("Int32")
    df["thr_idx"] = df["thr_idx"].astype("Int32")
    df.to_parquet(tmp_path / "p.parquet")

    con = duckdb.connect()
    con.execute("SET threads=2")
    sql = _map_doc_oracle().replace(_MAP_DOC_POOLS_PATH, str(tmp_path))
    res = con.execute(sql).df().set_index("doc_id")
    assert len(res) == len(docs)
    for did, (gt, pred) in docs.items():
        want = evaluate_map(gt, pred)
        got = res.loc[did]
        for k in SCALARS:
            assert _fmt6_half_up(want[k]) == _fmt6_half_up(float(got[k])), (
                did, k, want[k], got[k],
            )
        for k in ("map_per_class", "mar_100_per_class"):
            exp = _sorted_json(
                {kk: _fmt6_half_up(vv) for kk, vv in want[k].items()}
            )
            assert exp == got[k], (did, k, exp, got[k])
