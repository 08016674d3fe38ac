"""The token_edit_distance_pairs oracle is a full independent DuckDB
re-computation of all six text metrics from materialized token arrays
(set P/R/F1, byte-encoded Levenshtein, BLEU n-gram clipping, METEOR
occurrence-join alignment). This fuzz pins the SQL against the Python
kernels on randomized pairs plus the edge lattice (empty sides, lengths
1–4 where BLEU's total=0 early-outs live).

DuckDB's ``levenshtein`` is BYTE-based (a 3-byte CJK substitution costs
up to 3, and alignments may split multi-byte chars), so the encoding must
be one single byte per token — also asserted here.
"""

import random

import duckdb
import pandas as pd
import pytest

from docling_metrics_spark.kernels.levenshtein import levenshtein
from docling_metrics_spark.kernels.textmetrics import (
    evaluate_token_pair,
    evaluate_text_pair,
)
from docling_metrics_spark.operators.udfs import _encode_token_pair, _fmt6_half_up

SCORE_COLS = [
    "f1_score",
    "precision_score",
    "recall_score",
    "edit_distance_score",
    "bleu_score",
    "meteor_score",
]


def _cases():
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(120)]
    cases = [
        ([], []),
        ([], ["w1", "w2", "w3"]),
        (["w1", "w2"], []),
        (["w1", "w2", "w3"], ["w1", "w2", "w3"]),
    ]
    for la in range(1, 5):
        for lb in range(1, 5):
            cases.append(
                (
                    [rng.choice(vocab[:5]) for _ in range(la)],
                    [rng.choice(vocab[:5]) for _ in range(lb)],
                )
            )
    for _ in range(150):
        la, lb = rng.randint(0, 80), rng.randint(0, 80)
        v = vocab[: rng.randint(2, 120)]
        cases.append(
            (
                [rng.choice(v) for _ in range(la)],
                [rng.choice(v) for _ in range(lb)],
            )
        )
    return cases


def test_oracle_sql_matches_kernels(tmp_path):
    from docling_metrics_spark.plans.queries import (
        _TOKEN_PAIRS_ORACLE,
        _TOKEN_PAIRS_PATH,
    )

    cases = _cases()
    rows = []
    for i, (ta, tb) in enumerate(cases):
        ea, eb = _encode_token_pair(ta, tb)
        assert ea is not None and eb is not None
        # single-byte-per-token property DuckDB's byte-lev depends on
        assert len(ea.encode()) == len(ta) and len(eb.encode()) == len(tb)
        rows.append(
            {
                "gt_id": i,
                "pred_id": i + 1000,
                "tokens_a": ta,
                "tokens_b": tb,
                "enc_a": ea,
                "enc_b": eb,
                "tok_err": False,
            }
            | evaluate_token_pair(ta, tb).__dict__
        )
    # tokenizer-failure sentinel row: the oracle must mirror the error
    # channel (all six scores −1.0), not derive scores from empty tokens
    err_id = len(cases)
    rows.append(
        {"gt_id": err_id, "pred_id": err_id + 1000, "tokens_a": [],
         "tokens_b": [], "enc_a": None, "enc_b": None, "tok_err": True,
         "f1_score": -1.0, "precision_score": -1.0, "recall_score": -1.0,
         "edit_distance_score": -1.0, "bleu_score": -1.0,
         "meteor_score": -1.0}
    )
    pd.DataFrame(rows).to_parquet(tmp_path / "part0.parquet")
    con = duckdb.connect()
    con.execute("SET threads=2")
    sql = _TOKEN_PAIRS_ORACLE.replace(_TOKEN_PAIRS_PATH, str(tmp_path))
    res = con.execute(sql).df().set_index("gt_id").sort_index()
    assert len(res) == len(cases) + 1
    for col in SCORE_COLS:
        assert float(res.loc[err_id, col]) == -1.0, col
    for i, (ta, tb) in enumerate(cases):
        ks = evaluate_token_pair(ta, tb).__dict__
        for col in SCORE_COLS:
            # HALF_UP 6-dp on both sides — Spark F.round / DuckDB round
            # semantics, NOT Python banker's (1/128-style .5 edges differ)
            assert _fmt6_half_up(float(res.loc[i, col])) == _fmt6_half_up(
                ks[col]
            ), f"case {i} {col}: oracle={res.loc[i, col]} kernel={ks[col]}"


def test_encoding_preserves_token_levenshtein():
    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(40)]
    for _ in range(100):
        ta = [rng.choice(vocab) for _ in range(rng.randint(0, 30))]
        tb = [rng.choice(vocab) for _ in range(rng.randint(0, 30))]
        ea, eb = _encode_token_pair(ta, tb)
        assert levenshtein(list(ea), list(eb)) == levenshtein(ta, tb)


def test_encoding_overflow_returns_none():
    big = [f"w{i}" for i in range(130)]
    assert _encode_token_pair(big, []) == (None, None)
    assert _encode_token_pair(big[:64], big[60:]) == (None, None)
    # exactly at the cap still encodes
    ea, eb = _encode_token_pair(big[:127], big[:10])
    assert ea is not None and len(ea) == 127


def test_token_pair_matches_text_pair():
    """evaluate_text_pair == tokenize + evaluate_token_pair (the split
    introduced for the oracle must not change scores)."""
    from docling_metrics_spark.kernels.tokenize import treebank_tokenize

    texts = [
        ("The quick brown fox.", "The quick red fox jumped!"),
        ("", "something here"),
        ("a b c d e", ""),
        ("Dr. Smith's co-op, isn't it?", "Dr. Smith's coop is not it"),
    ]
    for a, b in texts:
        full = evaluate_text_pair(a, b).__dict__
        split = evaluate_token_pair(
            treebank_tokenize(a), treebank_tokenize(b)
        ).__dict__
        assert full == pytest.approx(split)
