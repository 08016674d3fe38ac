"""Per-sample text metrics: set P/R/F1, normalized edit distance, BLEU, METEOR.

Semantics mirror the reference's TextMetrics.evaluate_sample
(packages/docling-metrics-text/docling_metrics_text/docling_metrics_text.py:66-238):

- tokenize both texts (Treebank), build token *sets* for P/R/F1,
- precision = |A∩B| / |B|  (B = prediction/test set; nltk ``precision``),
- recall    = |A∩B| / |A|  (A = ground-truth/reference set),
- f1        = harmonic mean,
- undefined scores (empty prediction set, any kernel exception) return the
  configurable ``error_score`` sentinel, default −1.0
  (docling_metrics_text.py:49-54; verified by test_text_metrics.py:61-81),
- edit distance = token-level Levenshtein / max(len), 0.0 both-empty,
- BLEU: standard corpus BLEU (Papineni et al. 2002): brevity penalty ×
  geometric mean of modified n-gram precisions, n = 1..4, no smoothing —
  0.0 if any order has zero matches. (The reference delegates to
  HF ``evaluate.load("bleu")``, which is the same published formula; the HF
  package is not available here so we implement the formula directly.)
- METEOR: the published exact-match METEOR formula (Banerjee & Lavie 2005):
  unigram P/R with alpha=0.9 harmonic mean, chunk fragmentation penalty
  0.5·(chunks/matches)^3. The reference uses nltk's WordNet-backed matcher;
  WordNet is unavailable here, so stage-1 exact matching only (deterministic,
  documented deviation).
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass

from docling_metrics_spark.kernels.levenshtein import normalized_edit_distance
from docling_metrics_spark.kernels.tokenize import treebank_tokenize

DEFAULT_ERROR_SCORE = -1.0


@dataclass
class TextPairScores:
    f1_score: float
    precision_score: float
    recall_score: float
    edit_distance_score: float
    bleu_score: float
    meteor_score: float


def set_precision(ref_set: set, test_set: set) -> float | None:
    """|ref ∩ test| / |test|; None when the test set is empty."""
    if not test_set:
        return None
    return len(ref_set & test_set) / len(test_set)


def set_recall(ref_set: set, test_set: set) -> float | None:
    """|ref ∩ test| / |ref|; None when the reference set is empty."""
    if not ref_set:
        return None
    return len(ref_set & test_set) / len(ref_set)


def set_f_measure(ref_set: set, test_set: set, alpha: float = 0.5) -> float | None:
    p = set_precision(ref_set, test_set)
    r = set_recall(ref_set, test_set)
    if p is None or r is None:
        return None
    if p == 0.0 or r == 0.0:
        return 0.0
    return 1.0 / (alpha / p + (1.0 - alpha) / r)


def bleu(prediction_tokens: list[str], reference_tokens: list[str],
         max_n: int = 4) -> float:
    """Corpus BLEU for a single pair, no smoothing.

    Raises on an empty reference — HF ``evaluate`` errors there, which the
    caller maps to the −1 sentinel (test_text_metrics.py:61-81 parity)."""
    pred_len, ref_len = len(prediction_tokens), len(reference_tokens)
    if ref_len == 0:
        raise ValueError("empty reference")
    if pred_len == 0:
        return 0.0
    log_sum = 0.0
    for n in range(1, max_n + 1):
        # zip-of-shifted-views builds n-gram tuples in C, ~3× the sliced
        # comprehension; unigrams skip tuple-wrapping entirely
        if n == 1:
            pred_ngrams = Counter(prediction_tokens)
            ref_ngrams = Counter(reference_tokens)
        else:
            pred_ngrams = Counter(zip(*(prediction_tokens[i:] for i in range(n))))
            ref_ngrams = Counter(zip(*(reference_tokens[i:] for i in range(n))))
        total = max(pred_len - n + 1, 0)
        if total == 0:
            return 0.0
        matched = sum(min(c, ref_ngrams[g]) for g, c in pred_ngrams.items())
        if matched == 0:
            return 0.0
        log_sum += math.log(matched / total)
    bp = 1.0 if pred_len >= ref_len else math.exp(1.0 - ref_len / pred_len)
    return bp * math.exp(log_sum / max_n)


def _meteor_align(ref: list[str], hyp: list[str]) -> tuple[int, int]:
    """Greedy left-to-right exact unigram alignment → (matches, chunks).

    Each hypothesis token takes the leftmost unused reference occurrence of
    the same token. Indexing ref positions per token makes this O(n+m) —
    the naive scan is O(n·m), which blows up on skew-giant documents and
    caps task-level parallel scaling."""
    from collections import defaultdict, deque

    positions: dict[str, deque[int]] = defaultdict(deque)
    for ri, rtok in enumerate(ref):
        positions[rtok].append(ri)
    pairs: list[tuple[int, int]] = []  # (hyp_idx, ref_idx)
    for hi, tok in enumerate(hyp):
        q = positions.get(tok)
        if q:
            pairs.append((hi, q.popleft()))
    if not pairs:
        return 0, 0
    chunks = 1
    for (h0, r0), (h1, r1) in zip(pairs, pairs[1:]):
        if not (h1 == h0 + 1 and r1 == r0 + 1):
            chunks += 1
    return len(pairs), chunks


def meteor(reference_tokens: list[str], hypothesis_tokens: list[str],
           alpha: float = 0.9, beta: float = 3.0, gamma: float = 0.5) -> float:
    """Exact-match METEOR (Banerjee & Lavie 2005 parameters as in nltk)."""
    matches, chunks = _meteor_align(reference_tokens, hypothesis_tokens)
    if matches == 0:
        return 0.0
    precision = matches / len(hypothesis_tokens)
    recall = matches / len(reference_tokens)
    fmean = (precision * recall) / (alpha * precision + (1 - alpha) * recall)
    frag = chunks / matches
    penalty = gamma * frag**beta
    return (1 - penalty) * fmean


def evaluate_text_pair(
    text_a: str, text_b: str, error_score: float = DEFAULT_ERROR_SCORE
) -> TextPairScores:
    """Full per-sample text evaluation; ``text_a`` is ground truth,
    ``text_b`` the prediction. Mirrors TextMetrics.evaluate_sample."""
    try:
        tokens_a = treebank_tokenize(text_a)
        tokens_b = treebank_tokenize(text_b)
    except Exception:
        return TextPairScores(*([error_score] * 6))
    return evaluate_token_pair(tokens_a, tokens_b, error_score)


def evaluate_token_pair(
    tokens_a: list[str], tokens_b: list[str],
    error_score: float = DEFAULT_ERROR_SCORE,
) -> TextPairScores:
    """The six metrics from already-tokenized sides — the post-tokenize
    half of :func:`evaluate_text_pair`, split out so a query can
    materialize the token arrays and let a DuckDB oracle recompute every
    score from them independently."""
    set_a, set_b = set(tokens_a), set(tokens_b)

    def _safe(fn, *args):
        try:
            v = fn(*args)
            return error_score if v is None else v
        except Exception:
            return error_score

    return TextPairScores(
        f1_score=_safe(set_f_measure, set_a, set_b),
        precision_score=_safe(set_precision, set_a, set_b),
        recall_score=_safe(set_recall, set_a, set_b),
        edit_distance_score=_safe(normalized_edit_distance, tokens_a, tokens_b),
        bleu_score=_safe(bleu, tokens_a, tokens_b),
        meteor_score=_safe(meteor, tokens_a, tokens_b),
    )
