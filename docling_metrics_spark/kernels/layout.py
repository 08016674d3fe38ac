"""Layout metrics: IoU, COCO-style mAP, and a TORE-style multi-label
pixel confusion matrix. Pure numpy — runs inside Arrow UDFs.

- :func:`iou_matrix` — pairwise xyxy IoU (reference IoU reward
  grits.py:257-275; xywh↔xyxy conversions layout/utils/utils.py:18-49 are
  plain column arithmetic in our Spark layer).
- :func:`average_precision` / :func:`evaluate_map` — the published COCO
  evaluation protocol (Lin et al. 2014 + pycocotools reference protocol):
  greedy matching of score-sorted predictions to GT at a given IoU
  threshold, 101-point interpolated AP, thresholds 0.50:0.05:0.95,
  mAP = mean over classes present in GT. The reference delegates to
  torchmetrics/faster_coco_eval (map_layout_evaluator.py:201-208); we
  implement the protocol directly (torch unavailable, and from-scratch is
  the point).
- :func:`rasterize_multilabel` / :func:`confusion_matrix_from_masks` —
  per-pixel multi-label confusion in the spirit of the reference's TORE
  evaluator (multi_label_confusion_matrix.py:75-377): bboxes rasterized to
  per-pixel class *bitmasks* (uint64, bit 0 = background), pixels compressed
  to unique (gt_mask, pred_mask) pairs with counts (the relational
  ``groupBy(g, p).count()`` twin of the reference's np.unique compression,
  lines 28-56), then each pair contributes weight to an
  (n_classes+1)² matrix: matched classes on the diagonal, unmatched gt
  classes spread uniformly over unmatched pred classes (or background).
  Per-class precision/recall/F1 derive from row/column sums
  (multi_label_confusion_matrix.py:419-488). The contribution algebra is
  the reference's exact four-case weighted scheme (ibid. 163-377, verified
  case-by-case against the reference's paper fixture — see
  :func:`confusion_matrix_binary`), re-expressed as einsum over the
  compressed pairs instead of per-pixel 3-D contribution tensors.
"""

from __future__ import annotations

import numpy as np

IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)  # 0.50 … 0.95 (10 thresholds)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


def iou_matrix(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """Pairwise IoU of two (n,4) / (m,4) xyxy float arrays → (n,m)."""
    if len(boxes_a) == 0 or len(boxes_b) == 0:
        return np.zeros((len(boxes_a), len(boxes_b)))
    a = np.asarray(boxes_a, dtype=np.float64)
    b = np.asarray(boxes_b, dtype=np.float64)
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return np.divide(inter, union, out=np.zeros_like(inter), where=union > 0)


def _match_predictions(
    ious: np.ndarray, scores: np.ndarray, thr: float
) -> np.ndarray:
    """Greedy COCO matching: predictions (pre-sorted by descending score)
    claim the highest-IoU unmatched GT ≥ thr. Returns bool TP flags per
    prediction in that order."""
    n_gt = ious.shape[0]
    # caller passes predictions already sorted by descending score
    gt_taken = np.zeros(n_gt, dtype=bool)
    tp = np.zeros(len(scores), dtype=bool)
    for pi in range(len(scores)):
        best, best_iou = -1, thr
        for gi in range(n_gt):
            if not gt_taken[gi] and ious[gi, pi] >= best_iou:
                best, best_iou = gi, ious[gi, pi]
        if best >= 0:
            gt_taken[best] = True
            tp[pi] = True
    return tp


def average_precision(
    tp_sorted: np.ndarray, n_gt: int
) -> float:
    """101-point interpolated AP from TP flags sorted by descending score."""
    if n_gt == 0:
        return float("nan")
    if len(tp_sorted) == 0:
        return 0.0
    tp_cum = np.cumsum(tp_sorted)
    fp_cum = np.cumsum(~tp_sorted)
    recall = tp_cum / n_gt
    precision = tp_cum / (tp_cum + fp_cum)
    # Precision envelope (monotone non-increasing from the right),
    # vectorized: reverse → running max → reverse.
    precision = np.maximum.accumulate(precision[::-1])[::-1]
    idx = np.searchsorted(recall, RECALL_POINTS, side="left")
    prec_at = np.where(idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0)
    return float(prec_at.mean())


# COCO area ranges (pycocotools params): boxes outside the range are
# IGNORED for that bucket (neither GT nor false positive).
AREA_RANGES: dict[str, tuple[float, float]] = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}


def _match_with_ignore(
    ious: np.ndarray, gt_ig: np.ndarray, thr: float
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy COCO matching with ignore semantics (the published
    pycocotools evaluateImg algorithm): dts in descending-score order claim
    the highest-IoU unmatched GT ≥ thr; GT rows are pre-sorted non-ignored
    first, and a dt may fall through to an ignored GT only when no valid GT
    remains. Returns (dtm gt-row-index or -1 per dt, dt_ignored flags)."""
    n_gt, n_dt = ious.shape
    # plain-python lists: the tight greedy loop on ≤tens of boxes is
    # dominated by numpy scalar-indexing overhead otherwise
    ious_l = ious.T.tolist()  # [n_dt][n_gt]
    ig_l = gt_ig.tolist()
    gtm = [-1] * n_gt
    dtm = np.full(n_dt, -1, dtype=np.int64)
    dt_ig = np.zeros(n_dt, dtype=bool)
    for d in range(n_dt):
        row = ious_l[d]
        best = min(thr, 1.0 - 1e-10)
        m = -1
        for g in range(n_gt):
            if gtm[g] >= 0:
                continue
            if m > -1 and not ig_l[m] and ig_l[g]:
                break  # remaining gts are all ignored (sorted)
            if row[g] < best:
                continue
            best = row[g]
            m = g
        if m == -1:
            continue
        dtm[d] = m
        gtm[m] = d
        dt_ig[d] = ig_l[m]
    return dtm, dt_ig


def _ap_ar_from_match(
    dtm: np.ndarray, dt_ig: np.ndarray, npig: int
) -> tuple[float, float]:
    """101-point AP and max recall from score-ordered match results,
    ignored detections excluded (COCO accumulate)."""
    if npig == 0:
        return float("nan"), float("nan")
    keep = ~dt_ig
    tp = (dtm >= 0)[keep]
    if tp.size == 0:
        return 0.0, 0.0
    return average_precision(tp, npig), float(tp.sum() / npig)


def _match_all_thresholds(ious: np.ndarray) -> np.ndarray:
    """Greedy COCO matching for ALL IoU thresholds in one dt pass, for the
    no-ignore case (area="all" with every box in range — the core surface).

    Semantics are bit-identical to running :func:`_match_with_ignore` per
    threshold with no ignored GT: dts in descending-score order claim the
    max-IoU unmatched GT with IoU ≥ thr, equal-IoU ties going to the LAST
    GT index. Vectorizing the threshold axis turns the T×D×G Python loop
    into D passes of [T,G] numpy ops — ~2× on typical documents and ~20×
    on skew-giant pages where G is in the hundreds.

    Returns bool TP flags [T, D] in dt order."""
    n_gt, n_dt = ious.shape
    n_thr = len(IOU_THRESHOLDS)
    tp = np.zeros((n_thr, n_dt), dtype=bool)
    if n_gt == 0 or n_dt == 0:
        return tp
    thr_col = IOU_THRESHOLDS[:, None]  # [T,1]
    taken = np.zeros((n_thr, n_gt), dtype=bool)
    rows = ious.T  # [D,G]
    t_idx = np.arange(n_thr)
    for d in range(n_dt):
        row = rows[d]
        masked = np.where((row[None, :] >= thr_col) & ~taken, row[None, :], -1.0)
        # last argmax (ties → highest GT index), matching the loop's
        # `>=` replacement rule
        sel = (n_gt - 1) - np.argmax(masked[:, ::-1], axis=1)
        ok = masked[t_idx, sel] > -1.0
        taken[ok, sel[ok]] = True
        tp[ok, d] = True
    return tp


def _ap_all_thresholds(tp: np.ndarray, n_gt: int) -> np.ndarray:
    """101-point interpolated AP for every threshold at once: the batched
    twin of :func:`average_precision` over TP flags [T, D] (dt order =
    descending score). Returns AP [T]; caller guards n_gt == 0."""
    n_thr, n_dt = tp.shape
    if n_dt == 0:
        return np.zeros(n_thr)
    tp_cum = np.cumsum(tp, axis=1)
    fp_cum = np.cumsum(~tp, axis=1)
    recall = tp_cum / n_gt
    precision = tp_cum / (tp_cum + fp_cum)
    precision = np.maximum.accumulate(precision[:, ::-1], axis=1)[:, ::-1]
    # first dt index where recall ≥ each of the 101 points (searchsorted
    # batched via argmax over a [T, D, 101] comparison)
    ge = recall[:, :, None] >= RECALL_POINTS[None, None, :]
    idx = ge.argmax(axis=1)
    prec_at = np.where(
        ge.any(axis=1),
        np.take_along_axis(precision, np.minimum(idx, n_dt - 1), axis=1),
        0.0,
    )
    return prec_at.mean(axis=1)


def _fill_pools(
    gt: list[tuple[int, list[float]]],
    pred: list[tuple[int, list[float], float]],
    max_det: int,
    core: bool,
) -> tuple[list, dict, dict]:
    """The COCO matching/AP loop behind :func:`evaluate_map`: fills the
    per-(cls, thr_idx, area) AP pool and the per-(…, maxdet) AR pool
    (NaN = empty pool). Shared by the per-document surface and the
    long-form :func:`evaluate_map_detail` the layout_map oracle
    re-aggregates."""
    classes = sorted({c for c, _ in gt} | {c for c, _, _ in pred})
    # predictions are truncated to max_det per class below, but GT is
    # unbounded input: a hostile document with millions of boxes would
    # allocate a gigabyte IoU matrix — refuse with ValueError (the UDF
    # wrapper emits the sentinel row instead of killing the task)
    if len(gt) + len(pred) > 100_000:
        raise ValueError(f"too many boxes: {len(gt)} gt + {len(pred)} pred")
    ap: dict[tuple, float] = {}   # (cls, thr_idx, area) -> AP at max_det
    ar: dict[tuple, float] = {}   # (cls, thr_idx, area, maxdet) -> AR
    if not classes:
        return classes, ap, ar
    n_thr = len(IOU_THRESHOLDS)
    area_ranges = {"all": AREA_RANGES["all"]} if core else AREA_RANGES

    for cls in classes:
        g = np.array([b for c, b in gt if c == cls], dtype=np.float64).reshape(-1, 4)
        p = [(b, s) for c, b, s in pred if c == cls]
        p.sort(key=lambda x: -x[1])
        p = p[:max_det]
        pb = np.array([b for b, _ in p], dtype=np.float64).reshape(-1, 4)
        g_area = (g[:, 2] - g[:, 0]) * (g[:, 3] - g[:, 1])
        p_area = (pb[:, 2] - pb[:, 0]) * (pb[:, 3] - pb[:, 1])
        ious_full = iou_matrix(g, pb)

        if core:
            # Fast path for the overwhelmingly common case where the "all"
            # area range ignores nothing: matching + AP batch across the
            # whole threshold axis. Degenerate (inverted/negative-area) or
            # giant (>1e10) boxes DO get ignored by the "all" range, so any
            # out-of-range box falls through to the generic ignore-aware
            # loop below — keeping the core surface bit-identical to the
            # full surface on every input, not just well-formed ones.
            lo_all, hi_all = AREA_RANGES["all"]
            if (
                not ((g_area < lo_all) | (g_area > hi_all)).any()
                and not ((p_area < lo_all) | (p_area > hi_all)).any()
            ):
                npig = len(g)
                if npig == 0:
                    for ti in range(n_thr):
                        ap[(cls, ti, "all")] = float("nan")
                        ar[(cls, ti, "all", max_det)] = float("nan")
                    continue
                tp_all = _match_all_thresholds(ious_full)
                ap_t = _ap_all_thresholds(tp_all, npig)
                rec_t = tp_all.sum(axis=1) / npig
                for ti in range(n_thr):
                    ap[(cls, ti, "all")] = float(ap_t[ti])
                    ar[(cls, ti, "all", max_det)] = float(rec_t[ti])
                continue

        for area, (lo, hi) in area_ranges.items():
            gt_ig = (g_area < lo) | (g_area > hi)
            dt_out = (p_area < lo) | (p_area > hi)
            npig = int((~gt_ig).sum())
            maxdets = (
                (1, 10, max_det) if area == "all" and not core else (max_det,)
            )
            if npig == 0 and bool(dt_out.all()):
                # bucket empty on both sides: every AP/AR is NaN — skip the
                # threshold loop (most documents have no small boxes, so
                # this saves ~1/2 the matching work)
                for ti in range(n_thr):
                    ap[(cls, ti, area)] = float("nan")
                    for md in maxdets:
                        ar[(cls, ti, area, md)] = float("nan")
                continue
            order = np.argsort(gt_ig, kind="stable")  # non-ignored first
            ious_o = ious_full[order]
            git = gt_ig[order]
            for ti in range(n_thr):
                dtm, dt_ig = _match_with_ignore(ious_o, git, IOU_THRESHOLDS[ti])
                # unmatched out-of-range dts are ignored, not false positives
                dt_ig = dt_ig | ((dtm == -1) & dt_out)
                for md in maxdets:
                    if md == max_det:
                        a, r = _ap_ar_from_match(dtm, dt_ig, npig)
                        ap[(cls, ti, area)] = a
                    elif npig == 0:
                        r = float("nan")
                    else:
                        # truncated maxdets only need the recall — skip
                        # the (comparatively costly) AP integration
                        keep = ~dt_ig[:md]
                        r = float(((dtm[:md] >= 0) & keep).sum() / npig)
                    ar[(cls, ti, area, md)] = r
    return classes, ap, ar


def evaluate_map(
    gt: list[tuple[int, list[float]]],
    pred: list[tuple[int, list[float], float]],
    max_det: int = 100,
    surface: str = "full",
) -> dict:
    """COCO-protocol mAP for one document/page (or one merged group), with
    the reference's FULL result surface (map_layout_evaluator.py:146-199 /
    torchmetrics MeanAveragePrecision): map/map_50/map_75, size-bucketed
    map_small/medium/large, mar_1/mar_10/mar_100, mar_small/medium/large,
    and per-class map/mar_100 dicts keyed "cat_<id>". -1.0 marks an
    undefined bucket (no in-range GT), matching the torchmetrics sentinel.

    ``surface="core"`` restricts the computation to the flagship pipeline's
    kept fields (all-area map/map_50/map_75/mar_100): the size buckets,
    mar_1/mar_10, and per-class dicts are skipped entirely, not computed
    and discarded. Overlapping fields are bit-identical to the full
    surface (same matching loop, same threshold grid).

    gt: [(category_id, xyxy)], pred: [(category_id, xyxy, score)].
    """
    core = surface == "core"
    classes, ap, ar = _fill_pools(gt, pred, max_det, core)
    sent = -1.0
    if not classes:
        if core:
            return {"map": sent, "map_50": sent, "map_75": sent,
                    "mar_100": sent}
        return {
            "map": sent, "map_50": sent, "map_75": sent,
            "map_small": sent, "map_medium": sent, "map_large": sent,
            "mar_1": sent, "mar_10": sent, "mar_100": sent,
            "mar_small": sent, "mar_medium": sent, "mar_large": sent,
            "map_per_class": {}, "mar_100_per_class": {},
        }

    n_thr = len(IOU_THRESHOLDS)

    def _mean(vals: list[float]) -> float:
        arr = np.array(vals, dtype=np.float64)
        arr = arr[~np.isnan(arr)]
        return float(arr.mean()) if arr.size else sent

    def _map_area(area: str) -> float:
        return _mean([ap[(c, t, area)] for c in classes for t in range(n_thr)])

    def _mar(area: str, md: int) -> float:
        return _mean(
            [ar[(c, t, area, md)] for c in classes for t in range(n_thr)]
        )

    if core:
        return {
            "map": _map_area("all"),
            "map_50": _mean([ap[(c, 0, "all")] for c in classes]),
            "map_75": _mean([ap[(c, 5, "all")] for c in classes]),
            "mar_100": _mar("all", max_det),
        }

    per_cls_map = {
        f"cat_{c}": _mean([ap[(c, t, "all")] for t in range(n_thr)])
        for c in classes
    }
    per_cls_mar = {
        f"cat_{c}": _mean([ar[(c, t, "all", max_det)] for t in range(n_thr)])
        for c in classes
    }
    return {
        "map": _map_area("all"),
        "map_50": _mean([ap[(c, 0, "all")] for c in classes]),
        "map_75": _mean([ap[(c, 5, "all")] for c in classes]),
        "map_small": _map_area("small"),
        "map_medium": _map_area("medium"),
        "map_large": _map_area("large"),
        "mar_1": _mar("all", 1),
        "mar_10": _mar("all", 10),
        "mar_100": _mar("all", max_det),
        "mar_small": _mar("small", max_det),
        "mar_medium": _mar("medium", max_det),
        "mar_large": _mar("large", max_det),
        "map_per_class": per_cls_map,
        "mar_100_per_class": per_cls_mar,
    }


def evaluate_map_detail(
    gt: list[tuple[int, list[float]]],
    pred: list[tuple[int, list[float], float]],
    max_det: int = 100,
) -> list[dict]:
    """Long form of the full per-document surface: one row per
    (cls, thr_idx, area) pool with its AP and AR at maxdets 1/10/max_det
    ('all' area only for the truncated maxdets, mirroring COCO), NaN →
    None. The layout_map query materializes these rows so Spark and a
    DuckDB oracle both re-derive every surface field (nan-skipping means,
    −1.0 empty sentinels, per-class dicts) from the same table."""
    classes, ap, ar = _fill_pools(gt, pred, max_det, core=False)

    def _nn(v):
        return None if v is None or v != v else float(v)

    rows = []
    for cls in classes:
        for ti in range(len(IOU_THRESHOLDS)):
            for area in AREA_RANGES:
                rows.append(
                    {
                        "cls": int(cls),
                        "thr_idx": ti,
                        "area": area,
                        "ap": _nn(ap[(cls, ti, area)]),
                        "ar_1": _nn(ar.get((cls, ti, area, 1))),
                        "ar_10": _nn(ar.get((cls, ti, area, 10))),
                        "ar_100": _nn(ar[(cls, ti, area, max_det)]),
                    }
                )
    return rows


# ---------------------------------------------------------------------------
# TORE multi-label pixel confusion matrix — the reference's exact 4-case
# weighted contribution algebra (multi_label_confusion_matrix.py:163-377),
# vectorized over np.unique-compressed (gt_mask, pred_mask) pixel pairs.
# ---------------------------------------------------------------------------

BACKGROUND_BIT = 0  # bit 0 = background class; data class k -> bit k+1


def unpackbits64(x: np.ndarray, num_bits: int) -> np.ndarray:
    """Low ``num_bits`` bits of a 1-D uint64 array → (n, num_bits) float
    0/1 matrix (reference unpackbits, multi_label_confusion_matrix.py:17-25)."""
    mask = np.left_shift(np.uint64(1), np.arange(num_bits, dtype=np.uint64))
    return ((x[:, None] & mask[None, :]) != 0).astype(np.float64)


def rasterize_multilabel(
    boxes: list[tuple[int, list[float]]], width: int, height: int,
    n_classes: int, set_background: bool = True,
) -> np.ndarray:
    """Rasterize (category_id, xyxy) boxes into a (h, w) uint64 bitmask image.

    Pixel bit layout: data class k sets bit (k+1); bit 0 is set on pixels no
    class covers (the background class, category index 0 in the matrix) —
    the reference's encoding (multi_label_confusion_matrix.py:75-121) with
    our synthetic category ids shifted up one so background owns bit 0.

    With ``set_background=False`` (reference parity option) empty pixels
    carry mask 0; like the reference, case 3 of the confusion algebra then
    divides by a zero pred popcount and yields non-finite entries — use it
    only for inputs whose every pixel is covered (the reference's paper
    fixture does exactly that)."""
    if n_classes > 62:
        raise ValueError("at most 62 classes fit the uint64 bitmask encoding")
    img = np.zeros((height, width), dtype=np.uint64)
    for cls, (x1, y1, x2, y2) in boxes:
        xa, ya = max(int(np.floor(x1)), 0), max(int(np.floor(y1)), 0)
        xb, yb = min(int(np.ceil(x2)), width), min(int(np.ceil(y2)), height)
        if xb > xa and yb > ya:
            img[ya:yb, xa:xb] |= np.uint64(1 << (cls + 1))
    if set_background:
        img[img == 0] = np.uint64(1 << BACKGROUND_BIT)
    return img


def confusion_matrix_binary(
    gt_img: np.ndarray, pred_img: np.ndarray, num_categories: int
) -> np.ndarray:
    """Reference TORE contribution algebra over bit-encoded pixel images.

    Category c is bit c; returns a [num_categories, num_categories] float
    matrix. Pixels are compressed to unique (gt, pred) pairs with counts
    (multi_label_confusion_matrix.py:28-56) and each pair contributes via
    exactly one of the reference's four cases (ibid. 163-377):

    1. gt == pred              → +1 on the diagonal of every gt class.
    2. pred ⊋ gt               → diag gets |gt|/|pred| per gt class; each
                                 (gt class i, pred-only class j) gets 1/|pred|.
    3. gt ⊋ pred               → diag gets 1 per pred class; each
                                 (gt-only i, pred class j) gets 1/|pred|.
    4. mutual difference       → diag gets 1 per gt∩pred class; each
                                 (gt-only i, pred-only j) gets 1/|pred-only|.

    Invariants (reference _validate_contributions, ibid. 490-534): per-pixel
    row sums equal the gt bit vector; total weight equals Σ popcount(gt)."""
    g_flat = np.ascontiguousarray(gt_img, dtype=np.uint64).ravel()
    p_flat = np.ascontiguousarray(pred_img, dtype=np.uint64).ravel()
    # compress to unique (g, p) pairs with counts
    if 2 * num_categories <= 64:
        # pack both masks into one uint64 — 1-D compression is ~10× faster
        # than the row-sorting axis=0 np.unique on megapixel pages
        shift = np.uint64(num_categories)
        packed = (g_flat << shift) | p_flat
        if 2 * num_categories <= 20:
            # small key space: O(n) bincount beats np.unique's sort ~5×
            # (bincount sizes itself to max(packed)+1 — no need to force
            # the full 2^(2C) allocation)
            dense = np.bincount(packed.astype(np.int64))
            keys = np.nonzero(dense)[0].astype(np.uint64)
            counts = dense[keys.astype(np.int64)]
        else:
            keys, counts = np.unique(packed, return_counts=True)
        p = keys & ((np.uint64(1) << shift) - np.uint64(1))
        g = keys >> shift
    else:
        pairs = np.stack([g_flat, p_flat], axis=1)
        uniq, counts = np.unique(pairs, axis=0, return_counts=True)
        g, p = uniq[:, 0], uniq[:, 1]
    w = counts.astype(np.float64)

    C = num_categories
    cm = np.zeros((C, C), dtype=np.float64)
    gbits = unpackbits64(g, C)  # [u, C] 0/1
    pbits = unpackbits64(p, C)
    p_pop = pbits.sum(axis=1)

    eq = g == p
    # Case 1: perfect prediction — weighted diagonal of gt bits.
    if eq.any():
        cm += np.diag((gbits[eq] * w[eq, None]).sum(axis=0))

    ne = ~eq
    # Case 2: pred strictly contains gt.
    c2 = ne & ((g & p) == g)
    if c2.any():
        inter = gbits[c2]              # gt ⊆ pred ⇒ intersection bits = gt bits
        diff = pbits[c2] - gbits[c2]   # pred-only bits
        wk = w[c2] / p_pop[c2]
        cm += np.einsum("k,ki,kj->ij", wk, inter, diff)
        g_pop2 = gbits[c2].sum(axis=1)
        cm += np.diag((gbits[c2] * (g_pop2 * wk)[:, None]).sum(axis=0))

    # Case 3: gt strictly contains pred.
    c3 = ne & ((g | p) == g)
    if c3.any():
        gdiff = gbits[c3] - pbits[c3]  # gt-only bits
        with np.errstate(divide="ignore", invalid="ignore"):
            wk = w[c3] / p_pop[c3]
        cm += np.einsum("k,ki,kj->ij", wk, gdiff, pbits[c3])
        cm += np.diag((pbits[c3] * w[c3, None]).sum(axis=0))

    # Case 4: both sides hold classes missing from the other.
    d = g ^ p
    c4 = ((d & g) > 0) & ((d & p) > 0)
    if c4.any():
        gdiff = gbits[c4] * (1.0 - pbits[c4])
        pdiff = pbits[c4] * (1.0 - gbits[c4])
        inter = gbits[c4] * pbits[c4]
        wk = w[c4] / pdiff.sum(axis=1)
        cm += np.einsum("k,ki,kj->ij", wk, gdiff, pdiff)
        cm += np.diag((inter * w[c4, None]).sum(axis=0))
    return cm


def confusion_matrix_from_masks(
    gt_img: np.ndarray, pred_img: np.ndarray, n_classes: int
) -> np.ndarray:
    """(n_classes+1)² confusion matrix from two :func:`rasterize_multilabel`
    images; row/col 0 is background, data class k is row/col k+1."""
    return confusion_matrix_binary(gt_img, pred_img, n_classes + 1)


def confusion_metrics(cm: np.ndarray) -> dict[str, float]:
    """Per-class P/R/F1 means from a confusion matrix, matching the
    reference's math exactly (multi_label_confusion_matrix.py:419-488):
    zero (not NaN) where a row/column sum is empty, plain mean over ALL
    classes in the matrix."""
    diag = np.diag(cm)
    col_sums = cm.sum(axis=0)
    row_sums = cm.sum(axis=1)
    precision = np.divide(diag, col_sums, out=np.zeros_like(diag),
                          where=col_sums != 0)
    recall = np.divide(diag, row_sums, out=np.zeros_like(diag),
                       where=row_sums != 0)
    denom = precision + recall
    f1 = np.divide(2 * precision * recall, denom, out=np.zeros_like(diag),
                   where=denom != 0)
    return {
        "precision_mean": float(np.average(precision)),
        "recall_mean": float(np.average(recall)),
        "f1_mean": float(np.average(f1)),
    }


def confusion_per_class(cm: np.ndarray) -> dict[str, dict[str, float]]:
    """Per-class precision/recall/f1 dicts (the reference's
    MultiLabelMatrixAggMetrics classes_* fields,
    multi_label_confusion_matrix.py:459-478). Index 0 is the background
    class; data class k sits at index k+1, keyed "cat_<k>"."""
    diag = np.diag(cm)
    col_sums = cm.sum(axis=0)
    row_sums = cm.sum(axis=1)
    precision = np.divide(diag, col_sums, out=np.zeros_like(diag),
                          where=col_sums != 0)
    recall = np.divide(diag, row_sums, out=np.zeros_like(diag),
                       where=row_sums != 0)
    denom = precision + recall
    f1 = np.divide(2 * precision * recall, denom, out=np.zeros_like(diag),
                   where=denom != 0)

    def name(i: int) -> str:
        return "background" if i == 0 else f"cat_{i - 1}"

    return {
        "classes_precision": {name(i): float(v) for i, v in enumerate(precision)},
        "classes_recall": {name(i): float(v) for i, v in enumerate(recall)},
        "classes_f1": {name(i): float(v) for i, v in enumerate(f1)},
    }


def confusion_matrices(cm: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full precision/recall/F1 MATRICES — the element-wise normalizations
    the reference's exporter renders (multi_label_confusion_matrix.py:
    425-449): precision = column-normalized, recall = row-normalized,
    F1 = element-wise harmonic mean; zeros (not NaN) where a denominator
    is empty. The diagonals reproduce :func:`confusion_metrics`."""
    cm = np.asarray(cm, dtype=float)
    col_sums = cm.sum(axis=0)
    row_sums = cm.sum(axis=1)
    precision_matrix = np.divide(
        cm, col_sums[None, :], out=np.zeros(cm.shape), where=col_sums[None, :] != 0
    )
    recall_matrix = np.divide(
        cm, row_sums[:, None], out=np.zeros(cm.shape), where=row_sums[:, None] != 0
    )
    nom = 2 * precision_matrix * recall_matrix
    den = precision_matrix + recall_matrix
    f1_matrix = np.divide(nom, den, out=np.zeros(cm.shape), where=den != 0)
    return precision_matrix, recall_matrix, f1_matrix


def collapsed_confusion_matrix(cm: np.ndarray) -> np.ndarray:
    """Collapse all non-background classes into one (reference
    compute_metrics, multi_label_confusion_matrix.py:396-411): 2×2 matrix
    [[bg→bg, bg→any], [any→bg, any→any]] with background at index 0."""
    return np.asarray(
        [
            [cm[0, 0], np.sum(cm[0, 1:])],
            [np.sum(cm[1:, 0]), np.sum(cm[1:, 1:])],
        ]
    )


def match_stats(
    gt: list[tuple[int, list[float]]],
    pred: list[tuple[int, list[float], float]],
    max_det: int = 100,
) -> list[dict]:
    """Per-document COCO matching partials for DATASET-level mAP.

    The reference's dataset evaluation pools every page into one COCO run
    (map_layout_evaluator.py:50-99). That pooling IS decomposable: greedy
    TP matching is per-image-independent; only the AP integration needs all
    images' (score, tp) pairs per (class, iou_threshold, area bucket). So
    each document emits, per (class, threshold, area): its non-ignored
    prediction scores + TP flags (COCO ignore semantics applied locally),
    TP counts at maxdet 1/10 (per-image truncation), and the in-range GT
    count — the shuffle key is (class, threshold, area), tiny and uniform.

    Returns [{cls, thr_idx, area, scores, tp, n_gt, tp_md1, tp_md10}]."""
    classes = sorted(
        {c for c, _ in gt} | {c for c, _, _ in pred}
    )
    out = []
    for cls in classes:
        g = np.array([b for c, b in gt if c == cls], dtype=np.float64).reshape(-1, 4)
        p = [(b, s) for c, b, s in pred if c == cls]
        p.sort(key=lambda x: -x[1])
        p = p[:max_det]
        pb = np.array([b for b, _ in p], dtype=np.float64).reshape(-1, 4)
        ps = np.array([s for _, s in p], dtype=np.float64)
        g_area = (g[:, 2] - g[:, 0]) * (g[:, 3] - g[:, 1])
        p_area = (pb[:, 2] - pb[:, 0]) * (pb[:, 3] - pb[:, 1])
        ious = iou_matrix(g, pb)
        for area, (lo, hi) in AREA_RANGES.items():
            gt_ig = (g_area < lo) | (g_area > hi)
            dt_out = (p_area < lo) | (p_area > hi)
            npig = int((~gt_ig).sum())
            if npig == 0 and bool(dt_out.all()):
                continue  # empty bucket contributes nothing to the pool
            order = np.argsort(gt_ig, kind="stable")
            ious_o = ious[order]
            git = gt_ig[order]
            for ti, thr in enumerate(IOU_THRESHOLDS):
                dtm, dt_ig = _match_with_ignore(ious_o, git, thr)
                dt_ig = dt_ig | ((dtm == -1) & dt_out)
                keep = ~dt_ig
                tp = (dtm >= 0) & keep
                out.append(
                    {
                        "cls": int(cls),
                        "thr_idx": int(ti),
                        "area": area,
                        "scores": ps[keep].tolist(),
                        "tp": tp[keep].tolist(),
                        "n_gt": npig,
                        "tp_md1": int(tp[:1].sum()),
                        "tp_md10": int(tp[:10].sum()),
                    }
                )
    return out


def pooled_average_precision(
    scores: np.ndarray, tp: np.ndarray, n_gt: int
) -> float:
    """AP over pooled multi-image detections: global sort by score
    descending (stable), then the usual 101-point interpolation."""
    if n_gt == 0:
        return float("nan")
    if len(scores) == 0:
        return 0.0
    order = np.argsort(-scores, kind="stable")
    return average_precision(tp[order].astype(bool), n_gt)


def merged_map_local(docs: list[tuple[list, list]]) -> dict[str, float]:
    """Single-process oracle for dataset mAP: pool match partials from every
    document per (class, threshold, area), AP + pooled recalls per group,
    mean over groups — the same full surface as the distributed path."""
    from collections import defaultdict

    pool: dict[tuple, list] = defaultdict(lambda: [[], [], 0, 0, 0])
    for gt, pred in docs:
        for st in match_stats(gt, pred):
            slot = pool[(st["cls"], st["thr_idx"], st["area"])]
            slot[0].extend(st["scores"])
            slot[1].extend(st["tp"])
            slot[2] += st["n_gt"]
            slot[3] += st["tp_md1"]
            slot[4] += st["tp_md10"]

    ap: dict[tuple, float] = {}
    rec: dict[tuple, tuple] = {}
    for key, (scores, tp, n_gt, t1, t10) in pool.items():
        ap[key] = pooled_average_precision(np.array(scores), np.array(tp), n_gt)
        if n_gt == 0:
            rec[key] = (float("nan"),) * 3
        else:
            rec[key] = (t1 / n_gt, t10 / n_gt, int(np.sum(tp)) / n_gt)

    def _mean(vals):
        arr = np.asarray(vals, dtype=np.float64)
        arr = arr[~np.isnan(arr)]
        return float(arr.mean()) if arr.size else -1.0

    def _ap_area(area, thr=None):
        return _mean([
            v for (c, t, a), v in ap.items()
            if a == area and (thr is None or t == thr)
        ])

    def _rec_area(area, idx):
        return _mean([v[idx] for (c, t, a), v in rec.items() if a == area])

    classes = sorted({c for (c, _, _) in ap})
    return {
        "map": _ap_area("all"),
        "map_50": _ap_area("all", 0),
        "map_75": _ap_area("all", 5),
        "map_small": _ap_area("small"),
        "map_medium": _ap_area("medium"),
        "map_large": _ap_area("large"),
        "mar_1": _rec_area("all", 0),
        "mar_10": _rec_area("all", 1),
        "mar_100": _rec_area("all", 2),
        "mar_small": _rec_area("small", 2),
        "mar_medium": _rec_area("medium", 2),
        "mar_large": _rec_area("large", 2),
        "map_per_class": {
            f"cat_{c}": _mean(
                [v for (cc, t, a), v in ap.items() if cc == c and a == "all"]
            )
            for c in classes
        },
        "mar_100_per_class": {
            f"cat_{c}": _mean(
                [v[2] for (cc, t, a), v in rec.items() if cc == c and a == "all"]
            )
            for c in classes
        },
    }
