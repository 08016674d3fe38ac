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
  (multi_label_confusion_matrix.py:419-488). The contribution algebra is our
  own clean definition with the same interface and invariants
  (total weight = pixel count; exact match ⇒ diagonal only).
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
    return np.where(union > 0, inter / union, 0.0)


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


def evaluate_map(
    gt: list[tuple[int, list[float]]],
    pred: list[tuple[int, list[float], float]],
    max_det: int = 100,
) -> dict[str, float]:
    """COCO-protocol mAP for one document/page (or one merged group).

    gt: [(category_id, xyxy)], pred: [(category_id, xyxy, score)].
    Returns map, map_50, map_75, mar_100 (mean over classes present in GT).
    """
    classes = sorted({c for c, _ in gt})
    if not classes:
        nan = float("nan")
        return {"map": nan, "map_50": nan, "map_75": nan, "mar_100": nan}
    ap = np.zeros((len(classes), len(IOU_THRESHOLDS)))
    ar = np.zeros((len(classes), len(IOU_THRESHOLDS)))
    for ci, cls in enumerate(classes):
        g = np.array([b for c, b in gt if c == cls], dtype=np.float64).reshape(-1, 4)
        p = [(b, s) for c, b, s in pred if c == cls]
        p.sort(key=lambda x: -x[1])
        p = p[:max_det]
        pb = np.array([b for b, _ in p], dtype=np.float64).reshape(-1, 4)
        ps = np.array([s for _, s in p], dtype=np.float64)
        ious = iou_matrix(g, pb)
        for ti, thr in enumerate(IOU_THRESHOLDS):
            # ps is already descending (sorted above), so tp is tp_sorted
            tp = _match_predictions(ious, ps, thr)
            ap[ci, ti] = average_precision(tp, len(g))
            ar[ci, ti] = tp.sum() / len(g) if len(g) else float("nan")
    return {
        "map": float(np.nanmean(ap)),
        "map_50": float(np.nanmean(ap[:, 0])),
        "map_75": float(np.nanmean(ap[:, 5])),
        "mar_100": float(np.nanmean(ar)),
    }


# ---------------------------------------------------------------------------
# TORE-style multi-label pixel confusion matrix
# ---------------------------------------------------------------------------

BACKGROUND_BIT = 0  # bit 0 = background, class k -> bit k+1


def rasterize_multilabel(
    boxes: list[tuple[int, list[float]]], width: int, height: int,
    n_classes: int,
) -> np.ndarray:
    """Rasterize (category_id, xyxy) boxes into a (h, w) uint64 bitmask image.

    Pixel bit layout: bit 0 set when *no* class covers the pixel
    (background), bit (k+1) set when class k covers it — mirroring the
    reference's encoding (multi_label_confusion_matrix.py:75-121)."""
    if n_classes > 62:
        raise ValueError("at most 62 classes fit the uint64 bitmask encoding")
    img = np.zeros((height, width), dtype=np.uint64)
    for cls, (x1, y1, x2, y2) in boxes:
        xa, ya = max(int(np.floor(x1)), 0), max(int(np.floor(y1)), 0)
        xb, yb = min(int(np.ceil(x2)), width), min(int(np.ceil(y2)), height)
        if xb > xa and yb > ya:
            img[ya:yb, xa:xb] |= np.uint64(1 << (cls + 1))
    img[img == 0] = np.uint64(1 << BACKGROUND_BIT)
    return img


def _mask_to_classes(mask: int, n_classes: int) -> list[int]:
    """Bitmask → class indices, with index n_classes meaning background."""
    out = []
    if mask & 1:
        out.append(n_classes)
    for k in range(n_classes):
        if mask & (1 << (k + 1)):
            out.append(k)
    return out


def confusion_matrix_from_masks(
    gt_img: np.ndarray, pred_img: np.ndarray, n_classes: int
) -> np.ndarray:
    """Dense (n_classes+1)² confusion matrix from two bitmask images.

    Pixels are first compressed to unique (gt_mask, pred_mask) pairs with
    counts — the np.unique run-length trick of the reference
    (multi_label_confusion_matrix.py:28-56) — so cost is O(unique pairs).
    Each pixel contributes total weight 1, split uniformly over its gt
    classes; each gt class's weight goes to the diagonal if matched in pred,
    else uniformly over the pred classes it could be confused with."""
    pairs = np.stack([gt_img.ravel(), pred_img.ravel()], axis=1)
    uniq, counts = np.unique(pairs, axis=0, return_counts=True)
    size = n_classes + 1  # background is the last row/col
    cm = np.zeros((size, size), dtype=np.float64)
    for (g_mask, p_mask), cnt in zip(uniq, counts):
        g_classes = _mask_to_classes(int(g_mask), n_classes)
        p_classes = _mask_to_classes(int(p_mask), n_classes)
        w_per_gt = cnt / len(g_classes)
        matched = [g for g in g_classes if g in p_classes]
        unmatched_g = [g for g in g_classes if g not in p_classes]
        unmatched_p = [p for p in p_classes if p not in g_classes]
        for g in matched:
            cm[g, g] += w_per_gt
        if unmatched_g:
            targets = unmatched_p if unmatched_p else [n_classes]
            w_split = w_per_gt / len(targets)
            for g in unmatched_g:
                for p in targets:
                    cm[g, p] += w_split
    return cm


def confusion_metrics(cm: np.ndarray) -> dict[str, float]:
    """Per-class P/R/F1 means from a confusion matrix
    (reference shape: multi_label_confusion_matrix.py:419-488)."""
    diag = np.diag(cm)
    col_sums = cm.sum(axis=0)
    row_sums = cm.sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        precision = np.where(col_sums > 0, diag / col_sums, np.nan)
        recall = np.where(row_sums > 0, diag / row_sums, np.nan)
        f1 = np.where(
            (precision + recall) > 0, 2 * precision * recall / (precision + recall),
            np.nan,
        )
    return {
        "precision_mean": float(np.nanmean(precision)),
        "recall_mean": float(np.nanmean(recall)),
        "f1_mean": float(np.nanmean(f1)),
    }


def match_stats(
    gt: list[tuple[int, list[float]]],
    pred: list[tuple[int, list[float], float]],
    max_det: int = 100,
) -> list[dict]:
    """Per-document COCO matching partials for DATASET-level mAP.

    The reference's dataset evaluation pools every page into one COCO run
    (map_layout_evaluator.py:50-99). That pooling IS decomposable: greedy
    TP matching is per-image-independent; only the AP integration needs all
    images' (score, tp) pairs per (class, iou_threshold). So each document
    emits, per (class, threshold): its prediction scores, TP flags, and GT
    count — the shuffle key is (class, threshold), tiny and uniform.

    Returns [{cls, thr_idx, scores, tp, n_gt}]."""
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
        ious = iou_matrix(g, pb)
        for ti, thr in enumerate(IOU_THRESHOLDS):
            tp = _match_predictions(ious, ps, thr)
            out.append(
                {
                    "cls": int(cls),
                    "thr_idx": int(ti),
                    "scores": ps.tolist(),
                    "tp": tp.tolist(),
                    "n_gt": int(len(g)),
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
    document, AP per (class, threshold), mean over them."""
    from collections import defaultdict

    pool: dict[tuple[int, int], list] = defaultdict(lambda: [[], [], 0])
    for gt, pred in docs:
        for st in match_stats(gt, pred):
            slot = pool[(st["cls"], st["thr_idx"])]
            slot[0].extend(st["scores"])
            slot[1].extend(st["tp"])
            slot[2] += st["n_gt"]
    aps: dict[tuple[int, int], float] = {}
    for (cls, ti), (scores, tp, n_gt) in pool.items():
        aps[(cls, ti)] = pooled_average_precision(
            np.array(scores), np.array(tp), n_gt
        )
    vals = np.array(list(aps.values()))
    v50 = np.array([v for (c, t), v in aps.items() if t == 0])
    v75 = np.array([v for (c, t), v in aps.items() if t == 5])
    return {
        "map": float(np.nanmean(vals)),
        "map_50": float(np.nanmean(v50)),
        "map_75": float(np.nanmean(v75)),
    }
