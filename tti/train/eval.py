"""Detection/segmentation evaluation: COCO-style mAP on host (numpy).

The reference has no evaluation tooling at all (models arrive pre-trained,
SURVEY.md §4); the framework needs one to close the train -> validate -> deploy
loop. Standard protocol: greedy score-ordered matching per class at each IoU
threshold, 101-point interpolated average precision, averaged over
IoU 0.50:0.95 (mAP) plus mAP50. Box IoU and instance-mask IoU are both
supported; eval runs on host because it is not a hot path.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

IOU_THRESHOLDS = tuple(np.round(np.arange(0.5, 1.0, 0.05), 2))


def box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,4) x (M,4) xyxy -> (N,M)."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def mask_iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,H,W) x (M,H,W) binary -> (N,M)."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    af = a.reshape(len(a), -1).astype(bool)
    bf = b.reshape(len(b), -1).astype(bool)
    inter = af.astype(np.float64) @ bf.T.astype(np.float64)
    union = af.sum(1)[:, None] + bf.sum(1)[None, :] - inter
    return inter / np.maximum(union, 1e-9)


@dataclass
class ImageEval:
    """Per-image eval payload: predictions (score-sortable) + ground truth."""

    pred_boxes: np.ndarray  # (P, 4)
    pred_scores: np.ndarray  # (P,)
    pred_classes: np.ndarray  # (P,)
    gt_boxes: np.ndarray  # (G, 4)
    gt_classes: np.ndarray  # (G,)
    pred_masks: np.ndarray | None = None  # (P, H, W) binary
    gt_masks: np.ndarray | None = None  # (G, H, W)


def _average_precision(matched: np.ndarray, scores: np.ndarray, n_gt: int) -> float:
    """101-point interpolated AP from per-prediction match flags."""
    if n_gt == 0:
        return float("nan")
    if len(matched) == 0:
        return 0.0
    order = np.argsort(-scores, kind="stable")
    tp = matched[order].astype(np.float64)
    fp = 1.0 - tp
    tp_cum = np.cumsum(tp)
    fp_cum = np.cumsum(fp)
    recall = tp_cum / n_gt
    precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
    # Precision envelope + 101-point sampling.
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    samples = np.linspace(0, 1, 101)
    idx = np.searchsorted(recall, samples, side="left")
    prec = np.where(idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0)
    return float(prec.mean())


def _class_iou_tables(
    images: list[ImageEval], cls: int, use_masks: bool
) -> list[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Per-image (iou_matrix, score_order, scores) for one class — the IoU
    matrix is threshold-independent, so computing it once here and matching
    greedily per threshold on the cached table is ~10x cheaper than
    recomputing it for every IoU threshold (the mask matrices are full-image
    matmuls; the greedy match is trivial)."""
    tables = []
    for img in images:
        psel = img.pred_classes == cls
        gsel = img.gt_classes == cls
        ps = img.pred_scores[psel]
        order = np.argsort(-ps, kind="stable")
        if use_masks:
            iou = mask_iou_matrix(img.pred_masks[psel], img.gt_masks[gsel])
        else:
            iou = box_iou(img.pred_boxes[psel], img.gt_boxes[gsel])
        tables.append((iou, order, ps))
    return tables


def _match_class_cached(
    tables: list[tuple[np.ndarray, np.ndarray, np.ndarray]], iou_thresh: float
) -> tuple[np.ndarray, np.ndarray, int]:
    matched_all, scores_all, n_gt = [], [], 0
    for iou, order, ps in tables:
        n_gt += iou.shape[1]
        taken = np.zeros(iou.shape[1], bool)
        matched = np.zeros(len(ps), bool)
        for i in order:
            if iou.shape[1] == 0:
                break
            j = int(np.argmax(np.where(taken, -1.0, iou[i])))
            if iou[i, j] >= iou_thresh and not taken[j]:
                taken[j] = True
                matched[i] = True
        matched_all.append(matched)
        scores_all.append(ps)
    if matched_all:
        return np.concatenate(matched_all), np.concatenate(scores_all), n_gt
    return np.zeros(0, bool), np.zeros(0), n_gt


def evaluate(
    images: list[ImageEval],
    num_classes: int,
    iou_thresholds: tuple[float, ...] = IOU_THRESHOLDS,
    use_masks: bool = False,
) -> dict[str, float]:
    """Returns {'mAP50': ..., 'mAP50_95': ..., 'AP_class_{c}': ...}."""
    per_class_ap: dict[int, list[float]] = {c: [] for c in range(num_classes)}
    for cls in range(num_classes):
        tables = _class_iou_tables(images, cls, use_masks)
        for thresh in iou_thresholds:
            matched, scores, n_gt = _match_class_cached(tables, thresh)
            ap = _average_precision(matched, scores, n_gt)
            per_class_ap[cls].append(ap)

    out: dict[str, float] = {}
    ap50, ap_all = [], []
    for cls, aps in per_class_ap.items():
        aps_arr = np.asarray(aps, dtype=np.float64)
        if np.all(np.isnan(aps_arr)):
            continue
        out[f"AP_class_{cls}"] = float(np.nanmean(aps_arr))
        ap50.append(aps_arr[0])
        ap_all.append(np.nanmean(aps_arr))
    out["mAP50"] = float(np.nanmean(ap50)) if ap50 else 0.0
    out["mAP50_95"] = float(np.nanmean(ap_all)) if ap_all else 0.0
    return out
