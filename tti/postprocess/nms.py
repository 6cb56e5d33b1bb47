"""Fixed-shape batched NMS in XLA.

The reference relies on Ultralytics' dynamic-shape torchvision NMS
(conf=0.20, iou=0.25, max_det=200 — reference: config.py:71-73,
measurement.py:208-210). TPU/XLA requires static shapes, so this is a
fixed-shape re-design (SURVEY.md §7 "Hard parts"):

1. per-anchor best class (multi_label=False semantics),
2. confidence mask + top-k pre-selection (pre_topk candidates),
3. one K x K IoU matrix, class-masked (equivalent to the class-offset trick),
4. greedy suppression as a sequential scan over score-sorted candidates —
   exact greedy NMS, identical keep-set to torchvision for distinct scores,
5. emit the top ``max_det`` survivors, padded with valid=False rows.

Cost: K=512 -> one 512x512 IoU matrix + a 512-step scan of K-wide vector ops;
microseconds on a v5e and independent of detection count (no host sync,
no recompile).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tti.postprocess.decode import Detections

Array = jax.Array


def box_iou_matrix(boxes: Array) -> Array:
    """Pairwise IoU of (K, 4) xyxy boxes -> (K, K)."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0.0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0.0
    )
    lt = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def _greedy_suppress(
    cand_boxes: Array,
    top_scores: Array,
    cand_classes: Array,
    cand_coefs: Array,
    cand_ok: Array,
    iou_thresh: float,
    max_det: int,
    class_aware: bool,
) -> Detections:
    """Greedy NMS over score-sorted candidates -> fixed (max_det,) Detections."""
    k = cand_boxes.shape[0]
    iou = box_iou_matrix(cand_boxes)
    if class_aware:
        same_class = cand_classes[:, None] == cand_classes[None, :]
        iou = jnp.where(same_class, iou, 0.0)
    overlaps = iou > iou_thresh

    # Exact greedy NMS as a fixed-point sweep instead of a K-step sequential
    # scan: keep_i <- ok_i & no higher-ranked kept box overlaps i. The greedy
    # keep-set is the unique fixed point (induction on rank: position 0 is
    # correct after one sweep, position i after <= i), and real detection sets
    # converge in a handful of sweeps (suppression chains are short), so a
    # while_loop of O(K^2) vectorized sweeps beats K tiny sequential steps on
    # TPU by an order of magnitude.
    tri = jnp.tril(jnp.ones((k, k), bool), k=-1)  # tri[i, j] = (j < i)
    blocked_by = overlaps & tri  # blocked_by[i, j]: j outranks i and overlaps

    def cond(state):
        keep, prev, it = state
        return (it < k) & jnp.any(keep != prev)

    def sweep(state):
        keep, _, it = state
        blocked = jnp.any(blocked_by & keep[None, :], axis=1)
        return cand_ok & ~blocked, keep, it + 1

    keep0 = cand_ok
    keep, _, _ = jax.lax.while_loop(
        cond, sweep, (keep0, jnp.zeros((k,), bool), jnp.asarray(0))
    )

    k_out = min(max_det, k)
    out_scores, order = jax.lax.top_k(jnp.where(keep, top_scores, -1.0), k_out)
    if k_out < max_det:  # fewer candidates than the output budget: pad
        out_scores = jnp.pad(out_scores, (0, max_det - k_out), constant_values=-1.0)
        order = jnp.pad(order, (0, max_det - k_out))
    valid = out_scores > 0.0
    sel = lambda a: jnp.where(valid.reshape(valid.shape + (1,) * (a.ndim - 1)), a[order], 0)
    return Detections(
        boxes=sel(cand_boxes),
        scores=jnp.where(valid, out_scores, 0.0),
        classes=jnp.where(valid, cand_classes[order], -1),
        coefs=sel(cand_coefs),
        valid=valid,
    )


def _nms_single(
    boxes: Array,
    probs: Array,
    coefs: Array,
    conf_thresh: float,
    iou_thresh: float,
    max_det: int,
    pre_topk: int,
    class_aware: bool,
    approx_topk: bool = False,
) -> Detections:
    scores_all = jnp.max(probs, axis=-1)
    classes_all = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    # Strict > matches Ultralytics' candidate filter (`amax(1) > conf_thres`).
    conf_ok = scores_all > conf_thresh
    ranked = jnp.where(conf_ok, scores_all, -1.0)

    k = min(pre_topk, ranked.shape[0])
    if approx_topk and k < ranked.shape[0]:
        # TPU-native partial top-k (tpu.PartialReduce) instead of the full
        # anchor sort. NOT exact: recall_target bounds the chance of missing
        # a true top-k candidate, which matters only when more than
        # ~pre_topk anchors clear conf_thresh (telemetry counts those
        # frames). Opt-in: the deployment default preserves the torch-oracle
        # keep-set bit-for-bit.
        top_scores, top_idx = jax.lax.approx_max_k(
            ranked, k, recall_target=0.99
        )
    else:
        top_scores, top_idx = jax.lax.top_k(ranked, k)
    return _greedy_suppress(
        boxes[top_idx], top_scores, classes_all[top_idx], coefs[top_idx],
        top_scores > 0.0, iou_thresh, max_det, class_aware,
    )


@partial(
    jax.jit,
    static_argnames=("conf_thresh", "iou_thresh", "max_det", "pre_topk",
                     "class_aware", "approx_topk"),
)
def batched_nms(
    boxes: Array,
    probs: Array,
    coefs: Array,
    conf_thresh: float = 0.20,
    iou_thresh: float = 0.25,
    max_det: int = 200,
    pre_topk: int = 512,
    class_aware: bool = True,
    approx_topk: bool = False,
) -> Detections:
    """Batched greedy NMS: (B, A, 4) boxes + (B, A, nc) probs + (B, A, nm) coefs
    -> Detections with fixed (B, max_det) shapes. Defaults mirror the reference
    thresholds (config.py:71-73)."""
    fn = partial(
        _nms_single,
        conf_thresh=conf_thresh,
        iou_thresh=iou_thresh,
        max_det=max_det,
        pre_topk=pre_topk,
        class_aware=class_aware,
        approx_topk=approx_topk,
    )
    return jax.vmap(fn)(boxes, probs, coefs)


def raw_candidate_counts(raw, conf_thresh: float) -> Array:
    """(B,) int32 count of anchors whose best class clears conf_thresh —
    budget telemetry for the fixed pre_topk NMS candidate cap (computed on raw
    logits; sigmoid is monotonic so thresholding logits is exact)."""
    import math

    from tti.postprocess.decode import flatten_predictions

    _, cls_l, _, _ = flatten_predictions(raw)
    if 0.0 < conf_thresh < 1.0:
        logit_thresh = math.log(conf_thresh / (1.0 - conf_thresh))
    else:
        logit_thresh = -math.inf if conf_thresh <= 0.0 else math.inf
    best = jnp.max(cls_l.astype(jnp.float32), axis=-1)
    return jnp.sum(best > logit_thresh, axis=-1).astype(jnp.int32)


def nms_from_raw(
    raw,
    conf_thresh: float = 0.20,
    iou_thresh: float = 0.25,
    max_det: int = 200,
    pre_topk: int = 512,
    class_aware: bool = True,
) -> Detections:
    """Fused lazy decode + NMS: rank anchors by raw class LOGIT and decode DFL
    boxes only for the top ``pre_topk`` candidates.

    Equivalent to decode_predictions + batched_nms: sigmoid is strictly
    monotonic, so ordering/thresholding on logits (against logit(conf_thresh))
    selects the same candidate set in the same order; the DFL softmax
    expectation is per-anchor, so decoding after the gather is exact. Saves the
    (B, A, 4, REG_MAX) softmax + (B, A, 4) box assembly over all A anchors
    (A=8400 at 640px) — only K=pre_topk rows are decoded.
    """
    import math

    from tti.postprocess.decode import dfl_expectation, flatten_predictions, make_anchors

    box_l, cls_l, coef_l, level_hw = flatten_predictions(raw)
    anchors, stride_pa = make_anchors(level_hw)
    if 0.0 < conf_thresh < 1.0:
        logit_thresh = math.log(conf_thresh / (1.0 - conf_thresh))
    else:
        logit_thresh = -math.inf if conf_thresh <= 0.0 else math.inf

    def single(box_logits, cls_logits, coefs):
        best_logit = jnp.max(cls_logits, axis=-1).astype(jnp.float32)
        classes_all = jnp.argmax(cls_logits, axis=-1).astype(jnp.int32)
        ranked = jnp.where(best_logit > logit_thresh, best_logit, -jnp.inf)

        k = min(pre_topk, ranked.shape[0])
        top_logits, top_idx = jax.lax.top_k(ranked, k)
        cand_ok = jnp.isfinite(top_logits)
        top_scores = jnp.where(cand_ok, jax.nn.sigmoid(top_logits), -1.0)

        ltrb = dfl_expectation(box_logits[top_idx]) * stride_pa[top_idx][:, None]
        cx, cy = anchors[top_idx, 0], anchors[top_idx, 1]
        cand_boxes = jnp.stack(
            [cx - ltrb[:, 0], cy - ltrb[:, 1], cx + ltrb[:, 2], cy + ltrb[:, 3]],
            axis=-1,
        )
        return _greedy_suppress(
            cand_boxes, top_scores, classes_all[top_idx],
            coefs[top_idx].astype(jnp.float32), cand_ok,
            iou_thresh, max_det, class_aware,
        )

    return jax.vmap(single)(box_l, cls_l, coef_l)
