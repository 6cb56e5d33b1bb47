"""Task-aligned label assignment (TAL) as fixed-shape JAX ops.

The standard YOLOv8 assigner: for each ground-truth box, the top-k anchors by
the task-alignment metric ``score^alpha * iou^beta`` (restricted to anchors
whose center lies inside the box) become positives; anchors claimed by several
GTs resolve to the highest-IoU one; classification targets are the metric
normalized per-GT to its best IoU.

Everything is (A anchors) x (G padded GTs) dense — no dynamic shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


def pairwise_iou(boxes_a: Array, boxes_b: Array, eps: float = 1e-9) -> Array:
    """(A, 4) x (G, 4) xyxy -> (A, G)."""
    lt = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])
    rb = jnp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(boxes_a[:, 2] - boxes_a[:, 0], 0) * jnp.clip(boxes_a[:, 3] - boxes_a[:, 1], 0)
    area_b = jnp.clip(boxes_b[:, 2] - boxes_b[:, 0], 0) * jnp.clip(boxes_b[:, 3] - boxes_b[:, 1], 0)
    return inter / (area_a[:, None] + area_b[None, :] - inter + eps)


@partial(jax.jit, static_argnames=("topk", "alpha", "beta"))
def task_aligned_assign(
    pred_boxes: Array,
    pred_probs: Array,
    anchors: Array,
    gt_boxes: Array,
    gt_classes: Array,
    gt_valid: Array,
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
) -> dict[str, Array]:
    """Single-image TAL.

    pred_boxes (A, 4) decoded xyxy px; pred_probs (A, nc) sigmoid scores;
    anchors (A, 2) centers px; gt_boxes (G, 4); gt_classes (G,) int32;
    gt_valid (G,) bool.

    Returns dict:
      pos_mask (A,) bool, assigned_gt (A,) int32,
      target_boxes (A, 4), target_classes (A,) int32,
      target_scores (A, nc) soft targets for BCE.
    """
    # Assignment produces LABELS: no gradients may flow through it (and the
    # alignment metric's score^0.5 has an infinite derivative at score 0 —
    # without the stop_gradient, sigmoid underflow turns the whole loss NaN).
    pred_boxes = jax.lax.stop_gradient(pred_boxes)
    pred_probs = jax.lax.stop_gradient(pred_probs)

    A = pred_boxes.shape[0]
    G = gt_boxes.shape[0]
    iou = pairwise_iou(pred_boxes, gt_boxes)  # (A, G)
    # Prob of each GT's class at each anchor, as a one-hot contraction rather
    # than a take_along_axis: the (A, G) gather from a tiny nc-wide table is
    # the single most expensive op in the profiled train step (XLA lowers it
    # to a 114 ms serialized scalar loop at batch 64 / A=8400) while the
    # contraction fuses. Bit-exact: one 1.0 per one-hot row, the other terms
    # are p*0.0 = 0.0 and adding zeros never rounds.
    cls_onehot = jax.nn.one_hot(
        jnp.clip(gt_classes, 0), pred_probs.shape[-1], dtype=pred_probs.dtype
    )  # (G, nc)
    score = jnp.einsum("ac,gc->ag", pred_probs, cls_onehot)  # (A, G)
    metric = (score**alpha) * (iou**beta)

    inside = (
        (anchors[:, None, 0] >= gt_boxes[None, :, 0])
        & (anchors[:, None, 0] < gt_boxes[None, :, 2])
        & (anchors[:, None, 1] >= gt_boxes[None, :, 1])
        & (anchors[:, None, 1] < gt_boxes[None, :, 3])
    )
    candidate = inside & gt_valid[None, :]
    # Candidates rank at metric >= 0; non-candidates at -1. Acceptance is
    # candidacy, NOT metric > 0: requiring a positive metric makes training
    # collapse — once the classification loss pushes early scores into sigmoid
    # underflow the metric becomes exactly 0, every positive disappears, and
    # all losses reach a degenerate zero fixed point (observed: loss -> 0.001
    # with max prob -> 0 on a toy dataset).
    metric = jnp.where(candidate, metric, -1.0)

    # Top-k candidate anchors per GT by metric, WITHOUT lax.top_k: on TPU
    # top_k lowers to a full (value, iota) sort of the A-wide rows — 9.2 ms
    # of the profiled train step for k=10. k rounds of masked argmax produce
    # the identical membership set (argmax breaks ties at the lowest index,
    # exactly the sort's (value desc, index asc) order) at k small fused
    # reduce+select passes, and only candidates with metric >= 0 are kept —
    # the same acceptance the old scatter applied.
    k = min(topk, A)

    def _pick(carry, _):
        m, sel_acc = carry  # (G, A) working metric, (G, A) membership
        hit = jax.nn.one_hot(jnp.argmax(m, axis=-1), A, dtype=bool)  # (G, A)
        keep = jnp.max(m, axis=-1) >= 0.0  # (G,)
        sel_acc = sel_acc | (hit & keep[:, None])
        m = jnp.where(hit, -jnp.inf, m)
        return (m, sel_acc), None

    metric_t = metric.T  # (G, A)
    (_, sel), _ = jax.lax.scan(
        _pick, (metric_t, jnp.zeros_like(metric_t, dtype=bool)), None, length=k
    )
    assigned = sel.T  # (A, G)
    metric = jnp.maximum(metric, 0.0)

    # Anchor claimed by several GTs -> keep highest IoU.
    multi = jnp.sum(assigned, axis=1) > 1
    best_gt_by_iou = jnp.argmax(jnp.where(assigned, iou, -1.0), axis=1)
    one_hot_best = jax.nn.one_hot(best_gt_by_iou, gt_boxes.shape[0], dtype=bool)
    assigned = jnp.where(multi[:, None], assigned & one_hot_best, assigned)

    pos_mask = jnp.any(assigned, axis=1)
    assigned_gt = jnp.argmax(assigned, axis=1).astype(jnp.int32)

    # Per-GT normalization: target score peaks at the GT's best IoU.
    pos_metric = jnp.where(assigned, metric, 0.0)
    pos_iou = jnp.where(assigned, iou, 0.0)
    max_metric = jnp.max(pos_metric, axis=0)  # (G,)
    max_iou = jnp.max(pos_iou, axis=0)
    norm = max_iou / jnp.maximum(max_metric, 1e-9)
    anchor_score = jnp.max(pos_metric * norm[None, :], axis=1)  # (A,)

    # Per-anchor targets via one-hot matmuls over the G-row GT tables — same
    # gather-avoidance as the score above (these two were 4.6 + 3.1 ms of
    # serialized scalar loops in the profiled step). Exact: one 1.0 per row
    # (argmax of an all-false row is 0, matching gt[assigned_gt] semantics),
    # and small class ints are exact in f32.
    assigned_onehot = jax.nn.one_hot(assigned_gt, G, dtype=jnp.float32)  # (A, G)
    gathered_classes = jnp.einsum(
        "ag,g->a", assigned_onehot, jnp.clip(gt_classes, 0).astype(jnp.float32)
    ).astype(jnp.int32)
    target_classes = jnp.where(pos_mask, gathered_classes, 0)
    nc = pred_probs.shape[-1]
    target_scores = (
        jax.nn.one_hot(target_classes, nc, dtype=jnp.float32)
        * jnp.where(pos_mask, anchor_score, 0.0)[:, None]
    )

    return {
        "pos_mask": pos_mask,
        "assigned_gt": assigned_gt,
        "target_boxes": jnp.einsum("ag,gc->ac", assigned_onehot, gt_boxes),
        "target_classes": target_classes.astype(jnp.int32),
        "target_scores": target_scores,
    }
