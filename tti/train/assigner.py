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
    iou = pairwise_iou(pred_boxes, gt_boxes)  # (A, G)
    score = jnp.take_along_axis(
        pred_probs, jnp.clip(gt_classes, 0)[None, :].repeat(A, axis=0), axis=1
    )  # (A, G): prob of each GT's class at each anchor
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

    # Top-k candidate anchors per GT by metric.
    k = min(topk, A)
    topk_vals, topk_idx = jax.lax.top_k(metric.T, k)  # (G, k)
    sel = jnp.zeros((gt_boxes.shape[0], A), bool)
    sel = sel.at[jnp.arange(gt_boxes.shape[0])[:, None], topk_idx].set(topk_vals >= 0.0)
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

    target_classes = jnp.where(pos_mask, gt_classes[assigned_gt], 0)
    nc = pred_probs.shape[-1]
    target_scores = (
        jax.nn.one_hot(target_classes, nc, dtype=jnp.float32)
        * jnp.where(pos_mask, anchor_score, 0.0)[:, None]
    )

    return {
        "pos_mask": pos_mask,
        "assigned_gt": assigned_gt,
        "target_boxes": gt_boxes[assigned_gt],
        "target_classes": target_classes.astype(jnp.int32),
        "target_scores": target_scores,
    }
