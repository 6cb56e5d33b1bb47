"""YOLOv8-seg training losses in JAX.

The reference ships only pretrained ``.pt`` weights (reference: config.py:67) and
trains offline with Ultralytics; the TPU framework brings training in-house so
new fabric/stitch models can be produced without the torch stack. Standard
YOLOv8 loss recipe: BCE classification against task-aligned soft targets,
CIoU + DFL box regression, per-instance BCE mask loss normalized by box area.

All functions are masked fixed-shape ops (no dynamic gathers over positives).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tti.model.yolo import REG_MAX

Array = jax.Array


def bbox_ciou(pred: Array, target: Array, eps: float = 1e-7) -> Array:
    """Complete IoU between xyxy boxes (broadcasting elementwise): 1 - CIoU loss
    term is taken by the caller. Returns CIoU (...,)."""
    px1, py1, px2, py2 = pred[..., 0], pred[..., 1], pred[..., 2], pred[..., 3]
    tx1, ty1, tx2, ty2 = target[..., 0], target[..., 1], target[..., 2], target[..., 3]

    pw, ph = px2 - px1, py2 - py1
    tw, th = tx2 - tx1, ty2 - ty1

    inter_w = jnp.clip(jnp.minimum(px2, tx2) - jnp.maximum(px1, tx1), 0.0)
    inter_h = jnp.clip(jnp.minimum(py2, ty2) - jnp.maximum(py1, ty1), 0.0)
    inter = inter_w * inter_h
    union = pw * ph + tw * th - inter + eps
    iou = inter / union

    # Enclosing box diagonal.
    cw = jnp.maximum(px2, tx2) - jnp.minimum(px1, tx1)
    ch = jnp.maximum(py2, ty2) - jnp.minimum(py1, ty1)
    c2 = cw * cw + ch * ch + eps
    # Center distance.
    rho2 = ((tx1 + tx2 - px1 - px2) ** 2 + (ty1 + ty2 - py1 - py2) ** 2) / 4.0
    # Aspect-ratio consistency.
    v = (4 / jnp.pi**2) * (jnp.arctan(tw / (th + eps)) - jnp.arctan(pw / (ph + eps))) ** 2
    alpha = v / (v - iou + 1.0 + eps)
    alpha = jax.lax.stop_gradient(alpha)
    return iou - rho2 / c2 - alpha * v


def dfl_loss(box_logits: Array, target_ltrb: Array) -> Array:
    """Distribution focal loss per anchor.

    box_logits (..., 4, REG_MAX); target_ltrb (..., 4) in grid units, clipped to
    [0, REG_MAX-1]. Cross-entropy against the two integer bins bracketing the
    target, linearly weighted. Returns (...,) mean over the 4 sides.
    """
    t = jnp.clip(target_ltrb, 0.0, REG_MAX - 1 - 0.01)
    tl = jnp.floor(t)
    tr = tl + 1.0
    wl = tr - t
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(box_logits, axis=-1)
    ll = jnp.take_along_axis(logp, tl[..., None].astype(jnp.int32), axis=-1)[..., 0]
    lr = jnp.take_along_axis(logp, tr[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return -(wl * ll + wr * lr).mean(axis=-1)


def seg_loss(
    coefs: Array,
    protos: Array,
    gt_masks: Array,
    gt_boxes_mask_grid: Array,
    assigned_gt: Array,
    pos_mask: Array,
    eps: float = 1e-6,
) -> Array:
    """Per-positive-anchor instance mask BCE, cropped to the GT box and
    normalized by its area (the YOLOv8-seg recipe).

    coefs (A, nm); protos (Hm, Wm, nm); gt_masks (G, Hm, Wm) binary;
    gt_boxes_mask_grid (G, 4) xyxy on the proto grid; assigned_gt (A,) int32;
    pos_mask (A,) bool. Returns scalar.

    The mask tensor is built only for a top-P static slice of anchors ranked
    by pos_mask, NOT all A anchors: task-aligned assignment selects at most
    top-k=10 anchors per GT (tti.train.assigner), so P = 10*G covers every
    positive and the slice is exact — while the dense (A, Hm, Wm) tensor at
    640 px (A=8400) is a 44 GB allocation that cannot compile on one chip.
    """
    hm, wm = protos.shape[0], protos.shape[1]
    a, g = coefs.shape[0], gt_masks.shape[0]
    p = min(a, max(64, 10 * g))
    order = jax.lax.top_k(pos_mask.astype(jnp.float32), p)[1]
    coefs = coefs[order]
    assigned_gt = assigned_gt[order]
    pos_mask = pos_mask[order]
    logits = jnp.einsum(
        "ac,hwc->ahw", coefs.astype(jnp.float32), protos.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )  # (P, Hm, Wm) — only positives matter; masked below.
    tgt = gt_masks[assigned_gt]  # (A, Hm, Wm)
    boxes = gt_boxes_mask_grid[assigned_gt]  # (A, 4)

    rows = jnp.arange(hm, dtype=jnp.float32).reshape(1, hm, 1)
    cols = jnp.arange(wm, dtype=jnp.float32).reshape(1, 1, wm)
    inside = (
        (rows >= boxes[:, 1, None, None])
        & (rows < boxes[:, 3, None, None])
        & (cols >= boxes[:, 0, None, None])
        & (cols < boxes[:, 2, None, None])
    )
    bce = jnp.maximum(logits, 0.0) - logits * tgt + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    per_anchor = jnp.sum(bce * inside, axis=(1, 2))
    area = jnp.clip(
        (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]), 1.0
    )
    per_anchor = per_anchor / area
    n_pos = jnp.maximum(jnp.sum(pos_mask), 1.0)
    return jnp.sum(jnp.where(pos_mask, per_anchor, 0.0)) / n_pos
