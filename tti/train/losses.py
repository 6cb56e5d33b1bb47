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
    logp = jax.nn.log_softmax(box_logits, axis=-1)
    # The two bracketing-bin gathers were 68 ms of serialized scalar loops in
    # the profiled train step (take_along_axis over a 16-wide table). The
    # linear hat over the bin iota carries BIT-IDENTICAL weights — for
    # k=floor(t): 1-(t-floor(t)) and for k=floor(t)+1: 1-(floor(t)+1-t), both
    # exact multiples of ulp(t) below REG_MAX, so no expression rounds
    # (verified elementwise vs the gather weights) — and the weighted reduce
    # fuses into the softmax instead of gathering. Adding the 14 zero-weight
    # terms is exact (0.0 * finite logp = 0.0); the only numeric delta vs the
    # old program is XLA no longer FMA-contracting wl*ll + wr*lr (one rounding
    # of the product, observed max 3e-6 on random logits).
    bins = jnp.arange(REG_MAX, dtype=t.dtype)
    w = jnp.clip(1.0 - jnp.abs(bins - t[..., None]), 0.0)
    return -jnp.sum(logp * w, axis=-1).mean(axis=-1)


def _seg_storage_dtype():
    """Storage dtype for the seg loss's (P, Hm, Wm)-sized tensors (mask
    logits and the per-anchor GT gather) — the train step's largest HBM
    stream (~13 GB/iter at batch 64 / 640px / s4 in f32; the round-5 profile
    tagged ~20 ms of it). TTI_SEG_DTYPE=bf16 halves those bytes: the einsum
    accumulates on the MXU and rounds once on store, the GT masks are
    occupancy values whose bf16 rounding is ~2^-9 relative, and ALL
    elementwise BCE math + reductions still run f32 (upcast in-register
    inside the same fusion — no extra traffic). Default f32 = the r4 recipe
    bit-exactly. Read at trace time like the other TTI_* gates."""
    import os

    return (jnp.bfloat16 if os.environ.get("TTI_SEG_DTYPE") == "bf16"
            else jnp.float32)


def _seg_per_anchor(
    coefs: Array, assigned_gt: Array, protos: Array, gt_masks: Array,
    gt_boxes_mask_grid: Array,
) -> Array:
    """Area-normalized box-cropped mask BCE for a slice of anchors.

    coefs (P, nm); assigned_gt (P,); protos (Hm, Wm, nm); gt_masks
    (G, Hm, Wm); gt_boxes_mask_grid (G, 4). Returns (P,). The per-anchor math
    is independent across anchors, so callers may evaluate it on any anchor
    chunking and concatenate — results are bit-identical."""
    hm, wm = protos.shape[0], protos.shape[1]
    dt = _seg_storage_dtype()
    logits = jnp.einsum(
        "ac,hwc->ahw", coefs.astype(dt), protos.astype(dt),
        preferred_element_type=dt,
    )  # (P, Hm, Wm) — only positives matter; masked by the caller.
    tgt = gt_masks.astype(dt)[assigned_gt]  # (P, Hm, Wm)
    boxes = gt_boxes_mask_grid[assigned_gt]  # (P, 4)

    rows = jnp.arange(hm, dtype=jnp.float32).reshape(1, hm, 1)
    cols = jnp.arange(wm, dtype=jnp.float32).reshape(1, 1, wm)
    inside = (
        (rows >= boxes[:, 1, None, None])
        & (rows < boxes[:, 3, None, None])
        & (cols >= boxes[:, 0, None, None])
        & (cols < boxes[:, 2, None, None])
    )
    x = logits.astype(jnp.float32)
    t = tgt.astype(jnp.float32)
    bce = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    per_anchor = jnp.sum(bce * inside, axis=(1, 2))
    area = jnp.clip(
        (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]), 1.0
    )
    return per_anchor / area


# Per-sample logits bytes above which seg_loss switches to the chunked
# rematerialized path: 160 positives on a 480x480 proto grid (imgsz 960,
# mask_stride 2) is 147 MB *per sample* — batch 16 exhausts a v5e chip's HBM
# in this one tensor (measured OOM, round 3). Below it (<=240x240 grids) the
# single fused einsum is faster and stays.
_SEG_CHUNK_BYTES = 128 * 1024 * 1024


def seg_loss(
    coefs: Array,
    protos: Array,
    gt_masks: Array,
    gt_boxes_mask_grid: Array,
    assigned_gt: Array,
    pos_mask: Array,
    eps: float = 1e-6,
    chunk: int | None = None,
    anchor_weights: Array | None = None,
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

    On large proto grids (the hi-res mask_stride=2 head at imgsz 960: Hm=480)
    even the (P, Hm, Wm) slice OOMs, so the slice is further evaluated in
    fixed CHUNKS of anchors under jax.checkpoint: forward/backward recompute
    each chunk's logits instead of keeping all P alive. Exact — per-anchor
    terms are independent and concatenated back in order (bit-identical);
    only peak memory changes. ``chunk`` overrides the automatic policy
    (``TTI_SEG_CHUNK`` env does too; 0 forces the unchunked path).
    """
    import os

    hm, wm = protos.shape[0], protos.shape[1]
    a, g = coefs.shape[0], gt_masks.shape[0]
    p = min(a, max(64, 10 * g))
    order = jax.lax.top_k(pos_mask.astype(jnp.float32), p)[1]
    coefs = coefs[order]
    assigned_gt = assigned_gt[order]
    pos_mask = pos_mask[order]
    if anchor_weights is not None:
        anchor_weights = anchor_weights[order]

    env = os.environ.get("TTI_SEG_CHUNK")
    if env is not None:
        chunk = int(env) or None
    elif chunk is None and p * hm * wm * 4 > _SEG_CHUNK_BYTES:
        chunk = 32

    if chunk is None or chunk >= p:
        # Rematerialized even unchunked: without checkpoint XLA saves the
        # (P, Hm, Wm) logits tensor as a backward residual — at batch 64 /
        # 640px/s4 that is a 2.6 GB f32 save plus a same-sized layout copy
        # (copy.695, 5.1 ms in the round-4 train profile). Recomputing the
        # einsum in backward costs ~17 GFLOP total (<0.2 ms on the MXU) and
        # drops both. Bit-identical loss; only the autodiff schedule changes.
        per_anchor = jax.checkpoint(_seg_per_anchor)(
            coefs, assigned_gt, protos, gt_masks, gt_boxes_mask_grid
        )
    else:
        pad = (-p) % chunk
        coefs_c = jnp.pad(coefs, ((0, pad), (0, 0)))
        assigned_c = jnp.pad(assigned_gt, (0, pad))
        n_chunks = (p + pad) // chunk
        body = jax.checkpoint(
            lambda cf, ag: _seg_per_anchor(
                cf, ag, protos, gt_masks, gt_boxes_mask_grid
            )
        )
        per_anchor = jax.lax.map(
            lambda args: body(*args),
            (coefs_c.reshape(n_chunks, chunk, -1),
             assigned_c.reshape(n_chunks, chunk)),
        ).reshape(-1)[:p]

    # Optional per-anchor weights (per-class seg gains). The normalizer stays
    # n_pos, not sum(w): with all-ones weights this reduces bit-for-bit to the
    # unweighted recipe, and gains scale gradient magnitude per class instead
    # of silently renormalizing the loss.
    if anchor_weights is not None:
        per_anchor = per_anchor * anchor_weights
    n_pos = jnp.maximum(jnp.sum(pos_mask), 1.0)
    return jnp.sum(jnp.where(pos_mask, per_anchor, 0.0)) / n_pos
