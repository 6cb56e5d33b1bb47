"""Anchor-free DFL box decode: raw head logits -> (boxes, scores, classes, coefs).

The reference gets decoded/NMS'd boxes from the Ultralytics predictor
(reference: measurement.py:208-210, consumed at measurement.py:242-246). Here
decode is an explicit dense XLA stage:

- anchors are the per-level grid-cell centers (x+0.5, y+0.5) * stride,
- DFL turns each side's 16-bin distribution into its softmax expectation
  (equivalent to Ultralytics' fixed arange conv, which the converter skips),
- distances (l, t, r, b) in grid units scale by stride into xyxy pixels.

Everything is static-shaped: A = sum of level H*W anchors.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from tti.model.yolo import RawPredictions, REG_MAX, STRIDES

Array = jax.Array


@flax.struct.dataclass
class Detections:
    """Fixed-size detection set (padded; ``valid`` masks real rows).

    boxes are xyxy in model-input pixels until explicitly rescaled
    (tti.preprocess.letterbox.scale_boxes_to_frame).
    """

    boxes: Array  # (B, D, 4) xyxy
    scores: Array  # (B, D)
    classes: Array  # (B, D) int32
    coefs: Array  # (B, D, nm) mask coefficients
    valid: Array  # (B, D) bool


def make_anchors(
    level_hw: tuple[tuple[int, int], ...], strides: tuple[int, ...] = STRIDES, dtype=jnp.float32
) -> tuple[Array, Array]:
    """Anchor centers in input pixels (A, 2) and per-anchor stride (A,)."""
    points, strs = [], []
    for (h, w), s in zip(level_hw, strides):
        ys = (jnp.arange(h, dtype=dtype) + 0.5) * s
        xs = (jnp.arange(w, dtype=dtype) + 0.5) * s
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        points.append(jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1))
        strs.append(jnp.full((h * w,), s, dtype))
    return jnp.concatenate(points, axis=0), jnp.concatenate(strs, axis=0)


def dfl_expectation(box_logits: Array) -> Array:
    """(..., 4*REG_MAX) logits -> (..., 4) expected distances in grid units."""
    shape = box_logits.shape[:-1] + (4, REG_MAX)
    probs = jax.nn.softmax(box_logits.reshape(shape).astype(jnp.float32), axis=-1)
    bins = jnp.arange(REG_MAX, dtype=jnp.float32)
    return jnp.einsum("...k,k->...", probs, bins)


def flatten_predictions(raw: RawPredictions) -> tuple[Array, Array, Array, tuple[tuple[int, int], ...]]:
    """Concatenate per-level maps into (B, A, C) tensors + level shapes."""
    level_hw = tuple((t.shape[1], t.shape[2]) for t in raw.box)
    b = raw.box[0].shape[0]

    def flat(ts):
        return jnp.concatenate([t.reshape(b, -1, t.shape[-1]) for t in ts], axis=1)

    return flat(raw.box), flat(raw.cls), flat(raw.mcoef), level_hw


def decode_predictions(
    raw: RawPredictions, strides: tuple[int, ...] = STRIDES
) -> tuple[Array, Array, Array]:
    """RawPredictions -> (boxes_xyxy (B,A,4) in input px, class_probs (B,A,nc),
    coefs (B,A,nm)). Dense: NMS (tti.postprocess.nms) selects from these."""
    box_l, cls_l, coef_l, level_hw = flatten_predictions(raw)
    anchors, stride_per_anchor = make_anchors(level_hw, strides)

    ltrb = dfl_expectation(box_l) * stride_per_anchor[None, :, None]
    cx, cy = anchors[None, :, 0], anchors[None, :, 1]
    boxes = jnp.stack(
        [cx - ltrb[..., 0], cy - ltrb[..., 1], cx + ltrb[..., 2], cy + ltrb[..., 3]],
        axis=-1,
    )
    probs = jax.nn.sigmoid(cls_l.astype(jnp.float32))
    return boxes, probs, coef_l.astype(jnp.float32)
