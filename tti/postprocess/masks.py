"""Mask assembly: prototypes x coefficients -> instance masks.

The reference pulls per-instance masks from Ultralytics and NEAREST-resizes them
to frame size (reference: measurement.py:70-86); inside Ultralytics the mask is
sigmoid(coeffs . protos), cropped to the box. Here the same product is an
explicit dense stage:

    logits (N, Hm, Wm) = einsum(coefs (N, nm), protos (Hm, Wm, nm))

- ``assemble_masks`` materializes instance masks at proto resolution (cheap:
  N x H/4 x W/4) for tests, parity checks and host-side rendering;
- measurement statistics never materialize full-resolution masks — they reduce
  directly (see tti.kernels.maskstats), which is the memory-side win that lets
  the pipeline run hundreds of frames/s.

Box-coordinate convention: boxes arrive in model-input pixels; proto space is
input/4, so crop bounds scale by (Hm/inp_h, Wm/inp_w).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def crop_masks(masks: Array, boxes: Array) -> Array:
    """Zero mask values outside each instance's box.

    masks (..., N, H, W); boxes (..., N, 4) xyxy in *mask* pixel coords.
    """
    h, w = masks.shape[-2], masks.shape[-1]
    rows = jnp.arange(h, dtype=boxes.dtype).reshape(1, h, 1)
    cols = jnp.arange(w, dtype=boxes.dtype).reshape(1, 1, w)
    x1 = boxes[..., 0:1, None]
    y1 = boxes[..., 1:2, None]
    x2 = boxes[..., 2:3, None]
    y2 = boxes[..., 3:4, None]
    inside = (rows >= y1) & (rows < y2) & (cols >= x1) & (cols < x2)
    return masks * inside


def assemble_masks(
    protos: Array,
    coefs: Array,
    boxes_input_px: Array,
    valid: Array,
    input_hw: tuple[int, int],
    threshold: float | None = 0.5,
) -> Array:
    """Instance masks at proto resolution.

    protos (Hm, Wm, nm); coefs (N, nm); boxes_input_px (N, 4) xyxy in model-input
    pixels; valid (N,). Returns (N, Hm, Wm) float (sigmoid probabilities, or
    binarized if threshold is not None). Invalid rows are all-zero.
    """
    hm, wm = protos.shape[0], protos.shape[1]
    logits = jnp.einsum(
        "nc,hwc->nhw", coefs.astype(jnp.float32), protos.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    probs = jax.nn.sigmoid(logits)
    scale = jnp.array(
        [wm / input_hw[1], hm / input_hw[0], wm / input_hw[1], hm / input_hw[0]],
        probs.dtype,
    )
    probs = crop_masks(probs, boxes_input_px * scale)
    if threshold is not None:
        probs = (probs > threshold).astype(probs.dtype)
    return probs * valid[:, None, None].astype(probs.dtype)


def upsample_masks(masks: Array, out_hw: tuple[int, int], method: str = "bilinear") -> Array:
    """(N, Hm, Wm) -> (N, out_h, out_w). 'nearest' reproduces the reference's
    cv2.INTER_NEAREST resize to frame size (measurement.py:79)."""
    n = masks.shape[0]
    return jax.image.resize(masks, (n, out_hw[0], out_hw[1]), method=method)


def masks_at_input(
    protos: Array,
    coefs: Array,
    boxes_input_px: Array,
    valid: Array,
    input_hw: tuple[int, int],
) -> Array:
    """Instance masks at model-input resolution with Ultralytics
    ``process_mask(..., upsample=True)`` semantics — the exact chain behind
    ``results.masks.data`` that the reference consumes (measurement.py:70-86):
    sigmoid(coef . proto), crop at PROTO resolution with boxes downscaled by
    (Wm/W, Hm/H), BILINEAR-upsample the probabilities to the input size, then
    threshold > 0.5. Returns (N, H, W) float binary masks."""
    probs = assemble_masks(protos, coefs, boxes_input_px, valid, input_hw, threshold=None)
    up = upsample_masks(probs, input_hw, method="bilinear")
    return (up > 0.5).astype(jnp.float32)


def resize_nearest_cv2(masks: Array, out_hw: tuple[int, int]) -> Array:
    """cv2.resize(..., INTER_NEAREST) on (N, H, W) masks: source index =
    floor(dst * src/dst) — cv2's convention, NOT jax.image.resize's
    half-pixel-center rounding. Reproduces the reference's final mask resize to
    frame size (measurement.py:79)."""
    h, w = masks.shape[-2], masks.shape[-1]
    oh, ow = out_hw
    ys = jnp.clip(jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32), 0, h - 1)
    xs = jnp.clip(jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32), 0, w - 1)
    return masks[..., ys[:, None], xs[None, :]]


def masks_at_frame(
    protos: Array,
    coefs: Array,
    boxes_input_px: Array,
    valid: Array,
    input_hw: tuple[int, int],
    frame_hw: tuple[int, int],
) -> Array:
    """The reference's full frame-resolution mask chain: Ultralytics
    process_mask at input resolution (masks_at_input), then the reference's own
    cv2 INTER_NEAREST resize to the camera frame (measurement.py:70-86).
    Returns (N, frame_h, frame_w) float binary masks."""
    return resize_nearest_cv2(
        masks_at_input(protos, coefs, boxes_input_px, valid, input_hw), frame_hw
    )


def mask_iou(a: Array, b: Array, eps: float = 1e-9) -> Array:
    """IoU between two binary masks of equal shape (parity metric: BASELINE
    target mask IoU >= 0.999)."""
    a = a > 0.5
    b = b > 0.5
    inter = jnp.sum(a & b)
    union = jnp.sum(a | b)
    return inter / jnp.maximum(union, eps)
