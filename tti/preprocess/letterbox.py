"""Fused preprocessing: BGR->RGB + letterbox resize + normalize, in-graph.

The reference's preprocessing happens inside the Ultralytics predictor on CPU
(BGR->RGB at reference: measurement.py:205; letterbox/normalize inside
``model.predict(..., imgsz=960)`` at measurement.py:208-210). Here it is a pure
jnp function traced into the same XLA program as the model forward, so resize,
channel flip, scale and pad fuse with the first conv's HBM read
(BASELINE.json north star: "letterbox-resize, BGR->RGB, and normalize
preprocessing fuse directly into the model graph").

Letterbox semantics match Ultralytics: uniform scale r = min(T/h, T/w),
bilinear resize to (round(h*r), round(w*r)), center padding with 114/255.
All geometry is static: the spec is computed at trace time from static shapes.

Two padding modes, both static:
- ``square``: pad to the full (T, T) canvas (Ultralytics LetterBox(auto=False),
  what ONNX/TensorRT exports see);
- ``rect``: Ultralytics' auto minimal-rect mode (LetterBox(auto=True), the
  default for .pt models in ``model.predict``): pad only up to the next
  stride-32 multiple, e.g. a 1280x960 frame at imgsz=960 becomes 960x736, not
  960x960 (reference deployment: measurement.py:210 predict(imgsz=960)).
  Fewer padded pixels = the same detections with ~20-40% less compute.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

Array = jax.Array

PAD_VALUE = 114.0  # Ultralytics letterbox border color


@dataclass(frozen=True)
class LetterboxSpec:
    """Static geometry of a letterbox transform (source -> target)."""

    src_h: int
    src_w: int
    dst_h: int
    dst_w: int
    scale: float
    new_h: int  # resized content height
    new_w: int
    pad_top: int
    pad_left: int


def letterbox_spec(src_h: int, src_w: int, target: int | tuple[int, int]) -> LetterboxSpec:
    dst_h, dst_w = (target, target) if isinstance(target, int) else target
    r = min(dst_h / src_h, dst_w / src_w)
    new_h, new_w = round(src_h * r), round(src_w * r)
    pad_top = (dst_h - new_h) // 2
    pad_left = (dst_w - new_w) // 2
    return LetterboxSpec(src_h, src_w, dst_h, dst_w, r, new_h, new_w, pad_top, pad_left)


def letterbox_spec_rect(
    src_h: int, src_w: int, target: int | tuple[int, int], stride: int = 32,
    scaleup: bool = True,
) -> LetterboxSpec:
    """Ultralytics auto minimal-rect letterbox (LetterBox(auto=True), the .pt
    predict default — reference runs predict(imgsz=960) on 1280x960 frames,
    measurement.py:208-210, which letterboxes to 960x736, NOT 960x960).

    Geometry: scale r = min(T/h, T/w), resize to round(h*r) x round(w*r), then
    pad each axis only up to the next ``stride`` multiple ((T - new) % stride),
    split centered with Ultralytics' round(x/2 -+ 0.1) tie-break (equals floor
    for the top/left pad at integer total padding)."""
    th, tw = (target, target) if isinstance(target, int) else target
    # Ultralytics check_imgsz: predict imgsz is rounded UP to a stride multiple
    # before the letterbox sees it (the model needs stride-divisible inputs).
    th = -(-th // stride) * stride
    tw = -(-tw // stride) * stride
    r = min(th / src_h, tw / src_w)
    if not scaleup:
        r = min(r, 1.0)
    new_h, new_w = round(src_h * r), round(src_w * r)
    dh = (th - new_h) % stride
    dw = (tw - new_w) % stride
    pad_top = int(round(dh / 2 - 0.1))
    pad_left = int(round(dw / 2 - 0.1))
    return LetterboxSpec(
        src_h, src_w, new_h + dh, new_w + dw, r, new_h, new_w, pad_top, pad_left
    )


def make_letterbox_spec(
    src_h: int, src_w: int, target: int | tuple[int, int], mode: str = "square",
    stride: int = 32,
) -> LetterboxSpec:
    """Dispatch on letterbox mode: 'square' (full TxT canvas) or 'rect'
    (Ultralytics auto minimal-rect, stride-aligned)."""
    if mode == "rect":
        return letterbox_spec_rect(src_h, src_w, target, stride)
    if mode == "square":
        return letterbox_spec(src_h, src_w, target)
    raise ValueError(f"letterbox mode must be 'square' or 'rect', got {mode!r}")


def bgr_to_rgb(frames: Array) -> Array:
    """(..., 3) channel flip (reference: measurement.py:205)."""
    return frames[..., ::-1]


def normalize(frames: Array, dtype=jnp.float32) -> Array:
    """uint8 [0,255] -> float [0,1]."""
    return frames.astype(dtype) / jnp.asarray(255.0, dtype)


def letterbox(frames: Array, spec: LetterboxSpec, dtype=jnp.float32) -> Array:
    """(B, H, W, 3) float frames -> (B, dst_h, dst_w, 3), bilinear + center pad."""
    b = frames.shape[0]
    # antialias=False matches cv2.INTER_LINEAR (classic bilinear sampling, no
    # downscale prefilter) — required for numerical parity with the Ultralytics
    # preprocess; jax's default antialias=True is a *different* resize.
    resized = jax.image.resize(
        frames.astype(dtype), (b, spec.new_h, spec.new_w, 3), method="bilinear",
        antialias=False,
    )
    pad_bottom = spec.dst_h - spec.new_h - spec.pad_top
    pad_right = spec.dst_w - spec.new_w - spec.pad_left
    return jnp.pad(
        resized,
        ((0, 0), (spec.pad_top, pad_bottom), (spec.pad_left, pad_right), (0, 0)),
        constant_values=jnp.asarray(PAD_VALUE / 255.0, dtype),
    )


def decimation_stride(spec: LetterboxSpec) -> int | None:
    """If the resize is an exact odd-integer decimation whose bilinear sample
    positions land on source pixel centers, return the stride k, else None.

    With scale s = 1/k, output pixel i samples source (i + 0.5)k - 0.5 =
    ki + (k-1)/2 — an integer for odd k — so bilinear resize degenerates to a
    strided slice (1080p -> 640 letterbox is k=3)."""
    if spec.new_h == 0 or spec.new_w == 0:
        return None
    if spec.src_h % spec.new_h or spec.src_w % spec.new_w:
        return None
    k = spec.src_h // spec.new_h
    if k != spec.src_w // spec.new_w or k < 2 or k % 2 == 0:
        return None
    return k


def _integer_decimation(spec: LetterboxSpec) -> int | None:
    """decimation_stride gated for the FLOAT letterbox path. Counterintuitively
    the strided u8 slice LOSES there on v5e (514 vs 575 and 2787 vs 2915
    frames/s e2e): XLA already fuses the u8->float conversion into the resize
    and only reads the needed samples, while the standalone slice forces an
    unfavorable relayout. Kept behind TTI_LETTERBOX_DECIMATE=1 for evaluation
    on other hardware. (The packed-remap path fuses the decimation into its
    u32 PACK instead, where it wins — see PackedRemap.pack_decimated_u8.)
    """
    import os

    if os.environ.get("TTI_LETTERBOX_DECIMATE") != "1":
        return None
    return decimation_stride(spec)


ROWSLICE_MAX_BATCH = 32  # measured crossover, v5e (see STATUS ledger)


def _row_decimation(spec: LetterboxSpec, batch: int) -> int | None:
    """Integer-decimation gate for the ROW axis only. At an exact odd integer
    scale (1080p -> 360 rows is 3x) the bilinear sample positions are integers,
    so row selection is a strided slice of CONTIGUOUS whole rows — no lane
    relayout (the failure mode of full 2-D decimation, see
    _integer_decimation) — and the W resize then reads k-times less data.

    Batch-adaptive (v5e, 1080p->640 e2e): at batch 1 the slice is an 8x p50
    latency win (1.49 vs 12.32 ms — the fused big resize has a large fixed
    cost); at batch 128 it LOSES 3.4% throughput (4042 -> 3904 f/s — XLA's
    fused u8->f16 resize already reads only needed samples at high occupancy).
    Default: sliced at batch <= 32. TTI_LETTERBOX_ROWSLICE=1 forces on,
    =0 forces off."""
    import os

    force = os.environ.get("TTI_LETTERBOX_ROWSLICE")
    if force == "0":
        return None
    if force != "1" and batch > ROWSLICE_MAX_BATCH:
        return None
    if spec.new_h == 0 or spec.src_h % spec.new_h:
        return None
    k = spec.src_h // spec.new_h
    # Odd k: sample position (y+0.5)*k - 0.5 = k*y + (k-1)/2 is integral.
    if k < 2 or k % 2 == 0:
        return None
    return k


def letterbox_content(frames_bgr_u8: Array, spec: LetterboxSpec, dtype=jnp.float32,
                      decimate: bool | None = None) -> Array:
    """uint8 BGR -> normalized RGB resized CONTENT only (B, new_h, new_w, 3) —
    the letterbox without its padding (with the integer-decimation fast path).
    Used when the consumer supplies its own border handling (PackedRemap's
    pad-word sentinel equals the letterbox pad value).

    decimate=True forces the exact integer-decimation slice when the geometry
    allows (odd integer scale — bit-exact vs the bilinear resize). The
    MXU-warp consumer passes True: feeding the einsum from a strided u8 slice
    measured 4968 vs 4850 frames/s at batch 128 AND dispatch-floor p50 at
    batch 1 (the relayout penalty that made the slice lose into the GATHER
    consumer does not exist for a matmul operand)."""
    k = decimation_stride(spec) if decimate else _integer_decimation(spec)
    if k is not None:
        off = (k - 1) // 2
        small = frames_bgr_u8[:, off::k, off::k, :][:, : spec.new_h, : spec.new_w, :]
        return small[..., ::-1].astype(dtype) / 255.0
    b = frames_bgr_u8.shape[0]
    src = frames_bgr_u8
    kr = _row_decimation(spec, b)
    if kr is not None:
        off = (kr - 1) // 2
        src = src[:, off::kr, :, :][:, : spec.new_h]
    x = normalize(bgr_to_rgb(src), dtype)
    return jax.image.resize(
        x.astype(dtype), (b, spec.new_h, spec.new_w, 3), method="bilinear",
        antialias=False,
    )


def letterbox_u8(frames_bgr_u8: Array, spec: LetterboxSpec, dtype=jnp.float32) -> Array:
    """Fused uint8-BGR -> normalized-RGB letterbox, with the integer-decimation
    fast path (slice the uint8 input first, float math on the small image)."""
    resized = letterbox_content(frames_bgr_u8, spec, dtype)
    pad_bottom = spec.dst_h - spec.new_h - spec.pad_top
    pad_right = spec.dst_w - spec.new_w - spec.pad_left
    return jnp.pad(
        resized,
        ((0, 0), (spec.pad_top, pad_bottom), (spec.pad_left, pad_right), (0, 0)),
        constant_values=jnp.asarray(PAD_VALUE / 255.0, dtype),
    )


def preprocess_frames(
    frames_bgr_u8: Array, target: int | tuple[int, int], dtype=jnp.float32
) -> tuple[Array, LetterboxSpec]:
    """uint8 BGR (B, H, W, 3) -> normalized RGB letterboxed (B, T, T, 3).

    The single fused entry point: flip + normalize + resize + pad in one traced
    graph. Returns the spec needed to map detections back to frame coordinates.
    """
    b, h, w, _ = frames_bgr_u8.shape
    spec = letterbox_spec(h, w, target)
    return letterbox_u8(frames_bgr_u8, spec, dtype), spec


def scale_boxes_to_frame(boxes_xyxy: Array, spec: LetterboxSpec) -> Array:
    """Map xyxy boxes from letterboxed model-input pixels back to source-frame
    pixels (the inverse of the letterbox; what Ultralytics' scale_boxes does),
    clipped to the frame."""
    shift = jnp.array([spec.pad_left, spec.pad_top, spec.pad_left, spec.pad_top],
                      boxes_xyxy.dtype)
    out = (boxes_xyxy - shift) / spec.scale
    limit = jnp.array([spec.src_w, spec.src_h, spec.src_w, spec.src_h], out.dtype)
    return jnp.clip(out, 0.0, limit)


def frame_points_to_input(points_xy: Array, spec: LetterboxSpec) -> Array:
    """Source-frame pixel coords -> letterboxed model-input coords."""
    shift = jnp.array([spec.pad_left, spec.pad_top], points_xy.dtype)
    return points_xy * spec.scale + shift
