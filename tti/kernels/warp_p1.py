"""Pallas TPU kernel: fused decimate + BGR->RGB + normalize + warp pass 1.

The production preprocess at the headline geometry (1080p -> 640 letterbox,
odd integer decimation k=3) spends most of its time NOT in math but in moving
the uint8 batch into the pass-1 einsum's preferred operand layout: the XLA
step at batch 128 pays ~2.7 ms for the fused decimate+pack (an effective
~86 GB/s on a ~800 GB/s part — 2-D-strided u8 sublane selects), ~0.34 ms for
a u8 relayout copy, ~0.9 ms for the pass-1 einsum and ~0.17 ms for the BGR
reverse (tools/profile_forward.py, STATUS r3 ledger).

This kernel fuses the whole chain at the source:

    grid step y (one decimated output row):
      DMA the ONE source row it needs (B, W*C) u8   <- contiguous, 1/k of rows
      per RGB channel: lane-select the k-strided BGR samples,
      convert bf16, /255, - pad_value                <- letterbox_content parity
      (B, ws) @ w1[y] (ws, wo) on the MXU            <- pass 1, f32 accumulate
      write i1 (1, 3, B, wo) bf16

so the frame batch is read ONCE (only the rows the decimation keeps), the
batch dim lands directly in MXU sublanes (no transpose pass over HBM), and
the einsum-operand relayout never exists. Output layout (y, c, b, o) feeds
pass 2 as `einsum("ycbo,ovy->bvoc")` — the same batched matmul TwoPassWarp
already runs, with lhs free dims (c, b) instead of (b, c).

Numerics contract (tests/test_warp_p1.py): identical op order to the XLA path
— u8 -> bf16, * (1/255) in bf16, - pad in bf16, f32-accumulated dot — so
results match letterbox_content(decimate=True) + pass-1 einsum to f32
accumulation-order tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _p1_kernel(frames_ref, w1_ref, out_ref, *, k: int, off: int, ws: int,
               pad_value: float, bgr_flip: bool):
    """One grid step: one decimated source row for the whole batch.

    frames_ref: (B, 1, W*C) VMEM u8 — the one source row this step reads
    w1_ref:     (1, ws, wo) VMEM — this row's pass-1 kernels (bf16 on TPU,
                f32 on CPU, matching TwoPassWarp's weight dtype)
    out_ref:    (1, 3, B, wo) VMEM out — i1 in (y, c, b, o) order
    """
    b = frames_ref.shape[0]
    row = frames_ref[:, 0, :]  # (B, W*C) u8
    w1y = w1_ref[0]  # (ws, wo)
    wdt = w1y.dtype
    inv255 = jnp.asarray(1.0 / 255.0, wdt)
    pad = jnp.asarray(pad_value, wdt)
    for c in range(3):  # output channel (RGB)
        c_src = (2 - c) if bgr_flip else c  # BGR frames -> RGB content
        start = 3 * off + c_src  # flat lane of (W=off+k*wo, channel c_src)
        xc = jax.lax.slice(
            row, (0, start), (b, start + 3 * k * (ws - 1) + 1), (1, 3 * k)
        )  # (B, ws) u8 — the decimated samples of this row, one channel
        # Parity with letterbox_content + TwoPassWarp.apply: u8 -> wdt,
        # * 1/255 (wdt), - pad (wdt), then f32-accumulated matmul.
        xb = xc.astype(wdt) * inv255 - pad
        acc = jax.lax.dot_general(
            xb, w1y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, wo) f32
        out_ref[0, c] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("k", "off", "hs", "ws", "pad_value", "bgr_flip")
)
def warp_pass1_decimated(
    frames_u8: Array,  # (B, H, W, 3) uint8 BGR full-resolution frames
    w1: Array,  # (hs, ws, wo) bf16 pass-1 weights (dense)
    *,
    k: int,  # odd integer decimation stride (1080p -> 640px is 3)
    off: int,  # decimation offset (k - 1) // 2
    hs: int,  # content rows (= decimated source rows pass 1 consumes)
    ws: int,  # content cols
    pad_value: float,
    bgr_flip: bool = True,
) -> Array:
    """uint8 frames -> pass-1 intermediate i1, (hs, 3, B, wo) bf16.

    Exactly TwoPassWarp's dense pass 1 applied to
    letterbox_content(frames, decimate=True), minus the pad shift-back
    (pass 2 consumes the shifted values directly).
    """
    bsz, h, w, cc = frames_u8.shape
    if cc != 3:
        raise ValueError("expected 3-channel frames")
    if off + k * (hs - 1) >= h or 3 * off + 3 * k * (ws - 1) + 2 >= w * 3:
        raise ValueError("decimation geometry exceeds the frame")
    wo = w1.shape[2]
    flat = frames_u8.reshape(bsz, h, w * 3)
    grid = (hs,)
    return pl.pallas_call(
        functools.partial(_p1_kernel, k=k, off=off, ws=ws,
                          pad_value=pad_value, bgr_flip=bgr_flip),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bsz, 1, w * 3), lambda i: (0, off + k * i, 0)),
            pl.BlockSpec((1, ws, wo), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 3, bsz, wo), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((hs, 3, bsz, wo), w1.dtype),
        # Mosaic is the TPU path; elsewhere (CPU tests) run the interpreter.
        interpret=jax.default_backend() != "tpu",
    )(flat, w1)
