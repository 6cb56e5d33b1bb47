"""Pallas pass-1 warp kernel — PARKED: not lowerable on current Mosaic.

The design: fuse decimate + BGR->RGB + normalize + warp pass 1 into one
kernel so the 1080p u8 batch is read once (only the 1/k rows the decimation
keeps), the batch lands directly in MXU sublanes (M = 3B), and the XLA
chain's ~2.7 ms decimate+pack fusion, ~0.34 ms u8 relayout, ~0.9 ms pass-1
einsum and ~0.17 ms BGR reverse (tools/profile_forward.py at batch 128, v5e)
collapse into ~1.1 ms of HBM-bound work.

    grid step (r, o)  —  r: block of 8 decimated rows, o: pass-1 output cols
      o == 0:  DMA each (row, channel)'s k-strided samples HBM->VMEM dense
      every o: xb = packed[j] as (3B, ws) bf16, /255, -pad     <- letterbox
               (3B, ws) @ w1[8r+j] (ws, wo_blk) on the MXU, f32 accumulate
               out[8r+j, :, :, o-block] = (3, B, wo_blk) bf16

**Why it is parked** (every route measured/attempted on the v5e toolchain,
jax 0.8.x Mosaic, 2026-08-18 — see STATUS.md round-3 ledger):

1. BlockSpec'ing the frame input one source row per grid step fails the
   Mosaic block rule (last two block dims divisible by (8, 128) or equal to
   the array dims): a (B, 1, W*3) block on a (B, 1080, W*3) array is sublane
   block 1. Blocking 8 ROWS at a time cannot skip the 2/3 unneeded rows.
2. Manual full-row DMAs (memory_space=ANY + make_async_copy) lower fine,
   but the in-VMEM channel/column select is a stride-3k lane slice and
   Mosaic's `vector.extract_strided_slice` is restricted to strides [1, 2).
3. Doing the select inside the DMA descriptor: `pl.Slice(start, ws, 3k)`
   on a ref raises "Strided slices of references are unsupported".
4. Expressing the stride as an integer index on a free (B, H, W/k, 3k)
   reshape: HBM memrefs are tiled (8, 128) on the trailing dims, so Mosaic
   requires the trailing-dim slice be 128-aligned ("Slice shape along
   dimension 3 must be aligned to tiling (128), but is 1") — and the tiled
   view would 128-pad the 3k lane groups ~14x if materialized.
5. MXU-based selection (one-hot s8 matmul, dense or block-diagonal) costs
   ~1 TFLOP/step at the headline geometry — 2.6 ms at peak int8, more than
   the 2.7 ms XLA pack it would replace; the block-diagonal variant
   degenerates into ~16k irregular tiny matmuls per step.

The kernel below is the furthest-along variant (manual per-channel DMAs via
the grouped-lane view, route 4). It is numerics-correct and fully tested in
Pallas interpret mode (tests/test_warp_p1.py) and is kept as the ready
implementation for the day Mosaic gains strided DMA or VPU slices; it is
NOT wired into the runtime (tti/parallel/runtime.py preprocess notes this).

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

ROWS_PER_BLOCK = 8  # decimated rows per grid step (out-block sublane rule)


def _p1_kernel(frames_hbm, w1_ref, out_ref, packed, sems, *, k: int,
               off: int, ws: int, pad_value: float, bgr_flip: bool):
    """Grid step (r, o): 8 decimated source rows x one pass-1 column block.

    frames_hbm: (B, H, W*C) u8, memory_space=ANY (stays in HBM)
    w1_ref:     (8, ws, wo_blk) VMEM — this row block's pass-1 kernels
    out_ref:    (8, 3, B, wo_blk) VMEM out — i1 in (y, c, b, o) order
    packed:     (8, 3, B, ws) u8 VMEM scratch — decimated samples, kept
                across the o steps of one r block
    sems:       (8, 3) DMA semaphores, one per (row, channel) copy

    The column decimation + BGR flip happen INSIDE the DMA descriptors:
    each (row j, channel c) copy reads the k-strided samples of one BGR
    channel (1-byte elements, byte stride 3k) and lands them dense in
    packed[j, c]. HBM-side the stride (9 at the headline geometry) is well
    under a burst, so each row is streamed ~once per channel; that ~3x read
    amplification still only matches what the XLA fusion reads, while the
    VPU never touches a select (Mosaic's vector strided-slice is stride<2
    only — an in-kernel lane select is not lowerable on this toolchain).
    """
    r = pl.program_id(0)
    bsz = packed.shape[2]

    def chan_dma(j: int, c: int):
        src_row = off + k * (ROWS_PER_BLOCK * r + j)
        c_src = (2 - c) if bgr_flip else c  # BGR frames -> RGB content
        # frames_hbm is (B, H, W*3 // (3k), 3k): one lane group per kept
        # column; the sample of channel c_src sits at intra-group byte
        # 3*off + c_src. Integer indices (squeezes) express the strided
        # read — Mosaic rejects pl.Slice strides in DMAs, but a squeezed
        # trailing dim lowers to the same strided descriptor.
        return pltpu.make_async_copy(
            frames_hbm.at[:, src_row, pl.ds(0, ws), 3 * off + c_src],
            packed.at[j, c],
            sems.at[j, c],
        )

    @pl.when(pl.program_id(1) == 0)
    def _fetch():  # once per row block: strided channel DMAs
        for j in range(ROWS_PER_BLOCK):
            for c in range(3):
                chan_dma(j, c).start()
        for j in range(ROWS_PER_BLOCK):
            for c in range(3):
                chan_dma(j, c).wait()

    w1b = w1_ref[...]  # (8, ws, wo_blk) — bf16 on TPU, f32 on CPU
    wdt = w1b.dtype
    inv255 = jnp.asarray(1.0 / 255.0, wdt)
    pad = jnp.asarray(pad_value, wdt)
    for j in range(ROWS_PER_BLOCK):
        # Parity with letterbox_content + TwoPassWarp.apply: u8 -> wdt,
        # * 1/255 (wdt), - pad (wdt), then f32-accumulated matmul. Mosaic has
        # no unsigned->float cast; going through int32 is bit-exact for 0..255
        # (8-bit integers fit bf16's 8 significand bits).
        xb = (packed[j].reshape(3 * bsz, ws).astype(jnp.int32).astype(wdt)
              * inv255 - pad)
        acc = jax.lax.dot_general(
            xb, w1b[j], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (3B, wo_blk) f32
        out_ref[j] = acc.reshape(3, bsz, -1).astype(out_ref.dtype)


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
    if hs % ROWS_PER_BLOCK:
        raise ValueError(
            f"warp_p1 needs hs % {ROWS_PER_BLOCK} == 0, got {hs}"
        )
    wo = w1.shape[2]
    # Column-block the weights/output so the per-step VMEM stays small
    # (weights dominate: 8*ws*wo_blk). 128 = one lane tile.
    wo_blk = 128 if wo % 128 == 0 else wo
    if (w * 3) % (3 * k):
        raise ValueError("frame width must be a multiple of k")
    # Free row-major reshape: one 3k-byte lane group per kept source column,
    # so the kernel's channel DMAs index (not stride) into the group.
    flat = frames_u8.reshape(bsz, h, w // k, 3 * k)
    grid = (hs // ROWS_PER_BLOCK, wo // wo_blk)
    return pl.pallas_call(
        functools.partial(_p1_kernel, k=k, off=off, ws=ws,
                          pad_value=pad_value, bgr_flip=bgr_flip),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # manual row DMAs
            pl.BlockSpec((ROWS_PER_BLOCK, ws, wo_blk), lambda r, o: (r, 0, o)),
        ],
        out_specs=pl.BlockSpec(
            (ROWS_PER_BLOCK, 3, bsz, wo_blk), lambda r, o: (r, 0, 0, o)
        ),
        out_shape=jax.ShapeDtypeStruct((hs, 3, bsz, wo), w1.dtype),
        scratch_shapes=[
            pltpu.VMEM((ROWS_PER_BLOCK, 3, bsz, ws), jnp.uint8),
            pltpu.SemaphoreType.DMA((ROWS_PER_BLOCK, 3)),
        ],
        # Mosaic is the TPU path; elsewhere (CPU tests) run the interpreter.
        interpret=jax.default_backend() != "tpu",
    )(flat, w1)
