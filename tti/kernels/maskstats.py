"""Pallas TPU kernel: mask-prototype product -> per-instance statistics, fused.

The measurement core needs, per detection, only four reductions over its
instance mask (SURVEY.md §2 "Stitch statistics" / "Fabric envelope"):

    m00, m10, m01           (image moments -> centroid)
    per-column occupancy    (-> left/right extent, widths)
    per-column bottom row   (-> fabric lower envelope)

The XLA path (tti.postprocess.masks.assemble_masks + tti.measure.ops) first
materializes all D instance masks at proto resolution — for D=200 at 240x240
that is ~46 MB written and re-read per frame, pure HBM-bandwidth waste. This
kernel fuses the chain

    logits = coefs @ protos^T ;  mask = (logits > 0) & inside(box) ;  reduce

tile-by-tile in VMEM: one MXU matmul per proto row block, VPU reductions into
accumulators, nothing but (D,)/(D, W) statistics ever touching HBM.

Grid: one program per proto row-tile; outputs are accumulated across the grid
(zero-initialised at step 0). mask = logits > 0 is exactly sigmoid > 0.5.

Performance shape: ONE MXU matmul per grid step — coefs (D, nm) against the
whole row-tile flattened to (nm, ROW_TILE*W) — then static lane-slices peel the
per-row (D, W) views for the VPU reductions. (A first version issued one
matmul per proto row: 160 tiny ops/frame, 1.0 ms; this layout is ~10x fewer
dispatches.)

Contract shared with :func:`instance_mask_stats_xla` (the dense XLA reference
used in tests and as the CPU fallback).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

ROW_TILE = 16  # proto rows per grid step


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _logits_dtype(soft: bool = False):
    """Materialization dtype for the dense (D, Hm, Wm) logits tensor.

    The XLA stats paths are HBM-bound on writing + re-reading that tensor
    (5.8 GB/step f32 at the stride-2 deploy geometry, batch 128); bf16
    halves it. Defaults per path (TTI_MASKSTATS_LOGITS=f32|bf16 overrides,
    read at trace time like the other TTI_* perf gates):

    - BINARY path: f32 — bf16 measured perf-NEUTRAL there (1621 vs 1617
      frames/s at the deploy geometry, STATUS.md round-5) and the binary
      threshold logits > 0 is part of the bit-parity contract vs the torch
      oracle, so there is nothing to buy for the exactness given up.
    - SOFT path: bf16 — the soft reductions make more passes over a tensor
      4x the binary fields, measured +8.5% e2e at the deploy geometry
      (1265 vs 1166 frames/s, batch 128) with mm impact below 1e-4 mm on
      the 256-scene report (bias delta 2e-5, every order statistic
      unchanged — STATUS.md round-5 item 3). Sub-cell frac keeps ~1/256
      cell (~1e-3 mm here) resolution in bf16."""
    import os

    forced = os.environ.get("TTI_MASKSTATS_LOGITS")
    if forced == "bf16":
        return jnp.bfloat16
    if forced == "f32":
        return jnp.float32
    return jnp.bfloat16 if soft else jnp.float32


def _stats_kernel(protos_ref, coefs_ref, boxes_ref, valid_ref,
                  m_ref, colany_ref, bottom_ref, *, row_axis: int = 0):
    """One grid step: ROW_TILE proto rows for all D instances.

    protos_ref: (nm, ROW_TILE, W) VMEM   — pre-transposed prototypes
    coefs_ref:  (D, nm) VMEM
    boxes_ref:  (D, 4) VMEM              — xyxy on the proto grid
    valid_ref:  (D, 1) VMEM (float32 0/1)
    m_ref:      (D, 128) VMEM out        — [:,0]=m00 [:,1]=m10 [:,2]=m01 (lane-padded)
    colany_ref: (D, W) VMEM out          — 0/1 column occupancy
    bottom_ref: (D, W) VMEM out          — bottom-most row per column, -1 if none

    row_axis: which grid axis walks the proto row-tiles (the batched variant
    prepends a frame axis; accumulators reset when the row-tile index is 0).
    """
    step = pl.program_id(row_axis)

    @pl.when(step == 0)
    def _init():
        m_ref[:] = jnp.zeros_like(m_ref)
        colany_ref[:] = jnp.zeros_like(colany_ref)
        bottom_ref[:] = jnp.full_like(bottom_ref, -1.0)

    d = coefs_ref.shape[0]
    w = colany_ref.shape[1]
    nm = coefs_ref.shape[1]
    coefs = coefs_ref[:]  # (D, nm)
    valid = valid_ref[:]  # (D, 1)
    x1 = boxes_ref[:, 0:1]
    y1 = boxes_ref[:, 1:2]
    x2 = boxes_ref[:, 2:3]
    y2 = boxes_ref[:, 3:4]
    # Mosaic iota must be integer-typed; cast to f32 for the weighted sums.
    xs = jax.lax.broadcasted_iota(jnp.int32, (d, w), 1).astype(jnp.float32)

    # One MXU matmul for the whole tile: (D, nm) @ (nm, ROW_TILE*W).
    proto_flat = protos_ref[:].reshape(nm, ROW_TILE * w)
    logits_flat = jnp.dot(coefs, proto_flat, preferred_element_type=jnp.float32)

    row0 = step * ROW_TILE
    for t in range(ROW_TILE):
        yf = jnp.float32(row0 + t)
        logits = logits_flat[:, t * w : (t + 1) * w]  # static lane slice (D, W)
        inside = (xs >= x1) & (xs < x2) & (yf >= y1) & (yf < y2)
        mask = jnp.where((logits > 0.0) & inside, valid, 0.0)  # (D, W) 0/1

        m00 = jnp.sum(mask, axis=1, keepdims=True)
        m10 = jnp.sum(mask * xs, axis=1, keepdims=True)
        m_ref[:, 0:1] += m00
        m_ref[:, 1:2] += m10
        m_ref[:, 2:3] += yf * m00  # m01: every pixel in this row has y
        colany_ref[:] = jnp.maximum(colany_ref[:], mask)
        bottom_ref[:] = jnp.maximum(bottom_ref[:], jnp.where(mask > 0, yf, -1.0))


@partial(jax.jit, static_argnames=("interpret",))
def instance_mask_stats_pallas(
    protos: Array, coefs: Array, boxes_grid: Array, valid: Array, interpret: bool = False
) -> dict[str, Array]:
    """Fused statistics for all instances.

    protos (Hm, Wm, nm) f32; coefs (D, nm); boxes_grid (D, 4) xyxy on the proto
    grid; valid (D,) bool. Returns dict with m00/m10/m01 (D,), col_any (D, Wm)
    and bottom (D, Wm) (-1 where the column is empty). D and Wm are padded
    internally to lane multiples.
    """
    hm, wm, nm = protos.shape
    d = coefs.shape[0]
    d_pad = _round_up(max(d, 8), 8)
    w_pad = _round_up(wm, 128)
    h_pad = _round_up(hm, ROW_TILE)

    protos_t = jnp.transpose(protos, (2, 0, 1)).astype(jnp.float32)  # (nm, Hm, Wm)
    protos_t = jnp.pad(protos_t, ((0, 0), (0, h_pad - hm), (0, w_pad - wm)))
    coefs_p = jnp.pad(coefs.astype(jnp.float32), ((0, d_pad - d), (0, 0)))
    boxes_p = jnp.pad(boxes_grid.astype(jnp.float32), ((0, d_pad - d), (0, 0)))
    valid_p = jnp.pad(valid.astype(jnp.float32), (0, d_pad - d))[:, None]

    grid = h_pad // ROW_TILE
    m, col_any, bottom = pl.pallas_call(
        _stats_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (nm, ROW_TILE, w_pad), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((d_pad, nm), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((d_pad, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, w_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, w_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((d_pad, w_pad), jnp.float32),
            jax.ShapeDtypeStruct((d_pad, w_pad), jnp.float32),
        ],
        interpret=interpret,
    )(protos_t, coefs_p, boxes_p, valid_p)

    return {
        "m00": m[:d, 0],
        "m10": m[:d, 1],
        "m01": m[:d, 2],
        "col_any": col_any[:d, :wm],
        "bottom": bottom[:d, :wm],
    }


@partial(jax.jit, static_argnames=("interpret",))
def instance_mask_stats_pallas_batched(
    protos: Array, coefs: Array, boxes_grid: Array, valid: Array, interpret: bool = False
) -> dict[str, Array]:
    """Batched fused statistics: grid (B, row_tiles) instead of vmapping the
    per-frame kernel.

    vmap of a pallas_call prepends the batch to EVERY block (the whole batch of
    prototypes becomes one grid step's block), which defeats the VMEM tiling
    and measured 4550 vs 5041 frames/s e2e at batch 128 (round 2). Here the
    frame axis is a real grid axis: each (b, i) step sees one frame's row-tile,
    Mosaic pipelines the proto DMAs across steps, and the accumulators reset at
    i == 0 per frame.

    protos (B, Hm, Wm, nm); coefs (B, D, nm); boxes_grid (B, D, 4);
    valid (B, D) bool. Returns the per-frame dict with a leading B axis.
    """
    b, hm, wm, nm = protos.shape
    d = coefs.shape[1]
    d_pad = _round_up(max(d, 8), 8)
    w_pad = _round_up(wm, 128)
    h_pad = _round_up(hm, ROW_TILE)

    protos_t = jnp.transpose(protos, (0, 3, 1, 2)).astype(jnp.float32)
    protos_t = jnp.pad(protos_t, ((0, 0), (0, 0), (0, h_pad - hm), (0, w_pad - wm)))
    coefs_p = jnp.pad(coefs.astype(jnp.float32), ((0, 0), (0, d_pad - d), (0, 0)))
    boxes_p = jnp.pad(boxes_grid.astype(jnp.float32), ((0, 0), (0, d_pad - d), (0, 0)))
    valid_p = jnp.pad(valid.astype(jnp.float32), ((0, 0), (0, d_pad - d)))[..., None]

    grid = (b, h_pad // ROW_TILE)
    m, col_any, bottom = pl.pallas_call(
        partial(_stats_kernel, row_axis=1),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (None, nm, ROW_TILE, w_pad), lambda bb, i: (bb, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((None, d_pad, nm), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, d_pad, 4), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, d_pad, 1), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, d_pad, 128), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, d_pad, w_pad), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, d_pad, w_pad), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, d_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, d_pad, w_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, d_pad, w_pad), jnp.float32),
        ],
        interpret=interpret,
    )(protos_t, coefs_p, boxes_p, valid_p)

    return {
        "m00": m[:, :d, 0],
        "m10": m[:, :d, 1],
        "m01": m[:, :d, 2],
        "col_any": col_any[:, :d, :wm],
        "bottom": bottom[:, :d, :wm],
    }


def _stats2_kernel(protos_ref, coefs_ref, boxes_ref, m_ref, colany_ref,
                   bottom_ref, *, row_tile: int, w: int, row_axis: int = 0):
    """v2 grid step: ``row_tile`` proto rows, detections in LANES.

    Differences from :func:`_stats_kernel` (the v1 layout), all driven by the
    round-2/3 A/Bs where v1 lost to the dense XLA einsum at batch 128 (5273 vs
    6029 frames/s e2e) despite avoiding its ~1.7 GB/step of mask-tensor HBM
    traffic:

    * protos stream in their NATIVE (spatial, nm) layout — no host-side
      (B, nm, H, W) f32 transpose pass (a ~840 MB relayout round trip at
      batch 128) and no lane-padding of W (v1 padded 160 -> 256 lanes, +60%
      DMA); the flattened spatial dim is an exact multiple of the sublane
      tile for any W.
    * protos DMA in the model's own dtype (bf16 in production) — half of
      v1's f32 stream; products are exact (bf16*bf16 fits f24) and
      accumulation is f32 either way.
    * detections live in the 128 LANES (v1 padded D to sublane multiples of
      8 and reduced across lanes): one (row_tile*W, nm) @ (nm, 128) MXU
      matmul per step and every VPU reduction runs at full lane width.
    * validity is FOLDED INTO the coefficients outside the kernel
      (coefs_t *= valid: zeroed coefficients give logits == 0, and the mask
      test is strictly ``> 0`` — identical to the reference's ``& valid``),
      so the kernel carries 3 operands instead of 5.

    protos_ref: (row_tile * w, nm) VMEM — flattened spatial rows, native dtype
    coefs_ref:  (nm, 128) VMEM f32     — transposed, valid-folded coefficients
    boxes_ref:  (8, 128) VMEM f32      — rows 0..3 = x1, y1, x2, y2 per det
    m_ref:      (8, 128) VMEM out      — rows 0..2 = m00, m10, m01
    colany_ref: (w, 128) VMEM out      — 0/1 column occupancy (column-major)
    bottom_ref: (w, 128) VMEM out      — bottom-most row per column, -1 if none
    """
    step = pl.program_id(row_axis)

    @pl.when(step == 0)
    def _init():
        m_ref[:] = jnp.zeros_like(m_ref)
        colany_ref[:] = jnp.zeros_like(colany_ref)
        bottom_ref[:] = jnp.full_like(bottom_ref, -1.0)

    s = row_tile * w
    logits = jnp.dot(
        protos_ref[:].astype(jnp.float32), coefs_ref[:],
        preferred_element_type=jnp.float32,
    )  # (S, 128)

    # Spatial coordinates of each flattened row: x = s % w, y = row0 + s // w.
    sidx = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
    xs = (sidx % w).astype(jnp.float32)
    ys = (jnp.int32(step * row_tile) + sidx // w).astype(jnp.float32)

    x1, y1 = boxes_ref[0:1, :], boxes_ref[1:2, :]
    x2, y2 = boxes_ref[2:3, :], boxes_ref[3:4, :]
    inside = (xs >= x1) & (xs < x2) & (ys >= y1) & (ys < y2)
    mask = jnp.where((logits > 0.0) & inside, 1.0, 0.0)  # (S, 128)

    m_ref[0:1, :] += jnp.sum(mask, axis=0, keepdims=True)
    m_ref[1:2, :] += jnp.sum(mask * xs, axis=0, keepdims=True)
    m_ref[2:3, :] += jnp.sum(mask * ys, axis=0, keepdims=True)

    mask3 = mask.reshape(row_tile, w, 128)
    colany_ref[:] = jnp.maximum(colany_ref[:], jnp.max(mask3, axis=0))
    ymask = jnp.where(mask > 0.0, ys, -1.0).reshape(row_tile, w, 128)
    bottom_ref[:] = jnp.maximum(bottom_ref[:], jnp.max(ymask, axis=0))


def _stats2_prep(protos, coefs, boxes_grid, valid, row_tile: int = ROW_TILE):
    """Shared operand staging for the v2 kernels (see _stats2_kernel).

    boxes_t carries 8 sublane rows: 0..3 = x1,y1,x2,y2 and row 4 = the valid
    flag (0/1). The binary kernel only reads rows 0..3 (validity is folded
    into the coefficients there); the soft kernel needs the explicit flag
    because zeroed coefficients give logits == 0 -> sigmoid == 0.5, which
    would PASS its >= 0.5 occupancy test.
    """
    hm, wm, nm = protos.shape[-3:]
    d, nm_c = coefs.shape[-2], coefs.shape[-1]
    if nm_c != nm:
        raise ValueError("coefs/protos nm mismatch")
    if d > 128:
        raise ValueError("v2 kernel holds detections in lanes (D <= 128)")
    h_pad = _round_up(hm, row_tile)
    lead = protos.shape[:-3]
    protos_f = protos.reshape(lead + (hm * wm, nm))
    if h_pad != hm:  # pad spatial rows; y >= hm fails the box gate (y2 <= hm)
        protos_f = jnp.pad(
            protos_f, ((0, 0),) * len(lead) + ((0, (h_pad - hm) * wm), (0, 0))
        )
    valid_f = valid.astype(jnp.float32)
    coefs_t = jnp.swapaxes(coefs.astype(jnp.float32) * valid_f[..., None], -1, -2)
    coefs_t = jnp.pad(coefs_t, ((0, 0),) * len(lead) + ((0, 0), (0, 128 - d)))
    boxes_t = jnp.swapaxes(boxes_grid.astype(jnp.float32), -1, -2)
    boxes_t = jnp.concatenate(
        [boxes_t, valid_f[..., None, :]], axis=-2
    )
    boxes_t = jnp.pad(
        boxes_t, ((0, 0),) * len(lead) + ((0, 3), (0, 128 - d))
    )
    return protos_f, coefs_t, boxes_t, row_tile, h_pad // row_tile, wm, d


def _stats2_out(m, col_any, bottom, d, wm):
    return {
        "m00": m[..., 0, :d],
        "m10": m[..., 1, :d],
        "m01": m[..., 2, :d],
        "col_any": jnp.swapaxes(col_any, -1, -2)[..., :d, :wm],
        "bottom": jnp.swapaxes(bottom, -1, -2)[..., :d, :wm],
    }


@partial(jax.jit, static_argnames=("interpret",))
def instance_mask_stats_pallas2(
    protos: Array, coefs: Array, boxes_grid: Array, valid: Array,
    interpret: bool | None = None,
) -> dict[str, Array]:
    """v2 fused statistics, single frame. Contract of instance_mask_stats_xla."""
    protos_f, coefs_t, boxes_t, row_tile, grid, wm, d = _stats2_prep(
        protos, coefs, boxes_grid, valid
    )
    if interpret is None:  # Mosaic on TPU; interpreter elsewhere (CPU tests)
        interpret = jax.default_backend() != "tpu"
    s = row_tile * wm
    nm = protos.shape[-1]
    m, col_any, bottom = pl.pallas_call(
        partial(_stats2_kernel, row_tile=row_tile, w=wm),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((s, nm), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nm, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wm, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wm, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((wm, 128), jnp.float32),
            jax.ShapeDtypeStruct((wm, 128), jnp.float32),
        ],
        interpret=interpret,
    )(protos_f, coefs_t, boxes_t)
    return _stats2_out(m, col_any, bottom, d, wm)


@partial(jax.jit, static_argnames=("interpret",))
def instance_mask_stats_pallas2_batched(
    protos: Array, coefs: Array, boxes_grid: Array, valid: Array,
    interpret: bool | None = None,
) -> dict[str, Array]:
    """Batched v2: grid (B, row_tiles), one frame's row block per step."""
    protos_f, coefs_t, boxes_t, row_tile, grid, wm, d = _stats2_prep(
        protos, coefs, boxes_grid, valid
    )
    if interpret is None:  # Mosaic on TPU; interpreter elsewhere (CPU tests)
        interpret = jax.default_backend() != "tpu"
    b = protos.shape[0]
    s = row_tile * wm
    nm = protos.shape[-1]
    m, col_any, bottom = pl.pallas_call(
        partial(_stats2_kernel, row_tile=row_tile, w=wm, row_axis=1),
        grid=(b, grid),
        in_specs=[
            pl.BlockSpec((None, s, nm), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, nm, 128), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, 128), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, 8, 128), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, wm, 128), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, wm, 128), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, wm, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, wm, 128), jnp.float32),
        ],
        interpret=interpret,
    )(protos_f, coefs_t, boxes_t)
    return _stats2_out(m, col_any, bottom, d, wm)


SOFT_ROW_TILE = 8  # soft kernel carries ~2x the VPU intermediates per step


def _stats2s_kernel(protos_ref, coefs_ref, boxes_ref, m_ref, colany_ref,
                    bottom_ref, colp_ref, pb_ref, pbelow_ref,
                    *, row_tile: int, w: int, hm: int, row_axis: int = 0):
    """Soft (occupancy-aware) v2 grid step: the _stats2_kernel layout plus the
    sub-cell accumulators, so the dense (D, Hm, Wm) probability tensor never
    touches HBM.

    The dense path (instance_mask_stats_soft_xla) materializes p = sigmoid
    (logits) per instance — 45 MB/frame f32 at the stride-2 deploy geometry
    (368x480 grid, 64 detections) — then makes ~6 reduction passes over it.
    Here each grid step streams ``row_tile`` proto rows once, runs ONE MXU
    matmul against the lane-resident coefficients, and folds every statistic
    into VMEM accumulators.

    Extra outputs vs the binary kernel (contract of
    instance_mask_stats_soft_xla):
      m_ref rows 3..5                  — m00s/m10s/m01s probability moments
      colp_ref   (w, 128)              — per-column max probability
      pb_ref     (w, 128)              — p at the binary bottom row
      pbelow_ref (w, 128)              — p at the row below it (0 past grid)
    bottom_sub's crossing fraction is assembled OUTSIDE the kernel from
    (bottom, p_b, p_below) — same formula as the dense path.

    The bottom/p_b/p_below carry works because grid steps execute in row
    order: a tile-local bottom always supersedes the carried one (rows only
    grow), and a bottom on a tile's LAST row leaves p_below = 0 until the
    next tile's first row fills it (the ``bottom == row0 - 1`` test).

    Validity comes from boxes_ref row 4 (see _stats2_prep): folded-zero
    coefficients give logits == 0 -> sigmoid == 0.5, which would pass the
    occupancy test. Same reason the kernel gates ys < hm explicitly: padded
    proto rows are zeros -> p = 0.5 inside any box that touches y2 == hm.
    """
    step = pl.program_id(row_axis)

    @pl.when(step == 0)
    def _init():
        m_ref[:] = jnp.zeros_like(m_ref)
        colany_ref[:] = jnp.zeros_like(colany_ref)
        bottom_ref[:] = jnp.full_like(bottom_ref, -1.0)
        colp_ref[:] = jnp.zeros_like(colp_ref)
        pb_ref[:] = jnp.zeros_like(pb_ref)
        pbelow_ref[:] = jnp.zeros_like(pbelow_ref)

    s = row_tile * w
    logits = jnp.dot(
        protos_ref[:].astype(jnp.float32), coefs_ref[:],
        preferred_element_type=jnp.float32,
    )  # (S, 128)

    sidx = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
    xs = (sidx % w).astype(jnp.float32)
    row0 = step * row_tile
    ys = (jnp.int32(row0) + sidx // w).astype(jnp.float32)

    x1, y1 = boxes_ref[0:1, :], boxes_ref[1:2, :]
    x2, y2 = boxes_ref[2:3, :], boxes_ref[3:4, :]
    valid = boxes_ref[4:5, :]
    inside = ((xs >= x1) & (xs < x2) & (ys >= y1) & (ys < y2)
              & (ys < jnp.float32(hm)) & (valid > 0.0))
    p = jnp.where(inside, jax.nn.sigmoid(logits), 0.0)  # (S, 128)
    occ = jnp.where(p >= 0.5, 1.0, 0.0)

    m_ref[0:1, :] += jnp.sum(occ, axis=0, keepdims=True)
    m_ref[1:2, :] += jnp.sum(occ * xs, axis=0, keepdims=True)
    m_ref[2:3, :] += jnp.sum(occ * ys, axis=0, keepdims=True)
    m_ref[3:4, :] += jnp.sum(p, axis=0, keepdims=True)
    m_ref[4:5, :] += jnp.sum(p * xs, axis=0, keepdims=True)
    m_ref[5:6, :] += jnp.sum(p * ys, axis=0, keepdims=True)

    occ3 = occ.reshape(row_tile, w, 128)
    p3 = p.reshape(row_tile, w, 128)
    colany_ref[:] = jnp.maximum(colany_ref[:], jnp.max(occ3, axis=0))
    colp_ref[:] = jnp.maximum(colp_ref[:], jnp.max(p3, axis=0))

    # Cross-tile p_below fill FIRST (uses the carried bottom): the previous
    # tile's bottom on its last row reads its below-probability from this
    # tile's first row. Guarded to step > 0: at step 0, row0 - 1 == -1
    # collides with the bottom_ref init sentinel, which would write row-0
    # probabilities into every still-empty column (masked downstream today,
    # but correctness must not hinge on non-local masking).
    pbelow_ref[:] = jnp.where(
        (step > 0) & (bottom_ref[:] == jnp.float32(row0 - 1)),
        p3[0], pbelow_ref[:]
    )

    y3 = (jnp.int32(row0)
          + jax.lax.broadcasted_iota(jnp.int32, (row_tile, w, 128), 0)
          ).astype(jnp.float32)
    tile_bottom = jnp.max(jnp.where(occ3 > 0.0, y3, -1.0), axis=0)  # (w, 128)
    has = tile_bottom >= 0.0
    pb_tile = jnp.sum(jnp.where(y3 == tile_bottom[None], p3, 0.0), axis=0)
    pbelow_tile = jnp.sum(
        jnp.where(y3 == tile_bottom[None] + 1.0, p3, 0.0), axis=0
    )
    bottom_ref[:] = jnp.maximum(bottom_ref[:], tile_bottom)
    pb_ref[:] = jnp.where(has, pb_tile, pb_ref[:])
    pbelow_ref[:] = jnp.where(has, pbelow_tile, pbelow_ref[:])


def _stats2s_out(m, col_any, bottom, col_p, p_b, p_below, d, wm):
    out = _stats2_out(m, col_any, bottom, d, wm)
    bot = out["bottom"]
    p_b = jnp.swapaxes(p_b, -1, -2)[..., :d, :wm]
    p_below = jnp.swapaxes(p_below, -1, -2)[..., :d, :wm]
    frac = jnp.clip((p_b - 0.5) / jnp.maximum(p_b - p_below, 1e-6), 0.0, 1.0)
    out.update({
        "m00s": m[..., 3, :d],
        "m10s": m[..., 4, :d],
        "m01s": m[..., 5, :d],
        "bottom_sub": jnp.where(bot >= 0, bot + frac, -1.0),
        "col_p": jnp.swapaxes(col_p, -1, -2)[..., :d, :wm],
    })
    return out


def _soft_out_shapes(lead, wm):
    f32 = jnp.float32
    return [
        jax.ShapeDtypeStruct(lead + (8, 128), f32),    # m
        jax.ShapeDtypeStruct(lead + (wm, 128), f32),   # col_any
        jax.ShapeDtypeStruct(lead + (wm, 128), f32),   # bottom
        jax.ShapeDtypeStruct(lead + (wm, 128), f32),   # col_p
        jax.ShapeDtypeStruct(lead + (wm, 128), f32),   # p_b
        jax.ShapeDtypeStruct(lead + (wm, 128), f32),   # p_below
    ]


@partial(jax.jit, static_argnames=("interpret",))
def instance_mask_stats_soft_pallas2(
    protos: Array, coefs: Array, boxes_grid: Array, valid: Array,
    interpret: bool | None = None,
) -> dict[str, Array]:
    """Soft v2 fused statistics, single frame. Contract of
    instance_mask_stats_soft_xla."""
    hm, nm = protos.shape[-3], protos.shape[-1]
    protos_f, coefs_t, boxes_t, row_tile, grid, wm, d = _stats2_prep(
        protos, coefs, boxes_grid, valid, row_tile=SOFT_ROW_TILE
    )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s = row_tile * wm
    outs = pl.pallas_call(
        partial(_stats2s_kernel, row_tile=row_tile, w=wm, hm=hm),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((s, nm), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nm, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
        ] + [
            pl.BlockSpec((wm, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
            for _ in range(5)
        ],
        out_shape=_soft_out_shapes((), wm),
        interpret=interpret,
    )(protos_f, coefs_t, boxes_t)
    return _stats2s_out(*outs, d, wm)


@partial(jax.jit, static_argnames=("interpret",))
def instance_mask_stats_soft_pallas2_batched(
    protos: Array, coefs: Array, boxes_grid: Array, valid: Array,
    interpret: bool | None = None,
) -> dict[str, Array]:
    """Batched soft v2: grid (B, row_tiles), one frame's row block per step."""
    hm, nm = protos.shape[-3], protos.shape[-1]
    protos_f, coefs_t, boxes_t, row_tile, grid, wm, d = _stats2_prep(
        protos, coefs, boxes_grid, valid, row_tile=SOFT_ROW_TILE
    )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b = protos.shape[0]
    s = row_tile * wm
    outs = pl.pallas_call(
        partial(_stats2s_kernel, row_tile=row_tile, w=wm, hm=hm, row_axis=1),
        grid=(b, grid),
        in_specs=[
            pl.BlockSpec((None, s, nm), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, nm, 128), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, 128), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, 8, 128), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM)
        ] + [
            pl.BlockSpec((None, wm, 128), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(5)
        ],
        out_shape=_soft_out_shapes((b,), wm),
        interpret=interpret,
    )(protos_f, coefs_t, boxes_t)
    return _stats2s_out(*outs, d, wm)


def instance_mask_stats_xla(
    protos: Array, coefs: Array, boxes_grid: Array, valid: Array
) -> dict[str, Array]:
    """Dense XLA reference with the identical contract (materializes the
    (D, Hm, Wm) mask tensor; used on CPU and as the test oracle)."""
    hm, wm, _ = protos.shape
    # f32 einsum deliberately: a bf16-input einsum is exact only for
    # bf16-origin values and measured SLOWER e2e anyway (2519 vs 2583
    # frames/s at batch 128 — the threshold/reduction pass dominates, not
    # the matmul), as did an h-first reduction restructure. At the stride-2
    # deploy geometry the tensor is 4x bigger and the balance may flip:
    # TTI_MASKSTATS_LOGITS=bf16 halves the materialization (gated A/B).
    dt = _logits_dtype()
    logits = jnp.einsum(
        "dc,hwc->dhw", coefs.astype(dt), protos.astype(dt),
        preferred_element_type=dt,
    ).astype(jnp.float32)
    ys = jnp.arange(hm, dtype=jnp.float32).reshape(1, hm, 1)
    xs = jnp.arange(wm, dtype=jnp.float32).reshape(1, 1, wm)
    inside = (
        (xs >= boxes_grid[:, 0, None, None]) & (xs < boxes_grid[:, 2, None, None])
        & (ys >= boxes_grid[:, 1, None, None]) & (ys < boxes_grid[:, 3, None, None])
    )
    # (A bf16 mask with f32-accumulated sums is exact here but measured
    # SLOWER — mixed-dtype reductions break the multi-output fusion.)
    mask = ((logits > 0.0) & inside & valid[:, None, None]).astype(jnp.float32)
    m00 = jnp.sum(mask, axis=(1, 2))
    m10 = jnp.sum(mask * xs, axis=(1, 2))
    m01 = jnp.sum(mask * ys, axis=(1, 2))
    col_any = jnp.max(mask, axis=1)
    bottom = jnp.max(jnp.where(mask > 0, ys, -1.0), axis=1)
    return {"m00": m00, "m10": m10, "m01": m01, "col_any": col_any, "bottom": bottom}


def instance_mask_stats_soft_xla(
    protos: Array, coefs: Array, boxes_grid: Array, valid: Array
) -> dict[str, Array]:
    """Occupancy-aware (sub-cell) statistics for soft-mask-trained nets.

    A net trained with area-occupancy targets (``tti train --soft-masks``)
    calibrates each boundary proto cell's sigmoid to the fraction of the cell
    the instance covers. The binary 0.5-threshold reductions above then ERODE
    the mask by up to half a cell per side (every boundary cell under 50%
    occupancy drops) — measured as -0.16 mm edge / -0.10 mm width bias at the
    deployment geometry (STATUS.md round-4 "Soft-checkpoint mm tradeoff").
    This variant reads the boundary POSITION out of the occupancy field
    instead: the linear 0.5-crossing between adjacent cell probabilities.
    In the NEAREST-upsample grid conventions used by the measure pipeline, a
    crossing index c maps to input px at q*c + (q-1)/2 — the same mapping as
    block centroids (pipeline._mask_center_to_frame).

    Returns the binary contract dict PLUS:
      m00s/m10s/m01s (D,)  — probability-weighted moments (calibrated area
                             centroid; sub-cell, quantization-free)
      bottom_sub (D, Wm)   — per-column lower-boundary crossing index
                             (float; -1 where the column has no >=0.5 cell)
      col_p (D, Wm)        — per-column max probability (width crossings are
                             computed from it in the pipeline)

    Dense XLA reference; the fused v2 Pallas variant
    (instance_mask_stats_soft_pallas2) carries the identical contract — see
    instance_mask_stats_soft for the measured backend dispatch.
    """
    hm, wm, _ = protos.shape
    # Same TTI_MASKSTATS_LOGITS gate as the binary path, but bf16 by DEFAULT
    # here: the soft reductions make MORE passes over the tensor, so the
    # bytes saving compounds (+8.5% e2e measured at the deploy geometry);
    # sub-cell frac keeps ~1/256-cell resolution in bf16. TTI_MASKSTATS_
    # LOGITS=f32 restores the bit-exact oracle materialization.
    dt = _logits_dtype(soft=True)
    logits = jnp.einsum(
        "dc,hwc->dhw", coefs.astype(dt), protos.astype(dt),
        preferred_element_type=dt,
    ).astype(jnp.float32)
    ys = jnp.arange(hm, dtype=jnp.float32).reshape(1, hm, 1)
    xs = jnp.arange(wm, dtype=jnp.float32).reshape(1, 1, wm)
    inside = (
        (xs >= boxes_grid[:, 0, None, None]) & (xs < boxes_grid[:, 2, None, None])
        & (ys >= boxes_grid[:, 1, None, None]) & (ys < boxes_grid[:, 3, None, None])
    ) & valid[:, None, None]
    p = jnp.where(inside, jax.nn.sigmoid(logits), 0.0)  # (D, H, W)
    mask = (p >= 0.5).astype(jnp.float32)

    # Binary contract (identical semantics to instance_mask_stats_xla: the
    # sigmoid>=0.5 test equals logits>0 up to the boundary tie, which has
    # measure zero for trained weights).
    m00 = jnp.sum(mask, axis=(1, 2))
    m10 = jnp.sum(mask * xs, axis=(1, 2))
    m01 = jnp.sum(mask * ys, axis=(1, 2))
    col_any = jnp.max(mask, axis=1)
    bottom = jnp.max(jnp.where(mask > 0, ys, -1.0), axis=1)

    # Soft moments: probability-weighted sums.
    m00s = jnp.sum(p, axis=(1, 2))
    m10s = jnp.sum(p * xs, axis=(1, 2))
    m01s = jnp.sum(p * ys, axis=(1, 2))

    # Sub-cell lower boundary per column: r_b = bottom-most row with p>=0.5
    # (== bottom above); the 0.5 level-set sits between rows r_b and r_b+1 at
    #   r* = r_b + (p[r_b] - 0.5) / (p[r_b] - p[r_b+1])
    # (p[r_b+1] < 0.5 by construction of r_b; rows past the grid read as 0).
    # One-hot row selects instead of a (D, W, H) transpose + gathers: the
    # equality masks reduce over the SAME (D, H, W) layout as every other
    # statistic, so XLA folds p_b/p_below into the fused reduction passes
    # (the transposed gather materialized a second full-size copy of p).
    # bottom = -1 (empty column) matches no row -> p_b = p_below = 0 and the
    # final where() masks the column; bottom = hm-1 leaves p_below = 0
    # ("nothing below the grid"), identical to the gather formulation.
    p_b = jnp.sum(jnp.where(ys == bottom[:, None, :], p, 0.0), axis=1)
    p_below = jnp.sum(jnp.where(ys == bottom[:, None, :] + 1.0, p, 0.0), axis=1)
    frac = jnp.clip((p_b - 0.5) / jnp.maximum(p_b - p_below, 1e-6), 0.0, 1.0)
    bottom_sub = jnp.where(bottom >= 0, bottom + frac, -1.0)

    return {
        "m00": m00, "m10": m10, "m01": m01,
        "col_any": col_any, "bottom": bottom,
        "m00s": m00s, "m10s": m10s, "m01s": m01s,
        "bottom_sub": bottom_sub, "col_p": jnp.max(p, axis=1),
    }


def subcell_col_extent(col_p: Array) -> tuple[Array, Array, Array]:
    """Sub-cell left/right extent from a per-column max-probability profile.

    col_p: (..., W) in [0, 1]. Returns (left_sub, right_sub, any_occupied):
    crossing indices of the 0.5 level on the rising (left) and falling
    (right) flank around the binary extremes, in the same center-mapped
    units as ``bottom_sub``. Where no column reaches 0.5 the binary
    fallback values (argmax positions) are returned with any_occupied False.
    """
    w = col_p.shape[-1]
    occ = col_p >= 0.5
    any_occ = jnp.any(occ, axis=-1)
    left_i = jnp.argmax(occ, axis=-1)  # first >=0.5 column
    right_i = w - 1 - jnp.argmax(occ[..., ::-1], axis=-1)

    take = lambda idx: jnp.take_along_axis(col_p, idx[..., None], axis=-1)[..., 0]
    p_l = take(left_i)
    p_lprev = jnp.where(left_i > 0, take(jnp.maximum(left_i - 1, 0)), 0.0)
    lfrac = jnp.clip((0.5 - p_lprev) / jnp.maximum(p_l - p_lprev, 1e-6), 0.0, 1.0)
    left_sub = left_i.astype(jnp.float32) - 1.0 + lfrac

    p_r = take(right_i)
    p_rnext = jnp.where(right_i < w - 1, take(jnp.minimum(right_i + 1, w - 1)), 0.0)
    rfrac = jnp.clip((p_r - 0.5) / jnp.maximum(p_r - p_rnext, 1e-6), 0.0, 1.0)
    right_sub = right_i.astype(jnp.float32) + rfrac
    return left_sub, right_sub, any_occ


@jax.custom_batching.custom_vmap
def _stats_pallas_vmappable(
    protos: Array, coefs: Array, boxes_grid: Array, valid: Array
) -> dict[str, Array]:
    """Per-frame Pallas stats whose vmap rule swaps in the batched-grid kernel
    (vmap of a pallas_call would instead block the WHOLE batch per grid step)."""
    return instance_mask_stats_pallas(protos, coefs, boxes_grid, valid)


@_stats_pallas_vmappable.def_vmap
def _stats_pallas_vmap_rule(axis_size, in_batched, protos, coefs, boxes_grid, valid):
    if not all(in_batched):
        # Unbatched operands (never happens on the runtime path: detections and
        # prototypes are both per-frame) — broadcast and use the batched grid.
        bcast = lambda a, b: a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
        protos, coefs, boxes_grid, valid = (
            bcast(a, b)
            for a, b in zip((protos, coefs, boxes_grid, valid), in_batched)
        )
    out = instance_mask_stats_pallas_batched(protos, coefs, boxes_grid, valid)
    return out, {k: True for k in out}


@jax.custom_batching.custom_vmap
def _stats2_vmappable(
    protos: Array, coefs: Array, boxes_grid: Array, valid: Array
) -> dict[str, Array]:
    """v2 per-frame stats whose vmap rule swaps in the batched-grid v2 kernel."""
    return instance_mask_stats_pallas2(protos, coefs, boxes_grid, valid)


@_stats2_vmappable.def_vmap
def _stats2_vmap_rule(axis_size, in_batched, protos, coefs, boxes_grid, valid):
    if not all(in_batched):
        bcast = lambda a, b: a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
        protos, coefs, boxes_grid, valid = (
            bcast(a, b)
            for a, b in zip((protos, coefs, boxes_grid, valid), in_batched)
        )
    out = instance_mask_stats_pallas2_batched(protos, coefs, boxes_grid, valid)
    return out, {k: True for k in out}


@jax.custom_batching.custom_vmap
def _stats2s_vmappable(
    protos: Array, coefs: Array, boxes_grid: Array, valid: Array
) -> dict[str, Array]:
    """Soft v2 per-frame stats whose vmap rule swaps in the batched-grid kernel."""
    return instance_mask_stats_soft_pallas2(protos, coefs, boxes_grid, valid)


@_stats2s_vmappable.def_vmap
def _stats2s_vmap_rule(axis_size, in_batched, protos, coefs, boxes_grid, valid):
    if not all(in_batched):
        bcast = lambda a, b: a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
        protos, coefs, boxes_grid, valid = (
            bcast(a, b)
            for a, b in zip((protos, coefs, boxes_grid, valid), in_batched)
        )
    out = instance_mask_stats_soft_pallas2_batched(protos, coefs, boxes_grid, valid)
    return out, {k: True for k in out}


def instance_mask_stats_soft(
    protos: Array, coefs: Array, boxes_grid: Array, valid: Array
) -> dict[str, Array]:
    """Soft-stats backend dispatch (contract of instance_mask_stats_soft_xla).

    TTI_MASKSTATS=pallas2 routes to the fused soft v2 kernel on TPU (the
    dense probability tensor never hits HBM); default is the dense XLA path
    pending the deploy-geometry A/B (STATUS.md round-4)."""
    import os

    forced = os.environ.get("TTI_MASKSTATS")
    if jax.default_backend() == "tpu":
        if forced == "pallas2":
            if coefs.shape[-2] > 128:
                raise ValueError(
                    "TTI_MASKSTATS=pallas2 supports at most 128 detections "
                    f"(got {coefs.shape[-2]}); lower max_stats_dets"
                )
            return _stats2s_vmappable(protos, coefs, boxes_grid, valid)
        if forced in ("pallas", "pallas_batched"):
            # Those kernels are binary-path only. A silent XLA fallback here
            # would let an A/B record a number for a kernel that never ran —
            # same policy as the binary dispatcher's >128-detections guard.
            raise ValueError(
                f"TTI_MASKSTATS={forced} has no soft-stats kernel; use "
                "pallas2 or unset it (dense XLA soft path)"
            )
    return instance_mask_stats_soft_xla(protos, coefs, boxes_grid, valid)


def instance_mask_stats(
    protos: Array, coefs: Array, boxes_grid: Array, valid: Array
) -> dict[str, Array]:
    """Backend dispatch. TTI_MASKSTATS=pallas|pallas_batched|xla overrides.

    Default is the dense XLA path: at the production batch size the one big
    batched einsum beats the vmapped per-frame Pallas grid (measured 1896 vs
    1737 frames/s e2e at batch 128 on v5e). `pallas` forces the per-frame
    kernel (wins at small batches); `pallas_batched` routes any enclosing vmap
    to the (B, row_tiles)-grid kernel via custom_vmap — the round-3 candidate
    for the batch-128 tail."""
    import os

    forced = os.environ.get("TTI_MASKSTATS")
    if jax.default_backend() == "tpu":
        if forced == "pallas":
            return instance_mask_stats_pallas(protos, coefs, boxes_grid, valid)
        if forced == "pallas_batched":
            return _stats_pallas_vmappable(protos, coefs, boxes_grid, valid)
        if forced == "pallas2":
            if coefs.shape[-2] > 128:
                # The v2 kernel keeps all detections in one lane tile; a
                # silent XLA fallback here would let an A/B record a number
                # for a kernel that never ran.
                raise ValueError(
                    "TTI_MASKSTATS=pallas2 supports at most 128 detections "
                    f"(got {coefs.shape[-2]}); lower max_stats_dets or use "
                    "TTI_MASKSTATS=pallas_batched"
                )
            return _stats2_vmappable(protos, coefs, boxes_grid, valid)
    return instance_mask_stats_xla(protos, coefs, boxes_grid, valid)
