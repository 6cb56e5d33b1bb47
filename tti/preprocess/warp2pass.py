"""Undistort remap as two separable banded matmuls (MXU path).

The packed-u32 gather remap (tti.preprocess.remap.PackedRemap) is bound by
TPU gather throughput: ~10 ms of the 32 ms production step at batch 128 is
4-tap gathers. TPUs move 100x more flops through the MXU than through gather
units, so this module re-expresses the warp as the classic Catmull-Smith
two-pass mesh decomposition:

  pass 1 (horizontal): I1[y, xo]  = sum_w  src[y, w] * W1[y, w, xo]
  pass 2 (vertical):   out[v, xo] = sum_y  I1[y, xo] * W2[xo, v, y]

where W1 samples row y at sx*(xo, y) — the horizontal source map re-indexed
through the per-column INVERSE of the vertical map — and W2 samples column xo
at sy(xo, v). Each weight row holds one 2-tap bilinear kernel; the matrices
are dense (MXU flops are cheap; the band structure is not worth a custom
kernel at these sizes). Out-of-bounds taps get zero weight, and the input is
shifted by the 114-gray pad value so zero-weight rows resolve to the border
color — identical border semantics to remap_bilinear.

Exactness: the DECOMPOSITION is exact for the sampling positions; the only
deviation from single-pass bilinear is the interpolation kernel (the two
1-D lerps sample sx* at the two neighboring integer rows instead of at sy
itself). For the deployment calibration the measured difference is sub-LSB
(see STATUS ledger / tests/test_warp2pass.py).

Builder precondition: the vertical map must be strictly monotonic per column
(true for any physical lens model); the builder asserts and callers fall back
to the gather path if violated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tti.preprocess.letterbox import PAD_VALUE

Array = jax.Array

_SENTINEL = -1e5  # matches build_undistort_letterbox_map's OOB marker scale


class TwoPassWarp:
    """Precompiled two-pass warp for one calibration + letterbox geometry."""

    def __init__(
        self,
        map_xy: np.ndarray,  # (dst_h, dst_w, 2) source coords in content space
        src_hw: tuple[int, int],
        pad_value: float = PAD_VALUE / 255.0,
        weight_dtype=None,
        col_expand: tuple[int, int, int] | None = None,  # (k, off, full_w)
        block: int | None = None,
        s2d_out: bool = False,
    ) -> None:
        """col_expand=(k, off, full_w): fold the letterbox's exact integer
        COLUMN decimation (full col = off + k*content_col) into pass 1 by
        scattering its kernels onto the full-resolution column grid — the
        einsum then consumes ROW-SLICED full-width frames (contiguous DMA)
        and the stride-k column access disappears entirely. Exactly
        equivalent: the expanded kernels sample the same decimated pixels.

        s2d_out: emit the warped frame already space-to-depth-2 blocked,
        (B, dst_h/2, dst_w/2, 4C), matching tti.model.yolo.space_to_depth2
        exactly. Pass 2 is the SAME batched matmul (the batch dim o just
        splits into (o2, phase)), but the 2x2 interleave happens in the dot's
        output permutation instead of a standalone relayout copy, and the
        letterbox row padding folds into zero weight rows — both the
        (B, H/2, 2, W/2, 2, C) transpose copy and the pad op vanish from the
        step. Requires even dst dims (stride-32 letterbox targets are)."""
        if weight_dtype is None:
            # bf16 weights (8 mantissa bits — the same fractional precision
            # the packed-u32 gather path quantizes to) except on CPU, whose
            # XLA runtime cannot execute bf16 dots.
            weight_dtype = (jnp.float32 if jax.default_backend() == "cpu"
                            else jnp.bfloat16)
        self.src_hw = src_hw
        self.pad_value = float(pad_value)
        hs, ws = src_hw
        dst_h, dst_w = map_xy.shape[:2]
        self.dst_hw = (dst_h, dst_w)

        mx = np.asarray(map_xy[..., 0], np.float64)
        my = np.asarray(map_xy[..., 1], np.float64)
        live_row = ~np.all((mx < _SENTINEL) | (my < _SENTINEL), axis=1)
        live = np.nonzero(live_row)[0]
        self.row_start = int(live.min()) if live.size else 0
        self.row_stop = int(live.max()) + 1 if live.size else 0
        mx = mx[self.row_start : self.row_stop]
        my = my[self.row_start : self.row_stop]
        ho, wo = mx.shape

        col_live = ~np.all((mx < _SENTINEL) | (my < _SENTINEL), axis=0)
        sent = (mx < _SENTINEL) | (my < _SENTINEL)

        # Vertical monotonicity per live column (physical lens maps are).
        dmy = np.diff(my, axis=0)
        if np.any(dmy[:, col_live] <= 0):
            raise ValueError("vertical map not strictly monotonic per column")

        # sx*(xo, y): horizontal source position for INTERMEDIATE row y of
        # column xo — the horizontal map evaluated at the output row that
        # lands on source row y (per-column inverse of the vertical map).
        ys = np.arange(hs, dtype=np.float64)
        yo_grid = np.arange(ho, dtype=np.float64)
        sxstar = np.zeros((hs, wo), np.float64)
        for xo in range(wo):
            if not col_live[xo]:
                continue
            yo_hat = np.interp(ys, my[:, xo], yo_grid)  # clamped outside range
            sxstar[:, xo] = np.interp(yo_hat, yo_grid, mx[:, xo])

        # W1: (hs, ws, wo) — row-y horizontal 2-tap kernels.
        w1 = np.zeros((hs, ws, wo), np.float32)
        x0 = np.floor(sxstar).astype(np.int64)
        fx = (sxstar - x0).astype(np.float32)
        rows = np.broadcast_to(ys.astype(np.int64)[:, None], (hs, wo))
        cols = np.broadcast_to(np.arange(wo)[None, :], (hs, wo))
        for tap, wgt in ((x0, 1.0 - fx), (x0 + 1, fx)):
            ok = (tap >= 0) & (tap < ws) & col_live[None, :]
            np.add.at(w1, (rows[ok], tap[ok], cols[ok]), wgt[ok])

        # W2: (wo, ho, hs) — column-xo vertical 2-tap kernels; sentinel
        # output pixels keep all-zero rows (-> pad).
        w2 = np.zeros((wo, ho, hs), np.float32)
        y0 = np.floor(my).astype(np.int64)
        fy = (my - y0).astype(np.float32)
        vrows = np.broadcast_to(yo_grid.astype(np.int64)[:, None], (ho, wo))
        vcols = np.broadcast_to(np.arange(wo)[None, :], (ho, wo))
        for tap, wgt in ((y0, 1.0 - fy), (y0 + 1, fy)):
            ok = (tap >= 0) & (tap < hs) & ~sent
            np.add.at(w2, (vcols[ok], vrows[ok], tap[ok]), wgt[ok])

        self.col_expand = col_expand
        if col_expand is not None:
            k, off, full_w = col_expand
            w1_full = np.zeros((hs, full_w, wo), np.float32)
            w1_full[:, off : off + k * ws : k, :] = w1
            w1 = w1_full

        self.s2d_out = s2d_out
        if s2d_out:
            if dst_h % 2 or wo % 2:
                raise ValueError("s2d_out requires even dst dims")
            # Fold the letterbox row padding into all-zero kernel rows: padded
            # output rows resolve to pad_value exactly like jnp.pad did, and
            # pass 2 then covers the FULL dst canvas so the 2x2 blocking is a
            # uniform reshape of its output dims.
            w2_full = np.zeros((wo, dst_h, hs), np.float32)
            w2_full[:, self.row_start : self.row_stop] = w2
            w2 = w2_full
            ho = dst_h

        # Blocked/banded factorization (exact): each 2-tap kernel row is
        # nonzero only near the warp diagonal, so for a BLOCK of output
        # columns the live source-column window is narrow (block width +
        # local distortion displacement). Slicing the dense matrices down to
        # those windows drops >75% of the per-step weight HBM read — the only
        # per-step cost that does NOT amortize with batch — at identical
        # numerics (the dropped entries are exactly zero). Same story for
        # pass 2 over output-row blocks. Gated TTI_WARP_BLOCKED (runtime).
        self.block = block
        if block is not None:
            if s2d_out and block % 2:
                raise ValueError("s2d_out blocked mode needs an even block")
            self._w1_blocks: list[tuple[int, Array]] = []
            self._w2_blocks: list[tuple[int, Array]] = []
            src_w = w1.shape[1]
            for o0 in range(0, wo, block):
                blk = w1[:, :, o0 : o0 + block]
                live_c = np.nonzero(np.any(blk != 0.0, axis=(0, 2)))[0]
                c0, c1 = ((0, min(16, src_w)) if live_c.size == 0 else
                          (int(live_c.min()), int(live_c.max()) + 1))
                c0 = (c0 // 16) * 16  # sublane-aligned window start
                self._w1_blocks.append(
                    (c0, jnp.asarray(blk[:, c0:c1], weight_dtype)))
            for v0 in range(0, ho, block):
                blk = w2[:, v0 : v0 + block, :]
                live_y = np.nonzero(np.any(blk != 0.0, axis=(0, 1)))[0]
                y0, y1 = ((0, min(16, hs)) if live_y.size == 0 else
                          (int(live_y.min()), int(live_y.max()) + 1))
                y0 = (y0 // 16) * 16
                blk = blk[:, :, y0:y1]
                if s2d_out:  # (o, v, y) -> (o2, do, v2, dv, y)
                    blk = blk.reshape(wo // 2, 2, blk.shape[1] // 2, 2, -1)
                self._w2_blocks.append((y0, jnp.asarray(blk, weight_dtype)))
            self.weight_bytes = sum(
                int(np.prod(w.shape)) * w.dtype.itemsize
                for _, w in self._w1_blocks + self._w2_blocks)
            self.w1 = self.w2 = None
            return
        if s2d_out:  # (o, v, y) -> (o2, do, v2, dv, y)
            w2 = w2.reshape(wo // 2, 2, ho // 2, 2, hs)
        self.w1 = jnp.asarray(w1, weight_dtype)
        self.w2 = jnp.asarray(w2, weight_dtype)
        self.weight_bytes = (self.w1.size * self.w1.dtype.itemsize
                             + self.w2.size * self.w2.dtype.itemsize)

    @property
    def weights(self):
        """Pass these as JIT ARGUMENTS, never close over them: captured
        weight tensors serialize into the program as constants (hundreds of
        MB of HLO — breaches remote-compile request limits). Dense mode:
        (w1, w2); blocked mode: (tuple_of_w1_blocks, tuple_of_w2_blocks)."""
        if self.block is not None:
            return (tuple(w for _, w in self._w1_blocks),
                    tuple(w for _, w in self._w2_blocks))
        return (self.w1, self.w2)

    def apply(self, content: Array, weights=None) -> Array:
        """(B, hs, ws, C) content -> (B, dst_h, dst_w, C) warped + padded;
        s2d_out mode returns (B, dst_h/2, dst_w/2, 4C) pre-blocked instead."""
        w1, w2 = weights if weights is not None else self.weights
        dtype = content.dtype
        pad = jnp.asarray(self.pad_value, jnp.float32)
        s2d = self.s2d_out
        if self.block is not None:
            wdt = w1[0].dtype
            x = content.astype(wdt) - pad.astype(wdt)
            i1 = jnp.concatenate([
                jnp.einsum("bywc,ywo->byoc", x[:, :, c0 : c0 + w.shape[1]], w,
                           preferred_element_type=jnp.float32)
                for (c0, _), w in zip(self._w1_blocks, w1)
            ], axis=2).astype(wdt)
            if s2d:
                i1 = i1.reshape(i1.shape[0], i1.shape[1], -1, 2, i1.shape[3])
                out = jnp.concatenate([
                    jnp.einsum("byodc,odvey->bvoedc",
                               i1[:, y0 : y0 + w.shape[4]], w,
                               preferred_element_type=jnp.float32)
                    for (y0, _), w in zip(self._w2_blocks, w2)
                ], axis=1)
            else:
                out = jnp.concatenate([
                    jnp.einsum("byoc,ovy->bvoc", i1[:, y0 : y0 + w.shape[2]], w,
                               preferred_element_type=jnp.float32)
                    for (y0, _), w in zip(self._w2_blocks, w2)
                ], axis=1)
        else:
            x = content.astype(w1.dtype) - pad.astype(w1.dtype)
            i1 = jnp.einsum("bywc,ywo->byoc", x, w1,
                            preferred_element_type=jnp.float32)
            i1 = i1.astype(w2.dtype)
            if s2d:
                i1 = i1.reshape(i1.shape[0], i1.shape[1], -1, 2, i1.shape[3])
                out = jnp.einsum("byodc,odvey->bvoedc", i1, w2,
                                 preferred_element_type=jnp.float32)
            else:
                out = jnp.einsum("byoc,ovy->bvoc", i1, w2,
                                 preferred_element_type=jnp.float32)
        if s2d:
            # (b, v2, o2, dv, do, c) -> channel index (dv*2 + do)*C + c,
            # exactly space_to_depth2's order; row padding is already baked
            # into the zero weight rows.
            b, v2, o2, dv, do, c = out.shape
            return (out + pad).astype(dtype).reshape(b, v2, o2, dv * do * c)
        out = (out + pad).astype(dtype)
        dst_h, _ = self.dst_hw
        return jnp.pad(
            out,
            ((0, 0), (self.row_start, dst_h - self.row_stop), (0, 0), (0, 0)),
            constant_values=jnp.asarray(self.pad_value, dtype),
        )

    def apply_pass2_ycbo(self, i1: Array, weights=None, out_dtype=None) -> Array:
        """Pass 2 over a pass-1 intermediate in (y, c, b, o) layout — what the
        fused Pallas pass-1 kernel (tti.kernels.warp_p1) emits. Same batched
        matmul as apply()'s pass 2 with lhs free dims (c, b) instead of
        (b, c); dense weights only (the kernel path implies dense pass 1)."""
        if self.block is not None:
            raise NotImplementedError("pass-2-from-i1 requires dense weights")
        _, w2 = weights if weights is not None else self.weights
        dtype = out_dtype or i1.dtype
        pad = jnp.asarray(self.pad_value, jnp.float32)
        i1 = i1.astype(w2.dtype)
        if self.s2d_out:
            y, c, b, o = i1.shape
            i1r = i1.reshape(y, c, b, o // 2, 2)
            out = jnp.einsum("ycbod,odvey->bvoedc", i1r, w2,
                             preferred_element_type=jnp.float32)
            b, v2, o2, dv, do, c = out.shape
            return (out + pad).astype(dtype).reshape(b, v2, o2, dv * do * c)
        out = jnp.einsum("ycbo,ovy->bvoc", i1, w2,
                         preferred_element_type=jnp.float32)
        out = (out + pad).astype(dtype)
        dst_h, _ = self.dst_hw
        return jnp.pad(
            out,
            ((0, 0), (self.row_start, dst_h - self.row_stop), (0, 0), (0, 0)),
            constant_values=jnp.asarray(self.pad_value, dtype),
        )

    __call__ = apply
