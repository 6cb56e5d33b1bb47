"""Fused undistort + letterbox as one precomputed remap.

The reference never undistorts whole frames (it undistorts individual points,
reference: measurement.py:53-55); the TPU build's north star adds full-frame
rectification ("camera undistortion/rectification ... becomes a fused remap
kernel", BASELINE.json). Design:

- The sampling map is a function of the calibration only, so it is computed
  ONCE per calibration at the *letterboxed model-input* resolution: for each
  destination pixel, un-letterbox to ideal undistorted pixel coordinates, apply
  the forward distortion model, and record the source pixel to sample.
  Undistortion, resize, and letterbox therefore collapse into a single bilinear
  gather per frame — one HBM pass instead of three.
- ``remap_bilinear`` is the pure-XLA implementation (4 gathers + lerp);
  ``PackedRemap`` is the production fast path (packed-u32 gather + SWAR blend).
  A Pallas remap kernel was evaluated and rejected on the current toolchain
  (Mosaic rejects the required in-kernel dynamic gather; see STATUS.md ledger).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tti.calib.geometry import distort_points
from tti.preprocess.letterbox import PAD_VALUE, LetterboxSpec

Array = jax.Array


def build_undistort_letterbox_map(
    K: np.ndarray,
    dist: np.ndarray,
    spec: LetterboxSpec,
    new_K: np.ndarray | None = None,
) -> np.ndarray:
    """Sampling map (dst_h, dst_w, 2) of float32 (x, y) source coordinates.

    new_K: camera matrix of the undistorted view (defaults to K — same framing
    as cv2.undistort's default).
    """
    new_K = K if new_K is None else new_K
    ys, xs = np.meshgrid(
        np.arange(spec.dst_h, dtype=np.float64),
        np.arange(spec.dst_w, dtype=np.float64),
        indexing="ij",
    )
    # Un-letterbox: destination pixel centers -> undistorted source pixels.
    u = (xs - spec.pad_left + 0.5) / spec.scale - 0.5
    v = (ys - spec.pad_top + 0.5) / spec.scale - 0.5
    # Undistorted pixel -> ideal normalized coords under new_K.
    x_n = (u - new_K[0, 2]) / new_K[0, 0]
    y_n = (v - new_K[1, 2]) / new_K[1, 1]
    xy = np.stack([x_n, y_n], axis=-1)
    src = np.asarray(distort_points(jnp.asarray(xy), jnp.asarray(K), jnp.asarray(dist)))
    # Destination pixels outside the letterbox content must sample out-of-bounds
    # (-> pad value), including the case where the distorted lookup would wrap
    # back into the frame.
    content = (
        (xs >= spec.pad_left)
        & (xs < spec.pad_left + spec.new_w)
        & (ys >= spec.pad_top)
        & (ys < spec.pad_top + spec.new_h)
    )
    src = np.where(content[..., None], src, -1e6)
    return src.astype(np.float32)


def remap_bilinear(frames: Array, map_xy: Array, pad_value: float = PAD_VALUE / 255.0) -> Array:
    """Bilinear remap: (B, H, W, C) frames sampled at map_xy (dh, dw, 2).

    Out-of-bounds samples return ``pad_value``. Pure-XLA reference
    implementation (4 flat gathers + lerp); semantics shared with the
    packed-u32 fast path (``PackedRemap``).
    """
    b, h, w, c = frames.shape
    dtype = frames.dtype if jnp.issubdtype(frames.dtype, jnp.floating) else jnp.float32
    frames = frames.astype(dtype)

    mx, my = map_xy[..., 0], map_xy[..., 1]
    x0 = jnp.floor(mx)
    y0 = jnp.floor(my)
    fx = (mx - x0).astype(dtype)[..., None]
    fy = (my - y0).astype(dtype)[..., None]

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi: Array, xi: Array) -> tuple[Array, Array]:
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        flat_idx = (yc * w + xc).reshape(-1)
        vals = jnp.take(frames.reshape(b, h * w, c), flat_idx, axis=1)
        return vals.reshape(b, *map_xy.shape[:2], c), inb[..., None]

    v00, m00 = gather(y0i, x0i)
    v01, m01 = gather(y0i, x0i + 1)
    v10, m10 = gather(y0i + 1, x0i)
    v11, m11 = gather(y0i + 1, x0i + 1)

    pad = jnp.asarray(pad_value, dtype)
    v00 = jnp.where(m00, v00, pad)
    v01 = jnp.where(m01, v01, pad)
    v10 = jnp.where(m10, v10, pad)
    v11 = jnp.where(m11, v11, pad)

    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy


def scaled_intrinsics(K: np.ndarray, spec: LetterboxSpec) -> np.ndarray:
    """Camera matrix expressed in letterboxed-image pixel coordinates.

    Letterboxing maps frame pixel centers x_f -> (x_f + 0.5) * s - 0.5 + pad, so
    focal lengths scale by s and principal points follow the same affine.
    """
    Ks = np.asarray(K, np.float64).copy()
    s = spec.scale
    Ks[0, 0] *= s
    Ks[1, 1] *= s
    Ks[0, 1] *= s
    Ks[0, 2] = (Ks[0, 2] + 0.5) * s - 0.5 + spec.pad_left
    Ks[1, 2] = (Ks[1, 2] + 0.5) * s - 0.5 + spec.pad_top
    return Ks


def build_small_undistort_map(
    K: np.ndarray, dist: np.ndarray, spec: LetterboxSpec, unpadded_src: bool = False
) -> np.ndarray:
    """Sampling map for undistorting the *letterboxed* image in place
    ((dst_h, dst_w) -> (dst_h, dst_w) source coords in letterboxed space).

    Production uses this two-stage preprocess — XLA's strided-conv resize for
    the letterbox, then a remap over the SMALL operand — because gather cost on
    TPU scales with operand locality: measured 6.0 ms/frame for the single-pass
    1080p-operand remap vs 1.8 ms/frame for letterbox+small remap at identical
    output quality (bilinear-of-bilinear vs fused bilinear differ at the
    interpolation-kernel level only).
    """
    Ks = scaled_intrinsics(K, spec)
    ident = LetterboxSpec(
        src_h=spec.dst_h, src_w=spec.dst_w, dst_h=spec.dst_h, dst_w=spec.dst_w,
        scale=1.0, new_h=spec.dst_h, new_w=spec.dst_w, pad_top=0, pad_left=0,
    )
    m = build_undistort_letterbox_map(Ks, dist, ident)
    if unpadded_src:
        # Source coordinates relative to the UNPADDED resized content
        # (letterbox_content): taps into the pad border go out of bounds and
        # resolve to PackedRemap's pad word, which equals the letterbox pad
        # value — bit-identical output, 44% smaller pack/gather operand for a
        # 16:9 frame in a square input.
        live = m > -1e5  # keep the out-of-content sentinel rows sentinel
        m = np.where(live, m - np.array([spec.pad_left, spec.pad_top], np.float32), m)
    return m


def undistort_letterbox_frames(
    frames_bgr_u8: Array, map_xy: Array, dtype=jnp.float32
) -> Array:
    """uint8 BGR frames -> normalized RGB undistorted letterboxed frames, in one
    remap pass. ``map_xy`` is a full-resolution-operand map
    (build_undistort_letterbox_map). Prefer the two-stage
    :func:`letterbox_then_undistort` in production (see
    build_small_undistort_map for the measured rationale)."""
    x = frames_bgr_u8[..., ::-1].astype(dtype) / 255.0
    return remap_bilinear(x, jnp.asarray(map_xy))


class PackedRemap:
    """Precomputed remap that packs RGB u8 into one uint32 word per pixel so the
    bilinear gather fetches 4 words instead of 12 channel elements — measured
    2.0x over the f32 remap on v5e (12.3 vs 24.8 ms for a 16x640x640 batch;
    TPU gather cost is per-fetch). Out-of-bounds taps route to a dedicated pad
    word, reproducing remap_bilinear's border behavior; packing quantizes to
    8 bits (<=0.002 abs), far below the bf16 model-input precision.
    """

    def __init__(self, map_xy: np.ndarray, src_hw: tuple[int, int],
                 pad_value: float = PAD_VALUE / 255.0, interp: str = "bilinear") -> None:
        if interp not in ("bilinear", "nearest"):
            raise ValueError(f"interp must be bilinear|nearest, got {interp!r}")
        self.interp = interp
        h, w = src_hw
        mx = np.asarray(map_xy[..., 0], np.float64)
        my = np.asarray(map_xy[..., 1], np.float64)

        # Letterbox pad rows map entirely out of bounds; skip gathering them
        # and emit static pad rows instead. Default ON: at the production
        # batch size the avoided gather rows (44% of the map for 16:9 in a
        # square input) dominate the pad/concat cost — measured 2247 vs 1896
        # frames/s e2e at batch 128 on v5e. (At batch 16 the same A/B read as
        # a small loss — dispatch-floor noise.) TTI_REMAP_SKIP_PAD_ROWS=0
        # opts out (full-height gather).
        import os

        if os.environ.get("TTI_REMAP_SKIP_PAD_ROWS", "1") != "0":
            row_live = ~np.all(
                (mx < -1) | (my < -1) | (mx >= w + 1) | (my >= h + 1), axis=1
            )
        else:
            row_live = np.ones(map_xy.shape[0], bool)
        live = np.nonzero(row_live)[0]
        self.row_start = int(live.min()) if live.size else 0
        self.row_stop = int(live.max()) + 1 if live.size else 0
        mx = mx[self.row_start : self.row_stop]
        my = my[self.row_start : self.row_stop]

        x0 = np.floor(mx)
        y0 = np.floor(my)
        self.fx = jnp.asarray((mx - x0).astype(np.float32))[None, :, :, None]
        self.fy = jnp.asarray((my - y0).astype(np.float32))[None, :, :, None]
        # 8-bit lerp weights for the SWAR integer blend (see __call__): the
        # weight quantization moves the effective sample position by < 1/256
        # px, below the 8-bit packing quantization already on this path.
        self.wx8 = jnp.asarray(
            np.round((mx - x0) * 256.0).astype(np.uint32).reshape(-1)
        )[None, :]
        self.wy8 = jnp.asarray(
            np.round((my - y0) * 256.0).astype(np.uint32).reshape(-1)
        )[None, :]
        pad_idx = h * w  # one-past-the-end sentinel -> pad word

        def tap(yi: np.ndarray, xi: np.ndarray) -> np.ndarray:
            inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            flat = np.clip(yi, 0, h - 1) * w + np.clip(xi, 0, w - 1)
            return np.where(inb, flat, pad_idx).astype(np.int32)

        if self.interp == "nearest":
            # Single tap at the rounded position: 1/4 the gather fetches for
            # deployments that trade interpolation smoothness for speed.
            self.idx = (jnp.asarray(tap(np.round(my), np.round(mx)).reshape(-1)),)
        else:
            self.idx = tuple(
                jnp.asarray(tap(y0 + dy, x0 + dx).reshape(-1))
                for dy in (0, 1) for dx in (0, 1)
            )
        self.pad_value = pad_value
        pad_u8 = int(round(pad_value * 255.0))
        self.pad_word = np.uint32(pad_u8 | (pad_u8 << 8) | (pad_u8 << 16))
        self.src_hw = (h, w)
        self.dst_hw = map_xy.shape[:2]
        self.live_hw = (self.row_stop - self.row_start, map_xy.shape[1])

    def __call__(self, x: Array) -> Array:
        """(B, H, W, 3) float [0,1] -> (dst_h, dst_w) remapped, same dtype."""
        b = x.shape[0]
        h, w = self.src_hw
        # Quantize via f32: bf16 can't represent the x.5 rounding offsets above
        # 128, which would bias the 8-bit packing by up to 1 LSB.
        u8 = jnp.clip(x.astype(jnp.float32) * 255.0 + 0.5, 0, 255).astype(jnp.uint32)
        packed = u8[..., 0] | (u8[..., 1] << 8) | (u8[..., 2] << 16)
        return self.apply_packed(packed.reshape(b, h * w), x.dtype)

    def pack_decimated_u8(self, frames_bgr_u8: Array, row0: int, col0: int, k: int) -> Array:
        """Pack directly from uint8 BGR frames with a fused k-stride
        decimation: packed[y, x] = pixel (row0 + k*y, col0 + k*x), RGB order.
        Bit-identical to letterbox_content + __call__'s quantize when the
        resize is an exact decimation (decimation_stride) — u8 values survive
        the /255 -> *255 round trip exactly — with no float resize pass at
        all."""
        h, w = self.src_hw
        sub = frames_bgr_u8[:, row0 :: k, col0 :: k, :][:, :h, :w, :].astype(jnp.uint32)
        packed = sub[..., 2] | (sub[..., 1] << 8) | (sub[..., 0] << 16)  # BGR -> RGB bytes
        return packed.reshape(frames_bgr_u8.shape[0], h * w)

    def apply_packed(self, packed: Array, out_dtype) -> Array:
        """(B, src_h*src_w) packed u32 words -> (B, dst_h, dst_w, 3) out_dtype."""
        b = packed.shape[0]
        h, w = self.src_hw
        x = jnp.zeros((), out_dtype)  # dtype carrier for the shared body below
        flat = jnp.concatenate(
            [packed, jnp.full((b, 1), self.pad_word, jnp.uint32)], axis=1
        )

        def unpack(words: Array) -> Array:
            v = words.reshape(b, *self.live_hw)
            return jnp.stack(
                [(v & 0xFF), ((v >> 8) & 0xFF), ((v >> 16) & 0xFF)], axis=-1
            ).astype(x.dtype) / 255.0

        import os

        swar = os.environ.get("TTI_REMAP_SWAR", "1") != "0"
        if self.interp == "nearest":
            live = unpack(jnp.take(flat, self.idx[0], axis=1))
        elif swar:
            # SWAR integer bilinear: lerp the packed words directly in two
            # 16-bit-spaced fields (R|B in bytes 0/2, G in byte 1) with 8-bit
            # weights and round-to-nearest, unpacking to float ONCE at the
            # end. Field products fit u32: 0xFF * 256 = 0xFF00 per field, no
            # cross-field carry (0xFF00 + 0x80 rounding < 0x10000). Replaces
            # 4 unpacks + 9 f32 channel lerps with ~30 u32 lane ops.
            def xl(v0: Array, v1: Array, wq: Array) -> Array:
                rb0, rb1 = v0 & 0x00FF00FF, v1 & 0x00FF00FF
                g0, g1 = v0 & 0x0000FF00, v1 & 0x0000FF00
                rb = ((rb0 * (256 - wq) + rb1 * wq + 0x00800080) >> 8) & 0x00FF00FF
                g = ((g0 * (256 - wq) + g1 * wq + 0x00008000) >> 8) & 0x0000FF00
                return rb | g

            v00 = jnp.take(flat, self.idx[0], axis=1)
            v01 = jnp.take(flat, self.idx[1], axis=1)
            v10 = jnp.take(flat, self.idx[2], axis=1)
            v11 = jnp.take(flat, self.idx[3], axis=1)
            live = unpack(xl(xl(v00, v01, self.wx8), xl(v10, v11, self.wx8), self.wy8))
        else:
            v00 = unpack(jnp.take(flat, self.idx[0], axis=1))
            v01 = unpack(jnp.take(flat, self.idx[1], axis=1))
            v10 = unpack(jnp.take(flat, self.idx[2], axis=1))
            v11 = unpack(jnp.take(flat, self.idx[3], axis=1))
            top = v00 * (1.0 - self.fx) + v01 * self.fx
            bot = v10 * (1.0 - self.fx) + v11 * self.fx
            live = top * (1.0 - self.fy) + bot * self.fy
        # Re-attach the static pad rows.
        dst_h = self.dst_hw[0]
        return jnp.pad(
            live,
            ((0, 0), (self.row_start, dst_h - self.row_stop), (0, 0), (0, 0)),
            constant_values=jnp.asarray(self.pad_value, x.dtype),
        )


def letterbox_then_undistort(
    frames_bgr_u8: Array, spec: LetterboxSpec, small_remap: "PackedRemap | Array",
    dtype=jnp.float32,
) -> Array:
    """Two-stage production preprocess: fused flip+normalize+letterbox (with the
    integer-decimation fast path), then the small-operand undistort remap
    (packed-u32 fast path when given a PackedRemap; f32 remap when given a raw
    map array). A PackedRemap built over the unpadded content
    (build_small_undistort_map(unpadded_src=True)) skips materializing the
    letterbox padding entirely."""
    import os

    from tti.preprocess.letterbox import decimation_stride, letterbox_content, letterbox_u8

    from tti.preprocess.warp2pass import TwoPassWarp

    if isinstance(small_remap, TwoPassWarp):
        # MXU path: two separable banded matmuls over the unpadded content —
        # same input construction as InspectionPipeline.preprocess so both
        # entry points feed the warp identically. A column-expanded warp
        # (col_expand) consumes row-sliced FULL-WIDTH frames (pass 1 performs
        # the column resample); otherwise decimated letterbox content.
        if small_remap.col_expand is not None:
            from tti.preprocess.letterbox import bgr_to_rgb, normalize

            k, off, _ = small_remap.col_expand
            rows = frames_bgr_u8[:, off::k, :, :][:, : spec.new_h]
            return small_remap(normalize(bgr_to_rgb(rows), dtype))
        return small_remap(letterbox_content(frames_bgr_u8, spec, dtype,
                                             decimate=True))
    if isinstance(small_remap, PackedRemap):
        if small_remap.src_hw == (spec.new_h, spec.new_w):
            k = decimation_stride(spec)
            if k is not None and os.environ.get("TTI_REMAP_U8_DECIMATE") == "1":
                # Fuse the exact integer decimation into the u32 pack: no
                # float resize pass at all (bit-identical, see
                # pack_decimated_u8). Measured at batch 128: 2870 vs 2915
                # frames/s (the strided u8 read relayout costs more than the
                # float resize it removes) but single-frame p50 HALVES
                # (4.8 vs 9.4 ms) -> off by default, enable for
                # latency-critical small-batch deployments.
                off = (k - 1) // 2
                packed = small_remap.pack_decimated_u8(frames_bgr_u8, off, off, k)
                return small_remap.apply_packed(packed, dtype)
            return small_remap(letterbox_content(frames_bgr_u8, spec, dtype))
        return small_remap(letterbox_u8(frames_bgr_u8, spec, dtype))
    return remap_bilinear(letterbox_u8(frames_bgr_u8, spec, dtype), jnp.asarray(small_remap))
