"""Device-side training augmentation (mosaic / affine / HSV / flip) as one
jitted XLA program.

Why on device: the deployment hosts driving a TPU are small (this build
machine has ONE vCPU), and the Ultralytics-style host recipe — per-sample
cv2 mosaic + warpAffine + HSV — costs seconds per image there, starving a
~5 ms/step accelerator. The TPU-native design keeps the ENTIRE dataset
resident in HBM (a 320-image textile set is ~0.5 GB as uint8) and runs the
whole augmentation chain as gathers/elementwise inside XLA; the host's
per-step work is nothing but dispatch.

Semantics mirror tti.train.data's host recipe (itself the Ultralytics
train-time default: mosaic4, random scale ±0.5 + translate ±0.1, HSV
h=0.015/s=0.7/v=0.4, hflip 0.5):

  * mosaic4: 2Sx2S canvas of 4 dataset images, cropped back to SxS around a
    jittered center — here the crop is FUSED into the affine gather, so the
    canvas is sampled exactly once per output pixel (bilinear, border 114).
  * ground truth transforms analytically (the affine is axis-aligned):
    boxes map corner-to-corner; proto-resolution masks are re-gathered
    through the same output->canvas mapping (nearest).
  * HSV jitter runs in float RGB (cv2 applies u8 LUTs; equal in
    distribution, sub-LSB different per pixel).

The dense-candidate bound: a mosaic draws 4 images x G GT slots; candidates
beyond the output's G slots are dropped by validity-first top-k, exactly like
the host path's max_gt cap.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from tti.train.step import Targets

Array = jax.Array

PAD_GRAY = 114.0 / 255.0


def _image_dtype(default=jnp.float32):
    """Compute dtype for the augment IMAGE chain (canvas resample + HSV).

    The chain is pure bandwidth: canvas f32 (1.2 GB/step at batch 64/640px)
    through two separable resample matmuls and the HSV elementwise pass,
    landing in a (B, S, S, 3) buffer the bf16 forward re-casts anyway.
    bf16 runs it end to end in bf16 — half the HBM bytes, 2x the MXU rate on
    the resample matmuls (measured -16 ms/iter at batch 64/640px, round 5).
    Pixel effect is sub-1/255 rounding on values the u8 source quantized to
    1/255 already; GT (boxes/masks) stays f32 regardless.

    `default` comes from the caller (make_augment_fn's image_dtype — the
    trainer passes its compute dtype, so bf16 training gets the bf16 chain
    automatically); TTI_AUGMENT_DTYPE=bf16|f32 forces either way. Read at
    trace time like the other TTI_* gates."""
    import os

    v = os.environ.get("TTI_AUGMENT_DTYPE")
    if v == "bf16":
        return jnp.bfloat16
    if v in ("f32", "fp32", "float32"):
        return jnp.float32
    return default


@flax.struct.dataclass
class DeviceDataset:
    """The whole training set, device-resident (uint8 images + padded GT)."""

    images: Array  # (N, S, S, 3) uint8 RGB
    boxes: Array  # (N, G, 4) f32 xyxy px at S
    classes: Array  # (N, G) int32
    masks: Array  # (N, G, Sm, Sm) uint8, proto res (S/mask_stride); 0/1
    #               cells by default, 0..255 occupancy fractions when soft
    valid: Array  # (N, G) bool
    # Static (non-pytree) flag: masks hold u8-quantized area-occupancy
    # FRACTIONS (soft targets) instead of 0/1 cells. Changes how the augment
    # resamples them (no threshold) — part of the jit cache key by design.
    # True = every class soft (legacy); a tuple of class ids = per-class
    # (those classes soft, the rest binary — the augment thresholds each GT
    # slot by its class); False/() = all binary.
    soft: bool | tuple = flax.struct.field(pytree_node=False, default=False)

    @property
    def imgsz(self) -> int:
        return self.images.shape[1]


def build_device_dataset(samples, imgsz: int, max_gt: int,
                         mask_stride: int = 4,
                         soft_masks=False) -> DeviceDataset:
    """Decode + rasterize the dataset ONCE on host, upload to device.

    soft_masks: store area-occupancy fractions (rasterize_polygon_soft,
    quantized to u8 — same HBM footprint) instead of binary cells. Accepts
    every tti.train.data.soft_class_ids spelling; per-class values ("stitch")
    rasterize only those classes soft and the DeviceDataset carries the id
    tuple so the augment resample thresholds the binary classes only. See the
    soft-target rationale in tti.train.data.rasterize_polygon_soft."""
    from tti.train.data import (_load_resized_u8, rasterize_polygon,
                                rasterize_polygon_soft, soft_class_ids)

    soft_ids = soft_class_ids(soft_masks)
    n = len(samples)
    sm = imgsz // mask_stride
    images = np.zeros((n, imgsz, imgsz, 3), np.uint8)
    boxes = np.zeros((n, max_gt, 4), np.float32)
    classes = np.zeros((n, max_gt), np.int32)
    masks = np.zeros((n, max_gt, sm, sm), np.uint8)
    valid = np.zeros((n, max_gt), bool)
    all_soft = bool(soft_ids) and all(
        c in soft_ids for s in samples for c in s.classes)
    for i, s in enumerate(samples):
        images[i] = _load_resized_u8(s.image_path, imgsz)
        for g, (poly, cls) in enumerate(zip(s.polygons[:max_gt], s.classes[:max_gt])):
            p = np.clip(poly, 0.0, 1.0)
            boxes[i, g] = [p[:, 0].min() * imgsz, p[:, 1].min() * imgsz,
                           p[:, 0].max() * imgsz, p[:, 1].max() * imgsz]
            classes[i, g] = cls
            if cls in soft_ids:
                frac = rasterize_polygon_soft(p, (sm, sm), mask_stride)
                masks[i, g] = np.round(frac * 255.0).astype(np.uint8)
            else:
                masks[i, g] = rasterize_polygon(p, (sm, sm)).astype(np.uint8)
            valid[i, g] = True
    return DeviceDataset(
        images=jnp.asarray(images), boxes=jnp.asarray(boxes),
        classes=jnp.asarray(classes), masks=jnp.asarray(masks),
        valid=jnp.asarray(valid),
        soft=True if all_soft else soft_ids,
    )


def _rgb_to_hsv(rgb: Array) -> Array:
    """[0,1] RGB -> (h in [0,1), s, v). Elementwise (VPU) only."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    c = v - mn
    safe_c = jnp.where(c > 0, c, 1.0)
    h = jnp.where(
        v == r, (g - b) / safe_c,
        jnp.where(v == g, 2.0 + (b - r) / safe_c, 4.0 + (r - g) / safe_c),
    )
    h = jnp.where(c > 0, (h / 6.0) % 1.0, 0.0)
    s = jnp.where(v > 0, c / jnp.where(v > 0, v, 1.0), 0.0)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv: Array) -> Array:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _hsv_jitter(img: Array, key: Array, hgain: float, sgain: float, vgain: float) -> Array:
    # Gains computed in the image dtype so a bf16 chain stays bf16 end to end
    # (f32 constants would silently re-promote every op after them).
    r = (jax.random.uniform(key, (3,), minval=-1.0, maxval=1.0) * jnp.asarray(
        [hgain, sgain, vgain]
    ) + 1.0).astype(img.dtype)
    hsv = _rgb_to_hsv(img)
    h = (hsv[..., 0] * r[0]) % 1.0
    s = jnp.clip(hsv[..., 1] * r[1], 0.0, 1.0)
    v = jnp.clip(hsv[..., 2] * r[2], 0.0, 1.0)
    return _hsv_to_rgb(jnp.stack([h, s, v], axis=-1))


def _augment_one(
    key: Array,
    data: DeviceDataset,
    max_gt: int,
    scale: float,
    translate: float,
    mosaic_p: float,
    flip_p: float,
    hsv_gains: tuple[float, float, float],
    image_dtype=jnp.float32,
) -> tuple[Array, dict]:
    """One augmented (image f32 (S,S,3), padded-GT dict) drawn from the
    device-resident dataset."""
    s_px = data.imgsz
    sm = data.masks.shape[2]  # proto grid size (static)
    q = s_px // sm  # mask stride (4 default; 2 with the hi-res proto head)
    n, g_src = data.boxes.shape[:2]
    k_idx, k_mosaic, k_geom, k_hsv, k_flip = jax.random.split(key, 5)

    idx = jax.random.randint(k_idx, (4,), 0, n)
    use_mosaic = jax.random.uniform(k_mosaic) < mosaic_p
    # Non-mosaic draw: all four tiles become the SAME image and the affine
    # window locks to that tile (crop center at the tile's center).
    idx = jnp.where(use_mosaic, idx, jnp.broadcast_to(idx[0], (4,)))

    tiles = data.images[idx]  # (4, S, S, 3) u8
    # Non-mosaic: blank tiles 1-3 to border gray. A zoom-out (sc < 1) samples
    # the canvas beyond tile 0; leaving image copies there would train on
    # visible objects whose GT is masked out below (Ultralytics shows gray
    # border in its non-mosaic affine too).
    tile_is_zero = (jnp.arange(4) == 0)[:, None, None, None]
    tiles = jnp.where(use_mosaic | tile_is_zero, tiles,
                      jnp.asarray(114, jnp.uint8))
    canvas = jnp.concatenate(
        [jnp.concatenate([tiles[0], tiles[1]], axis=1),
         jnp.concatenate([tiles[2], tiles[3]], axis=1)],
        axis=0,
    )  # (2S, 2S, 3) u8

    ks, ktx, kty, kc = jax.random.split(k_geom, 4)
    sc = jax.random.uniform(ks, minval=1.0 - scale, maxval=1.0 + scale)
    tx = jax.random.uniform(ktx, minval=-translate, maxval=translate)
    ty = jax.random.uniform(kty, minval=-translate, maxval=translate)
    ctr = jax.random.uniform(kc, (2,), minval=0.25, maxval=0.75) * (2 * s_px)
    # Mosaic-off: the window is exactly tile 0 (top-left quadrant).
    x0 = jnp.where(use_mosaic, jnp.clip(ctr[0] - s_px // 2, 0, s_px), 0.0)
    y0 = jnp.where(use_mosaic, jnp.clip(ctr[1] - s_px // 2, 0, s_px), 0.0)

    def out_to_canvas(xo: Array, yo: Array) -> tuple[Array, Array]:
        """Output px -> canvas px (inverse of crop+scale+translate)."""
        u = ((xo + 0.5) / s_px - 0.5 - tx) / sc + 0.5
        v = ((yo + 0.5) / s_px - 0.5 - ty) / sc + 0.5
        return x0 + u * s_px - 0.5, y0 + v * s_px - 0.5

    # --- image: the fused crop+scale+translate is an AXIS-ALIGNED bilinear
    # resample, i.e. exactly jax.image.scale_and_translate — two separable
    # banded matmuls that ride the MXU. (A hand-rolled 4-tap gather version
    # was measured ~100x slower at 640px: per-pixel gathers are the one thing
    # TPUs do badly.) jax convention: in = (out + 0.5 - translation)/scale
    # - 0.5; matching our out->canvas map gives the translations below.
    # Border: S&T zero-fills out-of-canvas weight, so shift by the 114-gray
    # pad value and add it back — borders blend toward PAD_GRAY just like a
    # gathered tap against the border color.
    t_x = (0.5 + tx) * s_px - sc * (x0 + 0.5 * s_px)
    t_y = (0.5 + ty) * s_px - sc * (y0 + 0.5 * s_px)
    dt = image_dtype
    img = jnp.asarray(PAD_GRAY, dt) + jax.image.scale_and_translate(
        canvas.astype(dt) * jnp.asarray(1.0 / 255.0, dt) - jnp.asarray(PAD_GRAY, dt),
        (s_px, s_px, 3),
        (0, 1),
        # scale/translation stay f32: compute_weight_mat derives the sample
        # POSITIONS from their dtype (bf16 here would shift geometry ~0.25 px
        # at 640) and only casts the finished weights to the image dtype.
        scale=jnp.stack([sc, sc]),
        translation=jnp.stack([t_y, t_x]),
        method="linear",
        antialias=False,
    )
    img = jnp.clip(img, 0.0, 1.0)
    img = _hsv_jitter(img, k_hsv, *hsv_gains)
    flip = jax.random.uniform(k_flip) < flip_p
    img = jnp.where(flip, img[:, ::-1], img)

    # --- ground truth: 4*G candidates -> analytic box transform ---
    tile_off = jnp.asarray([[0, 0], [s_px, 0], [0, s_px], [s_px, s_px]], jnp.float32)
    cand_boxes = (data.boxes[idx]
                  + jnp.tile(tile_off, (1, 2))[:, None, :]).reshape(4 * g_src, 4)
    cand_classes = data.classes[idx].reshape(4 * g_src)
    cand_valid = data.valid[idx].reshape(4 * g_src)
    # Mosaic-off: tiles 1..3 are duplicates of tile 0 — mask them out.
    tile_of = jnp.arange(4 * g_src) // g_src
    cand_valid = cand_valid & (use_mosaic | (tile_of == 0))

    def canvas_to_out(xc_: Array, yc_: Array) -> tuple[Array, Array]:
        u = (xc_ - x0) / s_px
        v = (yc_ - y0) / s_px
        return ((u - 0.5) * sc + 0.5 + tx) * s_px, ((v - 0.5) * sc + 0.5 + ty) * s_px

    bx0, by0 = canvas_to_out(cand_boxes[:, 0], cand_boxes[:, 1])
    bx1, by1 = canvas_to_out(cand_boxes[:, 2], cand_boxes[:, 3])
    bx0f = jnp.where(flip, s_px - bx1, bx0)
    bx1f = jnp.where(flip, s_px - bx0, bx1)
    out_boxes = jnp.stack([
        jnp.clip(bx0f, 0, s_px), jnp.clip(by0, 0, s_px),
        jnp.clip(bx1f, 0, s_px), jnp.clip(by1, 0, s_px),
    ], axis=-1)
    w = out_boxes[:, 2] - out_boxes[:, 0]
    h = out_boxes[:, 3] - out_boxes[:, 1]
    cand_valid = cand_valid & (w >= 2.0) & (h >= 2.0)

    # Keep the first max_gt valid candidates (validity-first stable order —
    # the host path's max_gt cap).
    order = jnp.argsort(jnp.where(cand_valid, 0, 1), stable=True)[:max_gt]
    sel_boxes = out_boxes[order]
    sel_classes = cand_classes[order]
    sel_valid = cand_valid[order]
    sel_tile = order // g_src
    sel_slot = order % g_src

    # --- masks: the same axis-aligned resample at proto res, again as
    # scale_and_translate (a nearest per-pixel gather here measured ~340 ms
    # of a 401 ms batch-64 augment step — the masks dominated). The proto-
    # grid mapping is xl = (xm+0.5)/sc + C with the C below (derivation in
    # git history); jax S&T samples in = (out+0.5-T)/scale - 0.5, so
    # T = -sc*(C+0.5). Linear interp + 0.5 threshold on binary masks is
    # nearest-equivalent away from exact ties.
    def one_mask(tile: Array, slot: Array, ok: Array, cls: Array) -> Array:
        src = data.masks[idx[tile], slot].astype(jnp.float32)  # (Sm, Sm)
        # Per-class soft targets: data.soft is True (all classes soft — u8
        # occupancy fractions), a tuple of soft class ids (those slots hold
        # fractions, the rest 0/1 cells), or falsy (all binary).
        if data.soft is True:
            is_soft = None  # statically all-soft
        elif data.soft:
            is_soft = jnp.isin(cls, jnp.asarray(data.soft, jnp.int32))
        else:
            is_soft = False  # statically all-binary
        if is_soft is None:
            # u8-quantized occupancy fractions: linear resampling of a
            # fraction field IS the (approximate) occupancy under the affine;
            # no threshold — fractional boundary cells are the signal.
            src = src * (1.0 / 255.0)
        elif is_soft is not False:
            src = jnp.where(is_soft, src * (1.0 / 255.0), src)
        # proto pixel p centers at model px q*p+(q-1)/2 on BOTH grids; the
        # -q/2 folds the two half-pixel conventions ((q-1)/2 + 0.5; verified
        # exact at identity, q=4 reproduces the original -2.0 / /4 / s/8).
        c_x = ((x0 - tile_off[tile, 0] - q / 2.0) / q
               - (0.5 + tx) * s_px / (q * sc) + s_px / (2.0 * q))
        c_y = ((y0 - tile_off[tile, 1] - q / 2.0) / q
               - (0.5 + ty) * s_px / (q * sc) + s_px / (2.0 * q))
        m = jax.image.scale_and_translate(
            src[..., None], (sm, sm, 1), (0, 1),
            scale=jnp.stack([sc, sc]),
            translation=jnp.stack([-sc * (c_y + 0.5), -sc * (c_x + 0.5)]),
            method="linear", antialias=False,
        )[..., 0]
        if is_soft is False:
            m = (m > 0.5).astype(jnp.float32)
        elif is_soft is not None:
            # Mixed: threshold the binary slots (nearest-equivalent away from
            # ties, like the all-binary path), keep soft slots fractional.
            m = jnp.where(is_soft, m, (m > 0.5).astype(jnp.float32))
        return jnp.where(ok, jnp.clip(m, 0.0, 1.0), 0.0)

    sel_masks = jax.vmap(one_mask)(sel_tile, sel_slot, sel_valid, sel_classes)
    # Output-array flip == flipping the sample positions: index xm then holds
    # the sample at model px s_px - q*xm - (q/2 + 0.5), identical to the
    # pre-flip map.
    sel_masks = jnp.where(flip, sel_masks[:, :, ::-1], sel_masks)

    return img, {
        "boxes": sel_boxes,
        "classes": sel_classes,
        "masks": sel_masks,
        "valid": sel_valid,
    }


def make_augment_fn(
    batch_size: int,
    max_gt: int,
    scale: float = 0.5,
    translate: float = 0.1,
    mosaic_p: float = 1.0,
    flip_p: float = 0.5,
    hsv_gains: tuple[float, float, float] = (0.015, 0.7, 0.4),
    mesh=None,
    image_dtype=None,
):
    """Jitted (data, key) -> (images (B,S,S,3) f32, Targets): one fresh
    augmented batch per call, entirely on device. The dataset is a jit
    ARGUMENT, never a closure capture — captured arrays serialize into the
    program as constants, which both bloats the executable and breaches
    remote-compile request limits on tethered deployments. With a mesh,
    outputs are batch-sharded over 'data' so the handoff to the sharded train
    step is collective-free.

    image_dtype: the IMAGE chain's compute/storage dtype (None -> f32;
    trainers pass their compute dtype so bf16 training runs the bf16 chain).
    TTI_AUGMENT_DTYPE overrides (see _image_dtype)."""
    dt = _image_dtype(default=image_dtype or jnp.float32)

    def batch_fn(data: DeviceDataset, key: Array) -> tuple[Array, Targets]:
        keys = jax.random.split(key, batch_size)
        imgs, t = jax.vmap(
            lambda k: _augment_one(k, data, max_gt, scale, translate,
                                   mosaic_p, flip_p, hsv_gains,
                                   image_dtype=dt)
        )(keys)
        return imgs, Targets(
            boxes=t["boxes"], classes=t["classes"],
            masks=t["masks"], valid=t["valid"],
        )

    if mesh is not None:
        from tti.parallel.mesh import batch_sharding

        shard = batch_sharding(mesh)
        return jax.jit(
            batch_fn,
            out_shardings=(shard, Targets(boxes=shard, classes=shard,
                                          masks=shard, valid=shard)),
        )
    return jax.jit(batch_fn)
