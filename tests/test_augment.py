"""Device-side augmentation (tti/train/augment.py).

The identity configuration (mosaic off, scale/translate/HSV gains zero, flip
off) must reproduce the source sample EXACTLY — image, boxes, masks — which
pins the coordinate conventions of the fused crop+affine gather. The random
configuration is property-tested: shapes static, boxes in-bounds, masks
consistent with their boxes.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from tti.train.augment import DeviceDataset, make_augment_fn

S = 64
SM = S // 4
G = 4
N = 6


@pytest.fixture(scope="module")
def dataset() -> DeviceDataset:
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, size=(N, S, S, 3), dtype=np.uint8)
    boxes = np.zeros((N, G, 4), np.float32)
    classes = np.zeros((N, G), np.int32)
    masks = np.zeros((N, G, SM, SM), np.uint8)
    valid = np.zeros((N, G), bool)
    for i in range(N):
        for g in range(2 + (i % 3)):
            x0, y0 = rng.integers(0, S - 16, 2)
            w, h = rng.integers(8, 16, 2)
            boxes[i, g] = [x0, y0, x0 + w, y0 + h]
            classes[i, g] = int(rng.integers(0, 2))
            masks[i, g, y0 // 4:(y0 + h) // 4, x0 // 4:(x0 + w) // 4] = 1
            valid[i, g] = True
    return DeviceDataset(
        images=jnp.asarray(images), boxes=jnp.asarray(boxes),
        classes=jnp.asarray(classes), masks=jnp.asarray(masks),
        valid=jnp.asarray(valid),
    )


def test_identity_config_reproduces_source(dataset):
    aug = make_augment_fn(batch_size=3, max_gt=G, scale=0.0,
                          translate=0.0, mosaic_p=0.0, flip_p=0.0,
                          hsv_gains=(0.0, 0.0, 0.0))
    imgs, t = aug(dataset, jax.random.key(1))
    assert imgs.shape == (3, S, S, 3)
    imgs = np.asarray(imgs)
    for b in range(3):
        # Which source image? The one whose pixels match (idx is random).
        errs = [
            float(np.abs(imgs[b] - np.asarray(dataset.images[i], np.float32) / 255.0).max())
            for i in range(N)
        ]
        src = int(np.argmin(errs))
        assert errs[src] < 1e-5, f"sample {b}: no exact source match {min(errs)}"
        nv = int(np.asarray(dataset.valid[src]).sum())
        tv = np.asarray(t.valid[b])
        assert tv.sum() == nv
        np.testing.assert_allclose(
            np.sort(np.asarray(t.boxes[b])[tv], axis=0),
            np.sort(np.asarray(dataset.boxes[src])[np.asarray(dataset.valid[src])], axis=0),
            atol=1e-3,
        )
        # Masks: every kept GT's mask equals a source mask bit-for-bit.
        src_masks = np.asarray(dataset.masks[src])[np.asarray(dataset.valid[src])]
        for m in np.asarray(t.masks[b])[tv]:
            assert any(np.array_equal(m, sm.astype(np.float32)) for sm in src_masks)


def test_random_config_properties(dataset):
    aug = make_augment_fn(batch_size=4, max_gt=8)
    imgs, t = aug(dataset, jax.random.key(7))
    imgs = np.asarray(imgs)
    assert imgs.shape == (4, S, S, 3)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    assert t.boxes.shape == (4, 8, 4)
    assert t.masks.shape == (4, 8, SM, SM)
    boxes = np.asarray(t.boxes)
    valid = np.asarray(t.valid)
    masks = np.asarray(t.masks)
    assert valid.any(), "random mosaic produced zero GT across 4 samples"
    for b in range(4):
        for g in range(8):
            if not valid[b, g]:
                assert masks[b, g].sum() == 0
                continue
            x0, y0, x1, y1 = boxes[b, g]
            assert 0 <= x0 < x1 <= S and 0 <= y0 < y1 <= S
            ys, xs = np.nonzero(masks[b, g])
            if len(xs):
                # mask support within the (slightly dilated) box, proto res
                assert xs.min() * 4 >= x0 - 6 and xs.max() * 4 <= x1 + 6
                assert ys.min() * 4 >= y0 - 6 and ys.max() * 4 <= y1 + 6


def test_different_keys_differ(dataset):
    aug = make_augment_fn(batch_size=2, max_gt=G)
    a, _ = aug(dataset, jax.random.key(0))
    b, _ = aug(dataset, jax.random.key(1))
    assert float(jnp.abs(a - b).max()) > 1e-3

def test_identity_config_reproduces_source_stride2():
    """Same identity pin for the hi-res (mask_stride=2) proto grid: the mask
    resample constants are stride-parametric (q/2, /q, s/(2q)) and must stay
    exact at q=2."""
    rng = np.random.default_rng(3)
    sm2 = S // 2
    images = rng.integers(0, 255, size=(N, S, S, 3), dtype=np.uint8)
    boxes = np.zeros((N, G, 4), np.float32)
    classes = np.zeros((N, G), np.int32)
    masks = np.zeros((N, G, sm2, sm2), np.uint8)
    valid = np.zeros((N, G), bool)
    for i in range(N):
        for g in range(2):
            x0, y0 = rng.integers(0, S - 16, 2)
            w, h = rng.integers(8, 16, 2)
            boxes[i, g] = [x0, y0, x0 + w, y0 + h]
            masks[i, g, y0 // 2:(y0 + h) // 2, x0 // 2:(x0 + w) // 2] = 1
            valid[i, g] = True
    data = DeviceDataset(
        images=jnp.asarray(images), boxes=jnp.asarray(boxes),
        classes=jnp.asarray(classes), masks=jnp.asarray(masks),
        valid=jnp.asarray(valid),
    )
    aug = make_augment_fn(batch_size=3, max_gt=G, scale=0.0, translate=0.0,
                          mosaic_p=0.0, flip_p=0.0, hsv_gains=(0.0, 0.0, 0.0))
    imgs, t = aug(data, jax.random.key(2))
    imgs = np.asarray(imgs)
    for b in range(3):
        errs = [float(np.abs(imgs[b] - np.asarray(images[i], np.float32) / 255.0).max())
                for i in range(N)]
        src = int(np.argmin(errs))
        assert errs[src] < 1e-5
        tv = np.asarray(t.valid[b])
        assert tv.sum() == 2
        src_masks = masks[src][valid[src]]
        assert np.asarray(t.masks[b]).shape[-1] == sm2
        for m in np.asarray(t.masks[b])[tv]:
            assert any(np.array_equal(m, sm.astype(np.float32)) for sm in src_masks)


# ---- soft (area-occupancy) mask targets (round 4) -------------------------


def test_identity_config_preserves_soft_fractions():
    """Identity augment on a soft dataset returns the stored occupancy
    fractions EXACTLY (no threshold, no drift through the resample)."""
    rng = np.random.default_rng(5)
    images = rng.integers(0, 255, size=(N, S, S, 3), dtype=np.uint8)
    boxes = np.zeros((N, G, 4), np.float32)
    classes = np.zeros((N, G), np.int32)
    masks_u8 = np.zeros((N, G, SM, SM), np.uint8)
    valid = np.zeros((N, G), bool)
    for i in range(N):
        for g in range(2):
            x0, y0 = rng.integers(0, S - 16, 2)
            w, h = rng.integers(8, 16, 2)
            boxes[i, g] = [x0, y0, x0 + w, y0 + h]
            # Synthetic occupancy field: interior 255, one fractional border.
            masks_u8[i, g, y0 // 4:(y0 + h) // 4, x0 // 4:(x0 + w) // 4] = 255
            masks_u8[i, g, y0 // 4, x0 // 4:(x0 + w) // 4] = 93
            valid[i, g] = True
    data = DeviceDataset(
        images=jnp.asarray(images), boxes=jnp.asarray(boxes),
        classes=jnp.asarray(classes), masks=jnp.asarray(masks_u8),
        valid=jnp.asarray(valid), soft=True,
    )
    aug = make_augment_fn(batch_size=3, max_gt=G, scale=0.0, translate=0.0,
                          mosaic_p=0.0, flip_p=0.0, hsv_gains=(0.0, 0.0, 0.0))
    _, t = aug(data, jax.random.key(3))
    got = np.asarray(t.masks)
    assert got.max() <= 1.0 and got.min() >= 0.0
    frac_vals = np.unique(np.round(got[got > 0], 6))
    # The fractional border must SURVIVE (a binary path would kill 93/255).
    assert np.any(np.abs(frac_vals - 93.0 / 255.0) < 1e-6), frac_vals
    for b in range(3):
        tv = np.asarray(t.valid[b])
        for m in got[b][tv]:
            matched = any(
                np.allclose(m, sm.astype(np.float32) / 255.0, atol=1e-6)
                for i in range(N) for sm in masks_u8[i][valid[i]]
            )
            assert matched


def test_soft_dataset_builder_matches_oracle_occupancy(tmp_path):
    """build_device_dataset(soft_masks=True) stores the proto_ceiling soft
    oracle's occupancy (full-res raster -> exact box filter), u8-quantized."""
    from PIL import Image

    from tti.train.augment import build_device_dataset
    from tti.train.data import Sample, rasterize_polygon

    img_path = tmp_path / "im.png"
    Image.fromarray(np.zeros((S, S, 3), np.uint8)).save(img_path)
    # Axis-aligned rectangle whose right edge splits a proto cell in half:
    # x in [8, 22) px -> at stride 4, cells 2..4 full, cell 5 half-covered.
    poly = np.array([[8 / S, 8 / S], [22 / S, 8 / S],
                     [22 / S, 24 / S], [8 / S, 24 / S]], np.float32)
    sample = Sample(str(img_path), [poly], [0])
    data = build_device_dataset([sample], S, max_gt=2, mask_stride=4,
                                soft_masks=True)
    assert data.soft
    m = np.asarray(data.masks[0, 0], np.float32) / 255.0
    full = rasterize_polygon(poly, (S, S))
    want = full.reshape(SM, 4, SM, 4).mean(axis=(1, 3))
    np.testing.assert_allclose(m, want, atol=0.5 / 255.0)
    # The split boundary column is fractional (exact value depends on the
    # rasterizer's edge-inclusion convention), interior is 1.
    assert np.any((m > 0.0) & (m < 1.0))
    assert m.max() == 1.0


def test_rasterize_polygon_soft_rectangle_area():
    """Soft raster of an axis-aligned rectangle = analytic per-cell coverage."""
    from tti.train.data import rasterize_polygon_soft

    hw = (8, 8)  # cells of 4x4 px at factor 4 over a 32px frame
    # Rectangle x in [4, 14) px, y in [4, 12) px on the 32x32 full grid:
    # in cell units: x in [1.0, 3.5), y in [1.0, 3.0).
    poly = np.array([[4 / 32, 4 / 32], [14 / 32, 4 / 32],
                     [14 / 32, 12 / 32], [4 / 32, 12 / 32]], np.float32)
    m = rasterize_polygon_soft(poly, hw, factor=4)
    assert m[1, 1] == 1.0 and m[1, 2] == 1.0  # fully covered cells
    # Split column: ~half covered, +-1 full-res px of edge-inclusion slack.
    assert 0.25 <= m[1, 3] <= 0.75, m[1, 3]
    assert m[1, 4] == 0.0 and m[4, 1] == 0.0  # outside


def test_bf16_gate_produces_bf16_and_close_pixels(dataset, monkeypatch):
    """TTI_AUGMENT_DTYPE=bf16 must actually change the image chain (the gate
    was once advertised but unwired — ADVICE r4): output dtype bf16, pixels
    within bf16 rounding of the f32 chain, GT bit-identical."""
    aug32 = make_augment_fn(batch_size=2, max_gt=G)
    i32, t32 = aug32(dataset, jax.random.key(3))
    monkeypatch.setenv("TTI_AUGMENT_DTYPE", "bf16")
    aug16 = make_augment_fn(batch_size=2, max_gt=G)
    i16, t16 = aug16(dataset, jax.random.key(3))
    assert i16.dtype == jnp.bfloat16
    assert i32.dtype == jnp.float32
    # bf16 ~8-bit mantissa: worst pixel a few ULP through two resample
    # matmuls + HSV (measured 0.05 on random-noise tiles), mean ~1 ULP.
    diff = jnp.abs(i32 - i16.astype(jnp.float32))
    assert float(jnp.max(diff)) <= 0.08, float(jnp.max(diff))
    assert float(jnp.mean(diff)) <= 0.005, float(jnp.mean(diff))
    # GT path is dtype-gate independent.
    assert np.array_equal(np.asarray(t32.boxes), np.asarray(t16.boxes))
    assert np.array_equal(np.asarray(t32.masks), np.asarray(t16.masks))
    assert np.array_equal(np.asarray(t32.valid), np.asarray(t16.valid))
