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
