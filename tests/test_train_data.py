"""YOLO-format dataset loader tests (synthetic dataset on disk)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tti.train.data import (
    batches,
    discover_dataset,
    parse_label_file,
    rasterize_polygon,
    sample_to_targets,
)


@pytest.fixture
def dataset(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.integers(0, 255, size=(96, 96, 3), dtype=np.uint8)
        cv2.imwrite(str(tmp_path / f"img_{i}.jpg"), img)
        # Two instances: a stitch quad and a fabric quad.
        with open(tmp_path / f"img_{i}.txt", "w") as f:
            f.write("0 0.2 0.2 0.4 0.2 0.4 0.35 0.2 0.35\n")
            f.write("1 0.1 0.6 0.9 0.6 0.9 0.9 0.1 0.9\n")
    return str(tmp_path)


def test_parse_label_file(dataset):
    import os

    polys, classes = parse_label_file(os.path.join(dataset, "img_0.txt"))
    assert classes == [0, 1]
    assert polys[0].shape == (4, 2)


def test_rasterize_polygon_area():
    square = np.array([[0.25, 0.25], [0.75, 0.25], [0.75, 0.75], [0.25, 0.75]], np.float32)
    mask = rasterize_polygon(square, (64, 64))
    assert mask.shape == (64, 64)
    area = mask.sum() / (64 * 64)
    assert 0.2 < area < 0.3  # quarter of the image


def test_sample_to_targets_shapes(dataset):
    samples = discover_dataset(dataset)
    img, t = sample_to_targets(samples[0], imgsz=64, max_gt=8)
    assert img.shape == (64, 64, 3) and 0 <= img.min() and img.max() <= 1
    assert t["boxes"].shape == (8, 4)
    assert t["valid"].sum() == 2
    # Fabric box spans the lower part of the image.
    fb = t["boxes"][1]
    assert fb[3] > fb[1] > 30


def test_batches_iterate(dataset):
    samples = discover_dataset(dataset)
    it = batches(samples, batch_size=2, imgsz=64, max_gt=8, epochs=1, augment=True)
    out = list(it)
    assert len(out) == 2
    imgs, targets = out[0]
    assert imgs.shape == (2, 64, 64, 3)
    assert targets.masks.shape == (2, 8, 16, 16)


def test_train_on_synthetic_dataset(dataset):
    """Three real optimizer steps on the synthetic dataset reduce the loss."""
    import jax.numpy as jnp

    from tti.model.yolo import create_model, init_variables
    from tti.train.step import create_train_state, make_train_step

    samples = discover_dataset(dataset)
    model = create_model("n", nc=2)
    variables = init_variables(model, image_size=64)
    state, tx = create_train_state(model, variables, learning_rate=3e-3)
    step = make_train_step(model, tx, (64, 64))

    losses = []
    for imgs, targets in batches(samples, 4, 64, max_gt=8, epochs=3, augment=False):
        state, metrics = step(state, jnp.asarray(imgs), targets)
        losses.append(float(np.asarray(metrics["total"])))
    assert len(losses) == 3
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_soft_class_ids_spellings():
    from tti.train.data import soft_class_ids

    assert soft_class_ids(None) == ()
    assert soft_class_ids(False) == ()
    assert soft_class_ids("") == ()
    assert soft_class_ids(True) == (0, 1)
    assert soft_class_ids("all") == (0, 1)
    assert soft_class_ids("stitch") == (0,)
    assert soft_class_ids("fabric") == (1,)
    assert soft_class_ids("0,1") == (0, 1)
    assert soft_class_ids([1]) == (1,)


def test_per_class_soft_device_dataset_and_augment(dataset):
    """`--soft-masks stitch`: stitch (class 0) masks rasterize as occupancy
    fractions, fabric (class 1) stays 0/1; after the device augment, fabric
    slots are exactly binary while stitch slots keep fractional cells."""
    import jax
    import jax.numpy as jnp

    from tti.train.augment import build_device_dataset, make_augment_fn

    samples = discover_dataset(dataset)
    data = build_device_dataset(samples, imgsz=64, max_gt=8, mask_stride=4,
                                soft_masks="stitch")
    assert data.soft == (0,)
    m = np.asarray(data.masks)
    cls = np.asarray(data.classes)
    val = np.asarray(data.valid)
    stitch_vals = m[(cls == 0) & val]
    fabric_vals = m[(cls == 1) & val]
    assert fabric_vals.size and set(np.unique(fabric_vals)) <= {0, 1}
    # Boundary cells of a polygon rasterized soft carry intermediate u8s.
    assert stitch_vals.size and (np.unique(stitch_vals).size > 2
                                 or stitch_vals.max() > 1)

    augment = make_augment_fn(batch_size=4, max_gt=8)
    imgs, targets = augment(data, jax.random.key(0))
    am = np.asarray(targets.masks)
    acls = np.asarray(targets.classes)
    aval = np.asarray(targets.valid)
    fab = am[(acls == 1) & aval]
    assert fab.size
    assert np.all((fab == 0.0) | (fab == 1.0))  # binary survived the resample
    sti = am[(acls == 0) & aval]
    assert sti.size
    assert np.all((sti >= 0.0) & (sti <= 1.0))
