"""Breadth tests: logging, annotation, mesh helpers, coordinate maps."""

import json
import logging

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_json_formatter_structured_fields():
    from tti.core.logging import JsonFormatter

    record = logging.LogRecord("tti.x", logging.INFO, "f.py", 1, "measurement",
                               None, None)
    record.tti_seam_mm = 6.5
    record.tti_valid = True
    out = json.loads(JsonFormatter().format(record))
    assert out["msg"] == "measurement"
    assert out["seam_mm"] == 6.5
    assert out["valid"] is True
    assert out["level"] == "INFO"


def test_stage_timer():
    from tti.core.logging import StageTimer

    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    s = t.summary()
    assert s["a"]["n"] == 2
    assert s["a"]["total_s"] >= 0


def test_annotate_draws_boxes(rng):
    from tti.app.annotate import annotate_frame

    frame = np.zeros((64, 96, 3), np.uint8)
    boxes = np.array([[10, 10, 30, 30], [40, 12, 60, 40]], np.float32)
    classes = np.array([0, 1])
    valid = np.array([True, True])
    out = annotate_frame(frame, boxes, classes, valid, 0, 1,
                         roi_bounds=(2, 2, 90, 60), hud_lines=["hello"])
    assert out.shape == frame.shape
    assert out.sum() > 0  # something was drawn
    assert frame.sum() == 0  # original untouched


def test_overlay_masks(rng):
    from tti.app.annotate import overlay_masks
    from tti.preprocess.letterbox import letterbox_spec

    spec = letterbox_spec(64, 96, 64)
    frame = np.zeros((64, 96, 3), np.uint8)
    masks = np.zeros((2, 16, 16), np.float32)
    masks[0, 4:10, 4:10] = 1
    out = overlay_masks(frame, masks, np.array([0, 1]), np.array([True, False]), spec)
    assert out.sum() > 0


def test_mesh_helpers():
    from tti.parallel.mesh import batch_sharding, create_mesh, replicate, shard_batch

    mesh = create_mesh()
    assert mesh.devices.size == jax.device_count() == 8
    sharding = batch_sharding(mesh)
    x = shard_batch(mesh, jnp.zeros((8, 4)))
    assert x.sharding.is_equivalent_to(sharding, 2)
    y = replicate(mesh, jnp.zeros((3,)))
    assert y.sharding.is_fully_replicated

    with pytest.raises(ValueError):
        create_mesh(shape=(1000,))


def test_frame_points_to_input_roundtrip():
    from tti.preprocess.letterbox import frame_points_to_input, letterbox_spec, scale_boxes_to_frame

    spec = letterbox_spec(960, 1280, 960)
    pts = jnp.asarray(np.array([[100.0, 200.0], [640.0, 480.0]], np.float32))
    inp = frame_points_to_input(pts, spec)
    # Map back via the box transform (same affine on x/y pairs).
    boxes = jnp.concatenate([inp, inp], axis=-1)
    back = np.asarray(scale_boxes_to_frame(boxes, spec))[:, :2]
    np.testing.assert_allclose(back, np.asarray(pts), atol=1e-3)


def test_measurement_to_dict_batched_index():
    from tti.app.results import measurement_to_dict
    from tti.measure.pipeline import FrameMeasurement

    meas = FrameMeasurement(
        edge_distance_mm=jnp.asarray([6.5, np.nan]),
        stitch_width_mm=jnp.asarray([3.9, np.nan]),
        raw_edge_mm=jnp.asarray([6.5, np.nan]),
        raw_width_mm=jnp.asarray([3.9, np.nan]),
        n_dist=jnp.asarray([5, 0]), n_width=jnp.asarray([5, 0]),
        n_stitches=jnp.asarray([5, 0]), fabric_detected=jnp.asarray([True, False]),
    )
    d0 = measurement_to_dict(meas, index=0)
    d1 = measurement_to_dict(meas, index=1)
    assert d0["edge_distance_mm"] == pytest.approx(6.5)
    assert "error" not in d0
    assert d1["edge_distance_mm"] is None
    assert d1["error"]


def test_regen_docs_parsers():
    """tools/regen_docs.py: artifact parsers read the real round artifacts
    (driver envelope BENCH files, parity table, measure JSON) and the
    assembled table carries their numbers."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools import regen_docs

    name, rows = regen_docs.newest_bench()
    assert name.startswith("BENCH_r")
    assert any("1080p" in r["metric"] for r in rows)

    par = regen_docs.parity_row()
    assert par is not None
    f32, bf16 = (float(v) for v in par)
    assert 0.999 <= f32 <= 1.0 and 0.99 <= bf16 <= 1.0

    table = regen_docs.build_perf_table()
    assert name in table and par[0] in table
    assert "mm accuracy" in table
