"""Runtime pipeline e2e + multi-device sharding tests (virtual 8-CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tti.calib.io import CalibrationData
from tti.core.config import MeasureConfig, ModelConfig, RoiConfig
from tti.model.yolo import create_model, init_variables
from tti.parallel.mesh import create_mesh
from tti.parallel.runtime import DualPipeline, InspectionPipeline


IMGSZ = 64
FRAME_HW = (48, 64)


def _calib():
    K = np.array([[900.0 * 64 / 1280, 0, 636.0 * 64 / 1280],
                  [0, 884.0 * 48 / 960, 422.0 * 48 / 960],
                  [0, 0, 1.0]])
    dist = np.array([0.08, 0.05, -0.04, -0.005, -0.13])
    return CalibrationData(
        K=K, dist=dist,
        rvec=np.array([-0.863, -0.392, -1.359]),
        tvec=np.array([0.005, 0.036, 0.094]),
    )


@pytest.fixture(scope="module")
def tiny_pipeline():
    cfg = ModelConfig(variant="n", num_classes=2, image_size=IMGSZ, dtype="float32",
                      max_detections=16)
    model = create_model("n", nc=2)
    variables = init_variables(model, image_size=IMGSZ)
    return InspectionPipeline(
        model_cfg=cfg,
        variables=variables,
        frame_hw=FRAME_HW,
        calibration=_calib(),
        measure_cfg=MeasureConfig(max_stitches=8),
        roi=RoiConfig(enabled=True, x_min=1, x_max=63, y_min=1, y_max=47),
        return_masks=True,
        model=model,
    )


def test_pipeline_end_to_end_shapes(tiny_pipeline, rng):
    frames = rng.integers(0, 255, size=(2, *FRAME_HW, 3), dtype=np.uint8)
    outs = tiny_pipeline.process_batch(frames)
    assert outs.boxes_frame.shape == (2, 16, 4)
    assert outs.scores.shape == (2, 16)
    assert outs.masks.shape[:2] == (2, 16)
    assert outs.measurements is not None
    # Random weights -> (almost surely) nothing above conf; measurement NaN but finite-shaped.
    meas = outs.measurements
    assert np.asarray(meas.n_stitches).shape == (2,)
    # Frame-coord boxes stay inside the frame.
    assert outs.boxes_frame[..., [0, 2]].max() <= FRAME_HW[1]
    assert outs.boxes_frame[..., [1, 3]].max() <= FRAME_HW[0]


def test_pipeline_undistorted_and_plain_agree_on_shapes(rng):
    cfg = ModelConfig(variant="n", num_classes=2, image_size=IMGSZ, dtype="float32",
                      max_detections=8)
    model = create_model("n", nc=2)
    variables = init_variables(model, image_size=IMGSZ)
    plain = InspectionPipeline(model_cfg=cfg, variables=variables, frame_hw=FRAME_HW,
                               model=model)
    frames = rng.integers(0, 255, size=(1, *FRAME_HW, 3), dtype=np.uint8)
    outs = plain.process_batch(frames)
    assert outs.measurements is None  # no calibration -> detection only
    assert outs.boxes_frame.shape == (1, 8, 4)


def test_dual_pipeline_shares_preprocess(tiny_pipeline, rng):
    cfg2 = ModelConfig(variant="n", num_classes=2, image_size=IMGSZ, dtype="float32",
                       max_detections=16, conf_thresh=0.5)
    model2 = create_model("n", nc=2)
    vars2 = init_variables(model2, image_size=IMGSZ, seed=7)
    second = InspectionPipeline(model_cfg=cfg2, variables=vars2, frame_hw=FRAME_HW,
                                calibration=_calib(), model=model2)
    dual = DualPipeline(tiny_pipeline, second)
    frames = rng.integers(0, 255, size=(1, *FRAME_HW, 3), dtype=np.uint8)
    outs_a, outs_b = dual.process_batch(frames)
    assert outs_a.boxes_frame.shape == (1, 16, 4)
    assert outs_b.boxes_frame.shape == (1, 16, 4)
    # Config 4 is a TRUE e2e dual number: both calibrated models measure.
    assert outs_a.measurements is not None
    assert outs_b.measurements is not None
    assert outs_a.telemetry["n_candidates"].shape == (1,)


def test_pipeline_sharded_over_mesh(rng):
    """Batch sharded over all 8 virtual devices compiles + runs."""
    assert jax.device_count() == 8
    mesh = create_mesh()
    cfg = ModelConfig(variant="n", num_classes=2, image_size=IMGSZ, dtype="float32",
                      max_detections=8)
    model = create_model("n", nc=2)
    variables = init_variables(model, image_size=IMGSZ)
    pipeline = InspectionPipeline(model_cfg=cfg, variables=variables, frame_hw=FRAME_HW,
                                  calibration=_calib(), mesh=mesh, model=model,
                                  measure_cfg=MeasureConfig(max_stitches=8))
    frames = rng.integers(0, 255, size=(8, *FRAME_HW, 3), dtype=np.uint8)
    outs = pipeline.process_batch(frames)
    assert outs.boxes_frame.shape == (8, 8, 4)
    assert np.asarray(outs.measurements.n_stitches).shape == (8,)


def test_sharded_outputs_equal_single_device(rng):
    """A silent sharding bug (e.g. a collective over the wrong axis) must FAIL
    a test, not pass a shape check: mesh-sharded outputs are compared
    field-by-field against the single-device pipeline on identical frames."""
    assert jax.device_count() == 8
    cfg = ModelConfig(variant="n", num_classes=2, image_size=IMGSZ, dtype="float32",
                      max_detections=8)
    model = create_model("n", nc=2)
    variables = init_variables(model, image_size=IMGSZ)
    kwargs = dict(model_cfg=cfg, variables=variables, frame_hw=FRAME_HW,
                  calibration=_calib(), model=model, return_masks=True,
                  measure_cfg=MeasureConfig(max_stitches=8))
    sharded = InspectionPipeline(mesh=create_mesh(), **kwargs)
    single = InspectionPipeline(**kwargs)
    frames = rng.integers(0, 255, size=(8, *FRAME_HW, 3), dtype=np.uint8)
    outs_s = sharded.process_batch(frames)
    outs_u = single.process_batch(frames)

    np.testing.assert_array_equal(outs_s.valid, outs_u.valid)
    np.testing.assert_array_equal(outs_s.classes, outs_u.classes)
    np.testing.assert_allclose(outs_s.scores, outs_u.scores, atol=1e-5)
    np.testing.assert_allclose(outs_s.boxes_frame, outs_u.boxes_frame, atol=1e-3)
    np.testing.assert_allclose(outs_s.masks, outs_u.masks, atol=1e-4)
    assert (outs_s.measurements is None) == (outs_u.measurements is None)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, equal_nan=True),
        outs_s.measurements, outs_u.measurements,
    )
    assert set(outs_s.telemetry) == set(outs_u.telemetry)
    for key in outs_s.telemetry:
        np.testing.assert_array_equal(outs_s.telemetry[key], outs_u.telemetry[key])


def test_spatial_partitioned_equals_single_device(rng):
    """Spatial partitioning (frame HEIGHT sharded over a 'space' mesh axis —
    the batch-1 LATENCY axis; XLA SPMD inserts conv halo exchanges) must
    produce the same results as the unsharded pipeline, not just run."""
    assert jax.device_count() == 8
    cfg = ModelConfig(variant="n", num_classes=2, image_size=IMGSZ, dtype="float32",
                      max_detections=8)
    model = create_model("n", nc=2)
    variables = init_variables(model, image_size=IMGSZ)
    kwargs = dict(model_cfg=cfg, variables=variables, frame_hw=FRAME_HW,
                  calibration=_calib(), model=model,
                  measure_cfg=MeasureConfig(max_stitches=8))
    mesh = create_mesh(shape=(2, 4), axis_names=("data", "space"))
    sharded = InspectionPipeline(mesh=mesh, **kwargs)
    single = InspectionPipeline(**kwargs)
    frames = rng.integers(0, 255, size=(2, *FRAME_HW, 3), dtype=np.uint8)
    outs_s = sharded.process_batch(frames)
    outs_u = single.process_batch(frames)

    np.testing.assert_array_equal(outs_s.valid, outs_u.valid)
    np.testing.assert_array_equal(outs_s.classes, outs_u.classes)
    np.testing.assert_allclose(outs_s.scores, outs_u.scores, atol=1e-5)
    np.testing.assert_allclose(outs_s.boxes_frame, outs_u.boxes_frame, atol=1e-3)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, equal_nan=True),
        outs_s.measurements, outs_u.measurements,
    )


def test_rect_letterbox_pipeline_end_to_end(rng):
    """The default rect letterbox on a geometry where it is genuinely
    non-square (48x96 frames at imgsz 96 -> 64x96 model input): full
    undistort+measure pipeline compiles and keeps frame-coordinate contracts."""
    frame_hw = (48, 96)
    cfg = ModelConfig(variant="n", num_classes=2, image_size=96, dtype="float32",
                      max_detections=8, letterbox="rect")
    model = create_model("n", nc=2)
    variables = init_variables(model, image_size=32)
    pipeline = InspectionPipeline(model_cfg=cfg, variables=variables,
                                  frame_hw=frame_hw, calibration=_calib(),
                                  model=model, measure_cfg=MeasureConfig(max_stitches=8))
    assert (pipeline.spec.dst_h, pipeline.spec.dst_w) == (64, 96)
    assert pipeline.spec.scale == 1.0 and pipeline.spec.pad_top == 8
    frames = rng.integers(0, 255, size=(2, *frame_hw, 3), dtype=np.uint8)
    outs = pipeline.process_batch(frames)
    assert outs.boxes_frame.shape == (2, 8, 4)
    assert outs.boxes_frame[..., [0, 2]].max() <= frame_hw[1]
    assert outs.boxes_frame[..., [1, 3]].max() <= frame_hw[0]
    assert np.asarray(outs.measurements.n_stitches).shape == (2,)


def test_undistorting_pipeline_zeroes_measurement_distortion():
    """Rectified frames put all downstream coordinates in ideal pinhole space —
    the measurement geometry must NOT apply the distortion inverse again
    (regression: double undistortion skewed mm values)."""
    cfg = ModelConfig(variant="n", num_classes=2, image_size=IMGSZ, dtype="float32",
                      max_detections=8)
    model = create_model("n", nc=2)
    variables = init_variables(model, image_size=IMGSZ)
    rectified = InspectionPipeline(model_cfg=cfg, variables=variables,
                                   frame_hw=FRAME_HW, calibration=_calib(),
                                   model=model, undistort=True)
    raw = InspectionPipeline(model_cfg=cfg, variables=variables,
                             frame_hw=FRAME_HW, calibration=_calib(),
                             model=model, undistort=False)
    assert float(jnp.abs(rectified.cam.dist).max()) == 0.0
    assert float(jnp.abs(raw.cam.dist).max()) > 0.0
    assert rectified.remap_xy is not None and raw.remap_xy is None


def test_depth_to_space2_inverts_s2d(rng):
    from tti.model.yolo import depth_to_space2, space_to_depth2

    x = jnp.asarray(rng.normal(size=(2, 8, 12, 3)).astype(np.float32))
    assert (np.asarray(depth_to_space2(space_to_depth2(x))) ==
            np.asarray(x)).all()


def test_dual_pipeline_mixed_s2d_input(rng):
    """The bench config-4 construction: primary through the weight-transform
    branch (s2d_input follows the s2d warp default), secondary with an
    explicitly-passed RAW model. The dual step must hand each model the input
    form it expects (caught live: a 12-channel blocked buffer hit the raw
    stem's 3-channel conv). Each output must equal its single-pipeline run."""
    cfg = ModelConfig(variant="n", num_classes=2, image_size=IMGSZ,
                      dtype="float32", max_detections=16)
    variables = init_variables(create_model("n", nc=2), image_size=IMGSZ)
    primary = InspectionPipeline(
        model_cfg=cfg, variables=variables, frame_hw=FRAME_HW,
        calibration=_calib(),
    )
    model2 = create_model("n", nc=2)
    vars2 = init_variables(model2, image_size=IMGSZ, seed=7)
    second = InspectionPipeline(
        model_cfg=cfg, variables=vars2, frame_hw=FRAME_HW,
        calibration=_calib(), model=model2,
    )
    assert getattr(primary.model, "s2d_input", False) != getattr(
        second.model, "s2d_input", False)
    dual = DualPipeline(primary, second)
    frames = rng.integers(0, 255, size=(1, *FRAME_HW, 3), dtype=np.uint8)
    outs_a, outs_b = dual.process_batch(frames)
    solo_a = primary.process_batch(frames)
    solo_b = second.process_batch(frames)
    np.testing.assert_allclose(np.asarray(outs_a.scores),
                               np.asarray(solo_a.scores), atol=1e-5)
    np.testing.assert_allclose(np.asarray(outs_b.scores),
                               np.asarray(solo_b.scores), atol=1e-5)
    np.testing.assert_allclose(np.asarray(outs_b.boxes_frame),
                               np.asarray(solo_b.boxes_frame), atol=1e-2)
