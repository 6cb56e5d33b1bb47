"""Frozen deployment artifact (tti.app.export): round trip + output parity.

The artifact must reproduce the live pipeline's outputs exactly — it is the
same traced program — and must load/run from bytes alone (no pipeline
construction on the consumer side)."""

import numpy as np
import pytest

from tti.app.export import FrozenPipeline, export_pipeline
from tti.calib.io import CalibrationData
from tti.core.config import MeasureConfig, ModelConfig
from tti.model.yolo import create_model, init_variables
from tti.parallel.runtime import InspectionPipeline

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
def pipeline():
    cfg = ModelConfig(variant="n", num_classes=2, image_size=IMGSZ,
                      dtype="float32", max_detections=8)
    model = create_model("n", nc=2)
    variables = init_variables(model, image_size=IMGSZ)
    return InspectionPipeline(
        model_cfg=cfg, variables=variables, frame_hw=FRAME_HW,
        calibration=_calib(), model=model,
        measure_cfg=MeasureConfig(max_stitches=8),
    )


def test_export_round_trip_matches_live_pipeline(pipeline, rng):
    frames = rng.integers(0, 255, size=(2, *FRAME_HW, 3), dtype=np.uint8)
    live = pipeline.process_batch(frames)

    blob = export_pipeline(pipeline, batch=2, platforms=("cpu",))
    frozen = FrozenPipeline(blob)
    outs = frozen(frames)

    np.testing.assert_array_equal(outs["dets/valid"], live.valid)
    np.testing.assert_array_equal(outs["dets/classes"], live.classes)
    np.testing.assert_allclose(outs["dets/scores"], live.scores, atol=1e-6)
    np.testing.assert_allclose(outs["boxes_frame"], live.boxes_frame, atol=1e-5)
    np.testing.assert_allclose(
        outs["measurements/n_stitches"],
        np.asarray(live.measurements.n_stitches))
    np.testing.assert_allclose(
        outs["measurements/edge_distance_mm"],
        np.asarray(live.measurements.edge_distance_mm), equal_nan=True)


def test_export_multi_platform_lowering(pipeline, rng):
    """The default artifact lowers for BOTH tpu and cpu in one blob; callable
    on whichever platform loads it (cpu here)."""
    blob = export_pipeline(pipeline, batch=1, platforms=("tpu", "cpu"))
    frozen = FrozenPipeline(blob)
    assert frozen.manifest["platforms"] == ["tpu", "cpu"]
    frames = rng.integers(0, 255, size=(1, *FRAME_HW, 3), dtype=np.uint8)
    outs = frozen(frames)
    live = pipeline.process_batch(frames)
    np.testing.assert_array_equal(outs["dets/valid"], live.valid)
    np.testing.assert_allclose(outs["dets/scores"], live.scores, atol=1e-6)


def test_export_rejects_wrong_geometry(pipeline, rng):
    blob = export_pipeline(pipeline, batch=1, platforms=("cpu",))
    frozen = FrozenPipeline(blob)
    bad = rng.integers(0, 255, size=(2, *FRAME_HW, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="frozen for"):
        frozen(bad)
