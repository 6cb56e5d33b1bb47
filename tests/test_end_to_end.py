"""Whole-stack proof: data -> train -> pipeline -> px->mm measurement.

Trains a real YOLOv8n-seg from scratch on tiny synthetic fabric/stitch scenes
(in-framework data pipeline + TAL losses + DP step), then feeds fresh scenes
through the production InspectionPipeline (s2d stem transform, NMS, fused mask
statistics, ray-plane geometry) and asserts the detector finds the scene
content and the measurement core emits finite millimetre values.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

IMGSZ = 64
FRAME_HW = (64, 64)
N_TRAIN = 8


def _scene(rng):
    """One synthetic scene: dark background, bright fabric band in the lower
    half, 3 dark stitch squares in a row just above the fabric's top edge.
    Returns (bgr image, polygons, classes)."""
    img = np.full((IMGSZ, IMGSZ, 3), 30, np.uint8)
    img += rng.integers(0, 12, size=img.shape, dtype=np.uint8)
    fab_top = 36 + int(rng.integers(-3, 4))
    img[fab_top:, :] = 205
    polys = [np.array([[0.0, fab_top / IMGSZ], [1.0, fab_top / IMGSZ],
                       [1.0, 1.0], [0.0, 1.0]], np.float32)]
    classes = [1]
    y0 = fab_top - 12
    for k in range(3):
        x0 = 8 + 18 * k + int(rng.integers(-2, 3))
        img[y0:y0 + 6, x0:x0 + 8] = 120
        polys.append(np.array([[x0 / IMGSZ, y0 / IMGSZ],
                               [(x0 + 8) / IMGSZ, y0 / IMGSZ],
                               [(x0 + 8) / IMGSZ, (y0 + 6) / IMGSZ],
                               [x0 / IMGSZ, (y0 + 6) / IMGSZ]], np.float32))
        classes.append(0)
    return img, polys, classes


@pytest.fixture(scope="module")
def trained_variables(tmp_path_factory):
    from tti.model.yolo import create_model, init_variables
    from tti.train.data import Sample, batches
    from tti.train.step import create_train_state, make_train_step

    tmp = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(0)
    samples = []
    for i in range(N_TRAIN):
        img, polys, classes = _scene(rng)
        path = str(tmp / f"img_{i}.jpg")
        cv2.imwrite(path, img)
        samples.append(Sample(path, polys, classes))

    model = create_model("n", nc=2)
    variables = init_variables(model, image_size=IMGSZ)
    state, tx = create_train_state(model, variables, learning_rate=4e-3)
    step = make_train_step(model, tx, (IMGSZ, IMGSZ))

    losses = []
    for imgs, targets in batches(samples, batch_size=4, imgsz=IMGSZ, max_gt=8,
                                 epochs=40, augment=False, seed=1):
        state, metrics = step(state, jnp.asarray(imgs), targets)
        losses.append(float(np.asarray(metrics["total"])))
    assert losses[-1] < losses[0] * 0.7, f"training failed to converge: {losses[::20]}"
    return {"params": state.params, "batch_stats": state.batch_stats}


def test_trained_pipeline_detects_and_measures(trained_variables):
    from tti.calib.io import CalibrationData
    from tti.core.config import MeasureConfig, ModelConfig
    from tti.parallel.runtime import InspectionPipeline

    # Fronto-parallel plane 20 cm from a simple 64px pinhole camera.
    calib = CalibrationData(
        K=np.array([[80.0, 0, 32.0], [0, 80.0, 32.0], [0, 0, 1.0]]),
        dist=np.zeros(5),
        rvec=np.zeros(3),
        tvec=np.array([0.0, 0.0, 0.2]),
    )
    cfg = ModelConfig(variant="n", num_classes=2, image_size=IMGSZ, dtype="float32",
                      conf_thresh=0.25, max_detections=16)
    pipeline = InspectionPipeline(
        model_cfg=cfg, variables=trained_variables, frame_hw=FRAME_HW,
        calibration=calib, measure_cfg=MeasureConfig(min_stitches=2, max_stitches=8),
        undistort=False,  # zero distortion; exercise the plain letterbox path
    )

    rng = np.random.default_rng(99)
    frames = np.stack([_scene(rng)[0] for _ in range(2)])
    outs = pipeline.process_batch(frames)

    n_det = outs.valid.sum(axis=1)
    assert np.all(n_det >= 2), f"trained model found too few objects: {n_det}"
    # Both classes present somewhere in the batch.
    found_classes = set(outs.classes[outs.valid].tolist())
    assert 0 in found_classes, "no stitches detected"
    assert 1 in found_classes, "no fabric detected"

    meas = outs.measurements
    fabric_ok = np.asarray(meas.fabric_detected)
    n_stitches = np.asarray(meas.n_stitches)
    assert fabric_ok.any(), "measurement core saw no fabric"
    assert (n_stitches >= 1).any(), "measurement core saw no stitches"

    # At least one frame should produce a finite edge distance in a plausible
    # range for a 20 cm standoff scene (stitches ~12 px above the fabric edge:
    # 12 px * 0.2 m / 80 px-focal = 30 mm).
    edges = np.asarray(meas.raw_edge_mm)
    finite = np.isfinite(edges)
    if finite.any():
        assert 1.0 < edges[finite].min() < 200.0


def test_rectified_pipeline_matches_ideal(trained_variables):
    """System-level check of the rectification path: synthetically distorted
    frames through the undistort=True pipeline must yield the same detections
    and mm measurements as the ideal frames through undistort=False
    (regression for the double-undistortion bug)."""
    import jax.numpy as jnp

    from tti.calib.geometry import undistort_points
    from tti.calib.io import CalibrationData
    from tti.core.config import MeasureConfig, ModelConfig
    from tti.parallel.runtime import InspectionPipeline

    K = np.array([[80.0, 0, 32.0], [0, 80.0, 32.0], [0, 0, 1.0]])
    dist = np.array([0.3, 0.0, 0.0, 0.0, 0.0])  # mild barrel distortion
    calib_d = CalibrationData(K=K, dist=dist, rvec=np.zeros(3),
                              tvec=np.array([0.0, 0.0, 0.2]))
    calib_0 = CalibrationData(K=K, dist=np.zeros(5), rvec=np.zeros(3),
                              tvec=np.array([0.0, 0.0, 0.2]))

    # Synthesize what the distorted camera would capture of each ideal scene:
    # distorted(q) = ideal(project(undistort(q))) — then cv2.remap samples it.
    qx, qy = np.meshgrid(np.arange(IMGSZ, dtype=np.float64),
                         np.arange(IMGSZ, dtype=np.float64))
    q = np.stack([qx, qy], -1).reshape(-1, 2)
    xy = np.asarray(undistort_points(jnp.asarray(q, jnp.float32),
                                     jnp.asarray(K, jnp.float32),
                                     jnp.asarray(dist, jnp.float32), iters=12))
    src = xy * np.array([K[0, 0], K[1, 1]]) + np.array([K[0, 2], K[1, 2]])
    map_x = src[:, 0].reshape(IMGSZ, IMGSZ).astype(np.float32)
    map_y = src[:, 1].reshape(IMGSZ, IMGSZ).astype(np.float32)

    rng = np.random.default_rng(1234)
    ideal = np.stack([_scene(rng)[0] for _ in range(2)])
    distorted = np.stack([
        cv2.remap(f, map_x, map_y, cv2.INTER_LINEAR, borderValue=(30, 30, 30))
        for f in ideal
    ])

    cfg = ModelConfig(variant="n", num_classes=2, image_size=IMGSZ, dtype="float32",
                      conf_thresh=0.25, max_detections=16)
    mc = MeasureConfig(min_stitches=2, max_stitches=8)
    pipe_ideal = InspectionPipeline(model_cfg=cfg, variables=trained_variables,
                                    frame_hw=FRAME_HW, calibration=calib_0,
                                    measure_cfg=mc, undistort=False)
    pipe_rect = InspectionPipeline(model_cfg=cfg, variables=trained_variables,
                                   frame_hw=FRAME_HW, calibration=calib_d,
                                   measure_cfg=mc, undistort=True)

    out_i = pipe_ideal.process_batch(ideal)
    out_r = pipe_rect.process_batch(distorted)

    n_i = out_i.valid.sum(axis=1)
    n_r = out_r.valid.sum(axis=1)
    assert np.all(n_i >= 2), f"ideal pipeline found too few: {n_i}"
    # Rectified pipeline sees (approximately) the ideal image back.
    assert np.all(n_r >= 1), f"rectified pipeline found too few: {n_r}"

    e_i = np.asarray(out_i.measurements.raw_edge_mm)
    e_r = np.asarray(out_r.measurements.raw_edge_mm)
    both = np.isfinite(e_i) & np.isfinite(e_r)
    if both.any():
        # Same physical scene, same plane: mm values agree within resampling
        # tolerance. Before the double-undistortion fix this diverged by the
        # full distortion displacement.
        np.testing.assert_allclose(e_r[both], e_i[both], rtol=0.2, atol=2.0)
