"""Millimetre-accuracy gates (VERDICT r2 item 3).

Two layers:
- oracle self-consistency: the float64 scene/geometry oracle in
  tools/measure_report.py round-trips pixel<->plane exactly and its
  protocol-exact truth obeys the geometric inequalities it claims
  (protocol seam allowance >= perpendicular; protocol width >= chord of the
  nominal rect).
- product gate: the full production pipeline (trained in-tree deploy
  checkpoint, reference-native geometry: 1280x960 frames, real deployment
  calibration, imgsz 960, point undistortion) must measure deployment-shaped
  scenes within a millimetre error budget well inside the validity windows
  (seam window spans 4.5 mm, width window 1.35 mm; reference
  config.py:147-150). Budgets are set ~2x the measured p95 of
  MEASURE_REPORT.md so regressions fail, noise does not.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tools.measure_report import (  # noqa: E402
    FRAME_HW,
    PlaneMapper,
    make_measure_scene,
    run_pipeline,
)

DEPLOY_CKPT = os.path.join(os.path.dirname(__file__), "..",
                           "checkpoints", "yolov8n_textile_cam.msgpack")


@pytest.fixture(scope="module")
def mapper():
    return PlaneMapper()


def test_oracle_roundtrip_and_truth_consistency(mapper):
    rng = np.random.default_rng(0)
    uv = rng.uniform([100, 100], [FRAME_HW[1] - 100, FRAME_HW[0] - 100],
                     size=(200, 2))
    uv2 = mapper.to_pixel(mapper.to_plane(uv))
    np.testing.assert_allclose(uv2, uv, atol=1e-8)

    _, truth = make_measure_scene(mapper, np.random.default_rng(3))
    assert truth.n_stitches >= 3
    # The image column is oblique to the seam normal: protocol >= perpendicular.
    assert np.all(truth.edge_protocol >= truth.edge_perp - 1e-6)
    # Column extremes at centroid height can only widen a convex mark beyond
    # its rotated chord (theta <= 8 degrees in the generator).
    assert np.all(truth.width_protocol >= truth.width_nominal * np.cos(
        np.deg2rad(8.0)) - 0.05)
    # Truth lands in (or near) the product validity windows by construction.
    assert np.all((truth.edge_perp > 3.0) & (truth.edge_perp < 8.5))
    assert np.all((truth.width_nominal > 2.6) & (truth.width_nominal < 4.4))


def test_temporal_variants_share_geometry(mapper):
    """Smoothed-mode contract: one geometry rng + fresh appearance rngs yield
    identical analytic truth but different pixels (the median-of-8 ring sees
    genuine temporal nuisance, not copies), and the default path stays
    deterministic per seed."""
    g = lambda: np.random.default_rng([0, 7001, 3])  # noqa: E731
    f1, t1 = make_measure_scene(mapper, g(),
                                rng_app=np.random.default_rng([0, 7002, 3, 0]))
    f2, t2 = make_measure_scene(mapper, g(),
                                rng_app=np.random.default_rng([0, 7002, 3, 1]))
    assert t1.frame_edge == t2.frame_edge
    assert t1.frame_width == t2.frame_width
    np.testing.assert_array_equal(t1.width_protocol, t2.width_protocol)
    np.testing.assert_array_equal(t1.edge_protocol, t2.edge_protocol)
    assert not np.array_equal(f1, f2)

    fa, ta = make_measure_scene(mapper, np.random.default_rng(5))
    fb, tb = make_measure_scene(mapper, np.random.default_rng(5))
    np.testing.assert_array_equal(fa, fb)
    assert ta.frame_edge == tb.frame_edge


@pytest.mark.skipif(not os.path.exists(DEPLOY_CKPT),
                    reason="trained deploy checkpoint not present")
def test_mm_accuracy_gate(mapper):
    """Production pipeline vs analytic truth on deployment-shaped scenes."""
    rng = np.random.default_rng(11)
    frames, truths = [], []
    for _ in range(7):
        f, t = make_measure_scene(mapper, rng)
        frames.append(f)
        truths.append(t)
    frames = np.stack(frames)

    edge, width, n_det = run_pipeline(
        frames, DEPLOY_CKPT, undistort=False, dtype="float32", batch=len(frames))

    gt_edge = np.array([t.frame_edge for t in truths])
    gt_width = np.array([t.frame_width for t in truths])
    gt_n = np.array([t.n_stitches for t in truths])

    assert np.all(n_det >= np.minimum(gt_n, 3)), (n_det, gt_n)
    # Stitch width comes from ALL stitches -> every frame must emit a value.
    assert np.all(np.isfinite(width)), f"no stitch width emitted: {width}"
    # Seam allowance loses frames where the reference's row-selection kmeans
    # (measurement.py:392-430; min/max init never merges a single row) leaves
    # < MIN_STITCHES on the fabric side -> require majority coverage, not 100%.
    fin = np.isfinite(edge)
    assert fin.sum() >= 4, f"seam allowance mostly absent: {edge}"
    # Error budget: ~2.5x MEASURE_REPORT.md p95 for the camera-domain
    # stride-2 deploy checkpoint (edge p95 0.395 / width p95 0.310 raw
    # per-frame; max over 256 scenes 0.74 / 0.60) — an order inside the
    # validity windows (4.5 mm seam / 1.35 mm width spans). The stride-2
    # head also makes this a product-level regression gate for the q=2
    # grid-mapping relations (STATUS.md round-3 item 17).
    assert np.all(np.abs(edge[fin] - gt_edge[fin]) < 1.0), (edge, gt_edge)
    assert np.all(np.abs(width - gt_width) < 0.8), (width, gt_width)
