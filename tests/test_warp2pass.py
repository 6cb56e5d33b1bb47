"""Two-pass matmul warp (tti/preprocess/warp2pass.py) vs the gather remap.

The two-pass Catmull-Smith decomposition must reproduce the single-pass
bilinear remap to sub-LSB accuracy for the deployment lens model, including
the pad-border behavior, and fall back cleanly on non-monotonic maps.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from tti.preprocess.letterbox import PAD_VALUE, letterbox_spec
from tti.preprocess.remap import build_small_undistort_map, remap_bilinear
from tti.preprocess.warp2pass import TwoPassWarp

# Deployment-shaped intrinsics scaled to a small frame (fast on CPU).
FH, FW = 240, 320
K = np.array([[937.14 * FW / 1280, 0, 636.15 * FW / 1280],
              [0, 884.02 * FH / 960, 422.39 * FH / 960],
              [0, 0, 1.0]])
DIST = np.array([0.0799, 0.0476, -0.0401, -0.0052, -0.1334])


def _content(rng, spec):
    img = rng.random((2, spec.new_h, spec.new_w, 3), np.float32)
    # smooth it so interpolation differences are meaningful, not noise-driven
    img = (img + np.roll(img, 1, 1) + np.roll(img, 1, 2) + np.roll(img, 2, 2)) / 4
    return img


def test_two_pass_zero_distortion_exact():
    """With no distortion the maps are separable -> the decomposition must be
    EXACT (pins the builder mechanics; any deviation is a bug)."""
    spec = letterbox_spec(FH, FW, 160)
    m = build_small_undistort_map(K, np.zeros(5), spec, unpadded_src=True)
    warp = TwoPassWarp(m, (spec.new_h, spec.new_w))
    content = _content(np.random.default_rng(0), spec)
    exact = np.asarray(remap_bilinear(jnp.asarray(content), jnp.asarray(m)))
    got = np.asarray(warp(jnp.asarray(content)))
    np.testing.assert_allclose(got, exact, atol=1e-5)


def test_two_pass_positional_contract():
    """Deployment distortion: the only deviation from single-pass bilinear is
    the interpolation kernel. Contract (measured on the deployment lens):
    core of the frame EXACT, p99 positional error < 0.01 px, >0.25 px only on
    the outermost edge columns. Positional error is read off directly by
    warping coordinate-ramp images."""
    spec = letterbox_spec(FH, FW, 160)
    m = build_small_undistort_map(K, DIST, spec, unpadded_src=True)
    warp = TwoPassWarp(m, (spec.new_h, spec.new_w))
    h, w = spec.new_h, spec.new_w
    pad = PAD_VALUE / 255.0
    for axis, scale in ((1, h), (2, w)):
        ramp = np.broadcast_to(
            (np.arange(scale, dtype=np.float32) / scale).reshape(
                (1, scale, 1) if axis == 1 else (1, 1, scale)
            ),
            (1, h, w),
        )[..., None]
        exact = np.asarray(remap_bilinear(jnp.asarray(ramp), jnp.asarray(m)))
        got = np.asarray(warp(jnp.asarray(ramp)))
        live = (np.abs(exact - pad) > 1e-6) & (np.abs(got - pad) > 1e-6)
        err_px = np.where(live, np.abs(got - exact) * scale, 0.0)[0, ..., 0]
        hh, ww = err_px.shape
        core = err_px[hh // 4 : 3 * hh // 4, ww // 4 : 3 * ww // 4]
        assert core.max() < 1e-3, f"core not exact: {core.max()}"
        assert np.percentile(err_px, 99) < 0.01
        ys, xs = np.nonzero(err_px > 0.25)
        assert len(ys) < 0.001 * err_px.size
        assert np.all((xs < 8) | (xs >= ww - 8)), "large deviation off-edge"


def test_two_pass_rejects_non_monotonic():
    spec = letterbox_spec(FH, FW, 160)
    m = build_small_undistort_map(K, DIST, spec, unpadded_src=True)
    bad = m.copy()
    rows = slice(m.shape[0] // 2 - 4, m.shape[0] // 2 + 4)
    bad[rows, :, 1] = bad[rows, :, 1][::-1]  # fold the vertical map
    with pytest.raises(ValueError):
        TwoPassWarp(bad, (spec.new_h, spec.new_w))


def test_pipeline_selects_two_pass_by_default(rng=None):
    from tti.calib.io import CalibrationData
    from tti.core.config import ModelConfig
    from tti.parallel.runtime import InspectionPipeline
    from tti.model.yolo import create_model, init_variables

    calib = CalibrationData(K=K, dist=DIST, rvec=np.zeros(3), tvec=np.array([0, 0, 0.2]))
    model = create_model("n", nc=2)
    pipe = InspectionPipeline(
        model_cfg=ModelConfig(variant="n", num_classes=2, image_size=64),
        variables=init_variables(model, image_size=64),
        frame_hw=(FH, FW),
        calibration=calib,
        model=model,
    )
    assert isinstance(pipe.remap_xy, TwoPassWarp)


def test_col_expand_exactly_matches_decimated_content():
    """Folding the exact column decimation into pass 1 must be EXACT: the
    expanded kernels sample the same decimated pixels from the row-sliced
    full-width operand as the plain warp does from decimated content."""
    # square 240px frame at imgsz 80 -> exact odd integer scale k=3
    fh = fw = 240
    spec = letterbox_spec(fh, fw, 80)
    from tti.preprocess.letterbox import decimation_stride

    k = decimation_stride(spec)
    assert k == 3
    m = build_small_undistort_map(K, DIST, spec, unpadded_src=True)
    plain = TwoPassWarp(m, (spec.new_h, spec.new_w))
    expanded = TwoPassWarp(m, (spec.new_h, spec.new_w),
                           col_expand=(k, (k - 1) // 2, fw))
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, size=(2, fh, fw, 3), dtype=np.uint8)
    off = (k - 1) // 2
    content = frames[:, off::k, off::k, :][:, : spec.new_h, : spec.new_w]
    rows = frames[:, off::k, :, :][:, : spec.new_h]
    a = np.asarray(plain(jnp.asarray(content, jnp.float32) / 255.0))
    b = np.asarray(expanded(jnp.asarray(rows, jnp.float32) / 255.0))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_s2d_out_matches_blocked_plain_output():
    """s2d_out must equal space_to_depth2(plain warp output) EXACTLY in
    structure (same sums, same channel order (dv, do, c)) for dense AND
    blocked weights — the 2x2 interleave moves into the pass-2 dot's output
    permutation and the row padding into zero weight rows."""
    from tti.model.yolo import space_to_depth2

    spec = letterbox_spec(FH, FW, 160)
    m = build_small_undistort_map(K, DIST, spec, unpadded_src=True)
    plain = TwoPassWarp(m, (spec.new_h, spec.new_w))
    content = _content(np.random.default_rng(5), spec)
    want = np.asarray(space_to_depth2(plain(jnp.asarray(content))))
    for kw in ({}, {"block": 32}):
        warp = TwoPassWarp(m, (spec.new_h, spec.new_w), s2d_out=True, **kw)
        got = np.asarray(warp(jnp.asarray(content)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-5, err_msg=str(kw))
        # weights-as-arguments path (what the jitted runtime threads through)
        got_args = np.asarray(warp.apply(jnp.asarray(content), warp.weights))
        np.testing.assert_allclose(got_args, got, atol=0)


def test_s2d_pipeline_matches_default(monkeypatch):
    """TTI_WARP_S2D=1 end-to-end: the pipeline with the s2d-emitting warp must
    produce the same detections/measurements as the default pipeline."""
    from tti.calib.io import CalibrationData
    from tti.core.config import MeasureConfig, ModelConfig
    from tti.model.yolo import create_model, init_variables
    from tti.parallel.runtime import InspectionPipeline

    calib = CalibrationData(K=K, dist=DIST, rvec=np.zeros(3),
                            tvec=np.array([0, 0, 0.2]))
    model_cfg = ModelConfig(variant="n", num_classes=2, image_size=64)
    variables = init_variables(create_model("n", nc=2), image_size=64)
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 255, size=(2, FH, FW, 3), dtype=np.uint8)

    def run():
        pipe = InspectionPipeline(
            model_cfg=model_cfg, variables=variables, frame_hw=(FH, FW),
            calibration=calib, measure_cfg=MeasureConfig(),
        )
        return pipe.process_batch(frames)

    base = run()
    monkeypatch.setenv("TTI_WARP_S2D", "1")
    s2d = run()
    np.testing.assert_allclose(s2d.scores, base.scores, atol=1e-5)
    np.testing.assert_allclose(s2d.boxes_frame, base.boxes_frame, atol=1e-2)
    assert (s2d.valid == base.valid).all()


def test_blocked_matches_dense():
    """Banded/blocked weight slicing (block=N) is EXACT vs the dense two-pass
    warp: the dropped entries are identically zero, so only f32 accumulation
    order can differ. Also pins the compression: the banded weights must be
    materially smaller than the dense matrices for the deployment lens."""
    spec = letterbox_spec(FH, FW, 160)
    m = build_small_undistort_map(K, DIST, spec, unpadded_src=True)
    dense = TwoPassWarp(m, (spec.new_h, spec.new_w))
    blocked = TwoPassWarp(m, (spec.new_h, spec.new_w), block=64)
    content = _content(np.random.default_rng(3), spec)
    want = np.asarray(dense(jnp.asarray(content)))
    got = np.asarray(blocked(jnp.asarray(content)))
    np.testing.assert_allclose(got, want, atol=2e-5)
    assert blocked.weight_bytes < 0.6 * dense.weight_bytes, (
        blocked.weight_bytes, dense.weight_bytes)
    # weights-as-arguments path (what the jitted runtime threads through)
    got_args = np.asarray(blocked.apply(jnp.asarray(content), blocked.weights))
    np.testing.assert_allclose(got_args, got, atol=0)
