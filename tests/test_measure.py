"""Measurement core tests: ops vs numpy/cv2 oracles + full measure_frame scenes
(SURVEY.md §4: synthetic fabric/stitch fixtures, geometry property tests)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

from tti.core.config import MeasureConfig
from tti.measure.ops import (
    fabric_lower_envelope,
    kmeans_1d_two_clusters,
    masked_median,
    stitch_stats,
)
from tti.measure.pipeline import (
    CameraParams,
    MeasureState,
    StitchSet,
    init_measure_state,
    measure_frame,
    smooth_measurement,
    _mask_bottom_to_frame,
)
from tti.preprocess.letterbox import letterbox_spec


# ---------------------------------------------------------------------------
# ops-level oracles
# ---------------------------------------------------------------------------


def _envelope_reference(mask):
    """Literal numpy port of _fabric_lower_envelope (measurement.py:170-185)."""
    h, w = mask.shape
    envelope = np.full((w,), -1, dtype=int)
    rev = mask[::-1, :]
    has_any = rev.any(axis=0)
    idx = np.argmax(rev > 0, axis=0)
    for x in range(w):
        if has_any[x]:
            envelope[x] = h - 1 - idx[x]
    return envelope


def test_envelope_matches_reference(rng):
    mask = (rng.uniform(size=(40, 64)) > 0.8).astype(np.uint8)
    mask[:, 10] = 0  # guarantee an empty column
    got = np.asarray(fabric_lower_envelope(jnp.asarray(mask)))
    np.testing.assert_array_equal(got, _envelope_reference(mask))


def _kmeans_reference(values, max_iters=10):
    """Literal port of kmeans_1d_two_clusters (measurement.py:88-113)."""
    if values.size < 2:
        return np.zeros(values.shape[0], dtype=int), (float(values.mean()),) * 2
    c0, c1 = float(values.min()), float(values.max())
    labels = np.zeros(values.shape[0], dtype=int)
    for _ in range(max_iters):
        d0 = np.abs(values - c0)
        d1 = np.abs(values - c1)
        new_labels = (d1 < d0).astype(int)
        if new_labels.sum() == 0 or new_labels.sum() == len(values):
            break
        new_c0 = float(values[new_labels == 0].mean()) if (new_labels == 0).any() else c0
        new_c1 = float(values[new_labels == 1].mean()) if (new_labels == 1).any() else c1
        if new_c0 == c0 and new_c1 == c1:
            break
        c0, c1 = new_c0, new_c1
        labels = new_labels
    return labels, (c0, c1)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_kmeans_matches_reference(seed):
    rng = np.random.default_rng(seed)
    vals = np.concatenate([rng.normal(100, 5, 6), rng.normal(300, 5, 5)]).astype(np.float32)
    ref_labels, (rc0, rc1) = _kmeans_reference(vals)
    labels, (c0, c1) = kmeans_1d_two_clusters(jnp.asarray(vals), jnp.ones(len(vals), bool))
    np.testing.assert_array_equal(np.asarray(labels), ref_labels)
    assert float(c0) == pytest.approx(rc0, abs=1e-3)
    assert float(c1) == pytest.approx(rc1, abs=1e-3)


def test_kmeans_padding_invariance(rng):
    vals = np.concatenate([rng.normal(100, 5, 6), rng.normal(300, 5, 5)]).astype(np.float32)
    padded = np.concatenate([vals, np.full(7, 777.0, np.float32)])
    valid = np.concatenate([np.ones(len(vals), bool), np.zeros(7, bool)])
    la, _ = kmeans_1d_two_clusters(jnp.asarray(vals), jnp.ones(len(vals), bool))
    lb, _ = kmeans_1d_two_clusters(jnp.asarray(padded), jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(lb)[: len(vals)], np.asarray(la))


def test_masked_median_matches_numpy(rng):
    for n in [1, 2, 5, 8]:
        vals = rng.normal(size=8).astype(np.float32)
        mask = np.zeros(8, bool)
        mask[:n] = True
        med, ok = masked_median(jnp.asarray(vals), jnp.asarray(mask))
        assert bool(ok)
        assert float(med) == pytest.approx(float(np.median(vals[:n])), abs=1e-6)
    med, ok = masked_median(jnp.asarray(vals), jnp.zeros(8, bool))
    assert not bool(ok)


def test_stitch_stats_matches_cv2_moments(rng):
    n, h, w = 3, 32, 48
    masks = np.zeros((n, h, w), np.uint8)
    masks[0, 10:14, 5:15] = 1
    masks[1, 20:23, 30:44] = 1
    # instance 2 left empty -> bbox fallback
    boxes = np.array([[5, 10, 15, 14], [30, 20, 44, 23], [10, 10, 20, 18]], np.float32)
    valid = np.ones(n, bool)
    cx, cy, left, right, has = stitch_stats(jnp.asarray(masks), jnp.asarray(boxes),
                                            jnp.asarray(valid))
    for i in range(2):
        M = cv2.moments(masks[i])
        assert float(cx[i]) == pytest.approx(M["m10"] / M["m00"], abs=1e-3)
        assert float(cy[i]) == pytest.approx(M["m01"] / M["m00"], abs=1e-3)
        cols = np.where(masks[i].any(axis=0))[0]
        assert float(left[i]) == cols.min() and float(right[i]) == cols.max()
    assert not bool(has[2])
    assert float(cx[2]) == 15.0 and float(cy[2]) == 14.0  # bbox center fallback


# ---------------------------------------------------------------------------
# measure_frame scenes
# ---------------------------------------------------------------------------


FRAME_HW = (960, 1280)
INPUT = 960


@pytest.fixture(scope="module")
def cam(ref_intrinsics=None, ref_extrinsics=None):
    # fixtures with module scope can't consume session fixtures by position;
    # construct directly from the same deployment values.
    K = np.array(
        [[937.1384518987244, 0.0, 636.148901113533],
         [0.0, 884.022038878419, 422.3901781816556],
         [0.0, 0.0, 1.0]]
    )
    dist = np.array([0.07994929130530135, 0.04758675999900327, -0.04013555042332606,
                     -0.005228657034776396, -0.1334157094005971])
    rvec = np.array([-0.8631369244225452, -0.3919482615538663, -1.3591256137314185])
    tvec = np.array([0.005016396186926285, 0.03590342712705542, 0.09382141278570659])

    class _Calib:
        pass

    c = _Calib()
    c.K, c.dist, c.rvec, c.tvec = K, dist, rvec, tvec
    return CameraParams.from_calibration(c), (K, dist, rvec, tvec)


def _px_to_mm_oracle(u, v, K, dist, rvec, tvec):
    R, _ = cv2.Rodrigues(rvec)
    n_c = R[:, 2]
    d_c = -float(n_c.dot(tvec))
    pts = np.array([[[float(u), float(v)]]], dtype=np.float64)
    und = cv2.undistortPoints(pts, K, dist, P=None)
    ray = np.array([und[0, 0, 0], und[0, 0, 1], 1.0])
    s = -d_c / float(n_c.dot(ray))
    return R.T.dot(s * ray - tvec) * 1000.0


def _scene(spec, n_bottom=5, n_top=4, env_mask_y=150, max_stitches=16):
    """Two stitch rows above a flat fabric envelope (mask grid y=env_mask_y)."""
    wm = spec.dst_w // 4
    envelope = np.full((wm,), -1, np.int32)
    envelope[20:220] = env_mask_y
    env_frame_y = float(
        _mask_bottom_to_frame(jnp.asarray(float(env_mask_y)), spec.pad_top, spec.scale)
    )

    cx = np.zeros(max_stitches, np.float32)
    cy = np.zeros(max_stitches, np.float32)
    left = np.zeros(max_stitches, np.float32)
    right = np.zeros(max_stitches, np.float32)
    valid = np.zeros(max_stitches, bool)
    for i in range(n_bottom):
        cx[i] = 300 + 120 * i
        cy[i] = env_frame_y - 60  # near row
        left[i], right[i] = cx[i] - 12, cx[i] + 12
        valid[i] = True
    for i in range(n_top):
        j = n_bottom + i
        cx[j] = 330 + 120 * i
        cy[j] = env_frame_y - 460  # far row
        left[j], right[j] = cx[j] - 12, cx[j] + 12
        valid[j] = True
    stitches = StitchSet(
        cx=jnp.asarray(cx), cy=jnp.asarray(cy), left=jnp.asarray(left),
        right=jnp.asarray(right), valid=jnp.asarray(valid),
    )
    return stitches, jnp.asarray(envelope), env_frame_y


def test_measure_frame_two_rows(cam):
    cam_params, (K, dist, rvec, tvec) = cam
    spec = letterbox_spec(FRAME_HW[0], FRAME_HW[1], INPUT)
    cfg = MeasureConfig()
    stitches, envelope, env_frame_y = _scene(spec)

    meas = measure_frame(stitches, envelope, jnp.asarray(True), cam_params, spec, cfg)

    assert bool(meas.fabric_detected)
    assert int(meas.n_stitches) == 9
    # Only the bottom row (5 stitches, within 250 px of the envelope) measures
    # edge distance; widths come from ALL stitches.
    assert int(meas.n_dist) == 5
    assert int(meas.n_width) == 9

    # Oracle for one stitch's width + edge distance via cv2 geometry.
    cx0, cy0 = 300.0, env_frame_y - 60
    p_l = _px_to_mm_oracle(cx0 - 12, cy0, K, dist, rvec, tvec)
    p_r = _px_to_mm_oracle(cx0 + 12, cy0, K, dist, rvec, tvec)
    width0 = np.linalg.norm(p_r - p_l)
    # All bottom/top stitches have the same pixel extent; widths vary with
    # position but stay in the same ballpark.
    assert float(meas.raw_width_mm) == pytest.approx(width0, rel=0.35)

    p_s = _px_to_mm_oracle(cx0, cy0, K, dist, rvec, tvec)
    p_e = _px_to_mm_oracle(cx0, env_frame_y, K, dist, rvec, tvec)
    dist0 = np.linalg.norm(p_s - p_e)
    assert float(meas.raw_edge_mm) == pytest.approx(dist0, rel=0.35)


def test_measure_frame_no_fabric(cam):
    cam_params, _ = cam
    spec = letterbox_spec(FRAME_HW[0], FRAME_HW[1], INPUT)
    cfg = MeasureConfig()
    stitches, _, _ = _scene(spec)
    envelope = jnp.full((spec.dst_w // 4,), -1, jnp.int32)

    meas = measure_frame(stitches, envelope, jnp.asarray(False), cam_params, spec, cfg)
    assert not bool(meas.fabric_detected)
    assert np.isnan(float(meas.raw_edge_mm))
    assert np.isnan(float(meas.raw_width_mm))
    assert int(meas.n_dist) == 0


def test_measure_frame_min_stitches_gate(cam):
    cam_params, _ = cam
    spec = letterbox_spec(FRAME_HW[0], FRAME_HW[1], INPUT)
    cfg = MeasureConfig()
    stitches, envelope, _ = _scene(spec, n_bottom=2, n_top=0)
    meas = measure_frame(stitches, envelope, jnp.asarray(True), cam_params, spec, cfg)
    # 2 < MIN_STITCHES=3 (reference: config.py:79) -> no metrics.
    assert int(meas.n_stitches) == 2
    assert np.isnan(float(meas.raw_edge_mm))


def test_smoothing_median_window():
    state = init_measure_state(frame_buffer=8)

    class FakeMeas:
        pass

    def push(state, edge, width):
        from tti.measure.pipeline import FrameMeasurement

        meas = FrameMeasurement(
            edge_distance_mm=jnp.asarray(np.nan), stitch_width_mm=jnp.asarray(np.nan),
            raw_edge_mm=jnp.asarray(edge, jnp.float32),
            raw_width_mm=jnp.asarray(width, jnp.float32),
            n_dist=jnp.asarray(3), n_width=jnp.asarray(3), n_stitches=jnp.asarray(3),
            fabric_detected=jnp.asarray(True),
        )
        return smooth_measurement(state, meas)

    values = [5.0, 6.0, 100.0, 5.5]
    outs = []
    for v in values:
        state, sm = push(state, v, v)
        outs.append(float(sm.edge_distance_mm))
    # Reference semantics (measurement.py:474-484): median of pushed values.
    assert outs[0] == 5.0
    assert outs[1] == 5.5
    assert outs[2] == 6.0
    assert outs[3] == pytest.approx(5.75)

    # A NaN frame leaves the buffer untouched and reports NaN.
    state2, sm = push(state, np.nan, np.nan)
    assert np.isnan(float(sm.edge_distance_mm))
    state3, sm2 = push(state2, 5.0, 5.0)
    assert float(sm2.edge_distance_mm) == pytest.approx(5.5)


def test_upper_envelope():
    from tti.measure.ops import fabric_upper_envelope

    mask = np.zeros((20, 8), np.uint8)
    mask[5:15, 2] = 1
    mask[3:4, 5] = 1
    env = np.asarray(fabric_upper_envelope(jnp.asarray(mask)))
    assert env[2] == 5 and env[5] == 3 and env[0] == -1


def test_fabric_edge_mask_vs_cv2_contours():
    """Boundary pixel set == cv2.findContours(CHAIN_APPROX_NONE) point set on
    hole-free masks (the harness's _fabric_edge_points source,
    reference: Utils/check_stitch_distance.py:268-279)."""
    import cv2

    from tti.measure.ops import fabric_edge_mask

    rng = np.random.default_rng(3)
    for _ in range(4):
        mask = np.zeros((40, 56), np.uint8)
        for _ in range(3):  # union of solid rectangles: no interior holes
            y, x = rng.integers(0, 30, 2)
            h, w = rng.integers(4, 12, 2)
            mask[y:y + h, x:x + w] = 1
        ours = np.asarray(fabric_edge_mask(jnp.asarray(mask)))
        cont, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_NONE)
        ref = set()
        for c in cont:
            for x, y in c.reshape(-1, 2):
                ref.add((int(y), int(x)))
        got = {(int(y), int(x)) for y, x in zip(*np.nonzero(ours))}
        # cv2 traces the 8-connected outer chain; the 4-neighbour erosion
        # boundary is its superset on these shapes (it adds concave-corner
        # pixels cv2's chain steps across diagonally). Every traced point
        # must be in our set, and ours must contain no non-boundary pixel.
        assert ref <= got
        interior = set()
        for y, x in got:
            nb = [(y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1)]
            if all(0 <= a < 40 and 0 <= b < 56 and mask[a, b] for a, b in nb):
                interior.add((y, x))
        assert not interior


def test_nearest_edge_candidates():
    """Top-k nearest boundary pixels match a brute-force distance sort, and
    the fixed k=20 budget mirrors MAX_EDGE_CANDIDATES
    (reference: Utils/check_stitch_distance.py:37)."""
    from tti.measure.ops import fabric_edge_mask, nearest_edge_candidates

    mask = np.zeros((30, 40), np.uint8)
    mask[10:20, 5:35] = 1
    edge = fabric_edge_mask(jnp.asarray(mask))
    cx, cy = 18.0, 3.0  # stitch centroid above the fabric
    ys, xs, dist, valid = jax.jit(
        lambda e: nearest_edge_candidates(e, cx, cy, k=20))(edge)
    ys, xs, dist, valid = map(np.asarray, (ys, xs, dist, valid))
    assert valid.all()

    ey, ex = np.nonzero(np.asarray(edge))
    brute = np.sort(np.hypot(ex - cx, ey - cy))[:20]
    np.testing.assert_allclose(np.sort(dist), brute, rtol=1e-6)
    # Ordered nearest-first and each returned pixel is on the boundary.
    assert (np.diff(dist) >= -1e-6).all()
    assert all(np.asarray(edge)[y, x] for y, x in zip(ys, xs))

    # k larger than the boundary: surplus rows flagged invalid, coords 0.
    tiny = np.zeros((8, 8), np.uint8)
    tiny[4, 4] = 1
    ys2, xs2, d2, v2 = nearest_edge_candidates(
        fabric_edge_mask(jnp.asarray(tiny)), 0.0, 0.0, k=5)
    assert int(np.sum(np.asarray(v2))) == 1
    assert (np.asarray(ys2)[1:] == 0).all() and (np.asarray(xs2)[1:] == 0).all()
    assert np.isinf(np.asarray(d2)[1:]).all()


def test_measure_frame_skip_cluster(cam):
    """SKIP_CLUSTER median-split selection (reference: measurement.py:374-389):
    with two distinct rows, only the bottom half (>= median y) measures edge
    distance."""
    from tti.core.config import MeasureConfig as MC

    cam_params, _ = cam
    spec = letterbox_spec(FRAME_HW[0], FRAME_HW[1], INPUT)
    cfg = MC(skip_cluster=True)
    stitches, envelope, _ = _scene(spec)
    meas = measure_frame(stitches, envelope, jnp.asarray(True), cam_params, spec, cfg)
    assert int(meas.n_dist) == 5  # bottom row only
    assert int(meas.n_width) == 9

    # Rows within TWO_ROW_THRESHOLD_PX -> treated as one row, keep all.
    stitches2, envelope2, env_y = _scene(spec, n_bottom=4, n_top=0)
    meas2 = measure_frame(stitches2, envelope2, jnp.asarray(True), cam_params, spec, cfg)
    assert int(meas2.n_dist) == 4


def test_measure_frame_readout_calibration(cam):
    """cal_edge_mm / cal_width_mm (sidecar readout calibration, the
    reference's config.py:156-157 output-offset mechanism derived per
    checkpoint) shift the finite outputs by exactly the constant; NaN
    frames stay NaN and the n_* gates are unaffected."""
    cam_params, _ = cam
    spec = letterbox_spec(FRAME_HW[0], FRAME_HW[1], INPUT)
    stitches, envelope, _ = _scene(spec)

    base = measure_frame(stitches, envelope, jnp.asarray(True), cam_params,
                         spec, MeasureConfig())
    cal = measure_frame(stitches, envelope, jnp.asarray(True), cam_params,
                        spec, MeasureConfig(cal_edge_mm=0.128,
                                            cal_width_mm=-0.05))
    assert float(cal.raw_edge_mm) == pytest.approx(
        float(base.raw_edge_mm) + 0.128, abs=1e-5)
    assert float(cal.raw_width_mm) == pytest.approx(
        float(base.raw_width_mm) - 0.05, abs=1e-5)
    assert int(cal.n_dist) == int(base.n_dist)

    # A gated-out frame (no fabric) stays NaN under calibration.
    nof = measure_frame(stitches, envelope, jnp.asarray(False), cam_params,
                        spec, MeasureConfig(cal_edge_mm=0.128))
    assert np.isnan(float(nof.raw_edge_mm))


def test_measure_config_calibration_from_sidecar(monkeypatch):
    """with_subcell_from adopts sidecar cal constants; explicit non-zero
    config wins; TTI_READOUT_CAL=0 disables both."""
    meta = {"soft_masks": True, "cal_edge_mm": 0.13, "cal_width_mm": 0.17}
    monkeypatch.delenv("TTI_READOUT_CAL", raising=False)
    got = MeasureConfig().with_subcell_from(meta)
    assert got.cal_edge_mm == pytest.approx(0.13)
    assert got.cal_width_mm == pytest.approx(0.17)
    # Explicit config beats the sidecar.
    got = MeasureConfig(cal_edge_mm=0.5).with_subcell_from(meta)
    assert got.cal_edge_mm == pytest.approx(0.5)
    assert got.cal_width_mm == pytest.approx(0.17)
    # Kill switch zeroes everything.
    monkeypatch.setenv("TTI_READOUT_CAL", "0")
    got = MeasureConfig(cal_edge_mm=0.5).with_subcell_from(meta)
    assert got.cal_edge_mm == 0.0
    assert got.cal_width_mm == 0.0


def test_measure_config_sidecar_envelope_pin(monkeypatch):
    """A sidecar `subcell_envelope` pin beats the per-class soft keys (the
    deploy checkpoint carries its measured-best envelope readout); explicit
    config / env force still wins over the pin."""
    monkeypatch.delenv("TTI_SUBCELL_ENVELOPE", raising=False)
    meta = {"soft_stitch": True, "soft_fabric": False, "subcell_envelope": True}
    got = MeasureConfig().with_subcell_from(meta)
    assert got.subcell_edge is True
    assert got.envelope_subcell is True  # pin overrides soft_fabric=False
    got = MeasureConfig(subcell_envelope=False).with_subcell_from(meta)
    assert got.envelope_subcell is False  # explicit config wins
