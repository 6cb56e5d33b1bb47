"""Occupancy-aware sub-cell boundary readout (TTI_SUBCELL_EDGE).

A soft-mask-trained net (tti train --soft-masks) calibrates boundary proto
cells to their occupied fraction; the reference-exact binary 0.5-threshold
then erodes the mask by up to half a cell per side (STATUS.md round-4
"Soft-checkpoint mm tradeoff": -0.16 mm edge / -0.10 mm width bias at the
deployment geometry). These tests pin the sub-cell estimator:

- the soft statistics' binary keys stay IDENTICAL to the binary oracle
  (instance_mask_stats_xla), so subcell mode changes nothing it shouldn't;
- the 0.5-crossing recovers designed boundaries exactly where the occupancy
  profile is linear, and to <= 0.086*q px where it is crisp (one fractional
  cell — the analytic worst case of interpolating a step through 0.5);
- end to end, prepare_frame_inputs(subcell=True) beats the binary path on a
  crisp ideal-occupancy scene for envelope, left and right edges;
- the default path is bit-identical with the feature merged (regression).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from tti.kernels.maskstats import (
    instance_mask_stats_soft,
    instance_mask_stats_xla,
    subcell_col_extent,
)
from tti.measure.pipeline import (
    _mask_center_to_frame,
    prepare_frame_inputs,
)
from tti.postprocess.decode import Detections
from tti.preprocess.letterbox import LetterboxSpec


def _logit(p):
    p = np.clip(p, 1e-4, 1.0 - 1e-4)
    return np.log(p / (1.0 - p))


def _identity_spec(imgsz: int) -> LetterboxSpec:
    return LetterboxSpec(src_h=imgsz, src_w=imgsz, dst_h=imgsz, dst_w=imgsz,
                         scale=1.0, new_h=imgsz, new_w=imgsz,
                         pad_top=0, pad_left=0)


def test_soft_stats_binary_contract_matches_xla():
    rng = np.random.default_rng(0)
    hm, wm, nm, d = 12, 16, 4, 5
    protos = rng.normal(size=(hm, wm, nm)).astype(np.float32)
    coefs = rng.normal(size=(d, nm)).astype(np.float32)
    boxes = np.array([[1, 1, 14, 10]] * d, np.float32)
    valid = np.array([True, True, False, True, True])

    ref = instance_mask_stats_xla(
        jnp.asarray(protos), jnp.asarray(coefs), jnp.asarray(boxes), jnp.asarray(valid))
    soft = instance_mask_stats_soft(
        jnp.asarray(protos), jnp.asarray(coefs), jnp.asarray(boxes), jnp.asarray(valid))
    for k in ("m00", "m10", "m01", "col_any", "bottom"):
        np.testing.assert_allclose(np.asarray(soft[k]), np.asarray(ref[k]),
                                   atol=1e-5, err_msg=k)
    # Soft moments integrate the probability field: bounded by the box area,
    # positive where the binary mask is non-empty.
    assert np.all(np.asarray(soft["m00s"])[np.asarray(ref["m00"]) > 0] > 0)
    assert np.all(np.asarray(soft["m00s"]) <= 13 * 9 + 1e-3)


def test_bottom_sub_recovers_linear_crossing(monkeypatch):
    """p linear through 0.5 across adjacent rows -> crossing index is exact.
    f32-pinned: bf16 logits resolve the crossing at ~1/256 cell, coarser
    than this test's 1e-3 exactness bar (the production default trades that
    resolution for +8.5% e2e — STATUS.md round-5 item 3)."""
    monkeypatch.setenv("TTI_MASKSTATS_LOGITS", "f32")
    hm, wm = 16, 8
    r_star = 5.4  # designed crossing index
    rows = np.arange(hm, dtype=np.float64)
    p = np.clip(0.5 - (rows - r_star) * 0.25, 0.0, 1.0)  # linear around 0.5
    protos = np.repeat(_logit(p)[:, None], wm, axis=1)[..., None].astype(np.float32)

    out = instance_mask_stats_soft(
        jnp.asarray(protos), jnp.ones((1, 1), jnp.float32),
        jnp.asarray([[0, 0, wm, hm]], jnp.float32), jnp.asarray([True]))
    np.testing.assert_allclose(np.asarray(out["bottom_sub"])[0], r_star, atol=1e-3)
    # Binary bottom row is the integer floor-to->=0.5 row.
    np.testing.assert_array_equal(np.asarray(out["bottom"])[0], 5.0)


def test_bottom_sub_empty_column_sentinel():
    protos = np.full((8, 4, 1), -10.0, np.float32)
    out = instance_mask_stats_soft(
        jnp.asarray(protos), jnp.ones((1, 1), jnp.float32),
        jnp.asarray([[0, 0, 4, 8]], jnp.float32), jnp.asarray([True]))
    assert np.all(np.asarray(out["bottom_sub"]) == -1.0)


def test_subcell_col_extent_linear_crossings():
    w = 16
    l_star, r_star = 3.25, 11.75
    cols = np.arange(w, dtype=np.float64)
    prof = np.minimum(
        np.clip(0.5 + (cols - l_star) * 0.25, 0.0, 1.0),
        np.clip(0.5 - (cols - r_star) * 0.25, 0.0, 1.0),
    )
    left, right, any_occ = subcell_col_extent(jnp.asarray(prof[None], jnp.float32))
    assert bool(any_occ[0])
    np.testing.assert_allclose(float(left[0]), l_star, atol=1e-3)
    np.testing.assert_allclose(float(right[0]), r_star, atol=1e-3)


def test_subcell_recovers_subpixel_boundaries_e2e():
    """Crisp ideal-occupancy scene: a fabric band with its lower boundary at
    input y=11.9 and a stitch band spanning x=[6.7, 12.2] on a q=2 grid. The
    binary readout is off by up to ~a cell; subcell lands within 0.2 px
    (<= 0.086*q analytic worst case) and beats binary on every boundary."""
    imgsz, q = 32, 2
    hm = wm = imgsz // q
    spec = _identity_spec(imgsz)
    y_star, xl_star, xr_star = 11.9, 6.7, 12.2

    # Cell r spans input [q*r - 0.5, q*r + q - 0.5) in pixel-center coords.
    def frac_below(r):  # fabric occupies y < y_star
        return np.clip((y_star - (q * r - 0.5)) / q, 0.0, 1.0)

    def frac_x(c):  # stitch occupies xl_star <= x <= xr_star
        lo, hi = q * c - 0.5, q * c + q - 0.5
        return np.clip((min(xr_star, hi) - max(xl_star, lo)) / q, 0.0, 1.0)

    protos = np.full((hm, wm, 2), -10.0, np.float32)
    for c in range(wm):  # ch0: stitch, rows 2..4 exactly (full cells)
        protos[2:5, c, 0] = _logit(frac_x(c))
    for r in range(hm):  # ch1: fabric band, all columns
        protos[r, :, 1] = _logit(frac_below(r))

    dets = Detections(
        boxes=jnp.asarray(np.array([[0, 0, imgsz, imgsz]] * 2, np.float32)),
        scores=jnp.asarray(np.array([0.9, 0.8], np.float32)),
        classes=jnp.asarray(np.array([0, 1], np.int32)),
        coefs=jnp.asarray(np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)),
        valid=jnp.asarray(np.array([True, True])),
    )

    def run(subcell):
        stitches, envelope, fabric_any, _ = prepare_frame_inputs(
            dets, jnp.asarray(protos), spec, 0, 1, None,
            max_stitches=4, subcell=subcell)
        assert bool(fabric_any) and bool(stitches.valid[0])
        if subcell:
            env_y = float(_mask_center_to_frame(
                jnp.asarray(float(np.asarray(envelope)[8])), 0.0, 1.0, q))
        else:
            env_y = float(np.asarray(envelope)[8]) * q + (q - 1)  # bottom px
        return env_y, float(stitches.left[0]), float(stitches.right[0])

    env_b, left_b, right_b = run(False)
    env_s, left_s, right_s = run(True)

    assert abs(env_s - y_star) < 0.2
    assert abs(left_s - xl_star) < 0.2
    assert abs(right_s - xr_star) < 0.2
    assert abs(env_s - y_star) < abs(env_b - y_star)
    assert abs(left_s - xl_star) < abs(left_b - xl_star)
    assert abs(right_s - xr_star) < abs(right_b - xr_star)


def test_default_binary_path_unchanged():
    """Feature off => byte-identical statistics to the binary oracle path
    (the reference-exact semantics stay the default)."""
    rng = np.random.default_rng(1)
    imgsz, q = 32, 4
    hm = wm = imgsz // q
    spec = _identity_spec(imgsz)
    protos = rng.normal(size=(hm, wm, 2)).astype(np.float32) * 4
    dets = Detections(
        boxes=jnp.asarray(np.array([[0, 0, imgsz, imgsz]] * 2, np.float32)),
        scores=jnp.asarray(np.array([0.9, 0.8], np.float32)),
        classes=jnp.asarray(np.array([0, 1], np.int32)),
        coefs=jnp.asarray(np.eye(2, dtype=np.float32)),
        valid=jnp.asarray(np.array([True, True])),
    )
    a = prepare_frame_inputs(dets, jnp.asarray(protos), spec, 0, 1, None, 4)
    b = prepare_frame_inputs(dets, jnp.asarray(protos), spec, 0, 1, None, 4,
                             subcell=False)
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    for f in ("cx", "cy", "left", "right"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a[0], f)), np.asarray(getattr(b[0], f)))
    assert a[1].dtype == jnp.int32  # integer envelope semantics preserved


def test_pipeline_e2e_subcell():
    """Full inference chain with subcell_edge on: the vmapped soft statistics
    compile and produce a float envelope + finite measurement fields."""
    from tti.calib.io import CalibrationData
    from tti.core.config import MeasureConfig, ModelConfig
    from tti.model.yolo import create_model, init_variables
    from tti.parallel.runtime import InspectionPipeline

    rng = np.random.default_rng(7)
    imgsz = 64
    frame_hw = (48, 64)
    K = np.array([[900.0 * 64 / 1280, 0, 636.0 * 64 / 1280],
                  [0, 884.0 * 48 / 960, 422.0 * 48 / 960],
                  [0, 0, 1.0]])
    calib = CalibrationData(
        K=K, dist=np.array([0.08, 0.05, -0.04, -0.005, -0.13]),
        rvec=np.array([-0.863, -0.392, -1.359]),
        tvec=np.array([0.005, 0.036, 0.094]),
    )
    cfg = ModelConfig(variant="n", num_classes=2, image_size=imgsz,
                      dtype="float32", letterbox="square", mask_stride=2,
                      max_detections=16, proto_head="subpixel")
    model = create_model("n", nc=2, mask_stride=2, proto_head="subpixel")
    variables = init_variables(model, image_size=imgsz)
    pipe = InspectionPipeline(
        model_cfg=cfg, variables=variables, frame_hw=frame_hw,
        calibration=calib,
        measure_cfg=MeasureConfig(max_stitches=8, subcell_edge=True),
    )
    frames = rng.integers(0, 255, size=(2, *frame_hw, 3), dtype=np.uint8)
    outs = pipe.process_batch(frames)
    assert outs.measurements is not None
    env = np.asarray(outs.envelope)
    assert env.dtype == np.float32  # sub-cell crossing indices, not rows
    assert env.shape[0] == 2


def test_config_env_gate():
    from tti.core.config import load_config

    cfg = load_config(dotenv_path=None,
                      env={"TTI_SUBCELL_EDGE": "1", "DB_HOST": "h",
                           "DB_USER": "u", "DB_PASSWORD": "p",
                           "DB_NAME": "n", "DB_TABLE": "t"},
                      validate=False)
    assert cfg.measure.subcell_edge is True
    # Unset = AUTO (None): loaders resolve against the checkpoint sidecar.
    cfg2 = load_config(dotenv_path=None, env={}, validate=False)
    assert cfg2.measure.subcell_edge is None
    cfg3 = load_config(dotenv_path=None, env={"TTI_SUBCELL_EDGE": "0"},
                       validate=False)
    assert cfg3.measure.subcell_edge is False


def test_subcell_auto_resolution_from_sidecar():
    """with_subcell_from: auto follows the sidecar's soft_masks flag; an
    explicit setting (env TTI_SUBCELL_EDGE) always wins."""
    from tti.core.config import MeasureConfig

    auto = MeasureConfig()
    assert auto.with_subcell_from({"soft_masks": True}).subcell_edge is True
    assert auto.with_subcell_from({"soft_masks": False}).subcell_edge is False
    assert auto.with_subcell_from({}).subcell_edge is False  # legacy sidecars
    forced_off = MeasureConfig(subcell_edge=False)
    assert forced_off.with_subcell_from({"soft_masks": True}).subcell_edge is False
    forced_on = MeasureConfig(subcell_edge=True)
    assert forced_on.with_subcell_from({}).subcell_edge is True


def test_deploy_sidecar_declares_soft_masks():
    """The committed soft-trained deploy checkpoint must carry the flag the
    auto readout keys on (a soft net read with the binary threshold loses
    ~0.13 mm of boundary per side — MEASURE_REPORT.md A/B)."""
    import os

    from tti.model.convert import checkpoint_metadata

    path = os.path.join(os.path.dirname(__file__), "..",
                        "checkpoints", "yolov8n_textile_cam.msgpack")
    if not os.path.exists(path + ".json"):
        import pytest

        pytest.skip("deploy checkpoint not present")
    meta = checkpoint_metadata(path)
    assert meta.get("soft_masks") is True
    assert meta.get("proto_head") == "subpixel"


def test_measure_frame_compiles_with_subcell_cfg():
    """measure_frame jits with subcell_edge=True and a float envelope."""
    from tti.core.config import MeasureConfig
    from tti.measure.pipeline import CameraParams, StitchSet, measure_frame
    from tti.preprocess.letterbox import letterbox_spec

    K = np.array([[900.0, 0, 640], [0, 900.0, 480], [0, 0, 1]])
    dist = np.zeros(5)
    rvec = np.array([0.0, 0.0, 0.0])
    tvec = np.array([0.0, 0.0, 0.3])

    class _C:
        pass

    c = _C()
    c.K, c.dist, c.rvec, c.tvec = K, dist, rvec, tvec
    cam = CameraParams.from_calibration(c)
    spec = letterbox_spec(960, 1280, 960)
    cfg = MeasureConfig(subcell_edge=True, min_stitches=1)

    n = 8
    stitches = StitchSet(
        cx=jnp.linspace(300.0, 900.0, n), cy=jnp.full((n,), 500.0),
        left=jnp.linspace(290.0, 890.0, n), right=jnp.linspace(310.0, 910.0, n),
        valid=jnp.ones((n,), bool),
    )
    envelope = jnp.full((spec.dst_w // 2,), 380.25, jnp.float32)  # float subcell
    meas = measure_frame(stitches, envelope, jnp.asarray(True), cam, spec, cfg)
    assert np.isfinite(float(meas.raw_edge_mm))
    assert np.isfinite(float(meas.raw_width_mm))


def test_per_class_split_readout():
    """subcell=True + subcell_envelope=False (the `--soft-masks stitch`
    deployment): the envelope is bit-identical to the all-binary path
    (reference-exact integer rows from the soft stats' binary `bottom`
    field) while the stitch readout keeps the sub-cell crossings of the
    all-soft path."""
    rng = np.random.default_rng(3)
    imgsz, q = 32, 2
    hm = wm = imgsz // q
    spec = _identity_spec(imgsz)
    protos = rng.normal(size=(hm, wm, 2)).astype(np.float32) * 3
    dets = Detections(
        boxes=jnp.asarray(np.array([[0, 0, imgsz, imgsz]] * 2, np.float32)),
        scores=jnp.asarray(np.array([0.9, 0.8], np.float32)),
        classes=jnp.asarray(np.array([0, 1], np.int32)),
        coefs=jnp.asarray(np.eye(2, dtype=np.float32)),
        valid=jnp.asarray(np.array([True, True])),
    )
    args = (dets, jnp.asarray(protos), spec, 0, 1, None, 4)
    st_bin, env_bin, _, _ = prepare_frame_inputs(*args, subcell=False)
    st_soft, env_soft, _, _ = prepare_frame_inputs(*args, subcell=True)
    st_split, env_split, _, _ = prepare_frame_inputs(
        *args, subcell=True, subcell_envelope=False)

    assert env_split.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(env_split), np.asarray(env_bin))
    assert env_soft.dtype == jnp.float32
    for f in ("cx", "cy", "left", "right"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st_split, f)), np.asarray(getattr(st_soft, f)))

    # And the inverse split (fabric soft, stitch binary).
    st_inv, env_inv, _, _ = prepare_frame_inputs(
        *args, subcell=False, subcell_envelope=True)
    np.testing.assert_array_equal(np.asarray(env_inv), np.asarray(env_soft))
    for f in ("cx", "cy", "left", "right"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st_inv, f)), np.asarray(getattr(st_bin, f)))


def test_with_subcell_from_per_class_sidecar():
    """Per-class sidecar keys split the readouts; legacy single-flag sidecars
    keep envelope == stitch behavior; env forcing wins."""
    from tti.core.config import MeasureConfig, load_config

    auto = MeasureConfig()
    split = auto.with_subcell_from({"soft_stitch": True, "soft_fabric": False})
    assert split.subcell_edge is True
    assert split.subcell_envelope is False
    assert split.envelope_subcell is False

    legacy = auto.with_subcell_from({"soft_masks": True})
    assert legacy.subcell_edge is True
    assert legacy.subcell_envelope is None  # follows subcell_edge
    assert legacy.envelope_subcell is True

    inv = auto.with_subcell_from({"soft_stitch": False, "soft_fabric": True})
    assert inv.subcell_edge is False
    assert inv.envelope_subcell is True

    forced = MeasureConfig(subcell_envelope=True).with_subcell_from(
        {"soft_stitch": True, "soft_fabric": False})
    assert forced.envelope_subcell is True

    cfg = load_config(dotenv_path=None,
                      env={"TTI_SUBCELL_ENVELOPE": "0"}, validate=False)
    assert cfg.measure.subcell_envelope is False
