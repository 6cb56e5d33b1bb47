"""int8 W8A8 post-training quantization (tti.model.quantize + Conv qmode).

Gates: tree-transform structure, bit-level agreement of the quantized Conv
block with an independent float emulation of the same integer math, and
detection-level agreement of the full quantized production pipeline with the
float pipeline on a trained checkpoint (the capability contract: PTQ must not
change what the inspector detects)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tti.model.convert import fold_batchnorm, load_checkpoint
from tti.model.quantize import quantize_conv_kernel, quantize_weights
from tti.model.yolo import create_model, init_variables

DEPLOY_CKPT = os.path.join(
    os.path.dirname(__file__), "..", "checkpoints", "yolov8n_textile.msgpack"
)


def test_quantize_tree_structure():
    model = create_model("n", nc=2)
    variables = init_variables(model, image_size=64)
    q = quantize_weights(fold_batchnorm(variables))
    p = q["params"]

    stem = p["m0"]
    assert np.asarray(stem["qkernel"]).dtype == np.int8
    assert stem["qscale"].shape == (np.asarray(stem["qkernel"]).shape[-1],)
    assert "conv" not in stem
    # C2f nested bottleneck blocks quantize too.
    assert np.asarray(p["m2"]["m0"]["cv1"]["qkernel"]).dtype == np.int8
    # Head exit 1x1 predictor convs stay float (params sit directly at the
    # module level, not under a 'conv' child).
    exit_conv = p["m22"]["cv2_0_2"]
    assert np.asarray(exit_conv["kernel"]).dtype == np.float32
    # Proto deconv upsample stays float.
    assert np.asarray(p["m22"]["proto"]["upsample"]["kernel"]).dtype == np.float32


def test_quantize_skip_paths():
    model = create_model("n", nc=2)
    variables = init_variables(model, image_size=64)
    q = quantize_weights(fold_batchnorm(variables), skip=("m22/proto",))
    proto = q["params"]["m22"]["proto"]
    assert "qkernel" not in proto["cv1"] and "kernel" in proto["cv1"]["conv"]
    # Non-skipped blocks still quantize.
    assert np.asarray(q["params"]["m0"]["qkernel"]).dtype == np.int8


def test_quantize_requires_folded():
    model = create_model("n", nc=2)
    variables = init_variables(model, image_size=64)
    with pytest.raises(ValueError, match="fold"):
        quantize_weights(variables)


def test_quantized_conv_matches_integer_emulation(rng):
    """Conv(qmode='int8') == independent emulation of the same int math.

    The emulation runs the conv in f32 on the integer-valued operands —
    exact (|acc| <= 3*3*16*127^2 ~ 2.3e6 < 2^24), so any mismatch is a bug
    in the quantized path, not accumulation noise."""
    from tti.model.layers import Conv

    c1, c2 = 16, 24
    x = rng.normal(size=(2, 9, 9, c1)).astype(np.float32) * 3.0
    kernel = rng.normal(size=(3, 3, c1, c2)).astype(np.float32) * 0.2
    bias = rng.normal(size=(c2,)).astype(np.float32)

    kq, wscale = quantize_conv_kernel(kernel)
    conv = Conv(c2, 3, 1, dtype=jnp.float32, folded=True, qmode="int8")
    out = conv.apply(
        {"params": {"qkernel": kq, "qscale": wscale, "bias": bias}}, x, train=False
    )

    # Emulation: quantize activations the same way, convolve exactly in f64.
    absmax = np.max(np.abs(x), axis=(1, 2, 3), keepdims=True)
    sx = np.maximum(absmax, 1e-12) / 127.0
    xq = np.clip(np.rint(x / sx), -127, 127)
    acc = jax.lax.conv_general_dilated(
        jnp.asarray(xq, jnp.float32),
        jnp.asarray(kq, jnp.float32),
        window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    want = np.asarray(acc) * (sx * wscale[None, None, None, :]) + bias
    want = want / (1.0 + np.exp(-want))  # SiLU
    np.testing.assert_allclose(np.asarray(out), want.astype(np.float32),
                               rtol=1e-5, atol=1e-5)


def test_quantized_conv_relative_error_small(rng):
    """W8A8 error on one block stays in the expected per-layer band (<2%)."""
    from tti.model.layers import Conv

    c1, c2 = 32, 32
    x = rng.normal(size=(1, 16, 16, c1)).astype(np.float32)
    kernel = (rng.normal(size=(3, 3, c1, c2)) * 0.1).astype(np.float32)
    bias = np.zeros((c2,), np.float32)

    fconv = Conv(c2, 3, 1, dtype=jnp.float32, folded=True)
    fout = fconv.apply({"params": {"conv": {"kernel": kernel, "bias": bias}}},
                       x, train=False)
    kq, wscale = quantize_conv_kernel(kernel)
    qconv = Conv(c2, 3, 1, dtype=jnp.float32, folded=True, qmode="int8")
    qout = qconv.apply(
        {"params": {"qkernel": kq, "qscale": wscale, "bias": bias}}, x, train=False
    )
    rel = np.linalg.norm(np.asarray(qout) - np.asarray(fout)) / np.linalg.norm(
        np.asarray(fout)
    )
    assert rel < 0.02, rel


@pytest.mark.skipif(not os.path.exists(DEPLOY_CKPT), reason="trained ckpt absent")
def test_quantized_pipeline_detections_match_float(monkeypatch):
    """Full production pipeline, trained weights: every confident float
    detection has an int8 counterpart of the same class with IoU > 0.9."""
    from tools.measure_report import FRAME_HW, PlaneMapper, make_measure_scene
    from tti.core.config import ModelConfig
    from tti.parallel.runtime import InspectionPipeline

    mapper = PlaneMapper()
    frame, _ = make_measure_scene(mapper, np.random.default_rng(7))
    frames = frame[None]

    def load():
        template = init_variables(create_model("n", nc=2), image_size=64)
        return load_checkpoint(DEPLOY_CKPT, template)

    cfg = ModelConfig(variant="n", num_classes=2, image_size=640, dtype="float32")
    monkeypatch.delenv("TTI_QUANT", raising=False)
    fpipe = InspectionPipeline(model_cfg=cfg, variables=load(), frame_hw=FRAME_HW,
                               undistort=False)
    fout = fpipe.process_batch(frames)
    monkeypatch.setenv("TTI_QUANT", "int8")
    qpipe = InspectionPipeline(model_cfg=cfg, variables=load(), frame_hw=FRAME_HW,
                               undistort=False)
    qout = qpipe.process_batch(frames)

    fmask = fout.valid[0] & (fout.scores[0] > 0.4)
    assert fmask.sum() > 0, "scene produced no confident float detections"
    qboxes = qout.boxes_frame[0][qout.valid[0]]
    qcls = qout.classes[0][qout.valid[0]]

    def iou(a, b):
        lt = np.maximum(a[:2], b[:, :2])
        rb = np.minimum(a[2:], b[:, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[:, 0] * wh[:, 1]
        area = (a[2] - a[0]) * (a[3] - a[1]) + (b[:, 2] - b[:, 0]) * (
            b[:, 3] - b[:, 1]
        )
        return inter / np.maximum(area - inter, 1e-9)

    for box, cls in zip(fout.boxes_frame[0][fmask], fout.classes[0][fmask]):
        same = qcls == cls
        assert same.any(), f"class {cls} lost under int8"
        assert iou(box, qboxes[same]).max() > 0.9, (box, cls)


# ---- static-calibration variant (qmode='int8s', VERDICT r3 item 3) --------


def test_calibration_covers_every_quantized_block(rng):
    """calibrate_act_scales' key set == the set quantize_weights quantizes.

    A missing key would silently run that block at ascale=1; quantize_weights
    therefore hard-requires full coverage — this pins that the calib model's
    sow paths line up with the quantizer's walk, and that a dropped block
    raises the documented error instead of mis-scaling."""
    from tti.model.quantize import calibrate_act_scales
    from tti.model.yolo import YOLOv8Seg

    model = create_model("n", nc=2)
    folded = fold_batchnorm(init_variables(model, image_size=64))
    calib_model = YOLOv8Seg(variant="n", nc=2, folded_bn=True, qmode="calib")
    x = rng.uniform(0, 1, size=(2, 64, 64, 3)).astype(np.float32)
    scales = calibrate_act_scales(calib_model, folded, [x, x * 0.5])
    assert all(v > 0 for v in scales.values())
    # Attaches cleanly (full coverage) ...
    q = quantize_weights(folded, act_scales=scales)
    assert float(q["params"]["m0"]["ascale"]) == pytest.approx(scales["m0"])
    assert "ascale" in q["params"]["m2"]["m0"]["cv1"]
    # ... and an incomplete scale set is an error, not a silent ascale=1.
    missing = dict(scales)
    missing.pop("m2/m0/cv1")
    with pytest.raises(ValueError, match="missing calibrated block"):
        quantize_weights(folded, act_scales=missing)


def test_static_int8_conv_matches_integer_emulation(rng):
    """Conv(qmode='int8s') == exact emulation of the static-scale int math."""
    from tti.model.layers import Conv

    c1, c2 = 16, 24
    x = rng.normal(size=(2, 9, 9, c1)).astype(np.float32) * 3.0
    kernel = rng.normal(size=(3, 3, c1, c2)).astype(np.float32) * 0.2
    bias = rng.normal(size=(c2,)).astype(np.float32)
    ascale = np.float32(np.max(np.abs(x)) / 127.0)

    kq, wscale = quantize_conv_kernel(kernel)
    conv = Conv(c2, 3, 1, dtype=jnp.float32, folded=True, qmode="int8s")
    out = conv.apply(
        {"params": {"qkernel": kq, "qscale": wscale, "bias": bias,
                    "ascale": ascale}}, x, train=False)

    xq = np.clip(np.rint(x / ascale), -127, 127)
    acc = jax.lax.conv_general_dilated(
        jnp.asarray(xq, jnp.float32), jnp.asarray(kq, jnp.float32),
        window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    want = np.asarray(acc) * (ascale * wscale[None, None, None, :]) + bias
    want = want / (1.0 + np.exp(-want))  # SiLU
    np.testing.assert_allclose(np.asarray(out), want.astype(np.float32),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not os.path.exists(DEPLOY_CKPT), reason="trained ckpt absent")
def test_static_int8_pipeline_detections_match_float(monkeypatch, tmp_path):
    """TTI_QUANT=int8s end to end: calibrate -> gate the production pipeline
    (incl. the m0->m0s2d stem-rename) -> detections match float like the
    dynamic variant's contract."""
    import json

    from tools.measure_report import FRAME_HW, PlaneMapper, make_measure_scene
    from tti.core.config import ModelConfig
    from tti.model.quantize import calibrate_act_scales
    from tti.model.yolo import YOLOv8Seg
    from tti.parallel.runtime import InspectionPipeline
    from tti.preprocess.letterbox import letterbox_u8, make_letterbox_spec

    mapper = PlaneMapper()
    frame, _ = make_measure_scene(mapper, np.random.default_rng(7))
    frames = frame[None]

    def load():
        template = init_variables(create_model("n", nc=2), image_size=64)
        return load_checkpoint(DEPLOY_CKPT, template)

    cfg = ModelConfig(variant="n", num_classes=2, image_size=640, dtype="float32")
    monkeypatch.delenv("TTI_QUANT", raising=False)
    fpipe = InspectionPipeline(model_cfg=cfg, variables=load(), frame_hw=FRAME_HW,
                               undistort=False)
    fout = fpipe.process_batch(frames)

    # Calibrate on the deployment frame itself through the predict preprocess
    # (plain-stem model, so the runtime must do the m0 -> m0s2d rename).
    calib_model = YOLOv8Seg(variant="n", nc=2, folded_bn=True, qmode="calib")
    spec = make_letterbox_spec(FRAME_HW[0], FRAME_HW[1], 640, "square")
    xb = letterbox_u8(frames, spec, jnp.float32)
    scales = calibrate_act_scales(calib_model, fold_batchnorm(load()), [xb])
    scales_file = tmp_path / "scales.json"
    scales_file.write_text(json.dumps({"scales": scales}))

    monkeypatch.setenv("TTI_QUANT", "int8s")
    monkeypatch.setenv("TTI_QUANT_SCALES", str(scales_file))
    qpipe = InspectionPipeline(model_cfg=cfg, variables=load(), frame_hw=FRAME_HW,
                               undistort=False)
    qout = qpipe.process_batch(frames)

    fmask = fout.valid[0] & (fout.scores[0] > 0.4)
    assert fmask.sum() > 0, "scene produced no confident float detections"
    qboxes = qout.boxes_frame[0][qout.valid[0]]
    qcls = qout.classes[0][qout.valid[0]]

    def iou(a, b):
        lt = np.maximum(a[:2], b[:, :2])
        rb = np.minimum(a[2:], b[:, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[:, 0] * wh[:, 1]
        area = (a[2] - a[0]) * (a[3] - a[1]) + (b[:, 2] - b[:, 0]) * (
            b[:, 3] - b[:, 1])
        return inter / np.maximum(area - inter, 1e-9)

    for box, cls in zip(fout.boxes_frame[0][fmask], fout.classes[0][fmask]):
        same = qcls == cls
        assert same.any(), f"class {cls} lost under int8s"
        assert iou(box, qboxes[same]).max() > 0.9, (box, cls)
