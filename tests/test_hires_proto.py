"""Hi-res proto head (mask_stride=2) — a tti extension past the reference.

The measured resolution ceiling (MASK_CEILING.md) shows stitch mask AP is
bounded by the proto grid (input/4 in the Ultralytics export the reference
deploys: /root/reference/measurement.py:208-210). mask_stride=2 doubles the
proto grid with a second learned upsample stage. These tests pin:

- forward protos shape at input/2 for both train and inference graphs,
- one DP train step compiles and decreases loss with GT at the /2 grid,
- the full inference pipeline (s2d/folded-BN transforms + measurement)
  runs end-to-end with a mask_stride=2 model,
- the torch exporter refuses hi-res trees (no Ultralytics counterpart).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from tti.model.yolo import create_model, init_variables
from tti.train.step import Targets, create_train_state, make_train_step


def test_forward_proto_shape_stride2(rng):
    model = create_model("n", nc=2, mask_stride=2)
    variables = init_variables(model, image_size=64)
    x = jnp.asarray(rng.uniform(0, 1, size=(1, 64, 64, 3)).astype(np.float32))
    raw = model.apply(variables, x, train=False)
    assert raw.protos.shape == (1, 32, 32, 32)
    # Default stays at /4.
    model4 = create_model("n", nc=2)
    vars4 = init_variables(model4, image_size=64)
    assert model4.apply(vars4, x, train=False).protos.shape == (1, 16, 16, 32)


def test_train_step_stride2_decreases_loss(rng):
    imgsz = 32
    model = create_model("n", nc=2, mask_stride=2)
    variables = init_variables(model, image_size=imgsz)
    state, tx = create_train_state(model, variables, learning_rate=5e-3)
    step = make_train_step(model, tx, (imgsz, imgsz))

    batch, max_gt = 2, 2
    hm = imgsz // 2
    images = rng.uniform(0, 1, size=(batch, imgsz, imgsz, 3)).astype(np.float32)
    boxes = np.tile(np.array([[4, 4, 24, 24], [8, 8, 28, 28]], np.float32),
                    (batch, 1, 1))
    targets = Targets(
        boxes=jnp.asarray(boxes),
        classes=jnp.asarray(np.zeros((batch, max_gt), np.int32)),
        masks=jnp.asarray(
            (rng.uniform(size=(batch, max_gt, hm, hm)) > 0.5).astype(np.float32)),
        valid=jnp.ones((batch, max_gt), bool),
    )
    losses = []
    for _ in range(4):
        state, metrics = step(state, jnp.asarray(images), targets)
        losses.append(float(np.asarray(metrics["total"])))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_subpixel_proto_head(rng):
    """The round-4 sub-pixel hi-res head: protos at input/2 with ALL compute
    on the input/4 grid (1x1 conv to 4*nm phases + depth-to-space). Pins the
    output shape, parameter economy vs the deconv head, and that a train
    step with per-class seg gains runs and stays finite."""
    imgsz = 32
    model = create_model("n", nc=2, mask_stride=2, proto_head="subpixel")
    variables = init_variables(model, image_size=imgsz)
    x = jnp.asarray(rng.uniform(0, 1, size=(1, imgsz, imgsz, 3)).astype(np.float32))
    raw = model.apply(variables, x, train=False)
    assert raw.protos.shape == (1, imgsz // 2, imgsz // 2, 32)

    # No deconv-stage params; the subpixel 1x1 exists.
    proto_params = variables["params"]["m22"]["proto"]
    assert "cv3sp" in proto_params and "upsample2" not in proto_params
    assert "cv2b" not in proto_params and "cv3" not in proto_params

    # Train step with stitch-weighted seg loss (gain 2 on class 0).
    state, tx = create_train_state(model, variables, learning_rate=5e-3)
    step = make_train_step(model, tx, (imgsz, imgsz),
                           seg_class_gains=[2.0, 1.0])
    batch, max_gt = 2, 2
    hm = imgsz // 2
    images = rng.uniform(0, 1, size=(batch, imgsz, imgsz, 3)).astype(np.float32)
    boxes = np.tile(np.array([[4, 4, 24, 24], [8, 8, 28, 28]], np.float32),
                    (batch, 1, 1))
    targets = Targets(
        boxes=jnp.asarray(boxes),
        classes=jnp.asarray(np.zeros((batch, max_gt), np.int32)),
        masks=jnp.asarray(
            (rng.uniform(size=(batch, max_gt, hm, hm)) > 0.5).astype(np.float32)),
        valid=jnp.ones((batch, max_gt), bool),
    )
    losses = []
    for _ in range(3):
        state, metrics = step(state, jnp.asarray(images), targets)
        losses.append(float(np.asarray(metrics["total"])))
    assert all(np.isfinite(losses))


def test_seg_class_gains_scale_the_seg_loss(rng):
    """gains=[1,1] must reproduce the unweighted loss exactly; a stitch gain
    of 2 on an all-stitch scene must exactly double the seg term."""
    from tti.train.losses import seg_loss

    hm = wm = 16
    protos = jnp.asarray(rng.normal(size=(hm, wm, 8)).astype(np.float32))
    coefs = jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32))
    gt_masks = jnp.asarray((rng.uniform(size=(4, hm, wm)) > 0.5).astype(np.float32))
    gt_boxes = jnp.asarray(np.array([[0, 0, 12, 12]] * 4, np.float32))
    assigned = jnp.asarray(rng.integers(0, 4, size=32).astype(np.int32))
    pos = jnp.asarray(rng.uniform(size=32) > 0.5)

    base = seg_loss(coefs, protos, gt_masks, gt_boxes, assigned, pos)
    ones = seg_loss(coefs, protos, gt_masks, gt_boxes, assigned, pos,
                    anchor_weights=jnp.ones(32))
    twos = seg_loss(coefs, protos, gt_masks, gt_boxes, assigned, pos,
                    anchor_weights=jnp.full(32, 2.0))
    assert float(base) == float(ones)
    np.testing.assert_allclose(float(twos), 2 * float(base), rtol=1e-6)


@pytest.mark.parametrize("proto_head", ["deconv", "subpixel"])
def test_pipeline_e2e_stride2(rng, proto_head):
    """Full inference chain (preprocess -> forward -> NMS -> mask stats ->
    measurement) with the hi-res head (both second-stage architectures):
    every downstream stage derives its grid from protos.shape, so nothing
    may assume /4."""
    from tti.calib.io import CalibrationData
    from tti.core.config import MeasureConfig, ModelConfig
    from tti.parallel.runtime import InspectionPipeline

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
                      max_detections=16, proto_head=proto_head)
    model = create_model("n", nc=2, mask_stride=2, proto_head=proto_head)
    variables = init_variables(model, image_size=imgsz)
    pipe = InspectionPipeline(
        model_cfg=cfg, variables=variables, frame_hw=frame_hw,
        calibration=calib, measure_cfg=MeasureConfig(max_stitches=8),
        return_masks=True,
    )
    frames = rng.integers(0, 255, size=(2, *frame_hw, 3), dtype=np.uint8)
    outs = pipe.process_batch(frames)
    assert outs.boxes_frame.shape == (2, 16, 4)
    assert outs.measurements is not None
    # Masks come back at the /2 proto grid upsampled to input — shape pinned
    # by the letterbox spec, not the proto stride.
    assert outs.masks.shape[:2] == (2, 16)
    assert np.all(np.isfinite(np.asarray(outs.boxes_frame)))


def test_to_torch_rejects_stride2():
    from tti.model.convert import to_torch_state_dict

    model = create_model("n", nc=2, mask_stride=2)
    variables = init_variables(model, image_size=32)
    with pytest.raises(ValueError, match="mask_stride=2"):
        to_torch_state_dict(variables)


@pytest.mark.parametrize("q", [2, 4])
def test_measure_grid_mapping_matches_nearest_upsample(q):
    """Regression for the round-3 mm-report collapse: the measure pipeline's
    mask-grid -> frame-px relations must use the ACTUAL proto stride (derived
    from protos.shape), not the Ultralytics /4 constant. Ground truth: the
    statistics of the NEAREST-upsampled full-res mask, computed directly."""
    from tti.measure.pipeline import prepare_frame_inputs
    from tti.postprocess.decode import Detections
    from tti.preprocess.letterbox import LetterboxSpec

    imgsz = 32
    hm = wm = imgsz // q
    spec = LetterboxSpec(src_h=imgsz, src_w=imgsz, dst_h=imgsz, dst_w=imgsz,
                         scale=1.0, new_h=imgsz, new_w=imgsz,
                         pad_top=0, pad_left=0)

    # Proto ch0: stitch rect cells rows 2..3 x cols 1..4; ch1: fabric band
    # rows 5..6 full width. +-10 logits saturate the sigmoid threshold.
    protos = np.full((hm, wm, 2), -10.0, np.float32)
    protos[2:4, 1:5, 0] = 10.0
    protos[5:7, :, 1] = 10.0
    dets = Detections(
        boxes=jnp.asarray(np.array([[0, 0, imgsz, imgsz]] * 2, np.float32)),
        scores=jnp.asarray(np.array([0.9, 0.8], np.float32)),
        classes=jnp.asarray(np.array([0, 1], np.int32)),
        coefs=jnp.asarray(np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)),
        valid=jnp.asarray(np.array([True, True])),
    )
    stitches, envelope, fabric_any, _ = prepare_frame_inputs(
        dets, jnp.asarray(protos), spec, 0, 1, None, max_stitches=4)

    # Direct truth: NEAREST-upsample the cell mask to input px and measure.
    cell = (protos[..., 0] > 0)
    up = np.kron(cell, np.ones((q, q), bool))
    ys, xs = np.nonzero(up)
    assert bool(fabric_any)
    assert bool(stitches.valid[0]) and not bool(stitches.valid[1])
    np.testing.assert_allclose(float(stitches.cx[0]), xs.mean(), atol=1e-4)
    np.testing.assert_allclose(float(stitches.cy[0]), ys.mean(), atol=1e-4)
    assert float(stitches.left[0]) == xs.min()
    assert float(stitches.right[0]) == xs.max()
    # Envelope rows are cell indices; the bottom-of-block relation is applied
    # downstream — check the cells themselves here.
    np.testing.assert_array_equal(np.asarray(envelope), np.full(wm, 6))
