"""Cross-framework FULL-predict-chain parity (the BASELINE north star:
mask IoU >= 0.999 vs the PyTorch/Ultralytics pipeline).

Unlike tests/test_model_parity.py (layer/forward numerics), this exercises the
ENTIRE chain the reference deployment runs — auto minimal-rect letterbox at the
predict imgsz, forward, DFL decode, confidence filter, class-aware NMS, mask
assembly with Ultralytics process_mask(upsample=True) semantics, scale_boxes
back to the frame, and the reference's own cv2.INTER_NEAREST mask resize to
frame resolution (reference: measurement.py:70-86,208-210) — side by side:

  oracle:  tests/torch_ref.ultralytics_predict — torch forward + real cv2
           preprocessing, reproducing Ultralytics' public predict semantics
           operation-for-operation (ultralytics itself is not installable in
           this environment; when it IS importable the harness swaps in the
           real ultralytics.YOLO — see tools/parity_report.py).
  tti:     tti.app.predict.Predictor — the jitted XLA chain.

Run at f32 / highest matmul precision (conftest) so differences measure design
parity, not accumulation noise.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
torch = pytest.importorskip("torch")

import jax.numpy as jnp

from tests.torch_ref import make_detecting_model, ultralytics_predict
from tti.app.predict import Predictor
from tti.core.config import ModelConfig
from tti.model.convert import convert_torch_state_dict
from tti.model.yolo import create_model


def _make_pair(imgsz: int, frame_hw: tuple[int, int], seed: int = 0):
    tmodel = make_detecting_model("n", nc=2, seed=seed)
    variables = convert_torch_state_dict(tmodel.state_dict())
    cfg = ModelConfig(
        variant="n", num_classes=2, image_size=imgsz, letterbox="rect",
        dtype="float32", conf_thresh=0.20, iou_thresh=0.25, max_detections=64,
        nms_pre_topk=256,
    )
    predictor = Predictor(cfg, variables, frame_hw, mask_topk=64,
                          model=create_model("n", nc=2, dtype=jnp.float32))
    return tmodel, predictor


def _mask_iou_np(a: np.ndarray, b: np.ndarray) -> float:
    a = a > 0.5
    b = b > 0.5
    union = np.logical_or(a, b).sum()
    if union == 0:
        return 1.0
    return float(np.logical_and(a, b).sum() / union)


def _textured_frame(h: int, w: int, seed: int) -> np.ndarray:
    """Smooth structured test frame (pure noise makes every mask boundary
    pixel a coin flip; real frames are piecewise smooth)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = (
        110 + 70 * np.sin(xx / 17.0 + rng.uniform(0, 6)) * np.cos(yy / 23.0)
        + 40 * np.sin((xx + 2 * yy) / 41.0)
    )
    frame = np.stack([base, np.roll(base, 5, 1), np.roll(base, 9, 0)], -1)
    frame += rng.normal(0, 6, size=frame.shape)
    return np.clip(frame, 0, 255).astype(np.uint8)


def test_full_chain_parity_no_resample():
    """Geometry with scale=1 (no resize, rect pad only): every stage except the
    resample is bit-comparable, so the whole chain must agree essentially
    exactly — detections identical, frame-res mask IoU >= 0.999 per instance."""
    imgsz, frame_hw = 256, (180, 256)  # rect: pads 180 -> 192 rows, no resize
    tmodel, predictor = _make_pair(imgsz, frame_hw)
    assert predictor.spec.scale == 1.0 and (predictor.spec.dst_h, predictor.spec.dst_w) == (192, 256)

    for seed in (0, 1):
        frame = _textured_frame(*frame_hw, seed=seed)
        ref = ultralytics_predict(tmodel, frame, imgsz=imgsz, conf_thresh=0.20,
                                  iou_thresh=0.25, max_det=64)
        got = predictor(frame[None])
        n_ref = len(ref["scores"])
        n_got = int(got.valid[0].sum())
        assert n_ref > 0, "oracle found no detections; test is vacuous"
        assert n_got == n_ref

        np.testing.assert_array_equal(got.classes[0, :n_got], ref["classes"])
        np.testing.assert_allclose(got.scores[0, :n_got], ref["scores"], atol=2e-5, rtol=0)
        np.testing.assert_allclose(got.boxes[0, :n_got], ref["boxes"], atol=0.02, rtol=0)

        masks_frame = predictor.masks_to_frame(got.masks_input[0, :n_got])
        ious = [
            _mask_iou_np(masks_frame[i], ref["masks_frame"][i]) for i in range(n_ref)
        ]
        assert min(ious) >= 0.999, f"frame-res mask IoU {ious}"


def test_full_chain_parity_with_resample():
    """Deployment-shaped geometry (scale 0.75, rect): the oracle letterboxes
    with cv2 on uint8 (Ultralytics quantizes the resized image to u8); tti
    resizes in float inside the fused graph. The sub-LSB input difference must
    not change the detection set, and masks must stay near-identical."""
    imgsz, frame_hw = 192, (256, 320)  # 0.6 scale -> content 154x192, dst 160x192
    tmodel, predictor = _make_pair(imgsz, frame_hw, seed=3)
    assert predictor.spec.scale == 0.6
    assert (predictor.spec.dst_h, predictor.spec.dst_w) == (160, 192)

    frame = _textured_frame(*frame_hw, seed=11)
    ref = ultralytics_predict(tmodel, frame, imgsz=imgsz, conf_thresh=0.20,
                              iou_thresh=0.25, max_det=64)
    got = predictor(frame[None])
    n_ref = len(ref["scores"])
    n_got = int(got.valid[0].sum())
    assert n_ref > 0

    # Match greedily by box proximity (order can swap for near-equal scores).
    used = set()
    pairs = []
    for i in range(n_got):
        best_j, best_d = None, 1e9
        for j in range(n_ref):
            if j in used:
                continue
            d = float(np.abs(got.boxes[0, i] - ref["boxes"][j]).max())
            if d < best_d:
                best_d, best_j = d, j
        if best_j is not None and best_d < 3.0:
            used.add(best_j)
            pairs.append((i, best_j, best_d))
    assert len(pairs) >= 0.9 * max(n_ref, n_got), (
        f"only {len(pairs)} of {n_ref}/{n_got} detections matched"
    )

    # Measured reality of this geometry: the cv2-u8 resize deviates from the
    # float resize by mean 0.27 / max 0.75 LSB per input pixel; a RANDOM
    # (BN-calibrated, chaotic) network amplifies that to ~1 px box shift and
    # ~0.94 mask IoU on blob-shaped masks. With the TRAINED deployment
    # checkpoint the same chain measures median mask IoU 0.999863 at this
    # geometry (PARITY_REPORT.md — `tools/parity_report.py --weights ...`);
    # the exact-chain claim is carried by test_full_chain_parity_no_resample.
    masks_frame = predictor.masks_to_frame(got.masks_input[0])
    ious = [_mask_iou_np(masks_frame[i], ref["masks_frame"][j]) for i, j, _ in pairs]
    assert np.median(ious) >= 0.9 and min(ious) >= 0.85, f"mask IoUs {ious}"
    for i, j, _ in pairs:
        assert abs(float(got.scores[0, i]) - float(ref["scores"][j])) < 2e-2
        assert int(got.classes[0, i]) == int(ref["classes"][j])
