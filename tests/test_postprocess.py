"""Decode / NMS / mask assembly tests (fixed-shape XLA postprocess)."""

import numpy as np
import pytest

from tti.postprocess.decode import make_anchors
from tti.postprocess.masks import assemble_masks, crop_masks, mask_iou
from tti.postprocess.nms import batched_nms, box_iou_matrix


def _nms_reference(boxes, scores, classes, iou_thresh):
    """Plain-python greedy NMS oracle (torchvision semantics)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j] or classes[j] != classes[i]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0]); yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2]); yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / max(a + b - inter, 1e-9) > iou_thresh:
                suppressed[j] = True
    return keep


def test_make_anchors_counts():
    pts, strides = make_anchors(((80, 80), (40, 40), (20, 20)))
    assert pts.shape == (80 * 80 + 40 * 40 + 20 * 20, 2)
    # First anchor of each level is at (stride/2, stride/2).
    assert np.allclose(np.asarray(pts)[0], [4.0, 4.0])
    assert np.allclose(np.asarray(pts)[6400], [8.0, 8.0])
    assert np.allclose(np.asarray(strides)[:6400], 8.0)


def test_box_iou_matrix_basics():
    boxes = np.array(
        [[0, 0, 10, 10], [0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], np.float32
    )
    iou = np.asarray(box_iou_matrix(boxes))
    assert iou[0, 1] == pytest.approx(1.0)
    assert iou[0, 2] == pytest.approx(25 / 175, abs=1e-5)
    assert iou[0, 3] == 0.0


@pytest.mark.parametrize("seed", [0, 1, 2, 7, 13])
def test_nms_matches_reference_oracle(seed):
    rng = np.random.default_rng(seed)
    n, nc = 120, 2
    boxes = np.zeros((n, 4), np.float32)
    centers = rng.uniform(50, 600, size=(n, 2))
    wh = rng.uniform(10, 60, size=(n, 2))
    boxes[:, :2] = centers - wh / 2
    boxes[:, 2:] = centers + wh / 2
    scores = rng.uniform(0, 1, size=n).astype(np.float32)
    classes = rng.integers(0, nc, size=n)
    probs = np.full((n, nc), 1e-6, np.float32)
    probs[np.arange(n), classes] = scores
    coefs = rng.normal(size=(n, 32)).astype(np.float32)

    iou_t, conf_t = 0.25, 0.20
    dets = batched_nms(
        boxes[None], probs[None], coefs[None],
        conf_thresh=conf_t, iou_thresh=iou_t, max_det=200, pre_topk=128,
    )
    got = set()
    for b, s, c, v in zip(
        np.asarray(dets.boxes[0]), np.asarray(dets.scores[0]),
        np.asarray(dets.classes[0]), np.asarray(dets.valid[0]),
    ):
        if v:
            got.add((round(float(b[0]), 2), round(float(s), 4), int(c)))

    mask = scores >= conf_t
    keep = _nms_reference(boxes[mask], scores[mask], classes[mask], iou_t)
    expected = set()
    bm, sm, cm = boxes[mask], scores[mask], classes[mask]
    for i in keep:
        expected.add((round(float(bm[i, 0]), 2), round(float(sm[i]), 4), int(cm[i])))
    assert got == expected


def test_nms_class_aware(rng):
    """Identical overlapping boxes of different classes both survive."""
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    probs = np.array([[0.9, 0.0], [0.0, 0.8]], np.float32)
    coefs = np.zeros((2, 32), np.float32)
    dets = batched_nms(boxes[None], probs[None], coefs[None],
                       conf_thresh=0.2, iou_thresh=0.25, max_det=10, pre_topk=8)
    assert int(np.asarray(dets.valid).sum()) == 2


def test_nms_empty_frame():
    boxes = np.zeros((1, 50, 4), np.float32)
    probs = np.zeros((1, 50, 2), np.float32)
    coefs = np.zeros((1, 50, 32), np.float32)
    dets = batched_nms(boxes, probs, coefs, conf_thresh=0.2, iou_thresh=0.25,
                       max_det=20, pre_topk=32)
    assert int(np.asarray(dets.valid).sum()) == 0
    assert np.all(np.asarray(dets.classes) == -1)


def test_crop_masks():
    masks = np.ones((2, 8, 8), np.float32)
    boxes = np.array([[2, 2, 6, 6], [0, 0, 8, 4]], np.float32)
    out = np.asarray(crop_masks(masks, boxes))
    assert out[0].sum() == 16
    assert out[1].sum() == 32
    assert out[0, 0, 0] == 0 and out[0, 3, 3] == 1


def test_assemble_masks_matches_manual(rng):
    hm = wm = 16
    nm, n = 32, 4
    protos = rng.normal(size=(hm, wm, nm)).astype(np.float32)
    coefs = rng.normal(size=(n, nm)).astype(np.float32)
    boxes = np.array([[0, 0, 64, 64]] * n, np.float32)  # full input (input 64px)
    valid = np.array([True, True, False, True])

    got = np.asarray(assemble_masks(protos, coefs, boxes, valid, (64, 64)))
    manual = 1.0 / (1.0 + np.exp(-(coefs @ protos.reshape(-1, nm).T).reshape(n, hm, wm)))
    manual = (manual > 0.5).astype(np.float32) * valid[:, None, None]
    np.testing.assert_allclose(got, manual, atol=1e-5)


def test_mask_iou_metric():
    a = np.zeros((10, 10)); a[:5] = 1
    b = np.zeros((10, 10)); b[:5] = 1
    assert float(mask_iou(a, b)) == pytest.approx(1.0)
    b2 = np.zeros((10, 10)); b2[2:7] = 1
    assert float(mask_iou(a, b2)) == pytest.approx(30 / 70, abs=1e-6)


@pytest.mark.parametrize("seed", [0, 3])
def test_lazy_decode_matches_dense(seed):
    """nms_from_raw (logit-ranked top-k, decode-after-gather) must reproduce
    decode_predictions + batched_nms exactly on random raw heads."""
    import jax.numpy as jnp

    from tti.model.yolo import RawPredictions, REG_MAX
    from tti.postprocess.decode import decode_predictions
    from tti.postprocess.nms import nms_from_raw

    rng = np.random.default_rng(seed)
    b, nc, nm = 2, 2, 32
    hw = ((16, 16), (8, 8), (4, 4))
    mk = lambda c: tuple(
        jnp.asarray(rng.normal(0, 2, (b, h, w, c)).astype(np.float32)) for h, w in hw
    )
    raw = RawPredictions(
        box=mk(4 * REG_MAX), cls=mk(nc), mcoef=mk(nm),
        protos=jnp.zeros((b, 32, 32, nm), np.float32),
    )

    boxes, probs, coefs = decode_predictions(raw)
    dense = batched_nms(boxes, probs, coefs, conf_thresh=0.20, iou_thresh=0.25,
                        max_det=50, pre_topk=128)
    lazy = nms_from_raw(raw, conf_thresh=0.20, iou_thresh=0.25, max_det=50,
                        pre_topk=128)

    assert np.array_equal(np.asarray(dense.valid), np.asarray(lazy.valid))
    v = np.asarray(dense.valid)
    np.testing.assert_allclose(
        np.asarray(dense.boxes)[v], np.asarray(lazy.boxes)[v], rtol=0, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(dense.scores)[v], np.asarray(lazy.scores)[v], rtol=0, atol=1e-6
    )
    assert np.array_equal(np.asarray(dense.classes)[v], np.asarray(lazy.classes)[v])
    np.testing.assert_allclose(
        np.asarray(dense.coefs)[v], np.asarray(lazy.coefs)[v], rtol=0, atol=1e-5
    )


def test_approx_topk_matches_exact_when_sparse():
    """approx_topk=True (TTI_APPROX_TOPK path) must equal the exact NMS when
    fewer than pre_topk anchors clear conf_thresh — the production regime
    (telemetry counts the crowded frames where recall could drop)."""
    rng = np.random.default_rng(11)
    n, nc = 5040, 2
    boxes = np.zeros((n, 4), np.float32)
    centers = rng.uniform(50, 600, size=(n, 2))
    wh = rng.uniform(10, 60, size=(n, 2))
    boxes[:, :2] = centers - wh / 2
    boxes[:, 2:] = centers + wh / 2
    # 60 real candidates, the rest far below threshold.
    scores = rng.uniform(0.0, 0.05, size=n).astype(np.float32)
    hot = rng.choice(n, size=60, replace=False)
    scores[hot] = rng.uniform(0.3, 0.99, size=60).astype(np.float32)
    classes = rng.integers(0, nc, size=n)
    probs = np.full((n, nc), 1e-6, np.float32)
    probs[np.arange(n), classes] = scores
    coefs = rng.normal(size=(n, 32)).astype(np.float32)

    kw = dict(conf_thresh=0.20, iou_thresh=0.25, max_det=200, pre_topk=256)
    exact = batched_nms(boxes[None], probs[None], coefs[None], **kw)
    approx = batched_nms(boxes[None], probs[None], coefs[None],
                         approx_topk=True, **kw)
    assert (np.asarray(exact.valid) == np.asarray(approx.valid)).all()
    np.testing.assert_allclose(np.asarray(exact.scores),
                               np.asarray(approx.scores))
    np.testing.assert_allclose(np.asarray(exact.boxes),
                               np.asarray(approx.boxes))
