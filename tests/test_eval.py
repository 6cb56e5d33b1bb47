"""mAP evaluation harness tests."""

import numpy as np
import pytest

from tti.train.eval import ImageEval, box_iou, evaluate, mask_iou_matrix


def _img(pred_boxes, scores, classes, gt_boxes, gt_classes, pm=None, gm=None):
    return ImageEval(
        pred_boxes=np.asarray(pred_boxes, np.float64).reshape(-1, 4),
        pred_scores=np.asarray(scores, np.float64),
        pred_classes=np.asarray(classes, np.int64),
        gt_boxes=np.asarray(gt_boxes, np.float64).reshape(-1, 4),
        gt_classes=np.asarray(gt_classes, np.int64),
        pred_masks=pm, gt_masks=gm,
    )


def test_box_iou_matrix():
    iou = box_iou(np.array([[0, 0, 10, 10.0]]), np.array([[0, 0, 10, 10.0], [5, 5, 15, 15.0]]))
    np.testing.assert_allclose(iou[0], [1.0, 25 / 175], atol=1e-6)


def test_perfect_predictions_map_1():
    gt = [[10, 10, 50, 50], [60, 60, 90, 90]]
    img = _img(gt, [0.9, 0.8], [0, 1], gt, [0, 1])
    out = evaluate([img], num_classes=2)
    assert out["mAP50"] == pytest.approx(1.0)
    assert out["mAP50_95"] == pytest.approx(1.0)


def test_false_positive_lowers_precision():
    gt = [[10, 10, 50, 50]]
    # One hit + one high-scoring miss.
    img = _img([[10, 10, 50, 50], [200, 200, 240, 240]], [0.8, 0.9], [0, 0], gt, [0])
    out = evaluate([img], num_classes=1)
    assert 0.0 < out["mAP50"] < 1.0


def test_localization_quality_affects_map50_95():
    gt = [[10, 10, 50, 50]]
    shifted = [[14, 14, 54, 54]]  # IoU ~0.68: hit at 0.5, miss at 0.75+
    img = _img(shifted, [0.9], [0], gt, [0])
    out = evaluate([img], num_classes=1)
    assert out["mAP50"] == pytest.approx(1.0)
    assert out["mAP50_95"] < 0.6


def test_missing_class_ignored():
    gt = [[10, 10, 50, 50]]
    img = _img(gt, [0.9], [0], gt, [0])
    out = evaluate([img], num_classes=3)  # classes 1,2 have no GT anywhere
    assert out["mAP50"] == pytest.approx(1.0)
    assert "AP_class_1" not in out


def test_mask_map():
    h = w = 32
    gm = np.zeros((1, h, w)); gm[0, 8:24, 8:24] = 1
    pm_good = gm.copy()
    pm_bad = np.zeros((1, h, w)); pm_bad[0, 0:4, 0:4] = 1
    gt_box = [[8, 8, 24, 24]]
    img_good = _img(gt_box, [0.9], [0], gt_box, [0], pm=pm_good, gm=gm)
    img_bad = _img(gt_box, [0.9], [0], gt_box, [0], pm=pm_bad, gm=gm)
    good = evaluate([img_good], num_classes=1, use_masks=True)
    bad = evaluate([img_bad], num_classes=1, use_masks=True)
    assert good["mAP50"] == pytest.approx(1.0)
    assert bad["mAP50"] == 0.0
    assert mask_iou_matrix(pm_good, gm)[0, 0] == pytest.approx(1.0)


def test_duplicate_detections_counted_once():
    gt = [[10, 10, 50, 50]]
    img = _img([[10, 10, 50, 50], [10, 10, 50, 50]], [0.9, 0.85], [0, 0], gt, [0])
    out = evaluate([img], num_classes=1, iou_thresholds=(0.5,))
    # Second detection is a FP: precision drops below 1 past recall 1.
    assert out["mAP50"] == pytest.approx(1.0)  # AP unaffected (envelope), but
    # verify the FP exists via a stricter scenario: two dups, one GT, reversed
    img2 = _img([[10, 10, 50, 50], [10, 10, 50, 50]], [0.85, 0.9], [0, 0], gt, [0])
    out2 = evaluate([img2], num_classes=1, iou_thresholds=(0.5,))
    assert out2["mAP50"] == pytest.approx(1.0)
