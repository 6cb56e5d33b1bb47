"""Camera-domain scene generator (tools/synth_textile.py --camera): the
projected polygon labels must agree with the per-pixel plane-space masks the
renderer actually drew — i.e. training GT is exact, for both the distorted
sensor and the pinhole (rectified-path) sub-domains."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cv2 = pytest.importorskip("cv2")


def _iou(a: np.ndarray, b: np.ndarray) -> float:
    inter = float(np.logical_and(a, b).sum())
    union = float(np.logical_or(a, b).sum())
    return inter / max(union, 1.0)


def _raster(poly_px: np.ndarray, hw: tuple[int, int]) -> np.ndarray:
    m = np.zeros(hw, np.uint8)
    cv2.fillPoly(m, [np.round(poly_px).astype(np.int32)], 1)
    return m.astype(bool)


@pytest.fixture(scope="module")
def mappers():
    from tools.measure_report import PlaneMapper

    return {"distorted": PlaneMapper(),
            "pinhole": PlaneMapper(dist=np.zeros(5))}


@pytest.mark.parametrize("mode", ["distorted", "pinhole"])
def test_camera_scene_labels_match_rendered_masks(mappers, mode):
    from tools.synth_textile import make_camera_scene

    rng = np.random.default_rng(3)
    mapper = mappers[mode]
    for _ in range(2):
        bgr, polys, classes, masks = make_camera_scene(mapper, rng,
                                                       return_masks=True)
        assert bgr.shape == (mapper.h, mapper.w, 3)
        assert classes[0] == 1 and all(c == 0 for c in classes[1:])
        assert len(polys) == len(masks) >= 4  # fabric + >=3 stitches
        hw = (mapper.h, mapper.w)
        # Fabric: the wavy-edge polyline approximation vs the analytic band.
        assert _iou(_raster(polys[0], hw), masks[0]) > 0.95
        # Stitches: small quads, few-px rasterization slack.
        for poly, m in zip(polys[1:], masks[1:]):
            assert _iou(_raster(poly, hw), m) > 0.55
            assert m.sum() > 10  # visible in-frame


def test_pad_square_normalization(mappers):
    from tools.synth_textile import _pad_square, make_camera_scene

    rng = np.random.default_rng(5)
    bgr, polys, classes = make_camera_scene(mappers["pinhole"], rng)
    sq, polys_n = _pad_square(bgr, polys)
    w = bgr.shape[1]
    assert sq.shape == (w, w, 3)
    top = (w - bgr.shape[0]) // 2
    assert (sq[:top] == 114).all() and (sq[top + bgr.shape[0]:] == 114).all()
    for p in polys_n:
        assert p.min() >= 0.0 and p.max() <= 1.0
    # A known pixel round-trips: y' = (y + top) / w.
    y_px = float(polys[0][0, 1])
    assert np.isclose(polys_n[0][0, 1],
                      np.clip((y_px + top) / w, 0, 1), atol=1e-6)


def test_write_camera_split_dataset_loads(tmp_path, monkeypatch):
    """End-to-end: a tiny mixed split parses through the training dataset
    discovery + rasterization path."""
    from tools.synth_textile import write_camera_split
    from tti.train.data import discover_dataset, parse_label_file

    out = str(tmp_path / "train")
    write_camera_split(out, 3, seed=11, quality=90)
    samples = discover_dataset(os.path.join(out, "images"))
    assert len(samples) == 3
    for s in samples:
        polys, classes = parse_label_file(
            os.path.join(out, "labels",
                         os.path.basename(s.image_path).replace(".jpg", ".txt")))
        assert len(polys) == len(classes) >= 4
        assert 1 in classes and 0 in classes


def test_write_camera_split_mix_restricts_domains(tmp_path):
    """mix=(0,0,1) must produce flat-only scenes (square flat_size renders,
    not the 1280x1280 padded camera frames) — the single-domain val splits
    used for the per-domain eval breakdown depend on this."""
    import cv2

    from tools.synth_textile import write_camera_split

    out = str(tmp_path / "flat_only")
    write_camera_split(out, 2, seed=4, quality=90, flat_size=320,
                       mix=(0.0, 0.0, 1.0))
    for name in os.listdir(os.path.join(out, "images")):
        img = cv2.imread(os.path.join(out, "images", name))
        assert img.shape[:2] == (320, 320)
