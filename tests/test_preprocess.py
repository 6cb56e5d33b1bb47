"""Preprocess tests: letterbox geometry + parity vs cv2, fused undistort remap."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from tti.preprocess.letterbox import (
    letterbox_spec,
    letterbox_spec_rect,
    make_letterbox_spec,
    preprocess_frames,
    scale_boxes_to_frame,
)
from tti.preprocess.remap import (
    build_undistort_letterbox_map,
    remap_bilinear,
    undistort_letterbox_frames,
)


def test_letterbox_spec_reference_geometry():
    """1280x960 frame at imgsz 960 (the deployment's shapes:
    reference config.py:59-60, measurement.py:210)."""
    spec = letterbox_spec(960, 1280, 960)
    assert spec.scale == 0.75
    assert (spec.new_h, spec.new_w) == (720, 960)
    assert spec.pad_top == 120 and spec.pad_left == 0


def _ultra_letterbox(img: np.ndarray, new_shape: tuple[int, int], stride: int = 32,
                     auto: bool = True) -> tuple[np.ndarray, float, tuple[float, float]]:
    """Faithful oracle of Ultralytics' LetterBox.__call__ (the .pt predict
    preprocessing): cv2.INTER_LINEAR resize, auto minimal-rect stride padding,
    round(x -+ 0.1) center split, 114-gray border."""
    shape = img.shape[:2]
    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    new_unpad = int(round(shape[1] * r)), int(round(shape[0] * r))
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if auto:
        dw, dh = dw % stride, dh % stride
    dw /= 2
    dh /= 2
    if shape[::-1] != new_unpad:
        img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    img = cv2.copyMakeBorder(img, top, bottom, left, right, cv2.BORDER_CONSTANT,
                             value=(114, 114, 114))
    return img, r, (left, top)


def test_rect_spec_reference_geometry():
    """Deployment geometry: 1280x960 at imgsz=960 letterboxes to 960x736 under
    Ultralytics auto minimal-rect (reference measurement.py:210), NOT 960x960."""
    spec = letterbox_spec_rect(960, 1280, 960)
    assert (spec.dst_h, spec.dst_w) == (736, 960)
    assert (spec.new_h, spec.new_w) == (720, 960)
    assert spec.pad_top == 8 and spec.pad_left == 0
    assert make_letterbox_spec(960, 1280, 960, "rect") == spec
    with pytest.raises(ValueError):
        make_letterbox_spec(960, 1280, 960, "diamond")


@pytest.mark.parametrize(
    "h,w,t",
    [(960, 1280, 960), (1080, 1920, 640), (96, 128, 64), (720, 1280, 640),
     (480, 640, 352), (90, 128, 64), (971, 1333, 640), (640, 640, 640)],
)
def test_rect_spec_matches_ultralytics_oracle(h, w, t):
    """Spec geometry (dst dims, scale, pad placement) must equal the real
    LetterBox(auto=True) algorithm for a sweep of aspect ratios, including odd
    pad splits (90x128) and non-multiple sources (971x1333)."""
    spec = letterbox_spec_rect(h, w, t)
    img = np.full((h, w, 3), 255, np.uint8)
    out, r, (left, top) = _ultra_letterbox(img, (t, t))
    assert (spec.dst_h, spec.dst_w) == out.shape[:2]
    assert spec.scale == pytest.approx(r)
    assert (spec.pad_left, spec.pad_top) == (left, top)
    # Content placement: non-114 pixels sit exactly in the spec's content rect.
    content = np.zeros(out.shape[:2], bool)
    content[spec.pad_top:spec.pad_top + spec.new_h,
            spec.pad_left:spec.pad_left + spec.new_w] = True
    assert np.all(out[content] == 255)
    assert np.all(out[~content] == 114)


def test_rect_preprocess_pixel_parity_with_cv2(rng):
    """preprocess_frames at the rect target reproduces the real cv2 letterbox
    pixels (the content goes through the same half-pixel bilinear)."""
    frame = rng.integers(0, 255, size=(1, 96, 144, 3), dtype=np.uint8)
    spec = letterbox_spec_rect(96, 144, 96)  # genuinely rect: dst 64x96
    assert (spec.dst_h, spec.dst_w) == (64, 96)
    out, spec2 = preprocess_frames(jnp.asarray(frame), (spec.dst_h, spec.dst_w))
    # The square-spec of the rect target reproduces the rect geometry.
    assert spec2 == spec
    expected, _, _ = _ultra_letterbox(frame[0, :, :, ::-1], (96, 96))
    assert expected.shape[:2] == (spec.dst_h, spec.dst_w)
    assert np.abs(np.asarray(out)[0] - expected.astype(np.float32) / 255.0).max() < 0.02


def test_preprocess_matches_cv2_letterbox(rng):
    frame = rng.integers(0, 255, size=(1, 96, 128, 3), dtype=np.uint8)
    out, spec = preprocess_frames(jnp.asarray(frame), 64)
    out = np.asarray(out)
    assert out.shape == (1, 64, 64, 3)

    resized = cv2.resize(frame[0, :, :, ::-1], (spec.new_w, spec.new_h),
                         interpolation=cv2.INTER_LINEAR).astype(np.float32) / 255.0
    content = out[0, spec.pad_top:spec.pad_top + spec.new_h,
                  spec.pad_left:spec.pad_left + spec.new_w]
    # jax.image bilinear vs cv2 INTER_LINEAR: same half-pixel convention.
    assert np.abs(content - resized).max() < 0.02
    # Padding rows are the 114-gray border.
    assert np.allclose(out[0, 0], 114 / 255, atol=1e-6)


def test_scale_boxes_roundtrip():
    spec = letterbox_spec(960, 1280, 960)
    boxes_input = np.array([[0.0, 120.0, 960.0, 840.0]], np.float32)  # full content
    frame_boxes = np.asarray(scale_boxes_to_frame(jnp.asarray(boxes_input), spec))
    np.testing.assert_allclose(frame_boxes[0], [0, 0, 1280, 960], atol=1e-3)


def test_remap_identity_map(rng):
    """A map that samples pixel centers reproduces the image."""
    frame = rng.uniform(0, 1, size=(1, 32, 48, 3)).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(32, dtype=np.float32),
                         np.arange(48, dtype=np.float32), indexing="ij")
    map_xy = np.stack([xs, ys], -1)
    out = np.asarray(remap_bilinear(jnp.asarray(frame), jnp.asarray(map_xy)))
    np.testing.assert_allclose(out, frame, atol=1e-6)


def test_undistort_remap_matches_cv2(ref_intrinsics, rng):
    """Fused undistort+letterbox vs cv2.undistort + resize on a smooth image."""
    K, dist = ref_intrinsics
    h, w = 96, 128
    # Scale intrinsics down to the small test frame.
    Ks = K.copy()
    Ks[0] *= w / 1280
    Ks[1] *= h / 960
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([np.sin(xx / 9) * np.cos(yy / 7)] * 3, -1) * 0.5 + 0.5

    spec = letterbox_spec(h, w, (h, w))  # no resize; isolate undistortion
    map_xy = build_undistort_letterbox_map(Ks, dist, spec)
    got = np.asarray(remap_bilinear(jnp.asarray(img[None]), jnp.asarray(map_xy)))[0]

    expected = cv2.undistort(img, Ks, dist)
    # Compare interior (borders differ where cv2 clamps and we pad).
    sl = slice(8, -8)
    assert np.abs(got[sl, sl] - expected[sl, sl]).max() < 0.03


def test_undistort_letterbox_frames_dtype(rng, ref_intrinsics):
    K, dist = ref_intrinsics
    spec = letterbox_spec(96, 128, 64)
    Ks = K.copy(); Ks[0] *= 128 / 1280; Ks[1] *= 96 / 960
    map_xy = build_undistort_letterbox_map(Ks, dist, spec)
    frames = rng.integers(0, 255, size=(2, 96, 128, 3), dtype=np.uint8)
    out = np.asarray(undistort_letterbox_frames(jnp.asarray(frames), jnp.asarray(map_xy)))
    assert out.shape == (2, 64, 64, 3)
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_packed_remap_matches_f32_remap(ref_intrinsics, rng):
    """Packed-u32 remap (production fast path) vs the f32 reference remap:
    identical up to 8-bit quantization, including border/pad behavior."""
    from tti.preprocess.remap import PackedRemap, build_small_undistort_map

    K, dist = ref_intrinsics
    h, w = 96, 128
    Ks = K.copy(); Ks[0] *= w / 1280; Ks[1] *= h / 960
    spec = letterbox_spec(h, w, 64)
    small_map = build_small_undistort_map(Ks, dist, spec)

    x = rng.uniform(0, 1, size=(2, 64, 64, 3)).astype(np.float32)
    ref = np.asarray(remap_bilinear(jnp.asarray(x), jnp.asarray(small_map)))
    packed = PackedRemap(small_map, (64, 64))
    got = np.asarray(packed(jnp.asarray(x)))
    assert np.abs(got - ref).max() < 3.0 / 255.0


def test_integer_decimation_fast_path_matches_general(rng, monkeypatch):
    monkeypatch.setenv("TTI_LETTERBOX_DECIMATE", "1")
    """k=3 decimation (1080p->640-style) must equal the general bilinear path."""
    from tti.preprocess.letterbox import letterbox, letterbox_u8, normalize, bgr_to_rgb

    frames = rng.integers(0, 255, size=(2, 96, 192, 3), dtype=np.uint8)
    spec = letterbox_spec(96, 192, 64)  # 192/64 = 3, 96 -> 32 content rows
    assert spec.scale == pytest.approx(1 / 3)
    fast = np.asarray(letterbox_u8(jnp.asarray(frames), spec))
    general = np.asarray(letterbox(normalize(bgr_to_rgb(jnp.asarray(frames))), spec))
    np.testing.assert_allclose(fast, general, atol=2e-3)


def test_non_integer_scale_uses_general_path(rng):
    from tti.preprocess.letterbox import letterbox_u8, _integer_decimation

    spec = letterbox_spec(960, 1280, 960)  # scale 0.75 -> general path
    assert _integer_decimation(spec) is None
    frames = rng.integers(0, 255, size=(1, 960, 1280, 3), dtype=np.uint8)
    out = np.asarray(letterbox_u8(jnp.asarray(frames), spec))
    assert out.shape == (1, 960, 960, 3)


def test_packed_remap_nearest(rng, ref_intrinsics):
    from tti.preprocess.remap import PackedRemap, build_small_undistort_map

    K, dist = ref_intrinsics
    Ks = K.copy(); Ks[0] *= 128 / 1280; Ks[1] *= 96 / 960
    spec = letterbox_spec(96, 128, 64)
    small_map = build_small_undistort_map(Ks, dist, spec)
    x = rng.uniform(0, 1, size=(1, 64, 64, 3)).astype(np.float32)

    bil = PackedRemap(small_map, (64, 64))
    near = PackedRemap(small_map, (64, 64), interp="nearest")
    out_b = np.asarray(bil(jnp.asarray(x)))
    out_n = np.asarray(near(jnp.asarray(x)))
    assert out_n.shape == out_b.shape
    # Nearest differs from bilinear but stays within the source value range.
    assert 0.0 <= out_n.min() and out_n.max() <= 1.0
    with pytest.raises(ValueError):
        PackedRemap(small_map, (64, 64), interp="bicubic")


def test_unpadded_src_remap_matches_padded(ref_intrinsics, rng):
    """Content-source remap (pack/gather over the unpadded resize) matches the
    padded-source remap to f32 coordinate rounding (border taps resolve to the
    pad word, whose value equals the letterbox pad pixel; shifting the map by
    the pad offset re-rounds the f32 fractional parts by <=1 ulp)."""
    from tti.preprocess.remap import (
        PackedRemap, build_small_undistort_map, letterbox_then_undistort,
    )

    K, dist = ref_intrinsics
    h, w = 96, 128
    Ks = K.copy(); Ks[0] *= w / 1280; Ks[1] *= h / 960
    spec = letterbox_spec(h, w, 64)
    frames = jnp.asarray(rng.integers(0, 255, size=(2, h, w, 3), dtype=np.uint8))

    padded = PackedRemap(build_small_undistort_map(Ks, dist, spec),
                         (spec.dst_h, spec.dst_w))
    content = PackedRemap(
        build_small_undistort_map(Ks, dist, spec, unpadded_src=True),
        (spec.new_h, spec.new_w),
    )
    ref = np.asarray(letterbox_then_undistort(frames, spec, padded))
    got = np.asarray(letterbox_then_undistort(frames, spec, content))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


def test_u8_decimated_pack_matches_float_path(ref_intrinsics, rng):
    """The fused u8 decimating pack must be bit-identical to
    letterbox_content + the float pack when the resize is an exact odd-integer
    decimation."""
    from tti.preprocess.remap import (
        PackedRemap, build_small_undistort_map, letterbox_then_undistort,
    )

    K, dist = ref_intrinsics
    h, w = 96, 192  # k=3 decimation to 64: content 32x64
    Ks = K.copy(); Ks[0] *= w / 1280; Ks[1] *= h / 960
    spec = letterbox_spec(h, w, 64)
    frames = jnp.asarray(rng.integers(0, 255, size=(2, h, w, 3), dtype=np.uint8))
    rm = PackedRemap(
        build_small_undistort_map(Ks, dist, spec, unpadded_src=True),
        (spec.new_h, spec.new_w),
    )
    import os
    got = np.asarray(letterbox_then_undistort(frames, spec, rm))
    old = os.environ.get("TTI_REMAP_U8_DECIMATE")
    os.environ["TTI_REMAP_U8_DECIMATE"] = "0"
    try:
        ref = np.asarray(letterbox_then_undistort(frames, spec, rm))
    finally:
        if old is None:
            del os.environ["TTI_REMAP_U8_DECIMATE"]
        else:
            os.environ["TTI_REMAP_U8_DECIMATE"] = old
    np.testing.assert_array_equal(got, ref)
