"""Geometry parity vs OpenCV + round-trip properties (SURVEY.md §4 test plan)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tti.calib.geometry import (
    camera_plane,
    distort_points,
    pixels_to_plane_mm,
    pixels_to_world,
    project_points,
    rodrigues,
    undistort_points,
)


def _grid_pixels(w=1280, h=960, n=9):
    xs = np.linspace(20, w - 20, n)
    ys = np.linspace(20, h - 20, n)
    uu, vv = np.meshgrid(xs, ys)
    return np.stack([uu.ravel(), vv.ravel()], axis=-1)


def test_rodrigues_matches_cv2(ref_extrinsics):
    rvec, _ = ref_extrinsics
    R_cv, _ = cv2.Rodrigues(rvec)
    R_jax = np.asarray(rodrigues(rvec.astype(np.float32)))
    np.testing.assert_allclose(R_jax, R_cv, atol=1e-5)


def test_rodrigues_small_angle():
    R = np.asarray(rodrigues(np.array([1e-12, 0.0, 0.0], np.float32)))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)


def test_undistort_matches_cv2(ref_intrinsics):
    K, dist = ref_intrinsics
    uv = _grid_pixels()
    expected = cv2.undistortPoints(uv.reshape(-1, 1, 2), K, dist).reshape(-1, 2)
    got = np.asarray(undistort_points(uv.astype(np.float32), K.astype(np.float32),
                                      dist.astype(np.float32), iters=5))
    # iters=5 replays cv2's exact fixed-point schedule: float32-rounding-level
    # agreement everywhere, including the unconverged frame corners.
    np.testing.assert_allclose(got, expected, atol=2e-6)


def test_distort_undistort_roundtrip(ref_intrinsics):
    """With enough iterations the inverse is *better* than cv2's own (cv2's
    5-iteration result round-trips with ~0.66 px error at the corners; ours at
    iters=12 is < 0.01 px)."""
    K, dist = ref_intrinsics
    uv = _grid_pixels().astype(np.float32)
    xy = undistort_points(uv, K.astype(np.float32), dist.astype(np.float32), iters=12)
    uv_back = np.asarray(distort_points(xy, K.astype(np.float32), dist.astype(np.float32)))
    np.testing.assert_allclose(uv_back, uv, atol=0.01)  # px


def test_project_matches_cv2(ref_intrinsics, ref_extrinsics, rng):
    K, dist = ref_intrinsics
    rvec, tvec = ref_extrinsics
    pts = rng.uniform(-0.03, 0.03, size=(40, 3))
    pts[:, 2] = 0.0
    expected, _ = cv2.projectPoints(pts, rvec, tvec, K, dist)
    got = np.asarray(
        project_points(pts.astype(np.float32), rvec.astype(np.float32),
                       tvec.astype(np.float32), K.astype(np.float32), dist.astype(np.float32))
    )
    np.testing.assert_allclose(got, expected.reshape(-1, 2), atol=0.02)


def _pixel_to_world_reference(u, v, K, dist, R, t, n_c, d_c):
    """Literal numpy+cv2 port of the reference math (measurement.py:50-65) as the
    test oracle."""
    pts = np.array([[[float(u), float(v)]]], dtype=np.float64)
    und = cv2.undistortPoints(pts, K, dist, P=None)
    x_n, y_n = float(und[0, 0, 0]), float(und[0, 0, 1])
    d_cam = np.array([x_n, y_n, 1.0])
    denom = float(n_c.dot(d_cam))
    if abs(denom) < 1e-9:
        return None
    s = -d_c / denom
    return R.T.dot(s * d_cam - t)


def test_pixels_to_world_matches_reference_math(ref_intrinsics, ref_extrinsics):
    K, dist = ref_intrinsics
    rvec, tvec = ref_extrinsics
    R_cv, _ = cv2.Rodrigues(rvec)
    n_c = R_cv[:, 2]
    d_c = -float(n_c.dot(tvec))

    uv = _grid_pixels(n=7)
    expected = np.stack(
        [_pixel_to_world_reference(u, v, K, dist, R_cv, tvec, n_c, d_c) for u, v in uv]
    )
    got, valid = pixels_to_world(
        uv.astype(np.float32), K.astype(np.float32), dist.astype(np.float32),
        R_cv.astype(np.float32), tvec.astype(np.float32)
    )
    assert bool(np.all(valid))
    # World coords are in meters at ~0.1 m scale; 2e-5 m = 0.02 mm tolerance.
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-5)


def test_pixels_to_plane_mm_distance_scale(ref_intrinsics, ref_extrinsics):
    """Two pixels 100 px apart map to a plausible mm distance (sanity, and the
    x1000 scaling of measurement.py:355,458)."""
    K, dist = ref_intrinsics
    rvec, tvec = ref_extrinsics
    R = np.asarray(rodrigues(rvec.astype(np.float32)))
    uv = np.array([[600.0, 400.0], [700.0, 400.0]], np.float32)
    mm, valid = pixels_to_plane_mm(uv, K.astype(np.float32), dist.astype(np.float32),
                                   R, tvec.astype(np.float32))
    assert bool(np.all(valid))
    d = float(np.linalg.norm(np.asarray(mm)[0] - np.asarray(mm)[1]))
    assert 1.0 < d < 100.0


def test_degenerate_ray_masked(ref_intrinsics):
    """Rays parallel to the plane must be flagged invalid, not inf/nan
    (reference guard: measurement.py:58-59)."""
    K, dist = ref_intrinsics
    R = np.eye(3, dtype=np.float32)
    t = np.array([0.0, 0.0, 1.0], np.float32)
    n_c, d_c = camera_plane(R, t)
    # Plane normal is +z; a ray with zero z-component is impossible from a pinhole
    # (dir=(x,y,1)) so fake it by rotating the plane 90 deg: normal = +x.
    R90 = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], np.float32)
    n_c, d_c = camera_plane(R90, t)
    # Principal ray (0,0,1) has denom = n_c . (0,0,1) = R90[2,2] = 0 -> invalid.
    uv = np.array([[K[0, 2], K[1, 2]]], np.float32)
    world, valid = pixels_to_world(uv, K.astype(np.float32),
                                   np.zeros(5, np.float32), R90, t, n_c, d_c)
    assert not bool(valid[0])
    assert np.all(np.isfinite(np.asarray(world)))


def test_batched_shapes(ref_intrinsics, ref_extrinsics):
    K, dist = ref_intrinsics
    rvec, tvec = ref_extrinsics
    R = np.asarray(rodrigues(rvec.astype(np.float32)))
    uv = np.zeros((4, 17, 2), np.float32) + np.array([640.0, 480.0], np.float32)
    world, valid = pixels_to_world(uv, K.astype(np.float32), dist.astype(np.float32),
                                   R, tvec.astype(np.float32))
    assert world.shape == (4, 17, 3)
    assert valid.shape == (4, 17)


def test_local_mm_per_px_probe(ref_intrinsics, ref_extrinsics):
    """The 10-px probe fallback (reference check_stitch_distance.py:502-507)
    must agree with direct plane conversion: converting a segment of length
    L px should give ~L * local_mm_per_px mm."""
    import jax.numpy as jnp

    from tti.calib.geometry import local_mm_per_px, pixels_to_plane_mm, rodrigues

    K, dist = ref_intrinsics
    rvec, tvec = ref_extrinsics
    R = rodrigues(jnp.asarray(rvec))
    t = jnp.asarray(tvec, jnp.float32)
    uv = jnp.array([[640.0, 480.0], [400.0, 500.0]], jnp.float32)
    scale, valid = local_mm_per_px(uv, K, dist, R, t)
    assert bool(valid.all())
    # Direct conversion of a 50 px horizontal segment.
    a, va = pixels_to_plane_mm(uv, K, dist, R, t)
    b, vb = pixels_to_plane_mm(uv + jnp.array([50.0, 0.0]), K, dist, R, t)
    direct = jnp.linalg.norm(a - b, axis=-1) / 50.0
    assert bool((va & vb).all())
    np.testing.assert_allclose(np.asarray(scale), np.asarray(direct), rtol=0.02)
