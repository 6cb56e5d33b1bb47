"""JAX planar PnP vs cv2.solvePnP and synthetic ground truth."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tti.calib.geometry import rodrigues
from tti.calib.pnp import rotation_to_rvec, solve_pnp_planar


def _board_points(nx=5, ny=4, square=0.01):
    xs, ys = np.meshgrid(np.arange(nx) * square, np.arange(ny) * square)
    pts = np.stack([xs.ravel(), ys.ravel(), np.zeros(nx * ny)], axis=-1)
    return pts


def test_rotation_to_rvec_roundtrip(rng):
    for _ in range(20):
        rvec = rng.normal(size=3).astype(np.float32)
        R = np.asarray(rodrigues(rvec))
        back = np.asarray(rotation_to_rvec(R))
        R2 = np.asarray(rodrigues(back))
        np.testing.assert_allclose(R2, R, atol=1e-5)


@pytest.mark.parametrize("noise_px", [0.0, 0.3])
def test_solve_pnp_recovers_pose(ref_intrinsics, ref_extrinsics, rng, noise_px):
    K, dist = ref_intrinsics
    rvec_gt, tvec_gt = ref_extrinsics
    obj = _board_points()
    img, _ = cv2.projectPoints(obj, rvec_gt, tvec_gt, K, dist)
    img = img.reshape(-1, 2) + rng.normal(scale=noise_px, size=(len(obj), 2))

    rvec, tvec, rms = solve_pnp_planar(
        obj.astype(np.float32), img.astype(np.float32),
        K.astype(np.float32), dist.astype(np.float32)
    )
    R_got = np.asarray(rodrigues(np.asarray(rvec)))
    R_gt, _ = cv2.Rodrigues(rvec_gt)
    angle_err = np.degrees(
        np.arccos(np.clip((np.trace(R_got @ R_gt.T) - 1) / 2, -1, 1))
    )
    t_err_mm = np.linalg.norm(np.asarray(tvec) - tvec_gt) * 1000
    assert angle_err < (0.05 if noise_px == 0 else 1.0)
    assert t_err_mm < (0.05 if noise_px == 0 else 1.0)
    assert float(rms) < max(3 * noise_px, 0.05)


def test_solve_pnp_close_to_cv2(ref_intrinsics, ref_extrinsics, rng):
    K, dist = ref_intrinsics
    rvec_gt, tvec_gt = ref_extrinsics
    obj = _board_points()
    img, _ = cv2.projectPoints(obj, rvec_gt, tvec_gt, K, dist)
    img = img.reshape(-1, 2) + rng.normal(scale=0.2, size=(len(obj), 2))

    ok, rvec_cv, tvec_cv = cv2.solvePnP(obj, img, K, dist, flags=cv2.SOLVEPNP_ITERATIVE)
    assert ok
    rvec_j, tvec_j, _ = solve_pnp_planar(
        obj.astype(np.float32), img.astype(np.float32),
        K.astype(np.float32), dist.astype(np.float32)
    )
    np.testing.assert_allclose(np.asarray(tvec_j), tvec_cv.reshape(3), atol=2e-4)
    np.testing.assert_allclose(np.asarray(rvec_j), rvec_cv.reshape(3), atol=2e-3)


def test_solve_pnp_with_padding(ref_intrinsics, ref_extrinsics):
    """Fixed-shape padding rows (valid=0) must not change the solution."""
    K, dist = ref_intrinsics
    rvec_gt, tvec_gt = ref_extrinsics
    obj = _board_points()
    img, _ = cv2.projectPoints(obj, rvec_gt, tvec_gt, K, dist)
    img = img.reshape(-1, 2)

    pad = 12
    obj_p = np.concatenate([obj, np.zeros((pad, 3))]).astype(np.float32)
    img_p = np.concatenate([img, np.full((pad, 2), 1e6)]).astype(np.float32)
    valid = np.concatenate([np.ones(len(obj)), np.zeros(pad)]).astype(np.float32)

    rvec_a, tvec_a, _ = solve_pnp_planar(
        obj.astype(np.float32), img.astype(np.float32),
        K.astype(np.float32), dist.astype(np.float32))
    rvec_b, tvec_b, _ = solve_pnp_planar(
        obj_p, img_p, K.astype(np.float32), dist.astype(np.float32), valid=valid)
    np.testing.assert_allclose(np.asarray(tvec_b), np.asarray(tvec_a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rvec_b), np.asarray(rvec_a), atol=1e-4)
