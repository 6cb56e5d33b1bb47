"""ChArUco calibration on synthetically rendered board views (no camera)."""

import json

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tti.calib.charuco import (
    create_charuco_board,
    detect_charuco,
    run_extrinsic_calibration,
    solve_board_pose,
)
from tti.calib.io import load_extrinsics
from tti.core.config import BoardConfig


@pytest.fixture(scope="module")
def board():
    return create_charuco_board(BoardConfig())


def _render_board_view(board, K, dist, rvec, tvec, hw=(960, 1280)):
    """Render the board at a known pose by warping its canonical image with the
    pose-induced homography (zero distortion for exactness)."""
    cfg = board.config
    px_per_m = 8000
    bw = int(cfg.squares_y * cfg.square_length_m * px_per_m)
    bh = int(cfg.squares_x * cfg.square_length_m * px_per_m)
    img = board.board.generateImage((bw, bh), marginSize=0, borderBits=1)

    R, _ = cv2.Rodrigues(rvec)
    # Homography board-plane (meters) -> pixels: K [r1 r2 t].
    H_pose = K @ np.column_stack([R[:, 0], R[:, 1], tvec])
    # Board image px -> meters.
    S = np.array([[1.0 / px_per_m, 0, 0], [0, 1.0 / px_per_m, 0], [0, 0, 1.0]])
    H = H_pose @ S
    view = cv2.warpPerspective(
        img, H, (hw[1], hw[0]), flags=cv2.INTER_LINEAR, borderValue=255
    )
    # The detector inverts (reference: calibration.py:121-122) — pre-invert the
    # render so the detector sees a normal board.
    return cv2.bitwise_not(view)


@pytest.fixture(scope="module")
def scene(board):
    K = np.array([[900.0, 0, 640.0], [0, 900.0, 480.0], [0, 0, 1.0]])
    dist = np.zeros(5)
    rvec = np.array([0.1, -0.15, 0.05])
    tvec = np.array([-0.03, -0.02, 0.25])
    frame = _render_board_view(board, K, dist, rvec, tvec)
    return K, dist, rvec, tvec, frame


def test_detect_charuco_on_synthetic_board(board, scene):
    K, dist, rvec, tvec, frame = scene
    det = detect_charuco(board, frame)
    assert det is not None
    corners, ids = det
    assert len(ids) >= board.config.min_corners


@pytest.mark.parametrize("solver", ["tti", "cv2"])
def test_solve_board_pose_recovers_render_pose(board, scene, solver):
    K, dist, rvec, tvec, frame = scene
    corners, ids = detect_charuco(board, frame)
    rv, tv, rms = solve_board_pose(board, corners, ids, K, dist, solver=solver)
    assert rms < 1.0  # px
    assert np.abs(tv - tvec).max() < 0.003  # 3 mm
    R_got, _ = cv2.Rodrigues(rv)
    R_gt, _ = cv2.Rodrigues(rvec)
    angle = np.degrees(np.arccos(np.clip((np.trace(R_got @ R_gt.T) - 1) / 2, -1, 1)))
    assert angle < 1.0


def test_run_extrinsic_calibration_end_to_end(board, scene, tmp_path):
    K, dist, rvec, tvec, frame = scene
    out = tmp_path / "extrinsics.json"
    fake_time = iter(np.arange(0, 100, 0.5))
    ok = run_extrinsic_calibration(
        [frame] * 30, K, dist, str(out), board=board,
        capture_delay_s=2.0, clock=lambda: float(next(fake_time)),
    )
    assert ok
    rv, tv = load_extrinsics(str(out))
    assert np.abs(tv - tvec).max() < 0.003


def test_calibration_fails_without_board(board, tmp_path):
    blank = np.full((480, 640), 255, np.uint8)
    fake_time = iter(np.arange(0, 100, 0.5))
    ok = run_extrinsic_calibration(
        [blank] * 10, np.eye(3) * 900, np.zeros(5), str(tmp_path / "e.json"),
        board=board, capture_delay_s=1.0, clock=lambda: float(next(fake_time)),
    )
    assert not ok
    assert not (tmp_path / "e.json").exists()


def test_intrinsic_calibration_recovers_camera(board):
    """Full intrinsic calibration from synthetic board renders at diverse poses
    recovers the ground-truth camera matrix (the capability the reference
    outsources to an external app via download_calibartion_app.sh)."""
    from tti.calib.intrinsics import calibrate_intrinsics

    K_gt = np.array([[880.0, 0, 640.0], [0, 880.0, 480.0], [0, 0, 1.0]])
    dist_gt = np.zeros(5)
    rng = np.random.default_rng(3)
    frames = []
    # Diverse poses: tilt direction sweeps the circle, depth varies — a flat
    # pose set leaves the radial terms unconstrained (real capture apps demand
    # the same diversity from the operator).
    for k in range(16):
        ang = 2 * np.pi * k / 16
        tilt = 0.35 + 0.15 * rng.uniform()
        rvec = np.array([tilt * np.cos(ang), tilt * np.sin(ang), 0.0])
        rvec += rng.normal(scale=0.05, size=3)
        depth = 0.18 + 0.1 * rng.uniform()
        tvec = np.array([-0.03 + 0.02 * rng.uniform(), -0.025 + 0.02 * rng.uniform(), depth])
        frames.append(_render_board_view(board, K_gt, dist_gt, rvec, tvec))

    result = calibrate_intrinsics(frames, board=board)
    assert result.n_views >= 5
    assert result.rms < 1.5
    assert abs(result.K[0, 0] - K_gt[0, 0]) / K_gt[0, 0] < 0.05
    assert abs(result.K[1, 1] - K_gt[1, 1]) / K_gt[1, 1] < 0.05
    assert abs(result.K[0, 2] - K_gt[0, 2]) < 40
    # Individual coefficients are correlated/ill-conditioned; assert the net
    # distortion FIELD is small over the board's working area instead.
    from tti.calib.geometry import distort_points
    import jax.numpy as jnp

    xs = np.linspace(-0.2, 0.2, 9)  # evaluate within the calibrated board area
    xy = np.stack(np.meshgrid(xs, xs), -1).reshape(-1, 2).astype(np.float32)
    px = np.asarray(distort_points(jnp.asarray(xy), jnp.asarray(result.K, jnp.float32),
                                   jnp.asarray(result.dist, jnp.float32)))
    px_ideal = np.asarray(distort_points(jnp.asarray(xy), jnp.asarray(result.K, jnp.float32),
                                         jnp.zeros(5, jnp.float32)))
    assert np.abs(px - px_ideal).max() < 3.0  # px of spurious distortion


def test_intrinsic_calibration_insufficient_views(board):
    from tti.calib.intrinsics import calibrate_intrinsics
    from tti.core.errors import CalibrationError

    blank = np.full((480, 640), 255, np.uint8)
    with pytest.raises(CalibrationError):
        calibrate_intrinsics([blank] * 5, board=board)
