"""Camera geometry as batched JAX ops.

TPU-first re-design of the reference's per-point geometry
(reference: measurement.py:44-65): where the reference calls
``cv2.undistortPoints`` once per stitch endpoint inside Python loops
(reference: measurement.py:344-356,440-462), here every function takes
``(..., N, 2)`` batches and is jit/vmap-friendly — the whole frame's points go
through in one fused XLA program.

Distortion model is OpenCV's 5-coefficient (k1, k2, p1, p2, k3) pinhole model.
The inverse (undistort) uses the same fixed-point iteration as OpenCV's
``cvUndistortPointsInternal`` but with a static iteration count so it traces to
a ``lax.fori_loop``-free unrolled loop (iters is small).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# Degenerate-ray guard threshold (reference: measurement.py:58-59 `|denom| < 1e-9`).
_DENOM_EPS = 1e-9


def rodrigues(rvec: Array) -> Array:
    """Rotation vector -> 3x3 rotation matrix (cv2.Rodrigues equivalent,
    reference: measurement.py:139). Stable at theta -> 0 via Taylor guards."""
    rvec = jnp.asarray(rvec).reshape(3)
    theta = jnp.sqrt(jnp.sum(rvec * rvec) + 1e-30)
    small = theta < 1e-8
    k = rvec / jnp.where(small, 1.0, theta)
    K = jnp.array(
        [
            [0.0, -k[2], k[1]],
            [k[2], 0.0, -k[0]],
            [-k[1], k[0], 0.0],
        ],
        dtype=rvec.dtype,
    )
    c, s = jnp.cos(theta), jnp.sin(theta)
    # R = c*I + (1-c) k k^T + s [k]x ; written without matmuls so the 3x3 math
    # never hits the MXU's reduced default precision on TPU.
    kkT = k[:, None] * k[None, :]
    R = c * jnp.eye(3, dtype=rvec.dtype) + (1.0 - c) * kkT + s * K
    return jnp.where(small, jnp.eye(3, dtype=rvec.dtype), R)


def camera_plane(R: Array, t: Array) -> tuple[Array, Array]:
    """Fabric plane in camera coordinates from extrinsics: normal = board z-axis
    in camera frame, offset d so that n.X + d = 0 on the plane
    (reference: measurement.py:44-48 `compute_camera_plane`)."""
    n_c = R[:, 2]
    d_c = -jnp.dot(n_c, jnp.asarray(t).reshape(3))
    return n_c, d_c


def _radial_tangential(x: Array, y: Array, dist: Array) -> tuple[Array, Array]:
    """Forward distortion displacement for normalized coords."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return x * radial + dx, y * radial + dy


def distort_points(xy: Array, K: Array, dist: Array) -> Array:
    """Normalized ideal coords (..., 2) -> distorted pixel coords (..., 2).

    This is cv2.projectPoints' distortion stage for z=1 points; the exact inverse
    of :func:`undistort_points`. Used by property tests and the JAX PnP solver.
    """
    x, y = xy[..., 0], xy[..., 1]
    xd, yd = _radial_tangential(x, y, dist)
    u = K[0, 0] * xd + K[0, 1] * yd + K[0, 2]
    v = K[1, 1] * yd + K[1, 2]
    return jnp.stack([u, v], axis=-1)


def undistort_points(uv: Array, K: Array, dist: Array, iters: int = 5) -> Array:
    """Distorted pixel coords (..., 2) -> ideal normalized coords (..., 2).

    Fixed-point iteration matching cv2.undistortPoints (P=None) semantics
    (reference: measurement.py:53-55): x <- (x0 - tangential) / radial, evaluated
    at the current estimate. ``iters`` is static. OpenCV runs exactly 5
    iterations and is *unconverged* at frame corners (measured ~0.66 px
    round-trip error with the deployment's intrinsics); iters=5 reproduces cv2
    to ~1e-7, while iters>=12 converges to the true inverse (~2e-5 px
    round-trip). Default 5 for reference parity. Batched over any leading dims.
    """
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    fx, fy, cx, cy, skew = K[0, 0], K[1, 1], K[0, 2], K[1, 2], K[0, 1]
    v0 = (uv[..., 1] - cy) / fy
    u0 = (uv[..., 0] - cx - skew * v0) / fx

    x, y = u0, v0
    for _ in range(iters):
        r2 = x * x + y * y
        icdist = 1.0 / (1.0 + r2 * (k1 + r2 * (k2 + r2 * k3)))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (u0 - dx) * icdist
        y = (v0 - dy) * icdist
    return jnp.stack([x, y], axis=-1)


def pixels_to_world(
    uv: Array,
    K: Array,
    dist: Array,
    R: Array,
    t: Array,
    n_c: Array | None = None,
    d_c: Array | None = None,
    iters: int = 5,
) -> tuple[Array, Array]:
    """Batched pixel -> 3D world point via ray-plane intersection.

    The TPU equivalent of ``pixel_to_world_using_camera_plane``
    (reference: measurement.py:50-65), vectorized over (..., N, 2) pixels:

    1. undistort to normalized ray direction (x_n, y_n, 1)
    2. scale s = -d_c / (n_c . ray); guard |denom| < 1e-9 -> invalid
    3. X_world = R^T (s*ray - t)

    Returns (world (..., 3) in meters, valid (...,) bool). Invalid rows carry
    zeros instead of the reference's ``None`` (fixed shapes; mask, don't branch).
    """
    t = jnp.asarray(t).reshape(3)
    if n_c is None or d_c is None:
        n_c, d_c = camera_plane(R, t)
    xy = undistort_points(uv, K, dist, iters=iters)
    ray = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)  # (..., 3)
    denom = ray @ n_c  # (...,)
    valid = jnp.abs(denom) >= _DENOM_EPS
    s = -d_c / jnp.where(valid, denom, 1.0)
    X_cam = s[..., None] * ray
    X_world = (X_cam - t) @ R  # == R.T @ (X_cam - t) row-wise
    return jnp.where(valid[..., None], X_world, 0.0), valid


def pixels_to_plane_mm(
    uv: Array, K: Array, dist: Array, R: Array, t: Array, iters: int = 5
) -> tuple[Array, Array]:
    """Like :func:`pixels_to_world` but in millimetres (the measurement unit:
    reference multiplies by 1000 at measurement.py:355,458)."""
    world, valid = pixels_to_world(uv, K, dist, R, t, iters=iters)
    return world * 1000.0, valid


def project_points(points_w: Array, rvec: Array, tvec: Array, K: Array, dist: Array) -> Array:
    """World points (..., 3) -> distorted pixel coords (..., 2).

    cv2.projectPoints equivalent; the forward model used by the JAX PnP solver
    (tti.calib.pnp) and round-trip property tests.
    """
    R = rodrigues(rvec)
    t = jnp.asarray(tvec).reshape(3)
    pc = points_w @ R.T + t
    xy = pc[..., :2] / pc[..., 2:3]
    return distort_points(xy, K, dist)


def local_mm_per_px(
    uv: Array, K: Array, dist: Array, R: Array, t: Array,
    probe_px: float = 10.0, iters: int = 5,
) -> tuple[Array, Array]:
    """Local mm-per-pixel scale at pixel(s) ``uv`` via a horizontal probe:
    project uv and uv + (probe_px, 0) to the fabric plane and divide the world
    distance by the probe length (the reference's px->mm fallback when direct
    conversion is unavailable: check_stitch_distance.py:502-507).

    Returns (scale_mm_per_px (...,), valid (...,) bool — both probe rays must
    intersect the plane).
    """
    uv = jnp.asarray(uv, jnp.float32)
    uv2 = uv + jnp.array([probe_px, 0.0], jnp.float32)
    w1, v1 = pixels_to_plane_mm(uv, K, dist, R, t, iters=iters)
    w2, v2 = pixels_to_plane_mm(uv2, K, dist, R, t, iters=iters)
    dist_mm = jnp.linalg.norm(w1 - w2, axis=-1)
    return dist_mm / probe_px, v1 & v2
