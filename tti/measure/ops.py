"""Measurement primitives as masked, fixed-shape jnp ops.

Each primitive replaces a Python-loop stage of the reference's per-frame
measurement (SURVEY.md §2 rows "Fabric envelope", "Stitch statistics",
"Row selection / clustering"):

- variable-length Python lists become fixed-size arrays + validity masks,
- per-stitch cv2 calls become batched reductions,
- data-dependent branches become jnp.where selects.

Coordinate conventions: masks live on the proto grid (model input / 4);
helpers here are grid-agnostic — callers pass coordinates in the grid they
computed them in and map between grids with the half-pixel-consistent affine
transforms in tti.measure.pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

ENVELOPE_EMPTY = -1  # sentinel for columns without fabric (reference: measurement.py:178)


def fabric_lower_envelope(fabric_mask: Array) -> Array:
    """Bottom-most fabric row per column; -1 where the column is empty.

    Vectorized equivalent of ``_fabric_lower_envelope``
    (reference: measurement.py:170-185): flip rows, argmax, h-1-idx — but with
    the per-column Python loop replaced by one reduction.

    fabric_mask: (H, W) bool/float. Returns (W,) int32.
    """
    h = fabric_mask.shape[0]
    rev = (fabric_mask[::-1, :] > 0)
    has_any = jnp.any(rev, axis=0)
    idx_in_rev = jnp.argmax(rev, axis=0)
    env = h - 1 - idx_in_rev
    return jnp.where(has_any, env, ENVELOPE_EMPTY).astype(jnp.int32)


def fabric_upper_envelope(fabric_mask: Array) -> Array:
    """Top-most fabric row per column; -1 where empty. The diagnostic-harness
    variant of the envelope (reference: Utils/check_stitch_distance.py:238-251
    uses the upper edge when the seam runs above the fabric)."""
    rev = fabric_mask > 0
    has_any = jnp.any(rev, axis=0)
    idx = jnp.argmax(rev, axis=0)
    return jnp.where(has_any, idx, ENVELOPE_EMPTY).astype(jnp.int32)


def fabric_edge_mask(fabric_mask: Array) -> Array:
    """Boundary pixels of the fabric union mask: fabric pixels with at least
    one 4-neighbour outside the mask (the frame border counts as outside).

    Diagnostic-harness parity: ``_fabric_edge_points``
    (reference: Utils/check_stitch_distance.py:268-279) extracts the outer
    contour point set via cv2.findContours(RETR_EXTERNAL, CHAIN_APPROX_NONE)
    to feed a nearest-contour candidate search (MAX_EDGE_CANDIDATES=20,
    check_stitch_distance.py:37) — which the harness prepares at :456-460 but
    never executes (dead prototype code). This is the fixed-shape TPU form of
    the intended semantics: a nearest-point search needs the boundary pixel
    SET, not cv2's traced chain order, so the op returns a (H, W) bool mask
    that downstream reductions consume in place — no host-side point list,
    no ``max_pts`` decimation (that exists only to bound cv2's Python list).

    Divergence, documented: RETR_EXTERNAL drops interior hole contours; the
    erosion boundary keeps them. For the search's purpose (nearest fabric
    EDGE to a stitch centroid sitting outside the fabric) the outer boundary
    is always strictly nearer than any hole rim, so candidates differ only in
    the pathological hole-adjacent case the harness never handled either.

    fabric_mask: (H, W) bool/float. Returns (H, W) bool.
    """
    m = fabric_mask > 0
    pad = jnp.pad(m, 1, constant_values=False)
    interior = (pad[:-2, 1:-1] & pad[2:, 1:-1]
                & pad[1:-1, :-2] & pad[1:-1, 2:])
    return m & ~interior


def nearest_edge_candidates(
    edge_mask: Array, cx: Array, cy: Array, k: int = 20
) -> tuple[Array, Array, Array, Array]:
    """The ``k`` boundary pixels nearest to ``(cx, cy)``, nearest first.

    Fixed-shape form of the harness's nearest-contour candidate search
    (reference: Utils/check_stitch_distance.py:37 MAX_EDGE_CANDIDATES=20,
    prepared at :456-460): Euclidean distance from the centroid to every
    boundary pixel, top-k smallest. Variable-length contour lists become a
    masked full-grid reduction — one ``top_k`` on the TPU, no host round trip.

    edge_mask: (H, W) bool (from :func:`fabric_edge_mask`); cx, cy: scalar
    pixel coordinates in the same grid. Returns ``(ys, xs, dist, valid)``,
    each ``(k,)``; ``valid`` is False past the number of boundary pixels
    (then ys/xs are 0 and dist is +inf).
    """
    h, w = edge_mask.shape
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    d2 = (xs - cx) ** 2 + (ys - cy) ** 2
    d2 = jnp.where(edge_mask > 0, d2, jnp.inf).reshape(-1)
    neg, idx = jax.lax.top_k(-d2, k)
    dist = jnp.sqrt(-neg)
    valid = jnp.isfinite(dist)
    return (jnp.where(valid, idx // w, 0).astype(jnp.int32),
            jnp.where(valid, idx % w, 0).astype(jnp.int32),
            dist, valid)


def masked_median(values: Array, mask: Array, axis: int = -1) -> tuple[Array, Array]:
    """Median of the masked-in entries along ``axis`` (numpy semantics: mean of
    the two middles for even counts). Returns (median, any_valid). Invalid ->
    0.0 with any_valid False."""
    big = jnp.asarray(jnp.finfo(jnp.float32).max, values.dtype)
    filled = jnp.where(mask, values, big)
    sorted_vals = jnp.sort(filled, axis=axis)
    n = jnp.sum(mask, axis=axis)
    any_valid = n > 0
    n_safe = jnp.maximum(n, 1)
    lo_idx = (n_safe - 1) // 2
    hi_idx = n_safe // 2
    lo = jnp.take_along_axis(sorted_vals, lo_idx[..., None], axis=axis)[..., 0]
    hi = jnp.take_along_axis(sorted_vals, hi_idx[..., None], axis=axis)[..., 0]
    med = 0.5 * (lo + hi)
    return jnp.where(any_valid, med, 0.0), any_valid


def masked_mean(values: Array, mask: Array, axis: int = -1) -> tuple[Array, Array]:
    n = jnp.sum(mask, axis=axis)
    s = jnp.sum(jnp.where(mask, values, 0.0), axis=axis)
    return s / jnp.maximum(n, 1), n > 0


def stitch_stats(
    masks: Array, boxes: Array, valid: Array
) -> tuple[Array, Array, Array, Array, Array]:
    """Per-instance centroid + horizontal extent, with bbox fallback.

    Vectorized equivalent of the reference's per-stitch loop
    (measurement.py:298-329): centroid from image moments m10/m00, m01/m00;
    pixel width from the occupied-column span; all falling back to the bbox
    when the mask is empty.

    masks (N, H, W) binary on some grid; boxes (N, 4) xyxy on the SAME grid;
    valid (N,). Returns (cx, cy, left, right, has_mask) each (N,), grid coords.
    """
    m = (masks > 0).astype(jnp.float32)
    h, w = m.shape[-2], m.shape[-1]
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)

    m00 = jnp.sum(m, axis=(-2, -1))
    m10 = jnp.sum(m * xs[None, None, :], axis=(-2, -1))
    m01 = jnp.sum(m * ys[None, :, None], axis=(-2, -1))
    has_mask = (m00 > 1e-6) & valid

    cx_m = m10 / jnp.maximum(m00, 1e-6)
    cy_m = m01 / jnp.maximum(m00, 1e-6)

    col_any = jnp.any(m > 0, axis=-2)  # (N, W)
    left_m = jnp.argmax(col_any, axis=-1).astype(jnp.float32)
    right_m = (w - 1 - jnp.argmax(col_any[:, ::-1], axis=-1)).astype(jnp.float32)

    bx_cx = 0.5 * (boxes[:, 0] + boxes[:, 2])
    bx_cy = 0.5 * (boxes[:, 1] + boxes[:, 3])

    cx = jnp.where(has_mask, cx_m, bx_cx)
    cy = jnp.where(has_mask, cy_m, bx_cy)
    left = jnp.where(has_mask, left_m, boxes[:, 0])
    right = jnp.where(has_mask, right_m, boxes[:, 2])
    return cx, cy, left, right, has_mask


def kmeans_1d_two_clusters(
    values: Array, valid: Array, iters: int = 10
) -> tuple[Array, tuple[Array, Array]]:
    """Masked 1-D 2-means (reference: measurement.py:88-113) with a fixed
    iteration count (the reference caps at 10; data-dependent early exit would
    force dynamic control flow, and extra iterations past convergence are
    no-ops by construction).

    Returns (labels (N,) int32 in {0,1}, (c0, c1)). Invalid rows get label 0.
    """
    big = jnp.asarray(1e9, values.dtype)
    vmin = jnp.min(jnp.where(valid, values, big))
    vmax = jnp.max(jnp.where(valid, values, -big))

    def body(_, carry):
        c0, c1 = carry
        d0 = jnp.abs(values - c0)
        d1 = jnp.abs(values - c1)
        labels = (d1 < d0) & valid
        n1 = jnp.sum(labels)
        n0 = jnp.sum(valid & ~labels)
        new_c0 = jnp.sum(jnp.where(valid & ~labels, values, 0.0)) / jnp.maximum(n0, 1)
        new_c1 = jnp.sum(jnp.where(labels, values, 0.0)) / jnp.maximum(n1, 1)
        # Degenerate split (all points one side) keeps previous centers, like the
        # reference's early break (measurement.py:101-102).
        keep = (n1 == 0) | (n0 == 0)
        return (jnp.where(keep, c0, new_c0), jnp.where(keep, c1, new_c1))

    c0, c1 = jax.lax.fori_loop(0, iters, body, (vmin, vmax))
    labels = ((jnp.abs(values - c1) < jnp.abs(values - c0)) & valid).astype(jnp.int32)
    return labels, (c0, c1)


def sample_envelope(
    envelope: Array,
    cx: Array,
    neighborhood_cols: Array,
) -> tuple[Array, Array]:
    """Median envelope height around each centroid column.

    Equivalent of the reference's +-ENVELOPE_NEIGHBORHOOD column median
    (measurement.py:408-419,440-449): for each centroid x, gather envelope at
    the offset columns (clipped to bounds), median over columns that have
    fabric.

    envelope (W,) int32 with -1 sentinel; cx (N,) float grid coords;
    neighborhood_cols (K,) int32 offsets (e.g. arange(-3, 4)).
    Returns (env_y (N,) float32, has_env (N,) bool).
    """
    w = envelope.shape[0]
    cols = jnp.clip(
        jnp.round(cx).astype(jnp.int32)[:, None] + neighborhood_cols[None, :], 0, w - 1
    )
    vals = envelope[cols].astype(jnp.float32)  # (N, K)
    ok = vals >= 0
    return masked_median(vals, ok, axis=-1)
