"""The measurement pass: detections + masks -> seam/stitch metrics, one XLA op.

Reproduces the reference's ``process_frame`` measurement steps
(reference: measurement.py:188-511) as a single jitted, fixed-shape function:

  STEP 1  stitch widths from ALL stitches      (measurement.py:339-368)
  STEP 2  row selection for seam allowance     (measurement.py:374-430)
  STEP 3  edge distances for the near row      (measurement.py:432-462)
  STEP 4  means gated on MIN_STITCHES,
          median-of-FRAME_BUFFER smoothing     (measurement.py:469-484)

with these TPU-first re-designs:
- every per-stitch Python loop is a masked batched op (max_stitches padding),
- both pixel->mm endpoints of every stitch go through ONE batched ray-plane
  call instead of 2 cv2 calls per stitch,
- masks stay on the proto grid (model input / 4); statistics map to frame
  coordinates with the exact NEAREST-upsample relations (centroid of an
  upsampled block = 4*c + 1.5; envelope bottom row = 4*e + 3), so numbers match
  computing on full-resolution masks without ever materializing them,
- temporal smoothing is a functional ring-buffer state (MeasureState) carried
  through the step, not a Python deque.

"Missing" values are NaN in-graph; the host boundary (tti.app.results) converts
them to the reference's None + error-string dict contract
(measurement.py:506-511).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import flax.struct
import jax
import jax.numpy as jnp

from tti.calib.geometry import pixels_to_plane_mm
from tti.core.config import MeasureConfig
from tti.measure.ops import kmeans_1d_two_clusters, masked_mean, masked_median
from tti.postprocess.decode import Detections
from tti.preprocess.letterbox import LetterboxSpec

Array = jax.Array

PROTO_STRIDE = 4  # proto grid = model input / 4


@flax.struct.dataclass
class CameraParams:
    """Device-side calibration bundle (float32)."""

    K: Array  # (3,3)
    dist: Array  # (5,)
    R: Array  # (3,3)
    t: Array  # (3,)

    @staticmethod
    def from_calibration(calib) -> "CameraParams":
        import numpy as np

        from tti.calib.geometry import rodrigues

        R = rodrigues(jnp.asarray(calib.rvec, jnp.float32))
        return CameraParams(
            K=jnp.asarray(calib.K, jnp.float32),
            dist=jnp.asarray(calib.dist, jnp.float32),
            R=R,
            t=jnp.asarray(np.asarray(calib.tvec).reshape(3), jnp.float32),
        )


@flax.struct.dataclass
class FrameMeasurement:
    """Per-frame metrics; NaN = absent (host converts to None)."""

    edge_distance_mm: Array  # smoothed (scalar)
    stitch_width_mm: Array  # smoothed
    raw_edge_mm: Array
    raw_width_mm: Array
    n_dist: Array  # int32: stitches used for edge distance ('stitch_count')
    n_width: Array
    n_stitches: Array  # all detected stitches after ROI gating
    fabric_detected: Array  # bool


@flax.struct.dataclass
class MeasureState:
    """Functional replacement for the 8-deep median deques
    (reference: measurement.py:149-150)."""

    dist_buf: Array  # (F,)
    width_buf: Array
    dist_n: Array  # int32 filled count
    width_n: Array
    dist_pos: Array  # int32 ring cursor
    width_pos: Array


def init_measure_state(frame_buffer: int = 8) -> MeasureState:
    zeros = jnp.zeros((frame_buffer,), jnp.float32)
    zi = jnp.zeros((), jnp.int32)
    return MeasureState(zeros, zeros, zi, zi, zi, zi)


# Static measurement knobs as a hashable config (MeasureConfig is frozen).
MeasureParams = MeasureConfig


# ---------------------------------------------------------------------------
# Grid mappings (proto/mask grid <-> model-input px <-> frame px)
# ---------------------------------------------------------------------------


def _mask_center_to_frame(x_mask: Array, pad: float, scale: float,
                          q: float = PROTO_STRIDE) -> Array:
    """Centroid-consistent: NEAREST-upsampling a mask by q maps a low-res
    centroid c to q*c + (q-1)/2 in input px (q=4: 4c+1.5; the hi-res q=2
    head: 2c+0.5); then un-letterbox to frame px. q must come from the
    ACTUAL proto grid (input/protos.shape), not the Ultralytics constant —
    the stride-2 deploy head measured ~2x-displaced stitch coordinates when
    this was hardcoded at 4 (round-3 mm-report regression)."""
    return (x_mask * q + (q - 1.0) / 2.0 - pad) / scale


def _mask_left_to_frame(x_mask: Array, pad: float, scale: float,
                        q: float = PROTO_STRIDE) -> Array:
    return (x_mask * q - pad) / scale


def _mask_right_to_frame(x_mask: Array, pad: float, scale: float,
                         q: float = PROTO_STRIDE) -> Array:
    return (x_mask * q + (q - 1.0) - pad) / scale


def _mask_bottom_to_frame(y_mask: Array, pad: float, scale: float,
                          q: float = PROTO_STRIDE) -> Array:
    """Envelope rows are bottom-most pixels: block bottom row = q*e + q-1."""
    return (y_mask * q + (q - 1.0) - pad) / scale


def _frame_x_to_mask_col(x_frame: Array, pad: float, scale: float,
                         q: float = PROTO_STRIDE) -> Array:
    return (x_frame * scale + pad) / q


# ---------------------------------------------------------------------------
# Detection -> per-stitch arrays (class split, ROI gate, mask stats)
# ---------------------------------------------------------------------------


@flax.struct.dataclass
class StitchSet:
    """Fixed-size per-stitch arrays in FRAME pixel coordinates."""

    cx: Array
    cy: Array
    left: Array
    right: Array
    valid: Array  # bool


def roi_center_gate(
    boxes_frame: Array, roi_bounds: tuple[float, float, float, float] | None
) -> Array:
    """Keep detections whose bbox center lies inside the ROI
    (reference: measurement.py:253-259). roi_bounds None => all pass."""
    if roi_bounds is None:
        return jnp.ones(boxes_frame.shape[:-1], bool)
    x_min, y_min, x_max, y_max = roi_bounds
    cx = 0.5 * (boxes_frame[..., 0] + boxes_frame[..., 2])
    cy = 0.5 * (boxes_frame[..., 1] + boxes_frame[..., 3])
    return (cx >= x_min) & (cx <= x_max) & (cy >= y_min) & (cy <= y_max)


def prepare_frame_inputs(
    dets: Detections,
    protos: Array,
    spec: LetterboxSpec,
    stitch_class_id: int,
    fabric_class_id: int,
    roi_bounds: tuple[float, float, float, float] | None,
    max_stitches: int,
    max_stats_dets: int = 64,
    subcell: bool = False,
    subcell_envelope: bool | None = None,
) -> tuple[StitchSet, Array, Array, dict]:
    """Single-frame glue: split classes, gate by ROI, build stitch statistics
    and the fabric envelope. All shapes static.

    subcell=True (MeasureConfig.subcell_edge / TTI_SUBCELL_EDGE=1) switches to
    the occupancy-aware statistics for soft-mask-trained nets: boundary
    positions read from the 0.5-crossing of the calibrated occupancy field
    instead of the eroding binary threshold (instance_mask_stats_soft). The
    envelope is then FLOAT crossing indices in center-mapped units; the
    default path keeps the reference-exact integer bottom-row semantics.

    subcell_envelope (None = follow ``subcell``) splits the ENVELOPE readout
    from the stitch readout for per-class-trained nets (`tti train
    --soft-masks stitch`): a binary-trained fabric head keeps the
    reference-exact integer envelope while soft-trained stitches read
    sub-cell. The envelope dtype follows ITS flag (float crossings vs int32
    rows) — measure_frame's cfg.envelope_subcell must agree.

    Statistics come from the fused mask-proto reduction
    (tti.kernels.maskstats: Pallas on TPU, dense XLA elsewhere) — per-instance
    masks are never materialized on the measurement path.

    max_stats_dets caps the detection rows entering the (D, Hm, Wm) mask-stats
    reduction. NMS emits rows score-sorted, so the cap is a static slice of
    the TOP detections — exact whenever a frame has <= max_stats_dets valid
    detections (production scenes: tens), and it bounds the measure stage's
    dominant tensor regardless of the NMS max_det budget.

    dets: single-frame Detections (D rows); protos (Hm, Wm, nm).
    Returns (StitchSet (max_stitches rows), envelope (Wm,) int32, fabric_any bool,
    counts dict of int32 scalars for budget-overflow telemetry).
    """
    from tti.kernels.maskstats import instance_mask_stats, instance_mask_stats_soft
    from tti.preprocess.letterbox import scale_boxes_to_frame

    input_hw = (spec.dst_h, spec.dst_w)
    wm = protos.shape[1]

    # Telemetry over the FULL detection set, computed BEFORE the static stats
    # slice: budget overflow must be visible, never silent (a frame with more
    # ROI-valid detections than max_stats_dets / more stitches than
    # max_stitches drops the lowest-score rows — counts let the host log it).
    boxes_frame = scale_boxes_to_frame(dets.boxes, spec)
    in_roi_full = roi_center_gate(boxes_frame, roi_bounds) & dets.valid
    counts = {
        "n_roi_valid": jnp.sum(in_roi_full).astype(jnp.int32),
        "n_stitches_raw": jnp.sum(
            in_roi_full & (dets.classes == stitch_class_id)
        ).astype(jnp.int32),
    }

    if max_stats_dets and dets.boxes.shape[0] > max_stats_dets:
        dets = jax.tree_util.tree_map(lambda a: a[:max_stats_dets], dets)
        in_roi = in_roi_full[:max_stats_dets]
    else:
        in_roi = in_roi_full

    is_stitch = in_roi & (dets.classes == stitch_class_id)
    is_fabric = in_roi & (dets.classes == fabric_class_id)

    scale_vec = jnp.array(
        [wm / input_hw[1], protos.shape[0] / input_hw[0],
         wm / input_hw[1], protos.shape[0] / input_hw[0]],
        jnp.float32,
    )
    boxes_grid = dets.boxes * scale_vec
    env_subcell = subcell if subcell_envelope is None else subcell_envelope
    if subcell or env_subcell:
        stats = instance_mask_stats_soft(protos, dets.coefs, boxes_grid, in_roi)
    else:
        stats = instance_mask_stats(protos, dets.coefs, boxes_grid, in_roi)
    if env_subcell:
        # Union of sub-cell lower boundaries (float crossing indices).
        envelope = jnp.max(
            jnp.where(is_fabric[:, None], stats["bottom_sub"], -1.0), axis=0
        )
    else:
        # Fabric: union lower envelope = per-column max of instance bottom rows
        # (bottom is -1 where a column is empty -> sentinel survives the max;
        # the soft stats dict carries the identical binary `bottom` field, so
        # a soft-stitch/binary-fabric net reads the reference-exact rows).
        fabric_bottom = jnp.max(
            jnp.where(is_fabric[:, None], stats["bottom"], -1.0), axis=0
        )
        envelope = fabric_bottom.astype(jnp.int32)
    fabric_any = jnp.any(is_fabric & (stats["m00"] > 0))

    # Compact the stitch rows to a fixed max_stitches budget (NMS emits rows
    # score-sorted; stable top_k keeps that order).
    stitch_rank = jnp.where(is_stitch, dets.scores, -1.0)
    _, order = jax.lax.top_k(stitch_rank, min(max_stitches, stitch_rank.shape[0]))
    sel_valid = is_stitch[order]

    # The ACTUAL proto stride of this model (4 = Ultralytics; 2 = the hi-res
    # head). Static shapes make this a trace-time Python float.
    q = input_hw[1] / wm
    bsel = boxes_grid[order]

    if subcell:
        from tti.kernels.maskstats import subcell_col_extent

        m00s = stats["m00s"][order]
        has_mask = (m00s > 1e-6) & sel_valid
        cx_m = stats["m10s"][order] / jnp.maximum(m00s, 1e-6)
        cy_m = stats["m01s"][order] / jnp.maximum(m00s, 1e-6)
        left_m, right_m, _ = subcell_col_extent(stats["col_p"][order])
        # Bbox fallback, converted from grid coords g (input px = g*q) into
        # center-mapped crossing units c (input px = c*q + (q-1)/2).
        dlt = (q - 1.0) / (2.0 * q)
        cx_m = jnp.where(has_mask, cx_m, 0.5 * (bsel[:, 0] + bsel[:, 2]) - dlt)
        cy_m = jnp.where(has_mask, cy_m, 0.5 * (bsel[:, 1] + bsel[:, 3]) - dlt)
        left_m = jnp.where(has_mask, left_m, bsel[:, 0] - dlt)
        right_m = jnp.where(has_mask, right_m, bsel[:, 2] - dlt)
        # All sub-cell quantities (soft centroids, 0.5-crossings) live in
        # center-mapped units: one mapping for every coordinate.
        stitches = StitchSet(
            cx=_mask_center_to_frame(cx_m, spec.pad_left, spec.scale, q),
            cy=_mask_center_to_frame(cy_m, spec.pad_top, spec.scale, q),
            left=_mask_center_to_frame(left_m, spec.pad_left, spec.scale, q),
            right=_mask_center_to_frame(right_m, spec.pad_left, spec.scale, q),
            valid=sel_valid,
        )
        return stitches, envelope, fabric_any, counts

    m00 = stats["m00"][order]
    has_mask = (m00 > 1e-6) & sel_valid
    cx_m = stats["m10"][order] / jnp.maximum(m00, 1e-6)
    cy_m = stats["m01"][order] / jnp.maximum(m00, 1e-6)
    col_any = stats["col_any"][order] > 0  # (S, Wm)
    left_m = jnp.argmax(col_any, axis=-1).astype(jnp.float32)
    right_m = (wm - 1 - jnp.argmax(col_any[:, ::-1], axis=-1)).astype(jnp.float32)

    # Bbox fallback for empty masks (reference: measurement.py:308-323).
    cx_m = jnp.where(has_mask, cx_m, 0.5 * (bsel[:, 0] + bsel[:, 2]))
    cy_m = jnp.where(has_mask, cy_m, 0.5 * (bsel[:, 1] + bsel[:, 3]))
    left_m = jnp.where(has_mask, left_m, bsel[:, 0])
    right_m = jnp.where(has_mask, right_m, bsel[:, 2])

    stitches = StitchSet(
        cx=_mask_center_to_frame(cx_m, spec.pad_left, spec.scale, q),
        cy=_mask_center_to_frame(cy_m, spec.pad_top, spec.scale, q),
        left=_mask_left_to_frame(left_m, spec.pad_left, spec.scale, q),
        right=_mask_right_to_frame(right_m, spec.pad_left, spec.scale, q),
        valid=sel_valid,
    )
    return stitches, envelope, fabric_any, counts


# ---------------------------------------------------------------------------
# The measurement op
# ---------------------------------------------------------------------------


def _sample_envelope_frame(
    envelope: Array, cx_frame: Array, spec: LetterboxSpec, neighborhood: int,
    subcell: bool = False,
) -> tuple[Array, Array]:
    """Median envelope height (frame px) over the +-neighborhood FRAME columns
    around each centroid (reference: measurement.py:408-419,444-449). Frame
    columns map to (possibly repeated) mask columns — repetition mirrors the
    NEAREST-expanded envelope the reference reads.

    subcell: envelope holds float 0.5-crossing indices (center-mapped units)
    instead of integer bottom rows (bottom-pixel units)."""
    w = envelope.shape[0]
    q = spec.dst_w / w  # actual proto stride (4, or 2 for the hi-res head)
    offs = jnp.arange(-neighborhood, neighborhood + 1, dtype=jnp.float32)
    cols_f = _frame_x_to_mask_col(cx_frame[:, None] + offs[None, :],
                                  spec.pad_left, spec.scale, q)
    cols = jnp.clip(cols_f.astype(jnp.int32), 0, w - 1)
    vals = envelope[cols].astype(jnp.float32)
    ok = vals >= 0
    med_mask_y, has = masked_median(vals, ok, axis=-1)
    to_frame = _mask_center_to_frame if subcell else _mask_bottom_to_frame
    env_frame_y = to_frame(med_mask_y, spec.pad_top, spec.scale, q)
    return jnp.where(has, env_frame_y, 0.0), has


@partial(jax.jit, static_argnames=("spec", "cfg"))
def measure_frame(
    stitches: StitchSet,
    envelope: Array,
    fabric_any: Array,
    cam: CameraParams,
    spec: LetterboxSpec,
    cfg: MeasureConfig,
) -> FrameMeasurement:
    """STEPs 1-4 of the reference measurement on one frame's stitch set."""
    valid = stitches.valid
    n_stitches = jnp.sum(valid)
    any_stitch = n_stitches > 0

    # ---- STEP 1: widths from ALL stitches (measurement.py:339-368).
    # Both endpoints of every stitch in ONE batched px->mm call.
    width_pts = jnp.stack(
        [
            jnp.stack([stitches.left, stitches.cy], axis=-1),
            jnp.stack([stitches.right, stitches.cy], axis=-1),
        ],
        axis=1,
    )  # (N, 2, 2)
    w_mm, w_ok = pixels_to_plane_mm(
        width_pts, cam.K, cam.dist, cam.R, cam.t, iters=cfg.undistort_iters
    )
    widths = jnp.linalg.norm(w_mm[:, 1] - w_mm[:, 0], axis=-1)
    width_valid = valid & w_ok[:, 0] & w_ok[:, 1]

    # ---- STEP 2: row selection (measurement.py:374-430).
    env_y, has_env = _sample_envelope_frame(
        envelope, stitches.cx, spec, cfg.envelope_neighborhood,
        subcell=cfg.envelope_subcell,
    )
    multi = n_stitches >= 2
    if cfg.skip_cluster:
        med_y, _ = masked_median(stitches.cy, valid)
        big = jnp.asarray(1e9, jnp.float32)
        y_range = jnp.max(jnp.where(valid, stitches.cy, -big)) - jnp.min(
            jnp.where(valid, stitches.cy, big)
        )
        split = multi & (y_range > cfg.two_row_threshold_px)
        selected = valid & jnp.where(split, stitches.cy >= med_y, True)
    else:
        labels, _ = kmeans_1d_two_clusters(stitches.cy, valid)
        env_rows = envelope >= 0
        env_mean_mask_y, env_has = masked_mean(envelope.astype(jnp.float32), env_rows)
        # q from the ACTUAL envelope grid (was hardcoded 4 via the default —
        # a 2x-displaced cluster-selection anchor on the stride-2 head).
        q_env = spec.dst_w / envelope.shape[0]
        env_to_frame = (_mask_center_to_frame if cfg.envelope_subcell
                        else _mask_bottom_to_frame)
        fabric_mean_y = env_to_frame(env_mean_mask_y, spec.pad_top, spec.scale, q_env)
        c0_mean, c0_has = masked_mean(stitches.cy, valid & (labels == 0))
        c1_mean, c1_has = masked_mean(stitches.cy, valid & (labels == 1))
        c0_dist = jnp.where(c0_has, jnp.abs(c0_mean - fabric_mean_y), 1e9)
        c1_dist = jnp.where(c1_has, jnp.abs(c1_mean - fabric_mean_y), 1e9)
        chosen = jnp.where(env_has, jnp.where(c0_dist < c1_dist, 0, 1), 0)
        selected = valid & jnp.where(multi, labels == chosen, True)

    # Envelope-proximity gate with fall-back-to-selected (measurement.py:408-430).
    near = selected & has_env & (jnp.abs(stitches.cy - env_y) < cfg.max_px_distance)
    final = jnp.where(jnp.any(near), near, selected)

    # ---- STEP 3: edge distances for the near row (measurement.py:432-462).
    edge_pts = jnp.stack(
        [
            jnp.stack([stitches.cx, stitches.cy], axis=-1),
            jnp.stack([stitches.cx, env_y], axis=-1),
        ],
        axis=1,
    )
    e_mm, e_ok = pixels_to_plane_mm(
        edge_pts, cam.K, cam.dist, cam.R, cam.t, iters=cfg.undistort_iters
    )
    dists = jnp.linalg.norm(e_mm[:, 1] - e_mm[:, 0], axis=-1)
    dist_valid = final & has_env & e_ok[:, 0] & e_ok[:, 1]

    # ---- STEP 4: means gated on MIN_STITCHES (measurement.py:469-472).
    n_dist = jnp.sum(dist_valid)
    n_width = jnp.sum(width_valid)
    avg_dist, _ = masked_mean(dists, dist_valid)
    avg_width, _ = masked_mean(widths, width_valid)
    nan = jnp.asarray(jnp.nan, jnp.float32)
    # No fabric / no stitches reproduce the reference's error paths
    # (measurement.py:281-287,332-337): no metrics at all.
    usable = fabric_any & any_stitch
    # Per-checkpoint readout calibration (MeasureConfig.cal_*_mm, from the
    # sidecar via with_subcell_from): constant mm offsets correcting the
    # net's systematic boundary-calibration bias — the reference's own
    # output-offset mechanism (config.py:156-157), derived per checkpoint
    # by tools/calibrate_offsets.py on an independent synthetic set.
    # NaN frames stay NaN (nan + c == nan).
    avg_dist = avg_dist + jnp.float32(cfg.cal_edge_mm)
    avg_width = avg_width + jnp.float32(cfg.cal_width_mm)
    raw_edge = jnp.where(usable & (n_dist >= cfg.min_stitches), avg_dist, nan)
    raw_width = jnp.where(usable & (n_width >= cfg.min_stitches), avg_width, nan)

    return FrameMeasurement(
        edge_distance_mm=raw_edge,  # smoothing applied by smooth_measurement
        stitch_width_mm=raw_width,
        raw_edge_mm=raw_edge,
        raw_width_mm=raw_width,
        n_dist=jnp.where(usable, n_dist, 0).astype(jnp.int32),
        n_width=jnp.where(usable, n_width, 0).astype(jnp.int32),
        n_stitches=n_stitches.astype(jnp.int32),
        fabric_detected=fabric_any,
    )


def _push_and_median(
    buf: Array, n: Array, pos: Array, value: Array
) -> tuple[Array, Array, Array, Array]:
    """Push ``value`` (if not NaN) into the ring; return masked median."""
    has = ~jnp.isnan(value)
    f = buf.shape[0]
    new_buf = jnp.where(has, buf.at[pos].set(jnp.nan_to_num(value)), buf)
    new_n = jnp.where(has, jnp.minimum(n + 1, f), n)
    new_pos = jnp.where(has, (pos + 1) % f, pos)
    idx = jnp.arange(f)
    med, any_valid = masked_median(new_buf, idx < new_n)
    med = jnp.where(has & any_valid, med, jnp.nan)
    return new_buf, new_n, new_pos, med


@jax.jit
def smooth_measurement(
    state: MeasureState, meas: FrameMeasurement
) -> tuple[MeasureState, FrameMeasurement]:
    """Median-of-window smoothing (reference: measurement.py:474-484): a frame
    with a value pushes it and reads the window median; a frame without one
    reports NaN and leaves the window untouched."""
    d_buf, d_n, d_pos, d_med = _push_and_median(
        state.dist_buf, state.dist_n, state.dist_pos, meas.raw_edge_mm
    )
    w_buf, w_n, w_pos, w_med = _push_and_median(
        state.width_buf, state.width_n, state.width_pos, meas.raw_width_mm
    )
    new_state = MeasureState(d_buf, w_buf, d_n, w_n, d_pos, w_pos)
    return new_state, dataclasses.replace(
        meas, edge_distance_mm=d_med, stitch_width_mm=w_med
    )
