"""The production inference runtime: batched frames -> detections + metrics.

This is the TPU replacement for the reference's hot path
(reference: main.py:187-314 + measurement.py:188-511): instead of one
synchronous predict every 2 s, the runtime jits the ENTIRE chain

    uint8 frames -> (fused undistort+)letterbox -> YOLOv8-seg -> DFL decode
    -> batched NMS -> mask statistics -> envelope -> px->mm measurement

into one XLA program over a (B, H, W, 3) batch, sharded over a 1-D 'data' mesh
(BASELINE.json configs 3-5). The host only supplies camera frames and receives
compact geometry (boxes, per-frame metrics, proto-res masks for rendering) —
no per-detection host/device ping-pong.

Dual-model pipelines (BASELINE config 4: best_Model + single_needle_model
sharing preprocessed frames) reuse one preprocess pass via ``DualPipeline``.
"""

from __future__ import annotations

import os

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tti.calib.io import CalibrationData
from tti.core.config import MeasureConfig, ModelConfig, RoiConfig
from tti.measure.pipeline import (
    CameraParams,
    FrameMeasurement,
    measure_frame,
    prepare_frame_inputs,
)
from tti.model.yolo import YOLOv8Seg, create_model
from tti.parallel.mesh import batch_sharding
from tti.postprocess.decode import Detections, decode_predictions
from tti.postprocess.nms import batched_nms
from tti.preprocess.letterbox import LetterboxSpec, make_letterbox_spec
from tti.preprocess.remap import PackedRemap, build_small_undistort_map, letterbox_then_undistort

Array = jax.Array


@dataclass
class PipelineOutputs:
    """Host-side results for one batch (numpy)."""

    boxes_frame: np.ndarray  # (B, D, 4) xyxy in frame px (RECTIFIED frame
    # coordinates when the pipeline undistorts — overlay on a host-undistorted
    # frame, see Orchestrator.save_annotated_frame)
    scores: np.ndarray
    classes: np.ndarray
    valid: np.ndarray
    masks: np.ndarray | None  # (B, D, Hm, Wm) proto-res binary, for rendering
    measurements: Any | None  # FrameMeasurement pytree of (B,) arrays, or None
    stitches: Any | None = None  # StitchSet pytree of (B, S) arrays (frame px)
    envelope: np.ndarray | None = None  # (B, Wm) int32 mask-grid envelope
    telemetry: dict | None = None  # (B,) int32 counts vs the static budgets
    # (n_candidates vs nms_pre_topk, n_valid vs max_det, n_roi_valid vs
    # max_stats_dets, n_stitches_raw vs max_stitches) — budget overflow is
    # detectable, never silent

    def budget_overflows(self, model_cfg, measure_cfg=None) -> dict[str, np.ndarray]:
        """Per-frame booleans: which static budgets this batch exceeded.
        An exceeded budget means the lowest-score rows were dropped at that
        stage; results remain valid but may under-count crowded scenes."""
        if not self.telemetry:
            return {}
        t = self.telemetry
        out = {"nms_pre_topk": t["n_candidates"] > model_cfg.nms_pre_topk}
        if "n_valid" in t:
            # Saturated output = the NMS max_det cap truncated survivors.
            # (n_candidates is PRE-NMS and would false-positive on every
            # busy frame — suppressed candidates are not drops.)
            out["max_detections"] = t["n_valid"] >= model_cfg.max_detections
        if measure_cfg is not None and "n_roi_valid" in t:
            out["max_stats_dets"] = t["n_roi_valid"] > measure_cfg.max_stats_dets
            out["max_stitches"] = t["n_stitches_raw"] > measure_cfg.max_stitches
        return out


class InspectionPipeline:
    """Builds and owns the jitted device step for one model."""

    def __init__(
        self,
        model_cfg: ModelConfig,
        variables: dict,
        frame_hw: tuple[int, int],
        calibration: CalibrationData | None = None,
        measure_cfg: MeasureConfig | None = None,
        roi: RoiConfig | None = None,
        mesh=None,
        return_masks: bool = False,
        undistort: bool = True,
        model: YOLOv8Seg | None = None,
        s2d_stem: bool = True,
        undistort_interp: str = "bilinear",
    ) -> None:
        self.model_cfg = model_cfg
        self.measure_cfg = measure_cfg or MeasureConfig()
        self.frame_hw = frame_hw
        self.spec: LetterboxSpec = make_letterbox_spec(
            frame_hw[0], frame_hw[1], model_cfg.image_size, model_cfg.letterbox
        )
        self.mesh = mesh
        self.return_masks = return_masks

        dtype = jnp.bfloat16 if model_cfg.dtype == "bfloat16" else jnp.float32
        if model is None and s2d_stem and "m0" in variables.get("params", {}):
            # Exact inference-time weight transforms:
            # - space-to-depth stem (measured 2.7x faster standalone forward on
            #   v5e; the 3-channel full-res stem wastes 125/128 lanes),
            # - fused head-entry conv (3 small branch convs -> 1 per level).
            from tti.model.convert import fuse_head_entries, stem_to_s2d

            # Head-entry fusion is exact but measured 2.5x SLOWER e2e on v5e
            # (225 vs 570 frames/s): slicing the fused conv's output into
            # 64/64/32-channel groups forces lane relayouts downstream.
            # Available for evaluation on other hardware via TTI_FUSED_HEAD=1.
            fuse_head = os.environ.get("TTI_FUSED_HEAD") == "1"
            # BatchNorm folding is exact (test_folded_bn_exact) and measured
            # faster (1737 vs 1703 frames/s at batch 128; single-frame p50
            # 8.7 vs 16.7 ms) -> default ON; TTI_FOLDED_BN=0 opts out.
            fold_bn = os.environ.get("TTI_FOLDED_BN", "1") != "0"
            # W8A8 int8 PTQ (tti.model.quantize): per-channel int8 weights +
            # either dynamic per-sample activation scales ("int8") or STATIC
            # scales calibrated offline ("int8s" — tools/calibrate_int8.py,
            # removes the per-layer absmax reductions + quant/dequant HBM
            # round-trips the dynamic A/B lost on). Opt-in via env.
            quant = os.environ.get("TTI_QUANT", "")
            if quant not in ("", "int8", "int8s"):
                raise ValueError(
                    f"TTI_QUANT must be '', 'int8' or 'int8s', got {quant!r}")
            # TwoPassWarp can emit the frame already space-to-depth blocked
            # (s2d_out), removing the stem's (B, H/2, 2, W/2, 2, C) relayout
            # copy and the letterbox pad op from the step. Measured at the
            # production batch (128, v5e): 6042/6046 frames/s over two runs
            # vs 6008/6029 baseline -> default ON; TTI_WARP_S2D=0 opts out
            # (only TwoPassWarp preprocess honors it — the packed-gather
            # fallback keeps the in-model blocking either way).
            warp_s2d = os.environ.get("TTI_WARP_S2D", "1") != "0"
            variables = stem_to_s2d(variables)
            if fuse_head:
                variables = fuse_head_entries(variables)
            if fold_bn:
                from tti.model.convert import fold_batchnorm

                variables = fold_batchnorm(variables)
            if quant:
                if not fold_bn:
                    raise ValueError(
                        f"TTI_QUANT={quant} requires folded BN (TTI_FOLDED_BN=1)")
                if fuse_head:
                    raise ValueError(
                        f"TTI_QUANT={quant} + TTI_FUSED_HEAD=1 is unsupported "
                        "(no calibration path for the fused entries)")
                from tti.model.quantize import quantize_weights

                act_scales = None
                if quant == "int8s":
                    scales_path = os.environ.get("TTI_QUANT_SCALES", "")
                    if not scales_path or not os.path.exists(scales_path):
                        raise ValueError(
                            "TTI_QUANT=int8s needs TTI_QUANT_SCALES=<json from "
                            "tools/calibrate_int8.py> (per-block activation "
                            f"scales); got {scales_path!r}")
                    import json

                    with open(scales_path) as f:
                        act_scales = dict(json.load(f)["scales"])
                    # Calibration runs the plain-stem model; this pipeline runs
                    # the (numerically identical, relabeled) s2d stem.
                    if "m0" in act_scales and "m0s2d" not in act_scales:
                        act_scales["m0s2d"] = act_scales.pop("m0")
                variables = quantize_weights(variables, act_scales=act_scales)
            model = YOLOv8Seg(
                variant=model_cfg.variant, nc=model_cfg.num_classes, dtype=dtype,
                s2d_stem=True, s2d_input=warp_s2d, fused_head_entry=fuse_head,
                folded_bn=fold_bn, qmode=quant,
                mask_stride=model_cfg.mask_stride,
                proto_head=model_cfg.proto_head,
            )
        self.model = model or create_model(
            model_cfg.variant, nc=model_cfg.num_classes, dtype=dtype,
            mask_stride=model_cfg.mask_stride, proto_head=model_cfg.proto_head,
        )
        # Pin params on device once: weight transforms (and checkpoint loads)
        # can leave numpy leaves in the tree, and a numpy tree is re-uploaded
        # host->device on EVERY jitted call — catastrophic on relayed
        # transports (measured 1703 -> 367 frames/s when fold_batchnorm left
        # the whole tree in numpy).
        self.variables = jax.device_put(variables)

        self.roi_bounds: tuple[float, float, float, float] | None = None
        if roi is not None and roi.enabled:
            # Clamped to frame like the reference (measurement.py:222-236).
            h, w = frame_hw
            x1 = max(0, min(roi.x_min, w - 1))
            x2 = max(0, min(roi.x_max, w - 1))
            y1 = max(0, min(roi.y_min, h - 1))
            y2 = max(0, min(roi.y_max, h - 1))
            if x1 < x2 and y1 < y2:
                self.roi_bounds = (float(x1), float(y1), float(x2), float(y2))

        self.cam: CameraParams | None = None
        self.remap_xy: Array | None = None
        self.calibration = calibration
        if calibration is not None:
            self.cam = CameraParams.from_calibration(calibration)
            if undistort:
                # Two-stage preprocess: XLA letterbox resize then a packed-u32
                # small-operand undistort remap (see tti.preprocess.remap for
                # the measured rationale of both choices).
                small_map = build_small_undistort_map(
                    calibration.K, calibration.dist, self.spec, unpadded_src=True
                )
                remap_kind = os.environ.get("TTI_REMAP", "twopass")
                if remap_kind == "twopass" and undistort_interp == "bilinear":
                    # MXU path: the warp as two separable banded matmuls
                    # (tti/preprocess/warp2pass.py) — measured +19% e2e over
                    # the packed gather at batch 128 on v5e with a tight
                    # positional-error contract. TTI_REMAP=packed restores
                    # the gather.
                    from tti.preprocess.letterbox import decimation_stride
                    from tti.preprocess.warp2pass import TwoPassWarp

                    col = None
                    k = decimation_stride(self.spec)
                    if k is not None and os.environ.get(
                            "TTI_WARP_COLEXPAND") == "1":
                        # Fold the exact column decimation into pass 1 so the
                        # einsum consumes contiguous row-sliced frames.
                        # Measured REJECTED at batch 128 on v5e: 4745 vs 5041
                        # frames/s — the 3x pass-1 weight traffic (885 MB
                        # bf16/step) costs more than the stride-k u8 slice it
                        # removes (XLA already fuses that slice into the
                        # einsum operand load). Opt-in for other hardware.
                        col = (k, (k - 1) // 2, frame_hw[1])
                    blocked = os.environ.get("TTI_WARP_BLOCKED")
                    try:
                        self.remap_xy = TwoPassWarp(
                            small_map, (self.spec.new_h, self.spec.new_w),
                            col_expand=col,
                            # Banded weight slicing (exact; cuts the per-step
                            # weight HBM read ~4x). "0" keeps dense; any other
                            # integer is the output block width.
                            block=(int(blocked) or None) if blocked else None,
                            # Emit pre-blocked s2d output when the model skips
                            # its own blocking transpose.
                            s2d_out=getattr(self.model, "s2d_input", False),
                        )
                    except ValueError:  # non-monotonic vertical map
                        self.remap_xy = PackedRemap(
                            small_map, (self.spec.new_h, self.spec.new_w),
                            interp=undistort_interp,
                        )
                else:
                    self.remap_xy = PackedRemap(
                        small_map, (self.spec.new_h, self.spec.new_w),
                        interp=undistort_interp,
                    )
                # Frames are rectified before the model, so every downstream
                # pixel coordinate lives in IDEAL (pinhole) frame coordinates
                # under the original K. The measurement geometry must therefore
                # run with ZERO distortion — keeping the real coefficients here
                # would undistort a second time and skew the mm values. With
                # zero distortion the undistort fixed-point iterations are the
                # identity, so skip them statically (iters=0 returns the
                # initial normalized coords — exact).
                import dataclasses as _dc

                self.cam = self.cam.replace(dist=jnp.zeros(5, jnp.float32))
                self.measure_cfg = _dc.replace(self.measure_cfg, undistort_iters=0)

        self._step = self._build_step()

    # -- device step -------------------------------------------------------

    @property
    def warp_weights(self):
        """TwoPassWarp weight tensors, or None. Threaded through jitted steps
        as ARGUMENTS — closing over them embeds ~460 MB of constants in the
        serialized program (breaches remote-compile request limits)."""
        from tti.preprocess.warp2pass import TwoPassWarp

        return (self.remap_xy.weights
                if isinstance(self.remap_xy, TwoPassWarp) else None)

    def preprocess(self, frames_u8, warp_weights=None):
        """Traced: uint8 BGR frames -> model input (fused letterbox [+ remap]).
        Preprocess runs in the model's compute dtype: bf16 halves the resize's
        HBM traffic, and the packed remap re-quantizes to 8 bits regardless."""
        from tti.preprocess.warp2pass import TwoPassWarp

        pre_dtype = jnp.bfloat16 if self.model_cfg.dtype == "bfloat16" else jnp.float32
        # Contract with the model: s2d_input=True means the model skips its
        # own space-to-depth blocking. The s2d-emitting warp satisfies it for
        # free; every other path blocks here (same op the model would run).
        want_s2d = getattr(self.model, "s2d_input", False)
        if isinstance(self.remap_xy, TwoPassWarp):
            from tti.preprocess.letterbox import (
                bgr_to_rgb, letterbox_content, normalize,
            )

            # NOTE: a fused Pallas pass-1 kernel (decimate+BGR+normalize+
            # matmul, tti/kernels/warp_p1.py) was built and is numerics-
            # tested, but is NOT wired here: the k-strided byte select it
            # needs is inexpressible on current Mosaic (vector strided
            # slices are stride<2 only, DMA ref slices reject strides, and
            # HBM memref tiling 128-pads a (..., 3k) lane view), and every
            # MXU formulation of the select costs more than the ~2.7 ms XLA
            # pack it would replace. See the kernel docstring for the full
            # measured post-mortem.
            if self.remap_xy.col_expand is not None:
                # Rows by contiguous strided slice; columns inside pass 1.
                k, off, _ = self.remap_xy.col_expand
                rows = frames_u8[:, off::k, :, :][:, : self.spec.new_h]
                content = normalize(bgr_to_rgb(rows), pre_dtype)
            else:
                content = letterbox_content(frames_u8, self.spec, pre_dtype,
                                            decimate=True)
            out = self.remap_xy.apply(content, warp_weights)
            if want_s2d and not self.remap_xy.s2d_out:
                from tti.model.yolo import space_to_depth2

                out = space_to_depth2(out)
            return out
        if self.remap_xy is not None:
            out = letterbox_then_undistort(frames_u8, self.spec, self.remap_xy,
                                           dtype=pre_dtype)
        else:
            # letterbox_u8 with the ALREADY-COMPUTED spec — re-deriving
            # geometry from (dst_h, dst_w) can disagree with a rect spec by
            # 1px on the non-binding axis while scale_boxes_to_frame inverts
            # spec.scale.
            from tti.preprocess.letterbox import letterbox_u8

            out = letterbox_u8(frames_u8, self.spec, pre_dtype)
        if want_s2d:
            from tti.model.yolo import space_to_depth2

            out = space_to_depth2(out)
        return out

    def postprocess_chain(self, variables, x) -> dict:
        """Traced: preprocessed input -> the full per-model chain (forward,
        decode, NMS, telemetry, measurement, optional masks, frame boxes).
        Shared by the single-model step and DualPipeline (which runs this once
        per model on ONE preprocessed batch)."""
        spec = self.spec
        cfg = self.measure_cfg
        mcfg = self.model_cfg
        roi_bounds = self.roi_bounds
        measure_enabled = self.cam is not None
        return_masks = self.return_masks
        cam = self.cam
        # Lazy decode: rank anchors by raw logit, decode DFL only for the
        # top-k NMS candidates (exact — sigmoid is monotonic). Env-gated
        # pending a TPU A/B at the production batch size.
        lazy_decode = os.environ.get("TTI_LAZY_DECODE") == "1"

        raw = self.model.apply(variables, x, train=False)
        if lazy_decode:
            from tti.postprocess.nms import nms_from_raw, raw_candidate_counts

            dets = nms_from_raw(
                raw,
                conf_thresh=mcfg.conf_thresh,
                iou_thresh=mcfg.iou_thresh,
                max_det=mcfg.max_detections,
                pre_topk=mcfg.nms_pre_topk,
            )
            n_candidates = raw_candidate_counts(raw, mcfg.conf_thresh)
        else:
            boxes, probs, coefs = decode_predictions(raw)
            dets = batched_nms(
                boxes,
                probs,
                coefs,
                conf_thresh=mcfg.conf_thresh,
                iou_thresh=mcfg.iou_thresh,
                max_det=mcfg.max_detections,
                pre_topk=mcfg.nms_pre_topk,
                # Approximate candidate top-k (TPU partial reduce, recall
                # 0.99) instead of the full anchor sort; trades rare missed
                # candidates on >pre_topk-crowded frames for tail latency.
                # Opt-in pending the TPU A/B (exactness is the default).
                approx_topk=os.environ.get("TTI_APPROX_TOPK") == "1",
            )
            n_candidates = jnp.sum(
                jnp.max(probs, axis=-1) > mcfg.conf_thresh, axis=-1
            ).astype(jnp.int32)

        outs: dict[str, Any] = {"dets": dets}
        # Budget telemetry (VERDICT r1 item 5): the static NMS/stats caps
        # are exact only under-budget; expose the true in-graph counts so
        # over-budget frames are visible in logs, never silently truncated.
        telemetry = {
            "n_candidates": n_candidates,
            # Post-NMS survivor count: max_det overflow means THIS hit the
            # cap (candidates above conf that NMS suppresses are not drops).
            "n_valid": jnp.sum(dets.valid, axis=-1).astype(jnp.int32),
        }

        if measure_enabled:
            def per_frame(d: Detections, protos):
                stitches, envelope, fabric_any, counts = prepare_frame_inputs(
                    d, protos, spec, mcfg.stitch_class_id, mcfg.fabric_class_id,
                    roi_bounds, cfg.max_stitches, cfg.max_stats_dets,
                    # None (unresolved auto) measures binary — loaders resolve
                    # auto against the checkpoint sidecar before reaching here.
                    subcell=bool(cfg.subcell_edge),
                    subcell_envelope=cfg.envelope_subcell,
                )
                meas = measure_frame(stitches, envelope, fabric_any, cam, spec, cfg)
                return meas, stitches, envelope, counts

            meas, stitches, envelope, counts = jax.vmap(per_frame)(dets, raw.protos)
            outs["measurements"] = meas
            # Per-stitch geometry + envelope for host-side rendering
            # (reference overlays: measurement.py:292-296,358-368,460-462).
            outs["stitches"] = stitches
            outs["envelope"] = envelope
            telemetry.update(counts)
        outs["telemetry"] = telemetry

        if return_masks:
            from tti.postprocess.masks import assemble_masks

            outs["masks"] = jax.vmap(
                lambda d, p: assemble_masks(
                    p, d.coefs, d.boxes, d.valid, (spec.dst_h, spec.dst_w)
                )
            )(dets, raw.protos)

        # Boxes back to frame coordinates for the host.
        from tti.preprocess.letterbox import scale_boxes_to_frame

        outs["boxes_frame"] = scale_boxes_to_frame(dets.boxes, spec)
        return outs

    def _build_step(self):
        warp_w = self.warp_weights

        def step(variables, frames_u8, ww):
            return self.postprocess_chain(variables, self.preprocess(frames_u8, ww))

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from tti.parallel.mesh import frame_sharding

            # Frames shard on 'data' (batch) and, if the mesh has one, 'space'
            # (frame HEIGHT — spatial partitioning; see mesh.frame_sharding).
            # A 'space' axis turns the conv forward into H-slab SPMD with
            # XLA-inserted halo exchanges: the only mesh shape that reduces
            # SINGLE-FRAME latency rather than aggregate throughput.
            repl = NamedSharding(self.mesh, P())
            jitted = jax.jit(
                step,
                in_shardings=(repl, frame_sharding(self.mesh), repl),
            )
            return lambda variables, frames_u8: jitted(variables, frames_u8, warp_w)

        # Single device: let XLA CHOOSE the frames input layout (Layout.AUTO)
        # and place the frames in that layout, instead of accepting the
        # default layout and relayouting in-graph. Profiled at batch 128/1080p
        # the default path's first op is a 3.95 ms pure copy of the 796 MB u8
        # batch (16% of the step); with the auto layout (batch-minor — the
        # warp einsum wants B in lanes) the copy vanishes: 26.3 -> 22.5
        # ms/step measured. Host-fed callers pay the same H2D bytes either
        # way (the transfer engine linearizes host row-major into any tiled
        # layout). TTI_INPUT_LAYOUT=0 restores the plain jit.
        if (jax.default_backend() != "tpu"
                or os.environ.get("TTI_INPUT_LAYOUT") == "0"):
            jitted = jax.jit(step)
            return lambda variables, frames_u8: jitted(variables, frames_u8, warp_w)

        from jax.experimental.layout import Format, Layout

        jitted = jax.jit(step, in_shardings=(None, Format(Layout.AUTO), None))
        cache: dict[tuple, tuple] = {}

        def entry_for(variables, shape):
            e = cache.get(tuple(shape))
            if e is None:
                compiled = jitted.lower(
                    variables, jax.ShapeDtypeStruct(shape, jnp.uint8), warp_w
                ).compile()
                fmt = compiled.input_formats[0][1]
                cache[tuple(shape)] = e = (compiled, fmt)
            return e

        def run(variables, frames_u8):
            compiled, fmt = entry_for(variables, frames_u8.shape)
            if (isinstance(frames_u8, np.ndarray)
                    or frames_u8.format.layout.major_to_minor
                    != fmt.layout.major_to_minor):
                frames_u8 = jax.device_put(frames_u8, fmt)
            return compiled(variables, frames_u8, warp_w)

        # Callers that keep frames device-resident (bench, stream runners)
        # pre-place them once in the program's chosen layout.
        run.prepare_frames = lambda frames_np: jax.device_put(
            frames_np, entry_for(self.variables, frames_np.shape)[1]
        )
        return run

    # -- host API ------------------------------------------------------------

    def prepare_frames(self, frames_u8: np.ndarray) -> Array:
        """Place a frame batch on device in the layout the compiled step
        consumes directly (no in-graph relayout copy). Falls back to a plain
        transfer when the step has no layout preference (mesh/CPU paths)."""
        prep = getattr(self._step, "prepare_frames", None)
        return prep(frames_u8) if prep is not None else jnp.asarray(frames_u8)

    def process_batch(self, frames_bgr_u8: np.ndarray) -> PipelineOutputs:
        """frames (B, H, W, 3) uint8 BGR -> host results (blocking)."""
        return self.outputs_to_host(self._step(self.variables, frames_bgr_u8))

    @staticmethod
    def outputs_to_host(outs: dict) -> PipelineOutputs:
        """Materialize a device step result (process_batch_async) on host."""
        dets = outs["dets"]
        meas = outs.get("measurements")
        return PipelineOutputs(
            boxes_frame=np.asarray(outs["boxes_frame"]),
            scores=np.asarray(dets.scores),
            classes=np.asarray(dets.classes),
            valid=np.asarray(dets.valid),
            masks=np.asarray(outs["masks"]) if "masks" in outs else None,
            measurements=meas,
            stitches=outs.get("stitches"),
            envelope=np.asarray(outs["envelope"]) if "envelope" in outs else None,
            telemetry={k: np.asarray(v) for k, v in outs.get("telemetry", {}).items()},
        )

    def process_batch_async(self, frames_bgr_u8: np.ndarray):
        """Dispatch without blocking (device buffers returned; call
        jax.block_until_ready or np.asarray later). Lets the host pipeline the
        next batch's IO under device compute."""
        return self._step(self.variables, frames_bgr_u8)

    def profile_batch(self, frames_bgr_u8: np.ndarray, trace_dir: str) -> PipelineOutputs:
        """One step under jax.profiler tracing (SURVEY.md §5: the reference has
        no profiling; traces open in TensorBoard/XProf)."""
        with jax.profiler.trace(trace_dir):
            outs = self.process_batch(frames_bgr_u8)
        return outs


class DualPipeline:
    """Two models sharing one preprocessed batch (BASELINE.json config 4).

    The fused undistort/letterbox remap runs ONCE (the primary's preprocess);
    both models then run their FULL chain — forward, NMS, telemetry and (when
    that pipeline is calibrated) the complete measurement pass — on the same
    device buffer, so the config-4 number is a true end-to-end dual-model
    figure, apples-to-apples with config 3.
    """

    def __init__(self, primary: InspectionPipeline, secondary: InspectionPipeline) -> None:
        if primary.spec != secondary.spec:
            raise ValueError("dual pipelines must share letterbox geometry")
        if (primary.remap_xy is None) != (secondary.remap_xy is None):
            # The shared buffer is the PRIMARY's preprocess; a secondary built
            # for the other rectification state would measure in the wrong
            # coordinate space (double/missing undistortion).
            raise ValueError(
                "dual pipelines must agree on undistortion (both rectified or "
                "both raw) — the preprocessed batch is shared"
            )
        if primary.remap_xy is not None and not (
                primary.calibration is not None
                and secondary.calibration is not None
                and np.array_equal(primary.calibration.K, secondary.calibration.K)
                and np.array_equal(primary.calibration.dist,
                                   secondary.calibration.dist)):
            # Both rectified but with DIFFERENT lens models: the shared buffer
            # is warped with the PRIMARY's calibration, so the secondary's
            # measurement chain (its own cam geometry) would silently produce
            # wrong millimetres. Misconfiguration — refuse.
            raise ValueError(
                "dual rectified pipelines must share one calibration (K/dist) — "
                "the undistorted batch is produced with the primary's warp"
            )
        from tti.preprocess.warp2pass import TwoPassWarp

        if (isinstance(primary.remap_xy, TwoPassWarp)
                and isinstance(secondary.remap_xy, TwoPassWarp)
                and primary.remap_xy.s2d_out == secondary.remap_xy.s2d_out):
            # Same lens + geometry + output blocking -> identical warp
            # weights; the secondary's copy would be dead HBM (only the
            # primary's preprocess runs in the dual step). Rebuild its
            # standalone step so the old closure releases the duplicate
            # device tensors. When s2d_out differs (e.g. a raw explicit
            # model beside the transformed default), the secondary keeps its
            # own weights — its standalone step must emit the form its model
            # consumes.
            secondary.remap_xy = primary.remap_xy
            secondary._step = secondary._build_step()
        self.primary = primary
        self.secondary = secondary
        self._step = self._build()

    def _build(self):
        warp_w = self.primary.warp_weights
        # The shared buffer is the PRIMARY's preprocess output, which is
        # s2d-blocked iff primary.model.s2d_input (the default since the
        # s2d-emitting warp). A secondary whose model disagrees (e.g. an
        # explicitly-passed raw model) gets the exact permutation inverse —
        # both forms carry identical values.
        s2d_a = getattr(self.primary.model, "s2d_input", False)
        s2d_b = getattr(self.secondary.model, "s2d_input", False)

        def step(vars_a, vars_b, frames_u8, ww):
            x = self.primary.preprocess(frames_u8, ww)
            xb = x
            if s2d_a != s2d_b:
                from tti.model.yolo import depth_to_space2, space_to_depth2

                xb = depth_to_space2(x) if s2d_a else space_to_depth2(x)
            return (
                self.primary.postprocess_chain(vars_a, x),
                self.secondary.postprocess_chain(vars_b, xb),
            )

        # Mesh-sharded dual step (round-5, VERDICT r4 item 7): both models'
        # full chains run batch-sharded over the primary's mesh — same
        # frame_sharding as the single-model step (data + optional space
        # axes), state replicated. Equivalence vs the unsharded dual is
        # asserted by the driver dry run (__graft_entry__.dryrun_multichip).
        if self.primary.mesh is not None:
            if self.secondary.mesh is not self.primary.mesh:
                raise ValueError(
                    "dual pipelines must share one mesh (the preprocessed "
                    "batch is a single sharded buffer)")
            from jax.sharding import NamedSharding, PartitionSpec as P

            from tti.parallel.mesh import frame_sharding

            repl = NamedSharding(self.primary.mesh, P())
            jitted = jax.jit(
                step,
                in_shardings=(repl, repl,
                              frame_sharding(self.primary.mesh), repl),
            )
            return lambda va, vb, f: jitted(va, vb, f, warp_w)

        # Same auto-input-layout treatment as InspectionPipeline._build_step
        # (the dual program reads the identical 796 MB u8 batch).
        if (jax.default_backend() != "tpu"
                or os.environ.get("TTI_INPUT_LAYOUT") == "0"):
            jitted = jax.jit(step)
            return lambda va, vb, f: jitted(va, vb, f, warp_w)

        from jax.experimental.layout import Format, Layout

        jitted = jax.jit(step, in_shardings=(None, None, Format(Layout.AUTO), None))
        cache: dict[tuple, tuple] = {}

        def entry_for(va, vb, shape):
            e = cache.get(tuple(shape))
            if e is None:
                compiled = jitted.lower(
                    va, vb, jax.ShapeDtypeStruct(shape, jnp.uint8), warp_w
                ).compile()
                cache[tuple(shape)] = e = (compiled, compiled.input_formats[0][2])
            return e

        def run(va, vb, frames_u8):
            compiled, fmt = entry_for(va, vb, frames_u8.shape)
            if (isinstance(frames_u8, np.ndarray)
                    or frames_u8.format.layout.major_to_minor
                    != fmt.layout.major_to_minor):
                frames_u8 = jax.device_put(frames_u8, fmt)
            return compiled(va, vb, frames_u8, warp_w)

        run.prepare_frames = lambda frames_np: jax.device_put(
            frames_np,
            entry_for(self.primary.variables, self.secondary.variables,
                      frames_np.shape)[1],
        )
        return run

    def prepare_frames(self, frames_u8: np.ndarray) -> Array:
        """Place a frame batch in the DUAL program's chosen input layout —
        the single-pipeline program can pick a different one, in which case
        feeding its buffers here would pay an in-loop relayout copy."""
        prep = getattr(self._step, "prepare_frames", None)
        return prep(frames_u8) if prep is not None else jnp.asarray(frames_u8)

    def process_batch(self, frames_bgr_u8: np.ndarray) -> tuple[PipelineOutputs, PipelineOutputs]:
        outs_a, outs_b = self._step(
            self.primary.variables, self.secondary.variables, frames_bgr_u8
        )
        return (
            InspectionPipeline.outputs_to_host(outs_a),
            InspectionPipeline.outputs_to_host(outs_b),
        )

    def process_batch_async(self, frames_bgr_u8: np.ndarray):
        """Dispatch without blocking; materialize with
        InspectionPipeline.outputs_to_host per element."""
        return self._step(
            self.primary.variables, self.secondary.variables, frames_bgr_u8
        )
