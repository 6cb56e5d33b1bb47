"""tti command line: calibrate / run / check-model / capture / convert / bench.

The reference's operator workflows are scattered standalone scripts
(SURVEY.md §2 "Manual harnesses": Utils/check_model.py, Utils/auto_capture.py,
Utils/usb_camera.py, plus `python main.py` / `python calibration.py` entries);
here they are subcommands of one CLI:

  python -m tti.cli calibrate             (extrinsic ChArUco calibration)
  python -m tti.cli calibrate-intrinsics  (intrinsics from board views)
  python -m tti.cli run                   [--images DIR | --synthetic]
                                          [--cameras N] [--max-frames N]
  python -m tti.cli check-model --images DIR  (annotated detection dump)
  python -m tti.cli capture     --out DIR     (timed dataset capture)
  python -m tti.cli view                      (live camera view)
  python -m tti.cli tune-camera [--set exposure=3.5 ...]
  python -m tti.cli train       --images DIR  (in-framework training)
  python -m tti.cli eval        --images DIR  (box+mask mAP)
  python -m tti.cli convert     --pt model.pt --out model.ckpt
  python -m tti.cli bench                     (same harness as bench.py)
  python -m tti.cli export      --out a.npz   (frozen StableHLO deployment
                                               artifact + weights bundle)
"""

from __future__ import annotations

import argparse
import os
import sys

# Honor JAX_PLATFORMS before the first backend use. Some tethered deployments
# pin the TPU plugin via a site hook that ignores the env var (only jax.config
# switches work there) — translate it explicitly so `JAX_PLATFORMS=cpu tti
# eval` runs on CPU when the accelerator is absent or its relay is down.
if os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except RuntimeError:
        pass  # backends already initialized; env owner wins

from tti.core.config import load_config
from tti.core.logging import get_logger

log = get_logger("cli")


def _load_pipeline(cfg, frame_hw, calibration=None, return_masks=False):
    import dataclasses

    import jax.numpy as jnp

    from tti.model.convert import checkpoint_metadata, load_checkpoint
    from tti.model.yolo import create_model, init_variables
    from tti.parallel.runtime import InspectionPipeline

    have_weights = cfg.model.weights and os.path.exists(cfg.model.weights)
    if have_weights:
        # The checkpoint sidecar is authoritative about the architecture it
        # was trained with (variant / num_classes / mask_stride) — otherwise
        # pointing TTI_MODEL_WEIGHTS at the stride-2 deploy checkpoint without
        # also flipping TTI_MASK_STRIDE dies on a shape mismatch at load.
        meta = checkpoint_metadata(cfg.model.weights)
        arch = {k: meta[k]
                for k in ("variant", "num_classes", "mask_stride", "proto_head")
                if k in meta}
        drift = {k: (getattr(cfg.model, k), v) for k, v in arch.items()
                 if getattr(cfg.model, k) != v}
        if drift:
            log.info("adopting checkpoint architecture %s (config had %s)",
                     arch, {k: old for k, (old, _) in drift.items()})
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, **arch))
        # Auto boundary readout: soft-mask-trained checkpoints measure with
        # the sub-cell 0.5-crossing readout (MEASURE_REPORT.md A/B), binary
        # ones keep reference-exact semantics. TTI_SUBCELL_EDGE forces.
        measure = cfg.measure.with_subcell_from(meta)
        if measure is not cfg.measure:
            if measure.subcell_edge:
                log.info("soft-mask checkpoint: sub-cell boundary readout on "
                         "(TTI_SUBCELL_EDGE=0 forces binary)")
            cfg = dataclasses.replace(cfg, measure=measure)

    dtype = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32
    model = create_model(cfg.model.variant, nc=cfg.model.num_classes, dtype=dtype,
                         mask_stride=cfg.model.mask_stride,
                         proto_head=cfg.model.proto_head)
    variables = init_variables(model, image_size=cfg.model.image_size)
    if have_weights:
        variables = load_checkpoint(cfg.model.weights, variables)
        log.info("loaded weights from %s", cfg.model.weights)
    else:
        log.warning("weights %r not found — using random init", cfg.model.weights)
    return InspectionPipeline(
        model_cfg=cfg.model,
        variables=variables,
        frame_hw=frame_hw,
        calibration=calibration,
        measure_cfg=cfg.measure,
        roi=cfg.roi,
        return_masks=return_masks,
        model=model,
    )


def cmd_export(args) -> int:
    """Freeze the full inspection step (preprocess -> model -> NMS ->
    measurement) into a portable StableHLO artifact + weights bundle
    (tti.app.export). The tti analog of shipping a `.pt`, except the consumer
    needs only jax + the artifact — not the model/measurement code."""
    from tti.app.export import export_pipeline
    from tti.calib.io import CalibrationData

    cfg = load_config(validate=False)
    frame_hw = (cfg.camera.height, cfg.camera.width)
    calibration = None
    if os.path.exists(cfg.runtime.intrinsics_file) and os.path.exists(
            cfg.runtime.extrinsics_file):
        calibration = CalibrationData.load(cfg.runtime.intrinsics_file,
                                           cfg.runtime.extrinsics_file)
    else:
        log.warning("calibration files missing — exporting detection-only")
    pipeline = _load_pipeline(cfg, frame_hw, calibration)
    platforms = tuple(args.platforms.split(","))
    blob = export_pipeline(pipeline, batch=args.batch, platforms=platforms)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported batch={args.batch} frames={frame_hw} "
          f"platforms={','.join(platforms)} -> {args.out} ({len(blob)} bytes)")
    return 0


def cmd_calibrate(args) -> int:
    from tti.app.orchestrator import run_startup_calibration
    from tti.app.sources import OpenCVCameraSource

    cfg = load_config()
    source = OpenCVCameraSource(cfg.camera)
    ok = run_startup_calibration(cfg, source, solver=args.solver)
    source.release()
    print("RESULT:", "SUCCESS" if ok else "FAILED")
    return 0 if ok else 1


def cmd_calibrate_intrinsics(args) -> int:
    """Intrinsic calibration from live camera or image directory
    (replaces the reference's external calibration app download)."""
    from tti.app.sources import DirectorySource, OpenCVCameraSource, frames_iter
    from tti.calib.charuco import create_charuco_board
    from tti.calib.intrinsics import calibrate_intrinsics

    cfg = load_config(validate=False)
    if args.images:
        source = DirectorySource(args.images)
    else:
        source = OpenCVCameraSource(cfg.camera)
    board = create_charuco_board(cfg.board)
    try:
        result = calibrate_intrinsics(
            frames_iter(source), board=board,
            output_path=args.out, max_views=args.max_views,
        )
    finally:
        source.release()
    print(f"RESULT: rms={result.rms:.3f}px views={result.n_views} -> {args.out}")
    return 0


def cmd_run(args) -> int:
    """The main measurement loop (reference: python main.py)."""
    from tti.app.orchestrator import Orchestrator, run_startup_calibration
    from tti.app.sources import DirectorySource, OpenCVCameraSource, SyntheticSource
    from tti.calib.io import CalibrationData

    cfg = load_config(validate=not args.no_validate)

    if args.cameras and args.cameras > 1:
        return _run_multistream(args, cfg)

    if args.images:
        source = DirectorySource(args.images, loop=args.loop)
        frame_hw = _probe_hw(source)
    elif args.synthetic:
        # Unbounded source: the orchestrator's inference cadence skips frames
        # between measurements, so bounding the SOURCE at max_frames would end
        # the run after fewer than max_frames PROCESSED frames. The
        # orchestrator's own frame counter terminates the run.
        source = SyntheticSource(cfg.camera.height, cfg.camera.width)
        frame_hw = (cfg.camera.height, cfg.camera.width)
    else:
        source = OpenCVCameraSource(cfg.camera)
        frame_hw = (cfg.camera.height, cfg.camera.width)
        if not args.skip_calibration:
            if not run_startup_calibration(cfg, source):
                return 1

    calibration = None
    if os.path.exists(cfg.runtime.intrinsics_file) and os.path.exists(cfg.runtime.extrinsics_file):
        calibration = CalibrationData.load(cfg.runtime.intrinsics_file, cfg.runtime.extrinsics_file)
    else:
        log.warning("calibration files missing — running detection-only")

    pipeline = _load_pipeline(cfg, frame_hw, calibration)
    orch = Orchestrator(cfg, pipeline, source, show=getattr(args, "show", False))
    orch.init_services()
    orch.run(max_frames=args.max_frames,
             pipelined=getattr(args, "pipelined", False))
    return 0


def _run_multistream(args, cfg) -> int:
    """Multi-camera line (BASELINE.json config 5): N streams through one
    batched device pipeline, per-stream smoothing; metrics are logged (DB
    persistence stays single-stream — the reference schema has no stream id)."""
    import time

    from tti.app.results import measurement_to_dict
    from tti.app.sources import OpenCVCameraSource, SyntheticSource
    from tti.calib.io import CalibrationData
    from tti.parallel.streams import MultiStreamRunner

    n = args.cameras
    frame_hw = (cfg.camera.height, cfg.camera.width)
    if args.synthetic:
        sources = [SyntheticSource(*frame_hw, seed=i) for i in range(n)]
    else:
        sources = [OpenCVCameraSource(cfg.camera, index=f"/dev/video{i}") for i in range(n)]

    calibration = None
    if os.path.exists(cfg.runtime.intrinsics_file) and os.path.exists(cfg.runtime.extrinsics_file):
        calibration = CalibrationData.load(cfg.runtime.intrinsics_file, cfg.runtime.extrinsics_file)

    pipeline = _load_pipeline(cfg, frame_hw, calibration)
    runner = MultiStreamRunner(pipeline, sources, frame_hw)
    runner.start()
    batches = 0
    try:
        if not runner.wait_for_frames():
            log.error("streams produced no frames")
            return 1
        def report(outs, results) -> None:
            if results:
                for stream, meas in enumerate(results):
                    d = measurement_to_dict(meas)
                    log.info(
                        "stream %d: edge=%s width=%s n=%d", stream,
                        d["edge_distance_mm"], d["stitch_width_mm"], d["stitch_count"],
                    )
            else:
                # Detection-only (no calibration): report per-stream counts so
                # a bounded smoke run is not silent.
                for stream in range(len(sources)):
                    log.info(
                        "stream %d: %d detections", stream,
                        int(outs.valid[stream].sum()),
                    )

        # Count DISPATCHES against --max-frames (each step_pipelined() puts one
        # batch in flight; the final one is reported by flush()), so exactly
        # max_frames batches are processed — not max_frames+1.
        dispatched = 0
        while args.max_frames is None or dispatched < args.max_frames:
            # Pipelined: ring snapshot + H2D of THIS batch overlap the device
            # compute of the previous one (tti/parallel/streams.py).
            stepped = runner.step_pipelined()
            dispatched += 1
            if stepped is not None:
                report(*stepped)
                batches += 1
            time.sleep(cfg.runtime.inference_interval_s)
    except KeyboardInterrupt:
        pass
    finally:
        # Drain the in-flight pipelined batch; its measurements advanced the
        # smoothing state, so report them too rather than dropping them.
        drained = runner.flush()
        if drained is not None:
            report(*drained)
            batches += 1
        runner.stop()
        log.info("multistream shutdown: %d batches x %d streams", batches, len(sources))
    return 0


def _probe_hw(source):
    ok, frame = source.read()
    if not ok:
        raise RuntimeError("source produced no frames")
    source._idx = 0  # rewind DirectorySource
    return frame.shape[:2]


def cmd_check_model(args) -> int:
    """Headless segmentation sanity check with annotated dumps
    (reference: Utils/check_model.py)."""
    import cv2

    from tti.app.annotate import annotate_frame
    from tti.app.sources import DirectorySource, SyntheticSource

    cfg = load_config(validate=False)
    if args.images:
        source = DirectorySource(args.images)
        frame_hw = _probe_hw(source)
    else:
        source = SyntheticSource(cfg.camera.height, cfg.camera.width, count=args.max_frames)
        frame_hw = (cfg.camera.height, cfg.camera.width)
    pipeline = _load_pipeline(cfg, frame_hw, return_masks=True)

    from tti.app.annotate import overlay_masks

    os.makedirs(args.out, exist_ok=True)
    count = 0
    while count < args.max_frames:
        ok, frame = source.read()
        if not ok:
            break
        outs = pipeline.process_batch(frame[None])
        n = int(outs.valid[0].sum())
        annotated = frame
        if outs.masks is not None:
            annotated = overlay_masks(
                annotated, outs.masks[0], outs.classes[0], outs.valid[0], pipeline.spec
            )
        annotated = annotate_frame(
            annotated, outs.boxes_frame[0], outs.classes[0], outs.valid[0],
            cfg.model.stitch_class_id, cfg.model.fabric_class_id,
            hud_lines=[f"detections: {n}"],
        )
        path = os.path.join(args.out, f"check_{count:05d}.jpg")
        cv2.imwrite(path, annotated)
        print(f"{path}: {n} detections")
        count += 1
    return 0


def cmd_capture(args) -> int:
    """Timed dataset capture (reference: Utils/auto_capture.py)."""
    import time

    import cv2

    from tti.app.sources import OpenCVCameraSource

    cfg = load_config(validate=False)
    source = OpenCVCameraSource(cfg.camera)
    os.makedirs(args.out, exist_ok=True)
    count = 0
    try:
        while count < args.max_frames:
            ok, frame = source.read()
            if not ok:
                continue
            path = os.path.join(args.out, f"capture_{count:05d}.jpg")
            cv2.imwrite(path, frame)
            print("saved", path)
            count += 1
            time.sleep(args.interval)
    finally:
        source.release()
    return 0


def cmd_convert(args) -> int:
    """Convert a PyTorch checkpoint to a tti msgpack checkpoint."""
    import torch

    from tti.model.convert import convert_torch_state_dict, save_checkpoint

    obj = torch.load(args.pt, map_location="cpu", weights_only=False)
    state_dict = obj
    if hasattr(obj, "state_dict"):
        state_dict = obj.state_dict()
    elif isinstance(obj, dict):
        for key in ("model", "ema", "state_dict"):
            if key in obj:
                inner = obj[key]
                state_dict = inner.state_dict() if hasattr(inner, "state_dict") else inner
                break
    variables = convert_torch_state_dict(state_dict)
    save_checkpoint(variables, args.out, metadata={"source": args.pt})
    print("wrote", args.out)
    return 0


def cmd_export_weights(args) -> int:
    """Export a deploy msgpack (+ complete JSON sidecar) from a train-state
    checkpoint. Deploys the EMA tree when present (the Ultralytics-recipe
    "best" model). The sidecar is the load-time architecture contract
    (_load_pipeline adopts variant/nc/mask_stride/proto_head from it) AND the
    measurement-semantics contract: `soft_masks` drives the automatic
    sub-cell boundary readout (MeasureConfig.with_subcell_from)."""
    from tti.model.convert import load_checkpoint, save_checkpoint
    from tti.model.yolo import create_model, init_variables
    from tti.train.checkpoint import latest_checkpoint

    src = args.train_dir
    if os.path.isdir(src):
        newest = latest_checkpoint(src)
        if newest is not None:  # a run dir of step_* checkpoints
            src = newest
    model = create_model(args.variant, nc=args.num_classes,
                         mask_stride=args.mask_stride,
                         proto_head=args.proto_head)
    template = init_variables(model, image_size=64)
    variables = load_checkpoint(src, template)
    from tti.train.data import soft_class_ids

    cfg0 = load_config(validate=False)
    soft_ids = soft_class_ids(
        args.soft_masks, num_classes=args.num_classes,
        stitch_class_id=cfg0.model.stitch_class_id,
        fabric_class_id=cfg0.model.fabric_class_id)
    meta = {
        "source": src,
        "variant": args.variant,
        "num_classes": args.num_classes,
        "imgsz_trained": args.imgsz,
        "mask_stride": args.mask_stride,
        "proto_head": args.proto_head,
        # Legacy flag = ALL classes soft (r4 sidecars); per-class runs write
        # the split keys, which with_subcell_from prefers. A legacy reader
        # sees a stitch-only checkpoint as binary — conservative: the
        # envelope readout stays reference-exact either way.
        "soft_masks": bool(soft_ids) and len(soft_ids) == args.num_classes,
        "soft_stitch": cfg0.model.stitch_class_id in soft_ids,
        "soft_fabric": cfg0.model.fabric_class_id in soft_ids,
        "weights": "EMA (deployed tree)",
        "recipe": args.recipe,
    }
    save_checkpoint(variables, args.out, metadata=meta)
    print("deploy checkpoint:", args.out)
    print("sidecar:", args.out + ".json")
    return 0


def cmd_validate_reference(args) -> int:
    """One-shot validation of the reference's real trained weights, for the
    day ``best_Model.pt`` / ``single_needle_model.pt`` (reference:
    config.py:67, measurement.py:145) become available: convert -> strict
    structural load report -> full predict-chain parity vs the torch oracle
    at the deployment geometry -> mm measure-report (and optional mAP eval)
    with the converted checkpoint. Artifacts land in --out-dir."""
    import json

    import numpy as np
    import torch

    from tti.model.convert import (
        convert_torch_state_dict, save_checkpoint, verify_tree_shapes,
    )
    from tti.model.yolo import create_model, init_variables, model_channels

    os.makedirs(args.out_dir, exist_ok=True)
    obj = torch.load(args.pt, map_location="cpu", weights_only=False)
    state_dict = obj
    if hasattr(obj, "state_dict"):
        state_dict = obj.state_dict()
    elif isinstance(obj, dict):
        for key in ("model", "ema", "state_dict"):
            if key in obj:
                inner = obj[key]
                state_dict = inner.state_dict() if hasattr(inner, "state_dict") else inner
                break
    variables = convert_torch_state_dict(state_dict)

    # Infer the architecture from the converted tree (the .pt carries no
    # sidecar): width scale from the m1 conv's output channels, class count
    # from the class-branch exit bias. Ultralytics exports are always /4
    # proto stride.
    try:
        c128 = int(np.shape(variables["params"]["m1"]["conv"]["kernel"])[-1])
        nc = int(np.shape(variables["params"]["m22"]["cv3_0_2"]["bias"])[0])
    except KeyError as e:
        print(f"FAIL: converted tree is missing {e} — not an Ultralytics "
              f"YOLOv8-seg state dict?")
        return 1
    variant = None
    for cand in ("n", "s", "m", "l", "x"):
        if model_channels(cand)["c128"] == c128:
            variant = cand
            break
    if variant is None:
        print(f"FAIL: no YOLOv8 variant has width {c128} at m1")
        return 1
    print(f"architecture: yolov8{variant}-seg, {nc} classes")

    # Strict structural verification BOTH ways (missing + unexpected + shape).
    template = init_variables(create_model(variant, nc=nc), image_size=64)
    problems = [
        p
        for coll in ("params", "batch_stats")
        for p in verify_tree_shapes(
            variables.get(coll, {}), template[coll], path=coll
        )
    ]
    report = {
        "source_pt": args.pt,
        "torch_keys": len(state_dict),
        "variant": variant,
        "num_classes": nc,
        "strict_load_problems": problems,
    }
    with open(os.path.join(args.out_dir, "load_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    if problems:
        print(f"FAIL: {len(problems)} structural problems "
              f"(see {args.out_dir}/load_report.json):")
        for p in problems[:10]:
            print("  ", p)
        return 1
    print(f"strict load OK: {len(state_dict)} torch keys -> tti tree, "
          f"0 problems")

    ckpt = os.path.join(args.out_dir, args.name)
    save_checkpoint(
        variables, ckpt,
        metadata={"source": args.pt, "variant": variant, "num_classes": nc,
                  "imgsz_trained": 960, "mask_stride": 4,
                  "recipe": "converted from reference .pt "
                            "(tti validate-reference)"},
    )
    print("checkpoint:", ckpt)

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if root not in sys.path:
        sys.path.insert(0, root)

    # Predict-chain parity vs the torch oracle at the deployment geometry
    # (1280x960 frames, imgsz 960 — reference config.py:59-60,
    # measurement.py:210). parity_report exits nonzero below the gates.
    if not args.skip_parity:
        from tools.parity_report import main as parity_main

        parity_out = os.path.join(args.out_dir, "PARITY_REFERENCE.md")
        rc = parity_main(["--weights", ckpt, "--frames", str(args.frames),
                          "--imgsz", str(args.imgsz),
                          "--frame-h", str(args.frame_h),
                          "--frame-w", str(args.frame_w),
                          "--out", parity_out]) or 0
        print(f"parity report: {parity_out}")
        if rc:
            return rc

    # mm accuracy through the production chain (analytic plane-truth scenes).
    if not args.skip_measure:
        from tools.measure_report import main as measure_main

        measure_out = os.path.join(args.out_dir, "MEASURE_REFERENCE.md")
        measure_main(["--weights", ckpt, "--scenes", str(args.scenes),
                      "--imgsz", str(args.imgsz), "--out", measure_out])
        print(f"measure report: {measure_out}")

    # Optional mAP eval on a labeled dataset of real frames.
    if args.images:
        return main(["eval", "--images", args.images, "--weights", ckpt,
                     "--imgsz", str(args.imgsz)])
    return 0


def _show_loop(source, window: str, on_no_frame: str = "break") -> int:
    """Shared read/imshow/'q' loop for the live-view tools. on_no_frame:
    'break' exits on the first failed read (reference Utils/usb_camera.py
    semantics); 'skip' keeps polling (tuning tools)."""
    import cv2

    try:
        while True:
            ok, frame = source.read()
            if ok:
                cv2.imshow(window, frame)
            elif on_no_frame == "break":
                log.error("no frame from camera")
                return 1
            if cv2.waitKey(1) & 0xFF == ord("q"):
                return 0
    except KeyboardInterrupt:
        return 0
    finally:
        source.release()
        cv2.destroyAllWindows()


def cmd_view(args) -> int:
    """Live camera view (reference: Utils/usb_camera.py). 'q' quits."""
    from tti.app.sources import OpenCVCameraSource

    cfg = load_config(validate=False)
    return _show_loop(OpenCVCameraSource(cfg.camera), "tti view (q to quit)")


def cmd_eval(args) -> int:
    """Evaluate weights on a YOLO-format dataset: box mAP + mask mAP at BOTH
    proto resolution (input/4 — cheap relative tracking) and FULL resolution
    (the COCO-comparable protocol: predictions through the Ultralytics
    process_mask(upsample=True) chain, GT rasterized at imgsz)."""
    import dataclasses
    import time

    import numpy as np

    from tti.app.predict import Predictor
    from tti.model.convert import load_checkpoint
    from tti.model.yolo import create_model, init_variables
    from tti.train.data import discover_dataset, rasterize_polygon, sample_to_targets
    from tti.train.eval import ImageEval, evaluate

    if args.imgsz % 32:
        # The rect letterbox rounds a non-stride target UP (960->960, 100->128)
        # while GT rasterizes at args.imgsz — the mask grids would mismatch.
        raise SystemExit(f"--imgsz must be a multiple of 32, got {args.imgsz}")
    cfg = load_config(validate=False)
    model_cfg = dataclasses.replace(cfg.model, image_size=args.imgsz,
                                    # eval images are square-resized (no pad),
                                    # so square/rect letterbox coincide at
                                    # stride-multiple imgsz
                                    mask_stride=args.mask_stride,
                                    proto_head=args.proto_head,
                                    **({"weights": args.weights} if args.weights else {}))
    if model_cfg.weights and os.path.exists(model_cfg.weights):
        # The sidecar is authoritative about the trained architecture (same
        # contract as _load_pipeline) — evaluating a subpixel-head checkpoint
        # without --proto-head subpixel would die on a shape mismatch.
        from tti.model.convert import checkpoint_metadata

        meta = checkpoint_metadata(model_cfg.weights)
        arch = {k: meta[k]
                for k in ("variant", "num_classes", "mask_stride", "proto_head")
                if k in meta}
        if arch:
            model_cfg = dataclasses.replace(model_cfg, **arch)
    cfg = cfg.replace(model=model_cfg)
    samples = discover_dataset(args.images)

    import jax.numpy as jnp

    dtype = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32
    model = create_model(cfg.model.variant, nc=cfg.model.num_classes, dtype=dtype,
                         mask_stride=cfg.model.mask_stride,
                         proto_head=cfg.model.proto_head)
    variables = init_variables(model, image_size=64)
    if cfg.model.weights and os.path.exists(cfg.model.weights):
        variables = load_checkpoint(cfg.model.weights, variables)
        log.info("loaded weights from %s", cfg.model.weights)
    else:
        log.warning("weights %r not found — using random init", cfg.model.weights)
    quant = os.environ.get("TTI_QUANT", "")
    if quant in ("int8", "int8s"):
        # Same gate as the production pipeline: measure the W8A8 mAP delta
        # with the identical quantization the deployment would run.
        from tti.model.convert import fold_batchnorm
        from tti.model.quantize import quantize_weights
        from tti.model.yolo import YOLOv8Seg

        act_scales = None
        if quant == "int8s":
            import json

            scales_path = os.environ.get("TTI_QUANT_SCALES", "")
            if not scales_path or not os.path.exists(scales_path):
                raise SystemExit(
                    "TTI_QUANT=int8s needs TTI_QUANT_SCALES=<json from "
                    "tools/calibrate_int8.py>")
            with open(scales_path) as f:
                act_scales = dict(json.load(f)["scales"])
        variables = quantize_weights(fold_batchnorm(variables),
                                     act_scales=act_scales)
        model = YOLOv8Seg(variant=cfg.model.variant, nc=cfg.model.num_classes,
                          dtype=dtype, folded_bn=True, qmode=quant,
                          mask_stride=cfg.model.mask_stride,
                          proto_head=cfg.model.proto_head)
        log.info("evaluating with TTI_QUANT=%s (W8A8 PTQ)", quant)
    predictor = Predictor(cfg.model, variables, (args.imgsz, args.imgsz),
                          mask_topk=64, model=model, proto_masks=True)

    eval_proto: list[ImageEval] = []
    eval_full: list[ImageEval] = []
    t_eval0 = time.time()
    # Chunked predicts: one device dispatch (and one host<->device transfer)
    # per CHUNK of images, not per image — the per-call relay latency dominated
    # the serial loop on tethered deployments.
    chunk = 8
    for c0 in range(0, len(samples), chunk):
        if c0:
            print(f"eval {c0}/{len(samples)} "
                  f"({time.time() - t_eval0:.0f}s)", flush=True)
        batch_samples = samples[c0:c0 + chunk]
        prepped = [sample_to_targets(s, args.imgsz, max_gt=64,
                                     mask_stride=cfg.model.mask_stride)
                   for s in batch_samples]
        bgr = np.stack([(img[..., ::-1] * 255).astype(np.uint8)
                        for img, _ in prepped])
        if len(bgr) < chunk and len(samples) > chunk:  # keep one compiled shape
            bgr = np.concatenate(
                [bgr, np.zeros((chunk - len(bgr), *bgr.shape[1:]), bgr.dtype)])
        res = predictor(bgr)
        for b, (sample, (img, t)) in enumerate(zip(batch_samples, prepped)):
            valid = res.valid[b]
            m = min(int(valid.sum()), res.masks_input.shape[1])
            common = dict(
                pred_boxes=res.boxes[b][valid][:m],
                pred_scores=res.scores[b][valid][:m],
                pred_classes=res.classes[b][valid][:m],
                gt_boxes=t["boxes"][t["valid"]],
                gt_classes=t["classes"][t["valid"]],
            )
            eval_proto.append(ImageEval(
                **common,
                pred_masks=res.masks_proto[b][:m],
                gt_masks=np.asarray(t["masks"][t["valid"]]),
            ))
            # Index the RAW polygon list through src_index: scene_to_targets
            # drops degenerate slivers, so positional slicing would rasterize
            # the wrong instance for every GT after a dropped one.
            polys = [sample.polygons[i] for i in t["src_index"][t["valid"]]]
            gt_full = (np.stack([rasterize_polygon(p, (args.imgsz, args.imgsz))
                                 for p in polys])
                       if polys else np.zeros((0, args.imgsz, args.imgsz),
                                              np.float32))
            eval_full.append(ImageEval(
                **common,
                pred_masks=res.masks_input[b][:m],
                gt_masks=gt_full,
            ))

    box_metrics = evaluate(eval_full, cfg.model.num_classes)
    print("box:", {k: round(v, 4) for k, v in box_metrics.items()})
    proto_metrics = evaluate(eval_proto, cfg.model.num_classes, use_masks=True)
    print("mask(proto-res):", {k: round(v, 4) for k, v in proto_metrics.items()})
    full_metrics = evaluate(eval_full, cfg.model.num_classes, use_masks=True)
    print("mask(full-res):", {k: round(v, 4) for k, v in full_metrics.items()})
    return 0


def cmd_tune_camera(args) -> int:
    """Interactive exposure/brightness/contrast tuning
    (reference: Testing/test1.py trackbar tool). Headless mode (--set) applies
    values without a GUI."""
    import cv2

    from tti.app.sources import OpenCVCameraSource

    cfg = load_config(validate=False)
    source = OpenCVCameraSource(cfg.camera)
    cap = source.cap
    props = {
        "exposure": cv2.CAP_PROP_EXPOSURE,
        "brightness": cv2.CAP_PROP_BRIGHTNESS,
        "contrast": cv2.CAP_PROP_CONTRAST,
        "gain": cv2.CAP_PROP_GAIN,
    }
    try:
        if args.set:
            for assignment in args.set:
                key, _, value = assignment.partition("=")
                if key not in props:
                    print(f"unknown property {key!r}; choose from {sorted(props)}")
                    return 1
                cap.set(props[key], float(value))
                print(f"{key} = {cap.get(props[key])}")
            return 0
        window = "tti tune-camera (q to quit)"
        cv2.namedWindow(window)
        for name, prop in props.items():
            current = int(max(0, cap.get(prop)))
            cv2.createTrackbar(name, window, current, 255,
                               lambda v, p=prop: cap.set(p, float(v)))
        # Keep polling through dropped frames: exposure changes commonly stall
        # a read or two mid-adjustment.
        return _show_loop(source, window, on_no_frame="skip")
    finally:
        # _show_loop releases on its paths; this covers the --set early return
        # (double release is harmless on cv2 captures).
        source.release()


def cmd_train(args) -> int:
    """Train a stitch/fabric segmentation model on a YOLO-format dataset
    (data-parallel over all local devices)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tti.model.yolo import create_model, init_variables
    from tti.parallel.mesh import create_mesh, replicate, shard_batch
    from tti.train.checkpoint import save_train_state
    from tti.train.data import batches, discover_dataset
    from tti.train.step import create_train_state, make_train_step

    if args.resume and args.host_aug:
        print("--resume requires the device-aug path (the host batch "
              "iterator has no step-indexed stream to re-enter)")
        return 1
    samples = discover_dataset(args.images)
    # Mixed-precision training (round-5): bf16 trunk/head compute with f32
    # params and f32 loss math (make_train_step upcasts the head exits). The
    # pre-r5 trainer silently ran f32 compute — ~2x the activation HBM and
    # half the MXU rate for zero accuracy benefit (control retrain in
    # TRAINING.md round-5).
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = create_model(args.variant, nc=args.num_classes,
                         mask_stride=args.mask_stride,
                         proto_head=args.proto_head, dtype=dtype)
    # Stage logs bracket every potentially-minutes operation (remote-compile
    # transports): a stalled run's log then names the stage, not a mystery.
    log.info("initializing %s at %dpx (%s) on %s ...", args.variant,
             args.imgsz, args.dtype, jax.devices()[0].platform)
    variables = init_variables(model, image_size=args.imgsz)
    log.info("model initialized")
    steps_per_epoch = max(len(samples) // args.batch_size, 1)
    total_steps = steps_per_epoch * args.epochs
    state, tx = create_train_state(model, variables, learning_rate=args.lr,
                                   total_steps=total_steps)
    # Per-class seg-loss gains (stitch = the product's measured class).
    seg_class_gains = None
    if args.stitch_seg_gain != 1.0:
        cfg0 = load_config(validate=False)
        seg_class_gains = [1.0] * args.num_classes
        seg_class_gains[cfg0.model.stitch_class_id] = args.stitch_seg_gain
    start = 0
    if args.resume:
        # Restore the full TrainState (params, EMA, optimizer, step) from the
        # newest checkpoint in --out and continue the SAME run: the device-aug
        # data stream is a pure function of the step index (fold_in(key, seen)),
        # so a resumed run replays the exact schedule an uninterrupted run
        # would have seen. (SURVEY.md §5 checkpoint/resume row.)
        from tti.train.checkpoint import latest_checkpoint, restore_train_state

        ckpt = latest_checkpoint(args.out)
        if ckpt is None:
            print(f"--resume: no checkpoint under {args.out}; starting fresh")
        else:
            state = restore_train_state(ckpt, state)
            start = int(np.asarray(state.step))
            print(f"resumed {ckpt} at step {start}/{total_steps}", flush=True)
    mesh = create_mesh() if jax.device_count() > 1 else None
    step = make_train_step(model, tx, (args.imgsz, args.imgsz), mesh=mesh,
                           seg_class_gains=seg_class_gains)
    if mesh is not None:
        state = replicate(mesh, state)

    seen = 0
    if not args.host_aug:
        # Device-side augmentation (tti/train/augment.py): the dataset lives
        # in HBM; mosaic/affine/HSV/flip run as one jitted program per step.
        # Per-step host work is an RNG fold + dispatch — essential on small
        # deployment hosts, where the cv2 recipe costs seconds per sample.
        from tti.train.augment import build_device_dataset, make_augment_fn

        log.info("rasterizing %d samples to the device dataset ...", len(samples))
        data = build_device_dataset(samples, args.imgsz, args.max_gt,
                                    mask_stride=args.mask_stride,
                                    soft_masks=args.soft_masks)
        data = replicate(mesh, data) if mesh is not None else jax.device_put(data)
        jax.block_until_ready(data.images)
        log.info("device dataset resident (%.0f MB); compiling the train "
                 "step (first step can take minutes on remote-compile "
                 "transports) ...", data.images.nbytes / 1e6)
        # The augment image chain follows the training compute dtype (bf16
        # halves its HBM bytes; sub-LSB pixel effect — see _image_dtype).
        augment = make_augment_fn(args.batch_size, args.max_gt, mesh=mesh,
                                  image_dtype=dtype)
        key = jax.random.key(0)
        for seen in range(start + 1, total_steps + 1):
            x, targets = augment(data, jax.random.fold_in(key, seen))
            state, metrics = step(state, x, targets)
            if seen % args.log_every == 0:
                vals = {k: float(np.asarray(v)) for k, v in metrics.items()}
                print(f"step {seen}/{total_steps}: "
                      + " ".join(f"{k}={v:.4f}" for k, v in vals.items()),
                      flush=True)
            if args.checkpoint_every and seen % args.checkpoint_every == 0:
                save_train_state(state, args.out, step=seen)
    else:
        for imgs, targets in batches(samples, args.batch_size, args.imgsz,
                                     max_gt=args.max_gt, epochs=args.epochs,
                                     mask_stride=args.mask_stride,
                                     soft_masks=args.soft_masks):
            x = jnp.asarray(imgs)
            if mesh is not None:
                x = shard_batch(mesh, x)
                targets = shard_batch(mesh, targets)
            state, metrics = step(state, x, targets)
            seen += 1
            if seen % args.log_every == 0:
                vals = {k: float(np.asarray(v)) for k, v in metrics.items()}
                print(f"step {seen}: "
                      + " ".join(f"{k}={v:.4f}" for k, v in vals.items()),
                      flush=True)
            if args.checkpoint_every and seen % args.checkpoint_every == 0:
                save_train_state(state, args.out, step=seen)
    path = save_train_state(state, args.out, step=seen)
    print("final checkpoint:", path)
    return 0


def cmd_bench(args) -> int:
    import bench

    bench.main()
    return 0


def cmd_tune_device(args) -> int:
    """Sweep the env-gated perf variants on THIS device/geometry and write
    the winning configuration as .env lines (tools/tune_device.py)."""
    # tools/ is a namespace package at the repo root (same resolution as
    # cmd_bench's `import bench`).
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if root not in sys.path:
        sys.path.insert(0, root)
    from tools.tune_device import main as tune_main

    argv = ["--batches", args.batches, "--imgsz", str(args.imgsz),
            "--frame-h", str(args.frame_h), "--frame-w", str(args.frame_w),
            "--variant", args.variant, "--dtype", args.dtype,
            "--iters", str(args.iters), "--out", args.out,
            "--mask-stride", str(args.mask_stride),
            "--proto-head", args.proto_head]
    if args.trials:
        argv += ["--trials", args.trials]
    if args.allow_approx:
        argv.append("--allow-approx")
    if args.subcell:
        argv.append("--subcell")
    if args.int8_scales:
        argv += ["--int8-scales", args.int8_scales]
    tune_main(argv)
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="tti")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("calibrate", help="run extrinsic ChArUco calibration")
    p.add_argument("--solver", default="tti", choices=["tti", "cv2"])
    p.set_defaults(func=cmd_calibrate)

    p = sub.add_parser("calibrate-intrinsics",
                       help="intrinsic camera calibration from board views")
    p.add_argument("--images", help="calibrate from an image directory")
    p.add_argument("--out", default="camera_calibration.json")
    p.add_argument("--max-views", type=int, default=25)
    p.set_defaults(func=cmd_calibrate_intrinsics)

    p = sub.add_parser("run", help="measurement loop (main.py equivalent)")
    p.add_argument("--images", help="replay image directory instead of camera")
    p.add_argument("--synthetic", action="store_true", help="synthetic frames")
    p.add_argument("--loop", action="store_true")
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--skip-calibration", action="store_true")
    p.add_argument("--no-validate", action="store_true")
    p.add_argument("--show", action="store_true",
                   help="live annotated display, 'q' quits (reference main.py:296-329)")
    p.add_argument("--cameras", type=int, default=1,
                   help="multi-camera line: N streams through one device pipeline")
    p.add_argument("--pipelined", action="store_true",
                   help="double-buffer the single-camera loop (results lag one "
                        "tick; saturates the device at inference-interval 0)")
    p.set_defaults(func=cmd_run)

    p = sub.add_parser("check-model", help="annotated detection dump")
    p.add_argument("--images")
    p.add_argument("--out", default="check_frames")
    p.add_argument("--max-frames", type=int, default=20)
    p.set_defaults(func=cmd_check_model)

    p = sub.add_parser("capture", help="timed dataset capture")
    p.add_argument("--out", default="captures")
    p.add_argument("--interval", type=float, default=2.0)
    p.add_argument("--max-frames", type=int, default=1000)
    p.set_defaults(func=cmd_capture)

    p = sub.add_parser("convert", help="convert .pt weights to tti checkpoint")
    p.add_argument("--pt", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(func=cmd_convert)

    p = sub.add_parser("export-weights",
                       help="export a deploy msgpack + sidecar from a "
                            "train-state checkpoint (EMA tree)")
    p.add_argument("--train-dir", required=True,
                   help="orbax run dir (newest step_* picked), a single "
                        "step_* checkpoint, or a msgpack file")
    p.add_argument("--out", required=True, help="output .msgpack path")
    p.add_argument("--variant", default="n")
    p.add_argument("--num-classes", type=int, default=2)
    p.add_argument("--imgsz", type=int, default=960)
    p.add_argument("--mask-stride", type=int, default=4, choices=[2, 4])
    p.add_argument("--proto-head", default="deconv",
                   choices=["deconv", "subpixel"])
    p.add_argument("--soft-masks", nargs="?", const="all", default=None,
                   help="record which classes trained with area-occupancy "
                        "targets (all | stitch | fabric | comma ids; bare "
                        "flag = all) — drives the per-class sub-cell "
                        "boundary readout at load")
    p.add_argument("--recipe", default="",
                   help="free-text provenance line for the sidecar")
    p.set_defaults(func=cmd_export_weights)

    p = sub.add_parser("train", help="train a segmentation model (YOLO-format data)")
    p.add_argument("--images", required=True, help="dataset images directory")
    p.add_argument("--out", default="checkpoints")
    p.add_argument("--variant", default="n")
    p.add_argument("--num-classes", type=int, default=2)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--max-gt", type=int, default=32)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--checkpoint-every", type=int, default=500)
    p.add_argument("--resume", action="store_true",
                   help="continue from the newest checkpoint in --out "
                        "(device-aug path; replays the step-indexed stream)")
    p.add_argument("--mask-stride", type=int, default=4, choices=[2, 4],
                   help="proto grid = imgsz/mask_stride; 2 = hi-res proto "
                        "head (tti extension, lifts the small-object mask "
                        "resolution ceiling — see MASK_CEILING.md)")
    p.add_argument("--proto-head", default="deconv",
                   choices=["deconv", "subpixel"],
                   help="mask_stride=2 second stage: learned deconv (round-3 "
                        "head) or sub-pixel conv + depth-to-space (~20x "
                        "cheaper at inference; tti.model.layers.Proto)")
    p.add_argument("--stitch-seg-gain", type=float, default=1.0,
                   help="extra seg-loss weight on stitch-class positives "
                        "(>1 prioritizes the small-object stitch masks the "
                        "product measures; fabric keeps weight 1)")
    p.add_argument("--soft-masks", nargs="?", const="all", default=None,
                   help="area-occupancy mask targets (fractional boundary "
                        "cells) instead of binary — lifts the deployed-chain "
                        "mask ceiling on sub-cell objects (MASK_CEILING.md). "
                        "Takes a class spec (all | stitch | fabric | comma "
                        "ids; bare flag = all): '--soft-masks stitch' keeps "
                        "fabric binary so the envelope keeps reference-exact "
                        "integer semantics (round-5 edge-bias recovery)")
    p.add_argument("--host-aug", action="store_true",
                   help="cv2 host-side augmentation instead of the default "
                        "device-side (HBM-resident) pipeline")
    p.add_argument("--dtype", default="bf16", choices=["f32", "bf16"],
                   help="trunk/head compute dtype (params + loss math stay "
                        "f32). bf16 is the TPU-native default — the MXU's "
                        "native rate and half the activation HBM; f32 "
                        "reproduces the pre-round-5 recipe bit-exactly")
    p.set_defaults(func=cmd_train)

    p = sub.add_parser(
        "validate-reference",
        help="one-shot validation of the reference's trained .pt: convert "
             "-> strict load report -> torch-oracle parity -> measure "
             "report (run this the day best_Model.pt arrives)")
    p.add_argument("--pt", required=True, help="path to the reference .pt")
    p.add_argument("--out-dir", default="validation")
    p.add_argument("--name", default="reference_model.msgpack",
                   help="converted checkpoint filename inside --out-dir")
    p.add_argument("--frames", type=int, default=8,
                   help="parity frames at the deployment geometry")
    p.add_argument("--scenes", type=int, default=64,
                   help="analytic scenes for the mm measure report")
    p.add_argument("--imgsz", type=int, default=960,
                   help="model input size (960 = deployment geometry, "
                        "reference measurement.py:210)")
    p.add_argument("--frame-h", type=int, default=960)
    p.add_argument("--frame-w", type=int, default=1280)
    p.add_argument("--images", default="",
                   help="optional labeled real-frame dataset for an mAP eval")
    p.add_argument("--skip-parity", action="store_true")
    p.add_argument("--skip-measure", action="store_true")
    p.set_defaults(func=cmd_validate_reference)

    p = sub.add_parser("view", help="live camera view")
    p.set_defaults(func=cmd_view)

    p = sub.add_parser("eval", help="box+mask mAP on a YOLO-format dataset")
    p.add_argument("--images", required=True)
    p.add_argument("--weights")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--mask-stride", type=int, default=4, choices=[2, 4])
    p.add_argument("--proto-head", default="deconv",
                   choices=["deconv", "subpixel"])
    p.set_defaults(func=cmd_eval)

    p = sub.add_parser("tune-camera", help="exposure/brightness/contrast tuning")
    p.add_argument("--set", nargs="*", metavar="PROP=VALUE",
                   help="headless: apply values and exit (e.g. exposure=3.5)")
    p.set_defaults(func=cmd_tune_camera)

    p = sub.add_parser("bench", help="run the throughput benchmark")
    p.set_defaults(func=cmd_bench)

    p = sub.add_parser("tune-device", help="auto-tune the env-gated perf "
                       "variants on this device; writes winning .env lines")
    p.add_argument("--batches", default="1,128")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--frame-h", type=int, default=1080)
    p.add_argument("--frame-w", type=int, default=1920)
    p.add_argument("--variant", default="n")
    p.add_argument("--mask-stride", type=int, default=4, choices=[2, 4],
                   help="proto-head stride (2 = the hi-res deploy arch)")
    p.add_argument("--proto-head", default="deconv",
                   choices=["deconv", "subpixel"])
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--trials", default="", help="comma list (default: all)")
    p.add_argument("--allow-approx", action="store_true",
                   help="let approximate/quantized variants win")
    p.add_argument("--subcell", action="store_true",
                   help="time the sub-cell (soft-checkpoint) boundary readout")
    p.add_argument("--int8-scales", default="",
                   help="calibrated activation-scale JSON — adds quant=int8s")
    p.add_argument("--out", default="tune.env")
    p.set_defaults(func=cmd_tune_device)

    p = sub.add_parser("export", help="freeze the inspection step into a "
                       "portable StableHLO artifact + weights bundle")
    p.add_argument("--out", default="tti_pipeline.npz")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--platforms", default="tpu,cpu",
                   help="comma-separated lowering targets (default tpu,cpu)")
    p.set_defaults(func=cmd_export)

    args = parser.parse_args(argv)
    # Multi-host is a deployment configuration, not a code path: when the
    # TTI_COORDINATOR env triple is set, every subcommand's mesh spans all
    # hosts' chips (tti/parallel/dcn.py; smoke: tests/test_dcn.py).
    from tti.parallel.dcn import init_distributed

    init_distributed()
    # Persistent XLA compilation cache: train/eval recompile the same
    # programs across invocations (a cold 640px train-step compile is
    # minutes through a relayed transport); bench.py sets its own dir.
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("TTI_JAX_CACHE_DIR",
                                         "/tmp/tti_jax_cache"))
    except Exception:  # very old jax without the option — run uncached
        pass
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
