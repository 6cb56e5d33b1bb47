"""Full-geometry predict-chain parity report (VERDICT round-1 item 1).

Runs the REFERENCE DEPLOYMENT geometry — 1280x960 camera frames, predict
imgsz=960 with Ultralytics auto minimal-rect letterbox (960x736 model input;
reference: config.py:59-60, measurement.py:208-210) — through

  (a) the Ultralytics-semantics oracle (tests/torch_ref.ultralytics_predict:
      torch forward + real cv2 preprocessing; swaps itself for the real
      `ultralytics.YOLO` predictor when that package is importable), and
  (b) the tti predict chain (tti.app.predict.Predictor) at f32 AND at the
      production bf16 compute dtype,

and writes PARITY_REPORT.md with measured box/score agreement and per-instance
frame-resolution mask IoU (BASELINE north star: mask IoU >= 0.999).

Usage:  python tools/parity_report.py [--frames N] [--out PARITY_REPORT.md]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np


# The SAME frame generator and IoU the test suite gates on — imported, not
# duplicated, so the report can never silently desynchronize from the tests.
from test_predict_parity import _mask_iou_np as mask_iou  # noqa: E402
from test_predict_parity import _textured_frame as textured_frame  # noqa: E402


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--imgsz", type=int, default=960)
    ap.add_argument("--frame-h", type=int, default=960)
    ap.add_argument("--frame-w", type=int, default=1280)
    ap.add_argument("--out", default=None,
                    help="default: PARITY_REPORT.md with --weights (trained "
                    "production report), PARITY_DESIGN.md without (untrained "
                    "chaotic-network stress report)")
    ap.add_argument("--seed", type=int, default=0)
    # The random report model lights up ~900 anchors at 960px; the production
    # pre_topk=256 cap would make the comparison measure the budget, not the
    # chain. Size the candidate budget to the scene.
    ap.add_argument("--pre-topk", type=int, default=4096)
    ap.add_argument("--max-det", type=int, default=200)
    ap.add_argument("--weights", default=None,
                    help="tti checkpoint (msgpack or orbax train dir): measure "
                    "parity with TRAINED production weights — the checkpoint is "
                    "exported through tti.model.convert.to_torch_state_dict into "
                    "the torch oracle, and frames are synthetic textile scenes "
                    "(a trained detector does not fire on random torch_ref texture)")
    ap.add_argument("--quant", action="store_true",
                    help="add an int8-w8a8 row: the TTI_QUANT=int8 production "
                    "scheme (per-channel int8 weights, dynamic per-sample "
                    "activation quant) against the same float oracle — "
                    "quantifies the PTQ deviation at deployment geometry")
    args = ap.parse_args(argv)
    if args.out is None:
        args.out = "PARITY_REPORT.md" if args.weights else "PARITY_DESIGN.md"

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # Tethered deployments pin the TPU plugin via a site hook that ignores
        # the env var; translate it so CPU runs work with the relay down.
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except RuntimeError:
            pass
    jax.config.update("jax_compilation_cache_dir", "/tmp/tti_jax_cache_parity")
    jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp

    from torch_ref import make_detecting_model, ultralytics_predict
    from tti.app.predict import Predictor
    from tti.core.config import ModelConfig
    from tti.model.convert import convert_torch_state_dict
    from tti.model.yolo import create_model

    try:
        import ultralytics  # noqa: F401

        real_ultra = True
    except ImportError:
        real_ultra = False

    if args.weights:
        import torch

        from torch_ref import TorchYOLOv8Seg
        from tools.synth_textile import make_scene
        from tti.model.convert import load_checkpoint, to_torch_state_dict
        from tti.model.yolo import init_variables

        from tti.model.convert import checkpoint_metadata

        # Sidecar-driven architecture (tti validate-reference converts
        # arbitrary-variant reference .pts; default = the deployment n/2).
        meta = checkpoint_metadata(args.weights)
        variant = meta.get("variant", "n")
        nc = meta.get("num_classes", 2)
        template = init_variables(create_model(variant, nc=nc), image_size=64)
        variables = load_checkpoint(args.weights, template)
        tmodel = TorchYOLOv8Seg(variant, nc=nc)
        tmodel.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in to_torch_state_dict(variables).items()},
            strict=True,
        )
        tmodel.eval()

        def make_frame(h: int, w: int, seed: int) -> np.ndarray:
            # Deployment-shaped content: a textile scene rendered at the frame's
            # long side, centre-cropped to (h, w) — the fabric band (y in
            # 0.35-0.65 of the square) stays fully inside the crop.
            scene, _, _ = make_scene(max(h, w), np.random.default_rng(seed))
            y0, x0 = (scene.shape[0] - h) // 2, (scene.shape[1] - w) // 2
            return np.ascontiguousarray(scene[y0:y0 + h, x0:x0 + w])
    else:
        variant, nc = "n", 2
        tmodel = make_detecting_model(variant, nc=nc, seed=args.seed)
        variables = convert_torch_state_dict(tmodel.state_dict())

        def make_frame(h: int, w: int, seed: int) -> np.ndarray:
            return textured_frame(h, w, seed=seed)

    # Two deployment-scale geometries: the reference's 1280x960 frames (0.75
    # resample — includes the documented cv2-u8 vs float resize difference) and
    # an identity-scale 960x736 frame (no resample: every stage bit-comparable).
    # Identity geometry = the rect-letterboxed input of a 4:3 frame at this
    # imgsz (960 -> 736x960, the deployment shape) — frame == model input, so
    # no resample and every stage is bit-comparable.
    ident_h = (args.imgsz * 3 // 4 + 31) // 32 * 32
    geometries = [
        ("resample-0.75", (args.frame_h, args.frame_w)),
        ("identity-scale", (ident_h, args.imgsz)),
    ]
    dtypes = ["float32", "bfloat16"]
    if args.quant:
        from tti.model.convert import fold_batchnorm
        from tti.model.quantize import quantize_weights
        from tti.model.yolo import YOLOv8Seg

        variables_q = quantize_weights(fold_batchnorm(variables))
        dtypes.append("int8-w8a8")

    rows = []
    for geo_name, frame_hw in geometries:
      for dtype in dtypes:
        cfg = ModelConfig(
            variant=variant, num_classes=nc, image_size=args.imgsz, letterbox="rect",
            dtype="float32" if dtype == "int8-w8a8" else dtype,
            conf_thresh=0.20, iou_thresh=0.25,
            max_detections=args.max_det, nms_pre_topk=args.pre_topk,
        )
        if dtype == "int8-w8a8":
            # f32 carriers isolate the PTQ error itself (production composes
            # it with bf16; the bf16 row above bounds that part).
            pvars, pmodel = variables_q, YOLOv8Seg(
                variant=variant, nc=nc, dtype=jnp.float32, folded_bn=True,
                qmode="int8")
        else:
            jdt = jnp.float32 if dtype == "float32" else jnp.bfloat16
            pvars, pmodel = variables, create_model(variant, nc=nc, dtype=jdt)
        predictor = Predictor(cfg, pvars, frame_hw, mask_topk=args.max_det,
                              model=pmodel)
        print(f"[{geo_name}/{dtype}] input geometry: {predictor.spec}", file=sys.stderr)

        stats = dict(
            geo=geo_name, dtype=dtype, frames=0, ref_dets=0, got_dets=0, matched=0,
            box_err=[], score_err=[], ious=[], count_mismatch=0,
        )
        t0 = time.time()
        for k in range(args.frames):
            frame = make_frame(*frame_hw, seed=1000 + k)
            ref = ultralytics_predict(tmodel, frame, imgsz=args.imgsz,
                                      conf_thresh=0.20, iou_thresh=0.25,
                                      max_det=args.max_det)
            got = predictor(frame[None])
            n_ref = len(ref["scores"])
            n_got = int(got.valid[0].sum())
            stats["frames"] += 1
            stats["ref_dets"] += n_ref
            stats["got_dets"] += n_got
            if n_ref != n_got:
                stats["count_mismatch"] += 1

            # Greedy box matching (order may swap between near-equal scores).
            used: set[int] = set()
            masks_frame = predictor.masks_to_frame(got.masks_input[0])
            for i in range(min(n_got, masks_frame.shape[0])):
                best_j, best_d = None, 1e9
                for j in range(n_ref):
                    if j in used:
                        continue
                    d = float(np.abs(got.boxes[0, i] - ref["boxes"][j]).max())
                    if d < best_d:
                        best_d, best_j = d, j
                if best_j is None or best_d >= 5.0:
                    continue
                used.add(best_j)
                stats["matched"] += 1
                stats["box_err"].append(best_d)
                stats["score_err"].append(
                    abs(float(got.scores[0, i]) - float(ref["scores"][best_j]))
                )
                stats["ious"].append(
                    mask_iou(masks_frame[i], ref["masks_frame"][best_j])
                )
        stats["wall_s"] = time.time() - t0
        rows.append(stats)

    def fmt(stats: dict) -> str:
        ious = np.array(stats["ious"]) if stats["ious"] else np.array([np.nan])
        be = np.array(stats["box_err"]) if stats["box_err"] else np.array([np.nan])
        se = np.array(stats["score_err"]) if stats["score_err"] else np.array([np.nan])
        return (
            f"| {stats['geo']} | {stats['dtype']} | {stats['frames']} | {stats['ref_dets']} | "
            f"{stats['got_dets']} | {stats['matched']} | {stats['count_mismatch']} | "
            f"{np.median(ious):.6f} | {ious.min():.6f} | "
            f"{float((ious >= 0.999).mean()):.3f} | {be.max():.3f} | {se.max():.2e} |"
        )

    platform = None
    try:
        import jax

        platform = jax.devices()[0].platform
    except Exception:
        pass

    oracle_desc = (
        "real `ultralytics.YOLO` predictor" if real_ultra else
        "torch + cv2 oracle reproducing Ultralytics predict semantics "
        "operation-for-operation (`tests/torch_ref.ultralytics_predict`; the "
        "`ultralytics` package is not installable in this zero-egress "
        "environment — the harness auto-upgrades to it when importable)"
    )
    lines = [
        ("# PARITY REPORT — full predict chain vs Ultralytics semantics"
         if args.weights else
         "# PARITY DESIGN-STRESS REPORT — untrained chaotic network (worst case)\n\n"
         "This is the adversarial companion to PARITY_REPORT.md (the "
         "TRAINED-network\nreport, the production evidence); an untrained "
         "BN-calibrated network is\nlocally chaotic and amplifies sub-LSB "
         "input perturbations — a stress test\nof the chain mechanics, not a "
         "deployment claim."),
        "",
        f"- Geometry: {args.frame_w}x{args.frame_h} frames, predict imgsz={args.imgsz} "
        "with auto minimal-rect letterbox (the reference deployment's exact call: "
        "measurement.py:208-210) — model input "
        "960x736 at the default geometry.",
        f"- Oracle: {oracle_desc}.",
        (f"- Weights: TRAINED tti checkpoint `{args.weights}` (recipe: "
         "TRAINING.md), exported into the torch oracle via "
         "`tti.model.convert.to_torch_state_dict` (strict load) — both chains "
         "run the production network. Frames are synthetic textile scenes "
         "(`tools/synth_textile.make_scene`), the trained model's domain."
         if args.weights else
         "- Weights: deterministic seeded YOLOv8n-seg with detection-active class "
         "biases (`tests/torch_ref.make_detecting_model`) converted via "
         "`tti.model.convert.convert_torch_state_dict` — the real `.pt` deployment "
         "weights are absent from the reference mount "
         "(.MISSING_LARGE_BLOBS) and cannot be fetched."),
        "- Chain compared END-TO-END: letterbox -> forward -> DFL decode -> "
        "conf filter (strict >) -> class-aware NMS -> process_mask(upsample=True) "
        "-> scale_boxes -> the reference's cv2.INTER_NEAREST mask resize to frame "
        "(measurement.py:70-86). Mask IoU is measured at FRAME resolution "
        f"({args.frame_w}x{args.frame_h}).",
        f"- tti device platform: {platform}.",
        "",
        "| geometry | tti dtype | frames | oracle dets | tti dets | matched | frames w/ count mismatch "
        "| median mask IoU | min mask IoU | frac IoU>=0.999 | max box err (px) | max score err |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|",
        *[fmt(s) for s in rows],
        "",
        *(
            [
                "North star: mask IoU >= 0.999 (BASELINE.md). Read the table by row:",
                "- identity-scale/float32: no resample, f32 — every chain stage is",
                "  bit-comparable, so any deviation is a real bug.",
                "- resample-0.75 is the PRODUCTION geometry (1280x960 -> imgsz 960)",
                "  and carries the ONE documented implementation difference: the",
                "  oracle (like Ultralytics) resizes with cv2 on uint8; tti resizes",
                "  in float inside the fused graph (sub-LSB input deviation).",
                "- bfloat16 rows measure the production compute dtype.",
                "These rows use the TRAINED network — they measure (not argue) how",
                "the deployment weights respond to those perturbations.",
            ]
            if args.weights else
            [
                "North star: mask IoU >= 0.999 (BASELINE.md). Read the table by row:",
                "- identity-scale/float32 is the design-parity row: no resample, f32 —",
                "  every chain stage is bit-comparable, so any deviation is a real bug.",
                "- resample-0.75 adds the ONE documented implementation difference: the",
                "  oracle (like Ultralytics) resizes with cv2 on uint8 (quantizing the",
                "  letterboxed image to u8, mean 0.27 LSB deviation from the float",
                "  resize); tti resizes in float inside the fused graph. The seeded",
                "  random report network is chaotic (BN-calibrated, untrained), which",
                "  AMPLIFIES that sub-LSB input difference; trained networks are locally",
                "  smooth. See tests/test_predict_parity.py for the controlled version.",
                "- bfloat16 rows measure the production compute dtype on the same",
                "  chaotic network (worst case for rounding amplification).",
            ]
        ),
        "",
        f"Generated by tools/parity_report.py, {time.strftime('%Y-%m-%d %H:%M:%S')}.",
    ]
    Path(args.out).write_text("\n".join(lines) + "\n", encoding="utf-8")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
