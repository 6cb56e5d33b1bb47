"""Offline activation-scale calibration for static W8A8 int8 (TTI_QUANT=int8s).

The dynamic per-sample variant (TTI_QUANT=int8) lost its batch-128 throughput
A/B (4953 vs 6029 frames/s) on the per-layer absmax reductions and
quant/dequant passes XLA cannot fuse into the conv. The static variant bakes
each Conv block's input scale in as a graph constant instead — this tool
measures those scales on representative data (the same predict-chain tensors
`tti eval` feeds the model) and writes the JSON the runtime gate consumes:

  python tools/calibrate_int8.py --weights checkpoints/yolov8n_textile.msgpack \
      --synth 64 --out checkpoints/int8_scales.json [--percentile 99.9]
  TTI_QUANT=int8s TTI_QUANT_SCALES=checkpoints/int8_scales.json python bench.py

Input modes: --images <eval-format dataset dir> or --synth N (renders N
`tools/synth_textile.make_scene` scenes, the trained model's domain).
--percentile <100 clips outlier frames (per-batch absmax percentile).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--weights", required=True)
    ap.add_argument("--images", default="", help="eval-format dataset dir")
    ap.add_argument("--synth", type=int, default=0,
                    help="render N synthetic scenes instead of --images")
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--percentile", type=float, default=100.0)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    if bool(args.images) == bool(args.synth):
        ap.error("exactly one of --images / --synth")

    import jax.numpy as jnp

    from tti.model.convert import checkpoint_metadata, fold_batchnorm, load_checkpoint
    from tti.model.quantize import calibrate_act_scales
    from tti.model.yolo import YOLOv8Seg, create_model, init_variables
    from tti.preprocess.letterbox import letterbox_u8, make_letterbox_spec

    meta = checkpoint_metadata(args.weights)
    variant = meta.get("variant", "n")
    nc = meta.get("num_classes", 2)
    mask_stride = meta.get("mask_stride", 4)
    proto_head = meta.get("proto_head", "deconv")

    base = create_model(variant, nc=nc, mask_stride=mask_stride,
                        proto_head=proto_head)
    variables = load_checkpoint(
        args.weights, init_variables(base, image_size=64))
    folded = fold_batchnorm(variables)
    # Calibration statistics are collected in f32 (the sow casts regardless);
    # the production model quantizes FROM the same tensors it would see, so
    # run the calib forward in the production compute dtype.
    calib_model = YOLOv8Seg(variant=variant, nc=nc, dtype=jnp.bfloat16,
                            folded_bn=True, qmode="calib",
                            mask_stride=mask_stride, proto_head=proto_head)

    # Calibration frames -> the exact model-input tensors (letterbox_u8 on
    # square frames = the predict-chain preprocess `tti eval` uses).
    if args.synth:
        from tools.synth_textile import make_scene

        rng = np.random.default_rng(args.seed)
        frames = np.stack([make_scene(args.imgsz, rng)[0]
                           for _ in range(args.synth)])
    else:
        from tti.train.data import discover_dataset, sample_to_targets

        samples = discover_dataset(args.images)
        frames = np.stack([
            (sample_to_targets(s, args.imgsz, max_gt=1)[0][..., ::-1] * 255)
            .astype(np.uint8) for s in samples])
    spec = make_letterbox_spec(args.imgsz, args.imgsz, args.imgsz, "square")

    def batches():
        for i in range(0, len(frames), args.batch):
            chunk = frames[i:i + args.batch]
            yield letterbox_u8(chunk, spec, jnp.bfloat16)

    scales = calibrate_act_scales(calib_model, folded, batches(),
                                  percentile=args.percentile)
    payload = {
        "scales": scales,
        "meta": {
            "weights": os.path.abspath(args.weights),
            "variant": variant, "num_classes": nc,
            "mask_stride": mask_stride, "proto_head": proto_head,
            "imgsz": args.imgsz,
            "frames": int(len(frames)),
            "source": args.images or f"synth:{args.synth}:seed{args.seed}",
            "percentile": args.percentile,
        },
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    top = sorted(scales.items(), key=lambda kv: -kv[1])[:5]
    print(f"wrote {args.out}: {len(scales)} block scales "
          f"(largest: {', '.join(f'{k}={v:.4g}' for k, v in top)})")


if __name__ == "__main__":
    main()
