"""Measure the proto-resolution ceiling on full-res mask AP (VERDICT r2 item 5).

YOLOv8-seg represents every instance mask as a coefficient vector against a
(input/4)-resolution prototype basis; the deployed mask is
sigmoid(coef . proto) -> crop -> bilinear upsample -> (>0.5)
(Ultralytics process_mask(upsample=True); tti.postprocess.masks.masks_at_input).
For 8-40 px stitches the question is how much of the full-res mask AP gap is
the REPRESENTATION (the /4 proto grid + bilinear/threshold chain) vs the
NETWORK. This tool measures the representation ceiling directly: it feeds the
evaluator ORACLE predictions — perfect boxes/classes/scores, and the best
proto-grid rendering of the ground-truth mask itself pushed through the exact
deployment mask chain — so any AP lost here is lost to resolution, not
learning.

Two oracle variants bound the achievable family:
- soft:   area-downsampled GT occupancy on the proto grid (sub-cell boundary
          placement via intermediate sigmoid values — what a perfectly
          calibrated network could emit);
- binary: hard 0/1 proto cells (arbitrarily sharp logits — what a confidently
          saturated network emits).

Usage: python tools/proto_ceiling.py --images /tmp/textile_ds/val/images \
           [--imgsz 640 960] [--out MASK_CEILING.md]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tti.train.data import discover_dataset, rasterize_polygon  # noqa: E402
from tti.train.eval import IOU_THRESHOLDS, ImageEval, evaluate  # noqa: E402


def area_downsample(mask: np.ndarray, factor: int) -> np.ndarray:
    """Exact box-filter occupancy: fraction of each factor x factor cell inside
    the full-res binary mask."""
    h, w = mask.shape
    return mask.reshape(h // factor, factor, w // factor, factor).mean(axis=(1, 3))


def bilinear_upsample(mask: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Half-pixel-center bilinear resize (jax.image.resize 'bilinear'
    semantics, which is what masks_at_input deploys)."""
    import cv2

    return cv2.resize(mask.astype(np.float32), (out_hw[1], out_hw[0]),
                      interpolation=cv2.INTER_LINEAR)


def crop_proto(mask: np.ndarray, box_proto: np.ndarray) -> np.ndarray:
    """tti.postprocess.masks.crop_masks semantics on one proto-res mask."""
    h, w = mask.shape
    rows = np.arange(h, dtype=np.float64)[:, None]
    cols = np.arange(w, dtype=np.float64)[None, :]
    x1, y1, x2, y2 = [float(v) for v in box_proto]
    inside = (rows >= y1) & (rows < y2) & (cols >= x1) & (cols < x2)
    return mask * inside


def oracle_masks(gt_full: np.ndarray, boxes: np.ndarray, imgsz: int,
                 variant: str, stride: int = 4) -> np.ndarray:
    """GT masks -> deployment-chain masks through the best proto rendering."""
    out = np.zeros_like(gt_full, dtype=np.float32)
    scale = 1.0 / stride
    for i, (m, b) in enumerate(zip(gt_full, boxes)):
        proto = area_downsample(m.astype(np.float32), stride)
        if variant == "binary":
            proto = (proto >= 0.5).astype(np.float32)
        proto = crop_proto(proto, b * scale)
        up = bilinear_upsample(proto, (imgsz, imgsz))
        out[i] = (up > 0.5).astype(np.float32)
    return out


def run_geometry(samples, imgsz: int, variant: str,
                 stride: int = 4) -> dict[str, float]:
    images = []
    for s in samples:
        if not s.polygons:
            continue
        gt_full = np.stack([rasterize_polygon(p, (imgsz, imgsz))
                            for p in s.polygons])
        boxes = np.stack([
            np.concatenate([p.min(0), p.max(0)]) * imgsz for p in s.polygons
        ]).astype(np.float64)
        classes = np.asarray(s.classes, np.int64)
        pred = oracle_masks(gt_full, boxes, imgsz, variant, stride)
        images.append(ImageEval(
            pred_boxes=boxes, pred_scores=np.ones(len(boxes)),
            pred_classes=classes, gt_boxes=boxes, gt_classes=classes,
            pred_masks=pred, gt_masks=gt_full,
        ))
    return evaluate(images, num_classes=2, use_masks=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", default="/tmp/textile_ds/val/images")
    ap.add_argument("--imgsz", type=int, nargs="*", default=[640, 960])
    ap.add_argument("--mask-stride", type=int, default=4, choices=[2, 4],
                    help="proto grid = imgsz/stride (2 = the tti hi-res head)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    samples = discover_dataset(args.images)
    rows = []
    for imgsz in args.imgsz:
        for variant in ("soft", "binary"):
            t0 = time.time()
            m = run_geometry(samples, imgsz, variant, args.mask_stride)
            rows.append((imgsz, variant, m))
            print(f"imgsz={imgsz} proto={imgsz // args.mask_stride} {variant}: "
                  f"stitch AP50-95 {m.get('AP_class_0', float('nan')):.3f}  "
                  f"fabric {m.get('AP_class_1', float('nan')):.3f}  "
                  f"mAP50 {m['mAP50']:.3f}  mAP50-95 {m['mAP50_95']:.3f}  "
                  f"({time.time() - t0:.0f}s)", flush=True)

    lines = [
        "# MASK CEILING — proto-resolution upper bound on full-res mask AP",
        "",
        f"- Oracle predictions: perfect boxes/classes/scores; masks are the GT",
        f"  itself rendered on the proto grid (input/--mask-stride) and pushed through the",
        f"  EXACT deployment chain (crop -> bilinear upsample -> >0.5;",
        f"  tti.postprocess.masks.masks_at_input). AP lost here is lost to",
        f"  RESOLUTION, not to the network. {len(samples)} val scenes,",
        f"  thresholds {IOU_THRESHOLDS[0]}..{IOU_THRESHOLDS[-1]}.",
        "- soft = area-occupancy proto cells (sub-cell boundary placement);",
        "  binary = hard 0/1 cells (saturated logits).",
        "",
        "| imgsz | proto grid | oracle | stitch AP50-95 | fabric AP50-95 | mAP50 | mAP50-95 |",
        "|---|---|---|---|---|---|---|",
        *[f"| {s} | {s // args.mask_stride}x{s // args.mask_stride} | {v} "
          f"| {m.get('AP_class_0', float('nan')):.3f} "
          f"| {m.get('AP_class_1', float('nan')):.3f} | {m['mAP50']:.3f} "
          f"| {m['mAP50_95']:.3f} |" for s, v, m in rows],
        "",
        f"Generated by tools/proto_ceiling.py, {time.strftime('%Y-%m-%d %H:%M:%S')}.",
    ]
    text = "\n".join(lines) + "\n"
    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            f.write(text)
    print(text)


if __name__ == "__main__":
    main()
