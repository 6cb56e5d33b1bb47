"""Per-checkpoint readout-offset calibration (round 5).

The learned occupancy/logit field places boundaries with a small SYSTEMATIC
mm bias (boundary-cell calibration of the net — e.g. the r4 all-soft
checkpoint under-measured edge by 0.128 mm and width by 0.169 mm on every
scene; MEASURE_REPORT history). The reference corrects exactly this class of
error with empirically calibrated constants applied to the final
measurements (reference config.py:156-157: SEAM_LENGTH_OFFSET = -1.3,
STITCH_WIDTH_OFFSET = -1.0). This tool derives those constants PER
CHECKPOINT — the bias belongs to the net, not the optics — and writes them
into the checkpoint sidecar (cal_edge_mm / cal_width_mm), where
MeasureConfig.with_subcell_from picks them up for every consumer
(orchestrator, eval, measure_report, bench).

Method: render N analytic deployment-geometry scenes from a seed DISJOINT
from the 256-scene measure-report set (report seed 0; calibration default
7700), run the full production chain, and store the NEGATED median signed
error. Median (not mean) so tail scenes — spread, not bias — cannot drag
the constant.

    python tools/calibrate_offsets.py --weights checkpoints/foo.msgpack
    # then: tools/measure_report.py --weights checkpoints/foo.msgpack
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.measure_report import (  # noqa: E402
    FRAME_HW, PlaneMapper, make_measure_scene, run_pipeline)


def calibrate(weights: str, scenes: int = 96, seed: int = 7700,
              imgsz: int = 960, batch: int = 16, dtype: str = "float32",
              undistort: bool = False) -> dict:
    """Measure median signed edge/width error on a fresh analytic scene set.

    undistort=False is the reference-native path (the production default);
    the systematic boundary bias is a mask-grid property, shared by both
    paths (the A/B tables show path deltas ~0.01 mm).
    """
    mapper = PlaneMapper()
    rng = np.random.default_rng(seed)
    frames, truths = [], []
    for i in range(scenes):
        bgr, truth = make_measure_scene(mapper, rng)
        frames.append(bgr)
        truths.append(truth)
        if (i + 1) % 32 == 0:
            print(f"rendered {i + 1}/{scenes}", flush=True)
    frames = np.stack(frames)
    gt_edge = np.array([t.frame_edge for t in truths])
    gt_width = np.array([t.frame_width for t in truths])

    # The chain must run UNCALIBRATED here regardless of any existing sidecar
    # constants — recalibration would otherwise chase its own tail.
    os.environ["TTI_READOUT_CAL"] = "0"
    try:
        edge, width, _ = run_pipeline(frames, weights, undistort=undistort,
                                      dtype=dtype, imgsz=imgsz, batch=batch)
    finally:
        del os.environ["TTI_READOUT_CAL"]

    e_ok = np.isfinite(edge)
    w_ok = np.isfinite(width)
    e_err = edge[e_ok] - gt_edge[e_ok]
    w_err = width[w_ok] - gt_width[w_ok]
    return {
        "cal_edge_mm": round(float(-np.median(e_err)), 4),
        "cal_width_mm": round(float(-np.median(w_err)), 4),
        "cal_scenes": int(scenes),
        "cal_seed": int(seed),
        "cal_edge_bias_raw": round(float(np.mean(e_err)), 4),
        "cal_width_bias_raw": round(float(np.mean(w_err)), 4),
        "cal_coverage": round(float(e_ok.mean()), 4),
    }


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--weights", required=True, help="deploy .msgpack (the "
                    "sidecar .json next to it receives the constants)")
    ap.add_argument("--scenes", type=int, default=96)
    ap.add_argument("--seed", type=int, default=7700,
                    help="must stay disjoint from the measure-report seed")
    ap.add_argument("--imgsz", type=int, default=960)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args(argv)

    t0 = time.time()
    cal = calibrate(args.weights, scenes=args.scenes, seed=args.seed,
                    imgsz=args.imgsz, batch=args.batch, dtype=args.dtype)
    sidecar = args.weights + ".json"
    meta = {}
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            meta = json.load(f)
    meta.update(cal)
    with open(sidecar, "w") as f:
        json.dump(meta, f, indent=2)
    print(f"wrote {sidecar}: cal_edge_mm={cal['cal_edge_mm']:+.4f} "
          f"cal_width_mm={cal['cal_width_mm']:+.4f} "
          f"(raw bias {cal['cal_edge_bias_raw']:+.4f}/"
          f"{cal['cal_width_bias_raw']:+.4f}, {time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
