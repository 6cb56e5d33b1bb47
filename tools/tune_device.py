"""Device auto-tuner: sweep the framework's measured, env-gated variants on
THE USER'S hardware/geometry and emit the winning configuration.

Every optimization in this framework that won on one shape but lost on
another is kept behind an env gate (STATUS.md performance ledgers):
mask-stats backend (one big XLA einsum vs Pallas kernels), the s2d-emitting
warp, banded warp weights, approximate NMS top-k, W8A8 int8 quantization.
Which one wins depends on batch size, frame geometry, model scale and the
TPU generation — exactly the things that differ per deployment. This tool
measures them ON the deployment and writes the best set as `.env` lines, so
a production line gets the ledger's benefit without re-running the ledger by
hand.

Usage:
  python tools/tune_device.py --batches 1,128 --out tune.env
  python -m tti.cli tune-device           # same, CLI-wired

Method per trial: set the gate env vars, build a FRESH InspectionPipeline
(gates are read at build/trace time), warm up (compile), then time
device-resident full-pipeline steps with a scalar-fetch completion barrier
(block_until_ready is not a barrier on relayed transports). Throughput
trials batch many steps behind one barrier; latency trials sync every step
and report the median.
"""

from __future__ import annotations

import argparse
import dataclasses
import gc
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The sweep: every env-gated variant with a measured win somewhere, plus the
# defaults as control. Gates not in a trial are explicitly RESET to defaults
# so trials are independent of the caller's environment.
GATES = ["TTI_MASKSTATS", "TTI_WARP_S2D", "TTI_WARP_BLOCKED",
         "TTI_APPROX_TOPK", "TTI_QUANT", "TTI_QUANT_SCALES",
         "TTI_INPUT_LAYOUT", "TTI_MASKSTATS_LOGITS"]

TRIALS: list[tuple[str, dict[str, str]]] = [
    ("baseline", {}),
    ("maskstats=pallas_batched", {"TTI_MASKSTATS": "pallas_batched"}),
    ("maskstats=pallas2", {"TTI_MASKSTATS": "pallas2"}),
    ("maskstats_logits=bf16", {"TTI_MASKSTATS_LOGITS": "bf16"}),
    ("warp_s2d=0", {"TTI_WARP_S2D": "0"}),
    ("warp_blocked=64", {"TTI_WARP_BLOCKED": "64"}),
    ("approx_topk=1", {"TTI_APPROX_TOPK": "1"}),  # approximate NMS candidate
    # top-k: opt-in accuracy trade, reported but never auto-adopted.
    ("quant=int8", {"TTI_QUANT": "int8"}),  # <=0.009 AP cost (STATUS item 11)
]

# Exact trials may WIN the tune outright; approximate/quantized ones (incl.
# the bf16 logits materialization: boundary-tie threshold flips + ~1/256-cell
# sub-cell resolution) are reported but only adopted with --allow-approx.
EXACT_TRIALS = {t for t, env in TRIALS if "TTI_APPROX_TOPK" not in env
                and "TTI_QUANT" not in env
                and "TTI_MASKSTATS_LOGITS" not in env}


def build_pipeline(batch: int, imgsz: int, frame_hw: tuple[int, int],
                   variant: str, dtype: str, mask_stride: int = 4,
                   proto_head: str = "deconv", subcell: bool = False):
    import jax.numpy as jnp

    from tti.calib.io import CalibrationData
    from tti.core.config import MeasureConfig, ModelConfig, RoiConfig
    from tti.model.yolo import create_model, init_variables
    from tti.parallel.runtime import InspectionPipeline

    frame_h, frame_w = frame_hw
    # Deployment intrinsics scaled to the sensor grid + real extrinsics
    # (same geometry as bench.py so numbers are comparable).
    K = np.array(
        [[937.1384518987244 * frame_w / 1280, 0.0, 636.148901113533 * frame_w / 1280],
         [0.0, 884.022038878419 * frame_h / 960, 422.3901781816556 * frame_h / 960],
         [0.0, 0.0, 1.0]])
    dist = np.array([0.07994929130530135, 0.04758675999900327,
                     -0.04013555042332606, -0.005228657034776396,
                     -0.1334157094005971])
    calib = CalibrationData(
        K=K, dist=dist,
        rvec=np.array([-0.8631369244225452, -0.3919482615538663, -1.3591256137314185]),
        tvec=np.array([0.005016396186926285, 0.03590342712705542, 0.09382141278570659]))
    jdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    model = create_model(variant, nc=2, dtype=jdt, mask_stride=mask_stride,
                         proto_head=proto_head)
    cfg = ModelConfig(variant=variant, num_classes=2, image_size=imgsz,
                      dtype=dtype, mask_stride=mask_stride,
                      proto_head=proto_head)
    return InspectionPipeline(
        model_cfg=cfg, variables=init_variables(model, image_size=imgsz),
        frame_hw=frame_hw, calibration=calib,
        # --subcell times the as-deployed soft-checkpoint readout (the auto
        # resolution flips it on for soft-trained sidecars).
        measure_cfg=MeasureConfig(subcell_edge=subcell),
        roi=RoiConfig(enabled=True, x_min=10, x_max=frame_w - 10, y_min=300,
                      y_max=frame_h - 200))


@dataclasses.dataclass
class TrialResult:
    name: str
    batch: int
    fps: float
    p50_ms: float
    compile_s: float
    error: str | None = None


def run_trial(name: str, env: dict[str, str], batch: int, imgsz: int,
              frame_hw: tuple[int, int], variant: str, dtype: str,
              iters: int, lat_iters: int, mask_stride: int = 4,
              proto_head: str = "deconv", subcell: bool = False) -> TrialResult:
    import jax.numpy as jnp

    for g in GATES:
        os.environ.pop(g, None)
    os.environ.update(env)
    try:
        t0 = time.perf_counter()
        pipe = build_pipeline(batch, imgsz, frame_hw, variant, dtype,
                              mask_stride=mask_stride, proto_head=proto_head,
                              subcell=subcell)
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, size=(batch, *frame_hw, 3), dtype=np.uint8)
        frames_dev = pipe.prepare_frames(frames)

        def sync(outs) -> float:
            return float(jnp.sum(outs["dets"].scores))

        out = pipe._step(pipe.variables, frames_dev)
        sync(out)
        compile_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        sync(out)
        roundtrip = time.perf_counter() - t0

        t0 = time.perf_counter()
        for _ in range(iters):
            out = pipe._step(pipe.variables, frames_dev)
        sync(out)
        fps = batch * iters / max(time.perf_counter() - t0 - roundtrip, 1e-9)

        lats = []
        for _ in range(lat_iters):
            t1 = time.perf_counter()
            sync(pipe._step(pipe.variables, frames_dev))
            lats.append(time.perf_counter() - t1)
        # Subtract the measured sync round-trip (same correction as bench.py):
        # on relayed transports the scalar fetch costs tens of ms and is NOT
        # part of the device latency a direct-PCIe deployment would see —
        # without it the p50 column measures the tunnel, not the program.
        p50 = max(float(np.median(lats)) - roundtrip, 0.0) * 1e3
        res = TrialResult(name, batch, fps, p50, compile_s)
    except Exception as e:  # a gate may be unsupported on this toolchain
        res = TrialResult(name, batch, 0.0, float("inf"), 0.0,
                          error=f"{type(e).__name__}: {e}")
    finally:
        for g in GATES:
            os.environ.pop(g, None)
        gc.collect()
    return res


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--batches", default="1,128",
                    help="comma list of batch sizes to tune")
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--frame-h", type=int, default=1080)
    ap.add_argument("--frame-w", type=int, default=1920)
    ap.add_argument("--variant", default="n")
    ap.add_argument("--mask-stride", type=int, default=4, choices=[2, 4],
                    help="proto-head stride (2 = the hi-res deploy arch)")
    ap.add_argument("--proto-head", default="deconv",
                    choices=["deconv", "subpixel"],
                    help="mask_stride=2 second stage architecture")
    ap.add_argument("--subcell", action="store_true",
                    help="time the sub-cell (soft-checkpoint) boundary "
                         "readout — the as-deployed measure path for "
                         "soft-mask-trained sidecars")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--lat-iters", type=int, default=15)
    ap.add_argument("--trials", default="",
                    help="comma list of trial names to run (default: all)")
    ap.add_argument("--allow-approx", action="store_true",
                    help="let approximate/quantized trials WIN the tune "
                         "(they are always measured and reported)")
    ap.add_argument("--int8-scales", default="",
                    help="activation-scale JSON (tools/calibrate_int8.py) — "
                         "adds a quant=int8s trial for THIS arch; the file's "
                         "block keys must match the swept architecture")
    ap.add_argument("--out", default="tune.env")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/tti_jax_cache_tune")

    trials = list(TRIALS)
    if args.int8_scales:
        trials.append(("quant=int8s", {
            "TTI_QUANT": "int8s",
            "TTI_QUANT_SCALES": os.path.abspath(args.int8_scales)}))
    if args.trials:
        keep = set(args.trials.split(","))
        trials = [t for t in trials if t[0] in keep]
    batches = [int(b) for b in args.batches.split(",")]
    frame_hw = (args.frame_h, args.frame_w)

    results: list[TrialResult] = []
    for batch in batches:
        for name, env in trials:
            r = run_trial(name, env, batch, args.imgsz, frame_hw,
                          args.variant, args.dtype, args.iters, args.lat_iters,
                          mask_stride=args.mask_stride,
                          proto_head=args.proto_head, subcell=args.subcell)
            results.append(r)
            if r.error:
                print(f"[batch {batch:4d}] {name:28s} FAILED: {r.error}",
                      flush=True)
            else:
                print(f"[batch {batch:4d}] {name:28s} {r.fps:9.1f} frames/s  "
                      f"p50 {r.p50_ms:7.2f} ms  (compile {r.compile_s:.0f}s)",
                      flush=True)

    # Pick winners: throughput at the largest batch, latency at the smallest.
    # Exact-by-default: approximate/quantized trials only win with
    # --allow-approx; otherwise they are advisory lines in the report.
    def eligible(r: TrialResult) -> bool:
        return r.error is None and (args.allow_approx or r.name in EXACT_TRIALS)

    big, small = max(batches), min(batches)
    thr = [r for r in results if r.batch == big and eligible(r)]
    lat = [r for r in results if r.batch == small and eligible(r)]
    best_thr = max(thr, key=lambda r: r.fps) if thr else None
    best_lat = min(lat, key=lambda r: r.p50_ms) if lat else None

    env_of = dict(trials)
    lines = [f"# tti device tune — {time.strftime('%Y-%m-%d %H:%M:%S')}",
             f"# geometry: {frame_hw[0]}x{frame_hw[1]} imgsz={args.imgsz} "
             f"variant={args.variant} dtype={args.dtype} "
             f"platform={jax.default_backend()}"]
    if best_thr:
        lines.append(f"# throughput winner at batch {big}: {best_thr.name} "
                     f"({best_thr.fps:.1f} frames/s)")
        for k, v in env_of[best_thr.name].items():
            lines.append(f"{k}={v}")
    if best_lat and best_lat.name != (best_thr.name if best_thr else None):
        lines.append(f"# latency winner at batch {small}: {best_lat.name} "
                     f"(p50 {best_lat.p50_ms:.2f} ms) — for small-batch "
                     f"deployments use instead:")
        for k, v in env_of[best_lat.name].items():
            lines.append(f"# {k}={v}")
        # Crossover: bound the batch range where the latency winner actually
        # beats baseline, so the small-batch recommendation is measured, not
        # extrapolated below the tuned points (sweep more batches to tighten).
        base = {r.batch: r for r in results
                if r.name == "baseline" and r.error is None}
        mine = {r.batch: r for r in results
                if r.name == best_lat.name and r.error is None}
        shared = sorted(set(base) & set(mine))
        wins = [b for b in shared if mine[b].fps > base[b].fps]
        if wins and len(shared) > 1:
            losses = [b for b in shared if b not in wins]
            hi = min((b for b in losses if b > max(wins)), default=None)
            if hi is None:
                lines.append(f"# {best_lat.name} beats baseline at every "
                             f"measured batch ({shared[0]}..{shared[-1]})")
            else:
                lines.append(f"# {best_lat.name} wins at batch <= {max(wins)}"
                             f"; baseline wins from batch {hi} up "
                             f"(crossover inside ({max(wins)}, {hi}))")
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(args.out + ".json", "w") as f:
        json.dump([dataclasses.asdict(r) for r in results], f, indent=1)
    print(f"wrote {args.out} (+.json)")


if __name__ == "__main__":
    main()
