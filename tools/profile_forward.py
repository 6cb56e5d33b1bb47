"""Per-op forward-pass profile on the current backend (VERDICT r2 item 2).

Traces the production forward (bf16 YOLOv8-seg after the inference-time weight
transforms: s2d stem, folded BN) plus optionally the full pipeline step, parses
the XLA device plane programmatically (jax.profiler.ProfileData — no
tensorboard needed), and prints the top ops by device time with an
HLO-category aggregation. This is the measurement tool behind the round-3
forward/MXU work; committed so the numbers are reproducible.

Usage:
  python tools/profile_forward.py [--batch 128] [--imgsz 640] [--full]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def collect_device_ops(trace_dir: str):
    """Parse the newest xplane.pb under trace_dir -> (ops, async_ops) lists of
    (name, dur_us). A TPU device plane carries THREE overlapping lines —
    'XLA Modules' (whole-program spans), 'XLA Ops' (the true per-op compute
    timeline) and 'Async XLA Ops' (DMA copies overlapped under compute) —
    summing across them double/triple-counts. Only 'XLA Ops' durations are the
    device busy time; async copies are returned separately (their time hides
    under compute unless the op stream stalls on them)."""
    from jax.profiler import ProfileData

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    data = ProfileData.from_file(paths[-1])
    ops, async_ops = [], []
    for plane in data.planes:
        pname = plane.name.lower()
        if not ("tpu" in pname or "/device" in pname or "gpu" in pname):
            continue
        for line in plane.lines:
            lname = line.name.lower()
            bucket = None
            if lname == "xla ops":
                bucket = ops
            elif lname == "async xla ops":
                bucket = async_ops
            if bucket is None:
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e3
                if dur > 0:
                    bucket.append((ev.name, dur))
    if not ops:  # CPU backend fallback: op events live on host threads
        for plane in data.planes:
            if plane.name != "/host:CPU":
                continue
            for line in plane.lines:
                if not line.name.lower().startswith("tf_xlapjrt"):
                    continue
                for ev in line.events:
                    if ev.name.startswith(("end:", "ThreadpoolListener",
                                           "ThunkExecutor")):
                        continue
                    dur = ev.duration_ns / 1e3
                    if dur > 0:
                        ops.append((ev.name, dur))
    return ops, async_ops


CATEGORY_PATTERNS = [
    ("convolution", re.compile(r"convolution|conv")),
    ("fusion", re.compile(r"^(loop_)?fusion")),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast")),
    ("reduce", re.compile(r"reduce")),
    ("dot", re.compile(r"dot|matmul")),
    ("infeed/outfeed", re.compile(r"infeed|outfeed")),
]


def categorize(name: str) -> str:
    low = name.lower()
    for cat, pat in CATEGORY_PATTERNS:
        if pat.search(low):
            return cat
    return "other"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--frame-h", type=int, default=1080)
    ap.add_argument("--frame-w", type=int, default=1920)
    ap.add_argument("--full", action="store_true",
                    help="profile the FULL pipeline step (preprocess + forward "
                    "+ NMS + measure) instead of the bare forward")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--mask-stride", type=int, default=4, choices=[2, 4],
                    help="proto grid stride (2 = hi-res deploy arch)")
    ap.add_argument("--proto-head", default="deconv",
                    choices=["deconv", "subpixel"],
                    help="mask_stride=2 second stage architecture")
    ap.add_argument("--subcell", action="store_true",
                    help="profile the sub-cell (soft-checkpoint) boundary "
                         "readout — the as-deployed measure path for "
                         "soft-mask-trained sidecars")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/tti_jax_cache_bench")

    from tti.calib.io import CalibrationData
    from tti.core.config import MeasureConfig, ModelConfig
    from tti.model.yolo import init_variables
    from tti.parallel.runtime import InspectionPipeline

    K = np.array([[937.0 * args.frame_w / 1280, 0.0, 636.0 * args.frame_w / 1280],
                  [0.0, 884.0 * args.frame_h / 960, 422.0 * args.frame_h / 960],
                  [0.0, 0.0, 1.0]])
    calib = CalibrationData(
        K=K, dist=np.array([0.08, 0.048, -0.04, -0.005, -0.133]),
        rvec=np.array([-0.863, -0.392, -1.359]),
        tvec=np.array([0.005, 0.036, 0.094]))
    model_cfg = ModelConfig(variant="n", num_classes=2, image_size=args.imgsz,
                            dtype="bfloat16", mask_stride=args.mask_stride,
                            proto_head=args.proto_head)
    from tti.model.yolo import create_model
    pipeline = InspectionPipeline(
        model_cfg=model_cfg,
        variables=init_variables(
            create_model("n", nc=2, dtype=jnp.bfloat16,
                         mask_stride=args.mask_stride,
                         proto_head=args.proto_head),
            image_size=args.imgsz),
        frame_hw=(args.frame_h, args.frame_w),
        calibration=calib, measure_cfg=MeasureConfig(subcell_edge=args.subcell),
    )
    rng = np.random.default_rng(0)
    frames_np = rng.integers(
        0, 255, size=(args.batch, args.frame_h, args.frame_w, 3), dtype=np.uint8)
    # Production input path: pre-place the batch in the compiled step's
    # preferred layout (prepare_frames), exactly like bench.py and the stream
    # runners. Passing default-layout frames instead adds a 3.95 ms in-graph
    # relayout copy of the 796 MB u8 batch that the real pipeline doesn't pay.
    frames = pipeline.prepare_frames(frames_np)

    if args.full:
        def step():
            out = pipeline._step(pipeline.variables, frames)
            return float(jnp.sum(out["dets"].scores))
    else:
        pre = jax.jit(pipeline.preprocess)
        x = jax.block_until_ready(pre(frames, pipeline.warp_weights))
        fwd = jax.jit(lambda v, xx: pipeline.model.apply(v, xx, train=False))

        def step():
            raw = fwd(pipeline.variables, x)
            return float(jnp.sum(raw.protos.astype(jnp.float32)))

    step()  # compile
    t0 = time.perf_counter()
    step()
    base = time.perf_counter() - t0

    trace_dir = tempfile.mkdtemp(prefix="tti_prof_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.iters):
            step()

    events, async_events = collect_device_ops(trace_dir)
    total = sum(d for _, d in events)
    async_total = sum(d for _, d in async_events)
    per_op = collections.Counter()
    for name, dur in events:
        per_op[name] += dur
    per_cat = collections.Counter()
    for name, dur in per_op.items():
        per_cat[categorize(name)] += dur

    label = "full pipeline step" if args.full else "bare forward"
    print(f"\n== {label}: batch {args.batch}, imgsz {args.imgsz}, "
          f"wall {base*1e3:.2f} ms/step, device busy "
          f"{total/args.iters/1e3:.2f} ms/step "
          f"(+ {async_total/args.iters/1e3:.2f} ms async DMA, overlapped) ==")
    print("\n-- by HLO category (ms/step) --")
    for cat, dur in per_cat.most_common():
        print(f"  {cat:18s} {dur/args.iters/1e3:8.3f}  ({dur/total:5.1%})")
    print(f"\n-- top {args.top} ops (ms/step) --")
    for name, dur in per_op.most_common(args.top):
        print(f"  {dur/args.iters/1e3:8.3f}  {dur/total:5.1%}  {name[:110]}")


if __name__ == "__main__":
    main()
