"""Train-step speed-of-light ledger (VERDICT r3 item 4).

Inference has a per-stage floor ledger (tools/profile_forward.py -> STATUS.md);
training did not. This traces ONE production training iteration — the
device-side augmentation program (mosaic/affine/HSV/flip,
tti/train/augment.py) AND the train step (YOLOv8-seg forward, TAL assignment,
CIoU/DFL/BCE/chunked-mask losses, backward, AdamW+EMA,
tti/train/step.py::make_train_step) — on the current backend, parses the XLA
device plane, and prints per-program + per-op device time next to bf16
FLOP/HBM floors so every gap is a number, not a hunch.

The measured configuration is the TRAINING.md production recipe:
imgsz 640, batch 64, variant n, synthetic-dataset shapes.

Usage:
  python tools/profile_train.py [--batch 64] [--imgsz 640] [--iters 3]
                                [--mask-stride 4] [--dataset-size 320]
"""

from __future__ import annotations

import argparse
import collections
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_forward import categorize, collect_device_ops  # noqa: E402


def flop_floors(batch: int, imgsz: int, variant: str = "n") -> dict:
    """bf16 MXU + HBM floor estimates (v5e: 197 TFLOP/s bf16, ~800 GB/s).

    Forward conv FLOPs come from the measured inference ledger (0.97 TFLOP at
    batch 128 / imgsz 640 => 7.58 GFLOP/img); backward is 2x forward
    (grad-weights + grad-activations); the augment program's two
    scale_and_translate resamples are separable matmuls over the (S, S) grid.
    """
    fwd_gflop_per_img = 7.58 * (imgsz / 640.0) ** 2
    fwd = batch * fwd_gflop_per_img
    bwd = 2.0 * fwd
    # augment: image resample (S*S*3, two 1-D passes, 4-tap) + per-GT mask
    # resample at proto res; dominated by the image pass.
    aug = batch * (2 * 4 * imgsz * imgsz * 3 * 2) / 1e9
    peak_tf = 197.0
    hbm_gbps = 800.0
    # HBM floor: params (3.4M f32 x3 trees) + activations r/w ~ 2x fwd acts.
    act_gb = batch * imgsz * imgsz * 3 * 2 * 6 / 1e9  # rough: 6 tensor passes
    return {
        "forward_ms": fwd / peak_tf,
        "backward_ms": bwd / peak_tf,
        "augment_ms": max(aug / peak_tf, act_gb / hbm_gbps * 1e3 * 0.25),
        "hbm_activations_ms": act_gb / hbm_gbps * 1e3,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--mask-stride", type=int, default=4, choices=[2, 4])
    ap.add_argument("--dataset-size", type=int, default=320)
    ap.add_argument("--max-gt", type=int, default=16)
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"],
                    help="trunk/head compute dtype (mirrors tti train --dtype)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/tti_jax_cache_bench")

    from tti.model.yolo import create_model, init_variables
    from tti.train.augment import DeviceDataset, make_augment_fn
    from tti.train.step import create_train_state, make_train_step

    model = create_model("n", nc=2, mask_stride=args.mask_stride,
                         dtype=jnp.bfloat16 if args.dtype == "bf16"
                         else jnp.float32)
    variables = init_variables(model, image_size=args.imgsz)
    state, tx = create_train_state(model, variables, learning_rate=1e-3,
                                   total_steps=1000)
    step = make_train_step(model, tx, (args.imgsz, args.imgsz))

    # Synthetic device dataset with TRAINING.md-shaped GT density.
    rng = np.random.default_rng(0)
    n, g, sm = args.dataset_size, args.max_gt, args.imgsz // args.mask_stride
    data = DeviceDataset(
        images=jax.device_put(rng.integers(0, 255, (n, args.imgsz, args.imgsz, 3),
                                           dtype=np.uint8)),
        boxes=jax.device_put(rng.uniform(0, args.imgsz, (n, g, 4)).astype(np.float32)),
        classes=jax.device_put(rng.integers(0, 2, (n, g), dtype=np.int32)),
        masks=jax.device_put((rng.uniform(size=(n, g, sm, sm)) > 0.7
                              ).astype(np.uint8)),
        valid=jax.device_put(np.ones((n, g), bool)),
    )
    # Mirror cmd_train: the augment image chain follows the compute dtype.
    augment = make_augment_fn(
        args.batch, args.max_gt,
        image_dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32)
    key = jax.random.key(0)

    def one_iter(state, i):
        x, targets = augment(data, jax.random.fold_in(key, i))
        state, metrics = step(state, x, targets)
        return state, metrics

    # Compile + warm.
    state, metrics = one_iter(state, 0)
    total0 = float(np.asarray(metrics["total"]))
    t0 = time.perf_counter()
    state, metrics = one_iter(state, 1)
    float(np.asarray(metrics["total"]))
    wall = time.perf_counter() - t0

    # Sustained rate: the production loop (tti train) fetches metrics only
    # every --log-every steps, so successive dispatches pipeline and the
    # steady-state cost is device time + amortized dispatch — measured here
    # over a block of iters with ONE final fetch (the honest imgs/s figure;
    # the single synced iter above overstates cost by a full host roundtrip).
    n_sustained = max(args.iters * 3, 10)
    t0 = time.perf_counter()
    for i in range(1000, 1000 + n_sustained):
        state, metrics = one_iter(state, i)
    float(np.asarray(metrics["total"]))
    sustained = (time.perf_counter() - t0) / n_sustained

    trace_dir = tempfile.mkdtemp(prefix="tti_train_prof_")
    with jax.profiler.trace(trace_dir):
        for i in range(2, 2 + args.iters):
            state, metrics = one_iter(state, i)
        float(np.asarray(metrics["total"]))

    events, async_events = collect_device_ops(trace_dir)
    total = sum(d for _, d in events)
    per_op = collections.Counter()
    for name, dur in events:
        per_op[name] += dur
    per_cat = collections.Counter()
    for name, dur in per_op.items():
        per_cat[categorize(name)] += dur

    floors = flop_floors(args.batch, args.imgsz)
    print(f"\n== train iter (augment + step): batch {args.batch}, imgsz "
          f"{args.imgsz}, mask_stride {args.mask_stride} ==")
    print(f"wall {wall*1e3:.1f} ms/iter -> {args.batch/wall:.1f} imgs/s/chip; "
          f"device busy {total/args.iters/1e3:.2f} ms/iter "
          f"(+ {sum(d for _, d in async_events)/args.iters/1e3:.2f} ms async "
          f"DMA); first-iter loss {total0:.3f}")
    print(f"sustained (pipelined, {n_sustained} iters, one fetch): "
          f"{sustained*1e3:.1f} ms/iter -> {args.batch/sustained:.1f} "
          f"imgs/s/chip")
    print("\n-- bf16 speed-of-light floors (v5e) --")
    for k, v in floors.items():
        print(f"  {k:22s} {v:8.2f} ms")
    print("\n-- by HLO category (ms/iter) --")
    for cat, dur in per_cat.most_common():
        print(f"  {cat:18s} {dur/args.iters/1e3:8.3f}  ({dur/total:5.1%})")
    print(f"\n-- top {args.top} ops (ms/iter) --")
    for name, dur in per_op.most_common(args.top):
        print(f"  {dur/args.iters/1e3:8.3f}  {dur/total:5.1%}  {name[:110]}")


if __name__ == "__main__":
    main()
