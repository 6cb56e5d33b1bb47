"""Multi-host DCN proof on the PRODUCTION workload (VERDICT r3 item 6).

Launches 2 coordinated CPU processes (jax.distributed over localhost — the
same wire protocol a real 2-machine line would use, DCN replaced by loopback)
and runs the REAL train step (tti.train.step.make_train_step: YOLOv8-seg
forward, TAL assignment, CIoU/DFL/BCE/mask losses, EMA) over the global
4-device mesh, each process contributing its local slice of the batch. Every
process then re-runs the identical step single-device and asserts loss AND
post-update parameter equivalence. A train-step collective sharded on the
wrong axis changes the losses/params and fails this test; the previous
x*2/sum(x) smoke could not see that.

The optimizer in the asserted step is ``optax.sgd(1.0)``, not the production
AdamW chain: with it, post-step params = params − mean-grad, so the parameter
comparison reads the gradient all-reduce DIRECTLY at fp-noise tolerance. The
tx runs strictly downstream of the collectives (on the already-reduced grads,
batch-independent), so it adds no sharding surface — while Adam's m/√v
rescaling amplifies reduction-order noise on near-zero grads into O(lr)
param deviations and, one step later, discrete TAL-tie flips (measured: a
2-step AdamW variant deviated 0.7% on the step-1 seg loss from exactly such
a flip). One step of the production AdamW tx is still executed under the mesh
as a smoke (it must compile and run sharded), just not numerically asserted.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
# XLA CPU's default matmul precision is reduced (~1e-3): sharded and
# single-device convs then differ enough to flip discrete TAL ties and the
# comparison measures the backend, not the sharding. Pin highest.
jax.config.update("jax_default_matmul_precision", "highest")
# 2 local CPU devices per process -> 4 global devices over 2 processes.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)
sys.path.insert(0, os.environ["TTI_REPO"])

from tti.parallel.dcn import init_distributed, global_batch, process_local_slice
from tti.parallel.mesh import create_mesh, replicate

assert init_distributed()  # from TTI_* env vars
pid = jax.process_index()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

import jax.numpy as jnp

# --- wiring smoke: a cross-host reduction sees every process's rows --------
mesh = create_mesh()  # global 1-D data mesh — the production helper, unchanged

@jax.jit
def smoke(x):
    return x * 2.0, jnp.sum(x)

local = np.arange(2, dtype=np.float32) + 2 * pid
gx = global_batch(mesh, local)
assert gx.shape == (4,)
doubled, total = smoke(gx)
assert float(total) == 6.0, float(total)
np.testing.assert_allclose(process_local_slice(doubled), local * 2.0)

# --- the production workload: make_train_step over the global mesh ---------
import optax

from tti.model.yolo import create_model, init_variables
from tti.train.step import TrainState, Targets, create_train_state, make_train_step

IMGSZ, B, G = 32, 4, 2
model = create_model("n", nc=2)
variables = init_variables(model, image_size=IMGSZ, seed=0)

rng = np.random.default_rng(0)
images = rng.uniform(0, 1, size=(B, IMGSZ, IMGSZ, 3)).astype(np.float32)
boxes = np.tile(np.array([[4, 4, 24, 24], [8, 8, 28, 28]], np.float32), (B, 1, 1))
classes = np.tile(np.array([[0, 1]], np.int32), (B, 1))
masks = (rng.uniform(size=(B, G, IMGSZ // 4, IMGSZ // 4)) > 0.5).astype(np.float32)
valid = np.ones((B, G), bool)


def make_batch(use_mesh):
    if use_mesh:
        # Each process contributes ITS slice; global_batch assembles the
        # global array exactly as the production trainer would over DCN.
        sl = slice(pid * (B // 2), (pid + 1) * (B // 2))
        return global_batch(mesh, images[sl]), Targets(
            boxes=global_batch(mesh, boxes[sl]),
            classes=global_batch(mesh, classes[sl]),
            masks=global_batch(mesh, masks[sl]),
            valid=global_batch(mesh, valid[sl]),
        )
    return jnp.asarray(images), Targets(
        boxes=jnp.asarray(boxes), classes=jnp.asarray(classes),
        masks=jnp.asarray(masks), valid=jnp.asarray(valid))


def run(use_mesh):
    fresh = jax.tree_util.tree_map(lambda a: np.array(a, np.float32), variables)
    tx = optax.sgd(1.0)  # post-step params = params - mean-grad (see header)
    state = TrainState(params=fresh["params"], batch_stats=fresh["batch_stats"],
                       opt_state=tx.init(fresh["params"]),
                       step=jnp.zeros((), jnp.int32),
                       ema_params=jax.tree_util.tree_map(
                           lambda p: jnp.array(p, copy=True), fresh["params"]))
    m = mesh if use_mesh else None
    step = make_train_step(model, tx, (IMGSZ, IMGSZ), mesh=m)
    if use_mesh:
        state = replicate(mesh, state)
    x, tgt = make_batch(use_mesh)
    state, metrics = step(state, x, tgt)
    return state, {k: float(np.asarray(v)) for k, v in metrics.items()}


state_d, loss_d = run(True)
state_s, loss_s = run(False)

# Loss equivalence at identical params (vocabulary AND values; 1e-3 bar —
# per-shard reduction order differs). A wrongly-sharded forward/loss
# collective changes these.
assert set(loss_d) == set(loss_s)
for k in loss_d:
    assert abs(loss_d[k] - loss_s[k]) <= 1e-3 * (1.0 + abs(loss_s[k])), (
        k, loss_d[k], loss_s[k])

# Gradient-collective equivalence: with the sgd(1.0) tx the post-step param
# delta IS the all-reduced mean gradient, so sharded==single deltas bound the
# gradient psum PER LEAF, relative to that leaf's own gradient magnitude.
# (Replicated global arrays are fully replicated, so device_get is legal on
# both sides.) Bar: 1% relative — measured fp noise between the batch-4 and
# batch-1-per-shard conv/BN backward programs is ~0.1% rel (uniform across
# leaves, amplified through the BN-variance chain), while a wrong-axis
# collective is O(1) relative (grads doubled/halved/unsynced). EMA leaves
# follow params by a smooth blend, asserted under the same bar.
init_leaves = [np.asarray(jax.device_get(p), np.float32)
               for p in jax.tree_util.tree_leaves(variables["params"])]


def worst_rel(tree_d, tree_s):
    ld = jax.tree_util.tree_leaves(tree_d)
    ls = jax.tree_util.tree_leaves(tree_s)
    assert len(ld) == len(ls) == len(init_leaves)
    worst = 0.0
    for d, s, z in zip(ld, ls, init_leaves):
        dd = np.asarray(jax.device_get(d), np.float32) - z
        ds = np.asarray(jax.device_get(s), np.float32) - z
        dev = float(np.max(np.abs(dd - ds)))
        gmag = float(np.max(np.abs(ds)))
        worst = max(worst, dev / (1e-6 + gmag))
    return worst

worst_p = worst_rel(state_d.params, state_s.params)
worst_e = worst_rel(state_d.ema_params, state_s.ema_params)
assert worst_p <= 1e-2, f"sharded vs single grad/param rel divergence {worst_p}"
assert worst_e <= 1e-2, f"sharded vs single EMA rel divergence {worst_e}"

# Production-optimizer smoke: one AdamW-chain step must compile and run over
# the same mesh (numerics not asserted — see header).
state_a, tx_a = create_train_state(model, variables, learning_rate=1e-3)
step_a = make_train_step(model, tx_a, (IMGSZ, IMGSZ), mesh=mesh)
state_a = replicate(mesh, state_a)
x, tgt = make_batch(True)
state_a, metrics_a = step_a(state_a, x, tgt)
assert np.isfinite([float(np.asarray(v)) for v in metrics_a.values()]).all()

print(f"OK process {pid} (train-step parity, worst rel grad dev {worst_p:.2e}, "
      f"ema {worst_e:.2e})", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dcn_train_step(tmp_path):
    script = tmp_path / "dcn_worker.py"
    script.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            TTI_REPO=REPO,
            TTI_COORDINATOR=coord,
            TTI_NUM_PROCESSES="2",
            TTI_PROCESS_ID=str(pid),
        )
        # The conftest's virtual-8-device XLA_FLAGS would fight the worker's;
        # give each worker a clean slate.
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"OK process {pid}" in out, out
