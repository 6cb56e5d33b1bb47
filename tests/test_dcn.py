"""Multi-host DCN smoke (VERDICT r1 item 9).

Launches 2 coordinated CPU processes (jax.distributed over localhost — the
same wire protocol a real 2-machine line would use, DCN replaced by loopback)
and runs a sharded jit step over the GLOBAL mesh: each process contributes a
process-local batch, the step computes a global psum-style reduction, and both
processes must observe the full global result. This is the one-test-away proof
that the single-host mesh code (tti/parallel/mesh.py) is multi-host clean.
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
# 2 local CPU devices per process -> 4 global devices over 2 processes.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)
sys.path.insert(0, os.environ["TTI_REPO"])

from tti.parallel.dcn import init_distributed, global_batch, process_local_slice
from tti.parallel.mesh import create_mesh

assert init_distributed()  # from TTI_* env vars
pid = jax.process_index()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

mesh = create_mesh()  # global 1-D data mesh — the production helper, unchanged
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

@jax.jit
def step(x):
    # per-row transform + a cross-host reduction (rides DCN on a real line)
    return x * 2.0, jnp.sum(x)

# Each process contributes rows [0,1] resp [2,3] of the global batch.
local = np.arange(2, dtype=np.float32) + 2 * pid
gx = global_batch(mesh, local)
assert gx.shape == (4,)  # global shape spans both processes
doubled, total = step(gx)
# The reduction sees ALL hosts' rows: 0+1+2+3.
assert float(total) == 6.0, float(total)
mine = process_local_slice(doubled)
np.testing.assert_allclose(mine, local * 2.0)
print(f"OK process {pid}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dcn_smoke(tmp_path):
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
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"OK process {pid}" in out, out
