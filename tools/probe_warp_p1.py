"""Per-round Mosaic re-probe for the parked warp_p1 kernel (VERDICT r3 item 9).

tti/kernels/warp_p1.py is numerics-complete but unlowerable on the round-3
toolchain: the k-strided byte select it depends on is inexpressible (full
post-mortem in the kernel docstring + STATUS.md). This probe re-tests, on the
CURRENT toolchain, the two Mosaic capabilities that would unpark it plus the
kernel's own lowering, and prints one PASS/BLOCKED line per route:

  strided-vector-slice  route 2: jax.lax.slice with stride k inside a kernel
  strided-ref-slice     route 3: pl.Slice(start, size, stride) on a VMEM ref
  kernel-lowering       route 4: the shipped kernel (grouped-lane view DMAs)

Run each round after a jax/libtpu bump:  python tools/probe_warp_p1.py
If any row flips to PASS, wire the kernel behind TTI_WARP_P1=pallas and A/B
it at production batch (runtime.preprocess documents the splice point).
"""

from __future__ import annotations

import os
import sys
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _probe(name: str, fn) -> bool:
    try:
        fn()
        print(f"PASS     {name}")
        return True
    except Exception as e:  # noqa: BLE001 — report any lowering failure
        first = str(e).strip().splitlines()
        msg = first[0][:140] if first else type(e).__name__
        print(f"BLOCKED  {name}: {msg}")
        return False


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    backend = jax.default_backend()
    print(f"backend={backend} jax={jax.__version__}")
    if backend == "cpu":
        print("(CPU backend lowers nothing through Mosaic — run on the TPU "
              "host; interpret-mode numerics are covered by "
              "tests/test_warp_p1.py)")
        return 1

    K = 3  # the headline 1080p->640 decimation stride

    def strided_vector_slice():
        def kern(x_ref, o_ref):
            x = x_ref[...]
            o_ref[...] = jax.lax.slice(x, (0, 0), (8, 384), (1, K))

        f = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec((8, 384), lambda: (0, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )
        jax.jit(f).lower(jnp.zeros((8, 384), jnp.float32)).compile()

    def strided_ref_slice():
        def kern(x_ref, o_ref):
            o_ref[...] = x_ref[:, pl.Slice(0, 128, K)]

        f = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec((8, 384), lambda: (0, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )
        jax.jit(f).lower(jnp.zeros((8, 384), jnp.float32)).compile()

    def kernel_lowering():
        from tti.kernels import warp_p1
        from tti.kernels.warp_p1 import warp_pass1_decimated

        # Tiny headline-shaped instance (B=2, 48x1152 frame, k=3 -> 16x384
        # content, 128 output cols). interpret is forced OFF so this exercises
        # the real Mosaic lowering on whatever non-cpu backend is active.
        hs, ws, wo = 16, 384, 128
        frames = jnp.zeros((2, hs * K, ws * K, 3), jnp.uint8)
        w1 = jnp.zeros((hs, ws, wo), jnp.bfloat16)
        orig = warp_p1.jax.default_backend
        warp_p1.jax.default_backend = lambda: "tpu"  # defeat the interpret gate
        try:
            jax.jit(
                lambda f, w: warp_pass1_decimated(
                    f, w, k=K, off=1, hs=hs, ws=ws, pad_value=114 / 255.0)
            ).lower(frames, w1).compile()
        finally:
            warp_p1.jax.default_backend = orig

    results = {
        "strided-vector-slice (route 2)": _probe(
            "strided-vector-slice (route 2)", strided_vector_slice),
        "strided-ref-slice (route 3)": _probe(
            "strided-ref-slice (route 3)", strided_ref_slice),
        "kernel-lowering (route 4)": _probe(
            "kernel-lowering (route 4)", kernel_lowering),
    }
    if any(results.values()):
        print("\nA route UNBLOCKED: wire tti/kernels/warp_p1.py behind "
              "TTI_WARP_P1=pallas and A/B at production batch (STATUS.md).")
        return 0
    print("\nAll routes still blocked — kernel stays parked (STATUS.md "
          "post-mortem stands).")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
