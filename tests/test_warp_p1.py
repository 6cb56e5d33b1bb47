"""Fused Pallas pass-1 kernel (tti/kernels/warp_p1.py) vs the XLA chain.

The kernel must reproduce letterbox_content(decimate=True) -> TwoPassWarp
pass 1 exactly (same op order: u8 -> wdt, *1/255, -pad, f32-accumulated dot),
and the full kernel+pass-2 chain must match TwoPassWarp.apply on the same
frames. Runs in Pallas interpreter mode on CPU (same code path the TPU
compiles with Mosaic).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from tti.preprocess.letterbox import letterbox_spec, decimation_stride
from tti.preprocess.remap import build_small_undistort_map
from tti.preprocess.warp2pass import TwoPassWarp

# square 240px frame at imgsz 80 -> exact odd integer decimation k=3
FH = FW = 240
K = np.array([[937.14 * FW / 1280, 0, 636.15 * FW / 1280],
              [0, 884.02 * FH / 960, 422.39 * FH / 960],
              [0, 0, 1.0]])
DIST = np.array([0.0799, 0.0476, -0.0401, -0.0052, -0.1334])


def _setup():
    spec = letterbox_spec(FH, FW, 80)
    k = decimation_stride(spec)
    assert k == 3
    m = build_small_undistort_map(K, DIST, spec, unpadded_src=True)
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 255, size=(2, FH, FW, 3), dtype=np.uint8)
    return spec, k, m, frames


def _reference_content(frames, spec, k, dtype):
    off = (k - 1) // 2
    small = frames[:, off::k, off::k, :][:, : spec.new_h, : spec.new_w, :]
    return jnp.asarray(small[..., ::-1], dtype) / 255.0


def test_pass1_kernel_matches_einsum():
    from tti.kernels.warp_p1 import warp_pass1_decimated

    spec, k, m, frames = _setup()
    warp = TwoPassWarp(m, (spec.new_h, spec.new_w))
    w1, _ = warp.weights
    wdt = w1.dtype
    content = _reference_content(frames, spec, k, wdt)
    pad = jnp.asarray(warp.pad_value, wdt)
    want = jnp.einsum("bywc,ywo->byoc", content - pad, w1,
                      preferred_element_type=jnp.float32)  # (b, y, o, c)
    got = warp_pass1_decimated(
        jnp.asarray(frames), w1, k=k, off=(k - 1) // 2,
        hs=spec.new_h, ws=spec.new_w, pad_value=warp.pad_value,
    )  # (y, c, b, o)
    got_byoc = np.transpose(np.asarray(got, np.float32), (2, 0, 3, 1))
    np.testing.assert_allclose(
        got_byoc, np.asarray(want.astype(wdt), np.float32), atol=2e-5)


@pytest.mark.parametrize("s2d", [False, True])
def test_pass1_kernel_full_chain_matches_apply(s2d):
    from tti.kernels.warp_p1 import warp_pass1_decimated

    spec, k, m, frames = _setup()
    warp = TwoPassWarp(m, (spec.new_h, spec.new_w), s2d_out=s2d)
    w1, _ = warp.weights
    content = _reference_content(frames, spec, k, w1.dtype)
    want = np.asarray(warp.apply(content))
    i1 = warp_pass1_decimated(
        jnp.asarray(frames), w1, k=k, off=(k - 1) // 2,
        hs=spec.new_h, ws=spec.new_w, pad_value=warp.pad_value,
    )
    got = np.asarray(warp.apply_pass2_ycbo(i1, out_dtype=content.dtype))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_kernel_k5_geometry():
    """The kernel generalizes past k=3: 480px frames at imgsz 96 decimate at
    k=5 (the parked kernel must stay correct for any odd k if it is ever
    wired back in — see the module docstring's Mosaic post-mortem)."""
    from tti.kernels.warp_p1 import warp_pass1_decimated
    from tti.preprocess.letterbox import letterbox_spec as _spec

    fh = fw = 480
    spec = _spec(fh, fw, 96)
    k = decimation_stride(spec)
    assert k == 5
    k480 = np.array([[937.14 * fw / 1280, 0, 636.15 * fw / 1280],
                     [0, 884.02 * fh / 960, 422.39 * fh / 960],
                     [0, 0, 1.0]])
    m = build_small_undistort_map(k480, DIST, spec, unpadded_src=True)
    warp = TwoPassWarp(m, (spec.new_h, spec.new_w))
    w1, _ = warp.weights
    rng = np.random.default_rng(13)
    frames = rng.integers(0, 255, size=(2, fh, fw, 3), dtype=np.uint8)
    content = _reference_content(frames, spec, k, w1.dtype)
    want = np.asarray(warp.apply(content))
    i1 = warp_pass1_decimated(
        jnp.asarray(frames), w1, k=k, off=(k - 1) // 2,
        hs=spec.new_h, ws=spec.new_w, pad_value=warp.pad_value,
    )
    got = np.asarray(warp.apply_pass2_ycbo(i1, out_dtype=content.dtype))
    np.testing.assert_allclose(got, want, atol=2e-5)
