"""Pallas kernel tests (interpreter mode on CPU) vs the dense XLA reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from tti.kernels.maskstats import instance_mask_stats_pallas, instance_mask_stats_xla


def _random_problem(rng, d=24, hm=40, wm=48, nm=32):
    protos = rng.normal(size=(hm, wm, nm)).astype(np.float32)
    coefs = rng.normal(size=(d, nm)).astype(np.float32) * 0.5
    boxes = np.zeros((d, 4), np.float32)
    x1 = rng.uniform(0, wm - 8, d)
    y1 = rng.uniform(0, hm - 8, d)
    boxes[:, 0] = x1
    boxes[:, 1] = y1
    boxes[:, 2] = x1 + rng.uniform(4, wm / 2, d)
    boxes[:, 3] = y1 + rng.uniform(4, hm / 2, d)
    valid = rng.uniform(size=d) > 0.2
    return (jnp.asarray(protos), jnp.asarray(coefs), jnp.asarray(boxes),
            jnp.asarray(valid))


@pytest.mark.parametrize("seed", [0, 1])
def test_maskstats_pallas_matches_xla(seed):
    rng = np.random.default_rng(seed)
    protos, coefs, boxes, valid = _random_problem(rng)
    ref = instance_mask_stats_xla(protos, coefs, boxes, valid)
    got = instance_mask_stats_pallas(protos, coefs, boxes, valid, interpret=True)
    for key in ("m00", "m10", "m01", "col_any", "bottom"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]), atol=1e-3,
            err_msg=f"{key} mismatch",
        )


def test_maskstats_invalid_rows_zeroed(rng):
    protos, coefs, boxes, valid = _random_problem(rng)
    valid = jnp.zeros_like(valid)
    out = instance_mask_stats_pallas(protos, coefs, boxes, valid, interpret=True)
    assert float(np.asarray(out["m00"]).sum()) == 0.0
    assert np.all(np.asarray(out["bottom"]) == -1.0)


def test_maskstats_crop_respected(rng):
    """A strongly-positive everywhere mask must still be zero outside its box."""
    hm = wm = 32
    protos = jnp.ones((hm, wm, 32), jnp.float32)
    coefs = jnp.ones((4, 32), jnp.float32)  # logits = 32 > 0 everywhere
    boxes = jnp.asarray(np.array([[4, 8, 12, 16]] * 4, np.float32))
    valid = jnp.ones(4, bool)
    ref = instance_mask_stats_xla(protos, coefs, boxes, valid)
    got = instance_mask_stats_pallas(protos, coefs, boxes, valid, interpret=True)
    # Box is 8 wide x 8 tall -> m00 = 64; bottom row = 15.
    assert float(np.asarray(got["m00"])[0]) == 64.0
    assert float(np.asarray(got["bottom"])[0, 5]) == 15.0
    assert float(np.asarray(got["bottom"])[0, 0]) == -1.0
    np.testing.assert_allclose(np.asarray(got["col_any"]), np.asarray(ref["col_any"]))


@pytest.mark.parametrize("seed", [0, 1])
def test_maskstats_pallas_batched_matches_xla(seed):
    """Batched (B, row_tiles)-grid kernel == per-frame XLA reference, frame by
    frame, including odd (non-tile-multiple) proto heights."""
    import jax

    from tti.kernels.maskstats import instance_mask_stats_pallas_batched

    rng = np.random.default_rng(100 + seed)
    b = 3
    frames = [_random_problem(rng, d=24, hm=40, wm=48) for _ in range(b)]
    protos = jnp.stack([f[0] for f in frames])
    coefs = jnp.stack([f[1] for f in frames])
    boxes = jnp.stack([f[2] for f in frames])
    valid = jnp.stack([f[3] for f in frames])
    got = instance_mask_stats_pallas_batched(protos, coefs, boxes, valid,
                                             interpret=True)
    ref = jax.vmap(instance_mask_stats_xla)(protos, coefs, boxes, valid)
    for key in ("m00", "m10", "m01", "col_any", "bottom"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]), atol=1e-3,
            err_msg=f"{key} mismatch",
        )

@pytest.mark.parametrize("seed", [0, 1])
def test_maskstats_pallas2_matches_xla(seed):
    """v2 (detections-in-lanes, native-layout protos) == XLA reference."""
    from tti.kernels.maskstats import instance_mask_stats_pallas2

    rng = np.random.default_rng(seed)
    protos, coefs, boxes, valid = _random_problem(rng)
    ref = instance_mask_stats_xla(protos, coefs, boxes, valid)
    got = instance_mask_stats_pallas2(protos, coefs, boxes, valid, interpret=True)
    for key in ("m00", "m10", "m01", "col_any", "bottom"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]), atol=1e-3,
            err_msg=f"{key} mismatch",
        )


def test_maskstats_pallas2_bf16_protos(rng):
    """Production dtype: bf16 protos through v2 == XLA reference on the same
    bf16-origin values (products are exact; f32 accumulation both sides)."""
    from tti.kernels.maskstats import instance_mask_stats_pallas2

    protos, coefs, boxes, valid = _random_problem(rng)
    protos16 = protos.astype(jnp.bfloat16)
    ref = instance_mask_stats_xla(protos16, coefs, boxes, valid)
    got = instance_mask_stats_pallas2(protos16, coefs, boxes, valid,
                                      interpret=True)
    for key in ("m00", "m10", "m01", "col_any", "bottom"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]), atol=1e-3,
            err_msg=f"{key} mismatch",
        )


def test_maskstats_pallas2_invalid_and_crop(rng):
    from tti.kernels.maskstats import instance_mask_stats_pallas2

    protos, coefs, boxes, valid = _random_problem(rng)
    out = instance_mask_stats_pallas2(protos, coefs, boxes,
                                      jnp.zeros_like(valid), interpret=True)
    assert float(np.asarray(out["m00"]).sum()) == 0.0
    assert np.all(np.asarray(out["bottom"]) == -1.0)

    hm = wm = 32
    protos = jnp.ones((hm, wm, 32), jnp.float32)
    coefs = jnp.ones((4, 32), jnp.float32)
    boxes = jnp.asarray(np.array([[4, 8, 12, 16]] * 4, np.float32))
    got = instance_mask_stats_pallas2(protos, coefs, boxes,
                                      jnp.ones(4, bool), interpret=True)
    assert float(np.asarray(got["m00"])[0]) == 64.0
    assert float(np.asarray(got["bottom"])[0, 5]) == 15.0
    assert float(np.asarray(got["bottom"])[0, 0]) == -1.0


@pytest.mark.parametrize("seed", [0, 1])
def test_maskstats_pallas2_batched_matches_xla(seed):
    """Batched v2 == per-frame XLA, including odd proto heights (row padding)."""
    import jax

    from tti.kernels.maskstats import instance_mask_stats_pallas2_batched

    rng = np.random.default_rng(200 + seed)
    b = 3
    frames = [_random_problem(rng, d=24, hm=40, wm=48) for _ in range(b)]
    protos = jnp.stack([f[0] for f in frames])
    coefs = jnp.stack([f[1] for f in frames])
    boxes = jnp.stack([f[2] for f in frames])
    valid = jnp.stack([f[3] for f in frames])
    got = instance_mask_stats_pallas2_batched(protos, coefs, boxes, valid,
                                              interpret=True)
    ref = jax.vmap(instance_mask_stats_xla)(protos, coefs, boxes, valid)
    for key in ("m00", "m10", "m01", "col_any", "bottom"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]), atol=1e-3,
            err_msg=f"{key} mismatch",
        )


def test_maskstats_pallas2_vmap_routes_to_batched(rng):
    """vmap of the dispatch wrapper must produce batched-kernel results."""
    import jax

    from tti.kernels.maskstats import _stats2_vmappable

    frames = [_random_problem(rng, d=16, hm=32, wm=40) for _ in range(2)]
    protos = jnp.stack([f[0] for f in frames])
    coefs = jnp.stack([f[1] for f in frames])
    boxes = jnp.stack([f[2] for f in frames])
    valid = jnp.stack([f[3] for f in frames])
    got = jax.vmap(_stats2_vmappable)(protos, coefs, boxes, valid)
    ref = jax.vmap(instance_mask_stats_xla)(protos, coefs, boxes, valid)
    for key in ("m00", "m10", "m01", "col_any", "bottom"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]), atol=1e-3,
            err_msg=f"{key} mismatch",
        )


def test_maskstats_bf16_logits_gate(rng, monkeypatch):
    """TTI_MASKSTATS_LOGITS halves the dense logits materialization in bf16;
    the stats must agree with f32 everywhere the logits aren't within bf16
    rounding of the 0-boundary (random weights put measure-zero mass there,
    so moments agree to the mask-boundary tolerance and col_any exactly).
    Defaults are per-path (binary f32, soft bf16 — the measured winners,
    STATUS.md round-5 item 3), so each side of the A/B pins the env."""
    from tti.kernels.maskstats import instance_mask_stats_soft

    protos, coefs, boxes, valid = _random_problem(rng)
    monkeypatch.setenv("TTI_MASKSTATS_LOGITS", "f32")
    ref = instance_mask_stats_xla(protos, coefs, boxes, valid)
    refs = instance_mask_stats_soft(protos, coefs, boxes, valid)
    monkeypatch.setenv("TTI_MASKSTATS_LOGITS", "bf16")
    got = instance_mask_stats_xla(protos, coefs, boxes, valid)
    gots = instance_mask_stats_soft(protos, coefs, boxes, valid)
    # Binary stats: identical masks except cells with |logit| < bf16 eps.
    for key in ("m00", "m10", "m01"):
        np.testing.assert_allclose(np.asarray(got[key]), np.asarray(ref[key]),
                                   rtol=5e-2, atol=2.0, err_msg=key)
    assert np.mean(np.asarray(got["col_any"]) == np.asarray(ref["col_any"])) > 0.99
    # Soft stats: probabilities round at bf16 resolution (~1/256).
    for key in ("m00s", "m10s", "m01s"):
        np.testing.assert_allclose(np.asarray(gots[key]), np.asarray(refs[key]),
                                   rtol=2e-2, atol=2.0, err_msg=key)
    bs_ref = np.asarray(refs["bottom_sub"])
    bs_got = np.asarray(gots["bottom_sub"])
    both = (bs_ref >= 0) & (bs_got >= 0)
    assert np.allclose(bs_got[both], bs_ref[both], atol=0.05)  # ~1/20 cell


SOFT_KEYS = ("m00", "m10", "m01", "col_any", "bottom",
             "m00s", "m10s", "m01s", "bottom_sub", "col_p")


@pytest.mark.parametrize("seed", [0, 1])
def test_maskstats_soft_pallas2_matches_xla(seed, monkeypatch):
    """Soft v2 kernel (fused occupancy stats) == dense soft XLA reference,
    including the sub-cell bottom crossing and probability moments.

    Pins TTI_MASKSTATS_LOGITS=f32: this is an exactness test of the math;
    the soft path's bf16 production default is covered by the gate test."""
    monkeypatch.setenv("TTI_MASKSTATS_LOGITS", "f32")
    from tti.kernels.maskstats import (
        instance_mask_stats_soft_pallas2, instance_mask_stats_soft_xla)

    rng = np.random.default_rng(300 + seed)
    protos, coefs, boxes, valid = _random_problem(rng)
    ref = instance_mask_stats_soft_xla(protos, coefs, boxes, valid)
    got = instance_mask_stats_soft_pallas2(protos, coefs, boxes, valid,
                                           interpret=True)
    for key in SOFT_KEYS:
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]), atol=2e-3,
            err_msg=f"{key} mismatch",
        )


def test_maskstats_soft_pallas2_invalid_zeroed(rng):
    """Folded-zero coefficients give sigmoid(0) = 0.5 — the kernel's explicit
    valid gate (boxes row 4) must still zero every statistic."""
    from tti.kernels.maskstats import instance_mask_stats_soft_pallas2

    protos, coefs, boxes, valid = _random_problem(rng)
    out = instance_mask_stats_soft_pallas2(protos, coefs, boxes,
                                           jnp.zeros_like(valid),
                                           interpret=True)
    for key in ("m00", "m00s", "col_p"):
        assert float(np.asarray(out[key]).sum()) == 0.0, key
    assert np.all(np.asarray(out["bottom_sub"]) == -1.0)


def test_maskstats_soft_pallas2_cross_tile_bottom(rng, monkeypatch):
    """A bottom row landing exactly on a tile's LAST row must read p_below
    from the NEXT tile's first row (the cross-tile carry). f32-pinned
    exactness test (see test_maskstats_soft_pallas2_matches_xla)."""
    monkeypatch.setenv("TTI_MASKSTATS_LOGITS", "f32")
    from tti.kernels.maskstats import (
        SOFT_ROW_TILE, instance_mask_stats_soft_pallas2,
        instance_mask_stats_soft_xla)

    hm, wm, nm = 4 * SOFT_ROW_TILE, 48, 32
    # Logits decay with y so the 0.5 crossing sits near y2; sweep y2 across a
    # tile boundary (rows SOFT_ROW_TILE-1 .. SOFT_ROW_TILE+1).
    protos = np.zeros((hm, wm, nm), np.float32)
    for r in range(hm):
        protos[r, :, 0] = 2.0 - 0.3 * r
    protos = jnp.asarray(protos)
    coefs = jnp.asarray(np.eye(1, nm, dtype=np.float32).repeat(3, 0))
    boxes = jnp.asarray(np.array(
        [[0, 0, wm, SOFT_ROW_TILE], [0, 0, wm, SOFT_ROW_TILE + 1],
         [0, 0, wm, hm]], np.float32))
    valid = jnp.ones(3, bool)
    ref = instance_mask_stats_soft_xla(protos, coefs, boxes, valid)
    got = instance_mask_stats_soft_pallas2(protos, coefs, boxes, valid,
                                           interpret=True)
    for key in SOFT_KEYS:
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]), atol=2e-3,
            err_msg=f"{key} mismatch",
        )


@pytest.mark.parametrize("seed", [0])
def test_maskstats_soft_pallas2_batched_and_vmap(seed, monkeypatch):
    """Batched soft v2 == per-frame soft XLA; the custom_vmap wrapper routes
    an enclosing vmap to the batched grid. f32-pinned exactness test."""
    monkeypatch.setenv("TTI_MASKSTATS_LOGITS", "f32")
    import jax

    from tti.kernels.maskstats import (
        _stats2s_vmappable, instance_mask_stats_soft_pallas2_batched,
        instance_mask_stats_soft_xla)

    rng = np.random.default_rng(400 + seed)
    frames = [_random_problem(rng, d=24, hm=40, wm=48) for _ in range(3)]
    protos = jnp.stack([f[0] for f in frames])
    coefs = jnp.stack([f[1] for f in frames])
    boxes = jnp.stack([f[2] for f in frames])
    valid = jnp.stack([f[3] for f in frames])
    ref = jax.vmap(instance_mask_stats_soft_xla)(protos, coefs, boxes, valid)
    got = instance_mask_stats_soft_pallas2_batched(protos, coefs, boxes, valid,
                                                   interpret=True)
    via_vmap = jax.vmap(_stats2s_vmappable)(protos, coefs, boxes, valid)
    for key in SOFT_KEYS:
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]), atol=2e-3,
            err_msg=f"{key} mismatch (batched)",
        )
        np.testing.assert_allclose(
            np.asarray(via_vmap[key]), np.asarray(ref[key]), atol=2e-3,
            err_msg=f"{key} mismatch (vmap route)",
        )
