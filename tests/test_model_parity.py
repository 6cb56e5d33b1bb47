"""Flax YOLOv8-seg numerical parity vs the torch oracle (SURVEY.md §4/§7 gate:
layer-by-layer numerics vs the PyTorch implementation on fixed inputs)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from tests.torch_ref import TorchYOLOv8Seg, randomize_running_stats
from tti.model.convert import convert_torch_state_dict, verify_tree_shapes
from tti.model.yolo import YOLOv8Seg, init_variables


def _build_pair(variant="n", nc=2, seed=0):
    torch.manual_seed(seed)
    tmodel = TorchYOLOv8Seg(variant=variant, nc=nc).eval()
    randomize_running_stats(tmodel, seed)
    variables = convert_torch_state_dict(tmodel.state_dict())
    jmodel = YOLOv8Seg(variant=variant, nc=nc, dtype=jnp.float32)
    return tmodel, jmodel, variables


@pytest.mark.parametrize("variant", ["n", "s"])
def test_converted_tree_matches_init_structure(variant):
    tmodel, jmodel, variables = _build_pair(variant)
    ref = init_variables(jmodel, image_size=64)
    problems = verify_tree_shapes(variables["params"], ref["params"])
    problems += verify_tree_shapes(variables["batch_stats"], ref["batch_stats"])
    assert problems == [], "\n".join(problems[:20])


@pytest.mark.parametrize("variant", ["n"])
def test_forward_parity(variant, rng):
    tmodel, jmodel, variables = _build_pair(variant)
    x = rng.normal(size=(1, 3, 128, 128)).astype(np.float32)

    with torch.no_grad():
        tbox, tcls, tcoef, tprotos = tmodel(torch.from_numpy(x))

    preds = jmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)

    for lvl in range(3):
        for name, j, t in (
            ("box", preds.box[lvl], tbox[lvl]),
            ("cls", preds.cls[lvl], tcls[lvl]),
            ("mcoef", preds.mcoef[lvl], tcoef[lvl]),
        ):
            tn = t.numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(
                np.asarray(j), tn, atol=2e-4, rtol=1e-3,
                err_msg=f"{name} level {lvl} mismatch",
            )
    np.testing.assert_allclose(
        np.asarray(preds.protos), tprotos.numpy().transpose(0, 2, 3, 1),
        atol=2e-4, rtol=1e-3, err_msg="protos mismatch",
    )


def test_bf16_forward_close_to_fp32(rng):
    """bfloat16 compute path stays within bf16 tolerance of fp32 (production dtype)."""
    tmodel, _, variables = _build_pair("n")
    x = rng.normal(size=(1, 128, 128, 3)).astype(np.float32)
    j32 = YOLOv8Seg(variant="n", nc=2, dtype=jnp.float32)
    jbf = YOLOv8Seg(variant="n", nc=2, dtype=jnp.bfloat16)
    p32 = j32.apply(variables, jnp.asarray(x), train=False)
    pbf = jbf.apply(variables, jnp.asarray(x), train=False)
    # Logit-scale agreement; bf16 has ~3 decimal digits.
    err = np.abs(np.asarray(pbf.cls[0], np.float32) - np.asarray(p32.cls[0]))
    scale = np.abs(np.asarray(p32.cls[0])).mean() + 1.0
    assert err.mean() / scale < 0.05
