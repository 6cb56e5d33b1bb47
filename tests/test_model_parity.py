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


@pytest.mark.parametrize("variant", ["n", "s", "m"])
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


def test_mask_assembly_iou_parity(rng):
    """BASELINE headline: assembled instance masks match the torch pipeline at
    IoU >= 0.999. Same converted weights, same input, masks assembled from each
    framework's own protos+coefficients with identical crop/threshold rules."""
    import torch.nn.functional as F

    from tti.postprocess.masks import assemble_masks, mask_iou

    tmodel, jmodel, variables = _build_pair("n")
    x = rng.normal(size=(1, 3, 128, 128)).astype(np.float32) * 0.5

    with torch.no_grad():
        _, _, tcoef, tprotos = tmodel(torch.from_numpy(x))
    preds = jmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)

    # Take coefficient vectors from a handful of anchor positions at level 0
    # and a synthetic box per instance (box choice is shared, so this isolates
    # the proto product + sigmoid + crop + threshold chain).
    n = 6
    hm = wm = 32  # protos at input/4
    coords = [(1 + 2 * i, 2 + 2 * i) for i in range(n)]  # level-0 grid is 16x16
    tco = torch.stack([tcoef[0][0, :, r, c] for r, c in coords])  # (n, 32)
    jco = jnp.stack([preds.mcoef[0][0, r, c] for r, c in coords])
    boxes = np.array([[8 + 2 * i, 8, 100 - 3 * i, 120] for i in range(n)], np.float32)
    valid = np.ones(n, bool)

    # torch reference mask product (sigmoid(coef @ protos) cropped, > 0.5).
    tp = tprotos[0].reshape(32, -1)  # (32, hm*wm)
    tmask = torch.sigmoid(tco @ tp).reshape(n, hm, wm).numpy()
    scale = np.array([wm / 128, hm / 128, wm / 128, hm / 128], np.float32)
    bg = boxes * scale
    ys, xs = np.mgrid[0:hm, 0:wm]
    inside = (
        (xs[None] >= bg[:, 0, None, None]) & (xs[None] < bg[:, 2, None, None])
        & (ys[None] >= bg[:, 1, None, None]) & (ys[None] < bg[:, 3, None, None])
    )
    tmask = (tmask > 0.5) & inside

    jmask = np.asarray(
        assemble_masks(preds.protos[0], jco, jnp.asarray(boxes), jnp.asarray(valid),
                       (128, 128))
    ) > 0.5

    for i in range(n):
        if tmask[i].sum() == 0 and jmask[i].sum() == 0:
            continue
        iou = float(mask_iou(jnp.asarray(jmask[i]), jnp.asarray(tmask[i])))
        assert iou >= 0.999, f"instance {i}: mask IoU {iou}"


def test_s2d_stem_exact(rng):
    """Space-to-depth stem rewrite is numerically exact vs the k3/s2 stem."""
    from tti.model.convert import stem_to_s2d

    _, jmodel, variables = _build_pair("n")
    s2d_vars = stem_to_s2d(variables)
    jmodel_s2d = YOLOv8Seg(variant="n", nc=2, dtype=jnp.float32, s2d_stem=True)

    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    a = jmodel.apply(variables, x, train=False)
    b = jmodel_s2d.apply(s2d_vars, x, train=False)
    for lvl in range(3):
        np.testing.assert_allclose(np.asarray(b.cls[lvl]), np.asarray(a.cls[lvl]),
                                   atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(b.protos), np.asarray(a.protos),
                               atol=1e-4, rtol=1e-4)


def test_fused_head_entry_exact(rng):
    """Fused head-entry conv (cv2/cv3/cv4 level-0 convs stacked) is exact."""
    from tti.model.convert import fuse_head_entries

    _, jmodel, variables = _build_pair("n")
    fused_vars = fuse_head_entries(variables)
    jmodel_f = YOLOv8Seg(variant="n", nc=2, dtype=jnp.float32, fused_head_entry=True)

    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    a = jmodel.apply(variables, x, train=False)
    b = jmodel_f.apply(fused_vars, x, train=False)
    for lvl in range(3):
        np.testing.assert_allclose(np.asarray(b.box[lvl]), np.asarray(a.box[lvl]),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(b.cls[lvl]), np.asarray(a.cls[lvl]),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(b.mcoef[lvl]), np.asarray(a.mcoef[lvl]),
                                   atol=1e-4, rtol=1e-4)


def test_folded_bn_exact(rng):
    """BatchNorm folding into conv weights+bias is exact at inference."""
    from tti.model.convert import fold_batchnorm

    _, jmodel, variables = _build_pair("n")
    folded_vars = fold_batchnorm(variables)
    assert "batch_stats" not in folded_vars
    jmodel_f = YOLOv8Seg(variant="n", nc=2, dtype=jnp.float32, folded_bn=True)

    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    a = jmodel.apply(variables, x, train=False)
    b = jmodel_f.apply(folded_vars, x, train=False)
    for lvl in range(3):
        np.testing.assert_allclose(np.asarray(b.cls[lvl]), np.asarray(a.cls[lvl]),
                                   atol=5e-4, rtol=5e-4)
        np.testing.assert_allclose(np.asarray(b.box[lvl]), np.asarray(a.box[lvl]),
                                   atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(b.protos), np.asarray(a.protos),
                               atol=5e-4, rtol=5e-4)
