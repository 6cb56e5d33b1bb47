"""Training stack tests: assigner properties, losses, one DP train step."""

import os
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tti.model.yolo import REG_MAX, create_model, init_variables
from tti.parallel.mesh import create_mesh, replicate, shard_batch
from tti.train.assigner import pairwise_iou, task_aligned_assign
from tti.train.losses import bbox_ciou, dfl_loss
from tti.train.step import Targets, create_train_state, make_train_step


def test_pairwise_iou():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [100, 100, 110, 110]], np.float32)
    iou = np.asarray(pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(iou[0], [1.0, 25 / 175, 0.0], atol=1e-5)


def test_ciou_perfect_and_disjoint():
    a = jnp.asarray(np.array([[0, 0, 10, 10]], np.float32))
    assert float(bbox_ciou(a, a)[0]) == pytest.approx(1.0, abs=1e-5)
    b = jnp.asarray(np.array([[100, 100, 110, 110]], np.float32))
    assert float(bbox_ciou(a, b)[0]) < 0.0  # disjoint -> negative (center penalty)


def test_dfl_loss_minimized_at_target():
    """Loss at a one-hot-correct distribution is lower than at a wrong one."""
    target = jnp.asarray(np.array([[3.0, 5.0, 2.0, 7.0]], np.float32))
    logits_good = np.full((1, 4, REG_MAX), -10.0, np.float32)
    for i, t in enumerate([3, 5, 2, 7]):
        logits_good[0, i, t] = 10.0
    logits_bad = np.roll(logits_good, 4, axis=-1)
    good = float(dfl_loss(jnp.asarray(logits_good), target)[0])
    bad = float(dfl_loss(jnp.asarray(logits_bad), target)[0])
    assert good < 0.01 < bad


def test_seg_loss_chunked_matches_unchunked(rng):
    """The rematerialized chunked seg-loss path (hi-res proto grids) must be
    numerically identical to the single-einsum path — value AND gradients
    (it only reorders independent per-anchor work into lax.map chunks)."""
    from tti.train.losses import seg_loss

    a, g, nm, hm = 96, 5, 8, 40
    coefs = jnp.asarray(rng.normal(size=(a, nm)), jnp.float32)
    protos = jnp.asarray(rng.normal(size=(hm, hm, nm)), jnp.float32)
    gt_masks = jnp.asarray(rng.integers(0, 2, size=(g, hm, hm)), jnp.float32)
    boxes = jnp.asarray(
        np.stack([np.full(g, 2.0), np.full(g, 3.0),
                  rng.uniform(20, hm, g), rng.uniform(20, hm, g)], -1),
        jnp.float32,
    )
    assigned = jnp.asarray(rng.integers(0, g, size=(a,)), jnp.int32)
    pos = jnp.asarray(rng.uniform(size=(a,)) < 0.3)

    def run(chunk):
        def f(cf, pr):
            return seg_loss(cf, pr, gt_masks, boxes, assigned, pos, chunk=chunk)
        val, grads = jax.value_and_grad(f, argnums=(0, 1))(coefs, protos)
        return val, grads

    # P = max(64, 10*g) = 64 here; chunk=16 -> 4 rematerialized chunks.
    v0, g0 = run(None)
    v1, g1 = run(16)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)
    for ga, gb in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-5,
                                   atol=1e-7)


def test_assigner_assigns_inside_anchors():
    """Anchors inside a GT box with high predicted IoU+score become positives."""
    anchors = np.stack(np.meshgrid(np.arange(8.0) * 8 + 4, np.arange(8.0) * 8 + 4),
                       -1).reshape(-1, 2).astype(np.float32)
    A = anchors.shape[0]
    gt = np.array([[8, 8, 40, 40]], np.float32)
    # Perfect predictions: every anchor predicts the GT box, prob 0.9 class 0.
    pred_boxes = np.tile(gt, (A, 1)).astype(np.float32)
    probs = np.full((A, 2), 0.05, np.float32)
    probs[:, 0] = 0.9
    out = task_aligned_assign(
        jnp.asarray(pred_boxes), jnp.asarray(probs), jnp.asarray(anchors),
        jnp.asarray(gt), jnp.asarray([0], jnp.int32), jnp.asarray([True]),
    )
    pos = np.asarray(out["pos_mask"])
    inside = ((anchors[:, 0] >= 8) & (anchors[:, 0] < 40)
              & (anchors[:, 1] >= 8) & (anchors[:, 1] < 40))
    assert pos.sum() == min(10, inside.sum())  # topk=10 candidates
    assert np.all(inside[pos])  # positives only inside the box
    ts = np.asarray(out["target_scores"])
    assert ts[pos, 0].max() <= 1.0 and ts[pos, 0].min() > 0.0
    assert ts[~pos].sum() == 0.0


def test_assigner_no_valid_gt():
    anchors = np.array([[4.0, 4.0]], np.float32)
    out = task_aligned_assign(
        jnp.asarray(np.array([[0, 0, 8, 8]], np.float32)),
        jnp.asarray(np.array([[0.9, 0.1]], np.float32)),
        jnp.asarray(anchors),
        jnp.asarray(np.zeros((2, 4), np.float32)),
        jnp.asarray(np.zeros(2, np.int32)),
        jnp.asarray(np.zeros(2, bool)),
    )
    assert not bool(np.asarray(out["pos_mask"]).any())


def test_train_step_decreases_loss_dp_mesh(rng):
    """One compiled DP step on the 8-device mesh; a few steps reduce the loss."""
    imgsz = 32
    mesh = create_mesh()
    model = create_model("n", nc=2)
    variables = init_variables(model, image_size=imgsz)
    state, tx = create_train_state(model, variables, learning_rate=5e-3)
    step = make_train_step(model, tx, (imgsz, imgsz), mesh=mesh)

    batch, max_gt = 8, 2
    hm = imgsz // 4
    images = rng.uniform(0, 1, size=(batch, imgsz, imgsz, 3)).astype(np.float32)
    boxes = np.tile(np.array([[4, 4, 24, 24], [8, 8, 28, 28]], np.float32), (batch, 1, 1))
    targets = Targets(
        boxes=jnp.asarray(boxes),
        classes=jnp.asarray(np.zeros((batch, max_gt), np.int32)),
        masks=jnp.asarray((rng.uniform(size=(batch, max_gt, hm, hm)) > 0.5).astype(np.float32)),
        valid=jnp.ones((batch, max_gt), bool),
    )
    with mesh:
        state = replicate(mesh, state)
        images_d = shard_batch(mesh, jnp.asarray(images))
        targets_d = shard_batch(mesh, targets)
        losses = []
        for _ in range(5):
            state, metrics = step(state, images_d, targets_d)
            losses.append(float(np.asarray(metrics["total"])))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert int(np.asarray(state.step)) == 5


def test_checkpoint_roundtrip(tmp_path, rng):
    from tti.train.checkpoint import latest_checkpoint, restore_train_state, save_train_state

    model = create_model("n", nc=2)
    variables = init_variables(model, image_size=32)
    state, _ = create_train_state(model, variables)
    path = save_train_state(state, str(tmp_path / "ckpts"), step=0)
    found = latest_checkpoint(str(tmp_path / "ckpts"))
    assert found is not None and os.path.basename(found).startswith("step_0")
    restored = restore_train_state(path, state)
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_step_bf16_mixed_precision(rng):
    """bf16-compute training (round-5 `tti train --dtype bf16` default):
    params/grads/optimizer stay f32, loss math runs f32 on upcast head exits,
    first-step loss lands within bf16 rounding of the f32-compute model, and
    a few steps still reduce it."""
    imgsz = 32
    states = {}
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = create_model("n", nc=2, dtype=dt)
        # Fresh per-model init (same seed -> same f32 params; the f32 step
        # DONATES its state, so sharing one tree would hand the bf16 run
        # deleted buffers).
        variables = init_variables(model, image_size=imgsz)
        state, tx = create_train_state(model, variables, learning_rate=5e-3)
        step = make_train_step(model, tx, (imgsz, imgsz))
        states[name] = (state, step)

    batch, max_gt = 4, 2
    hm = imgsz // 4
    images = jnp.asarray(
        rng.uniform(0, 1, size=(batch, imgsz, imgsz, 3)).astype(np.float32))
    boxes = np.tile(np.array([[4, 4, 24, 24], [8, 8, 28, 28]], np.float32),
                    (batch, 1, 1))
    targets = Targets(
        boxes=jnp.asarray(boxes),
        classes=jnp.asarray(np.zeros((batch, max_gt), np.int32)),
        masks=jnp.asarray((rng.uniform(size=(batch, max_gt, hm, hm)) > 0.5
                           ).astype(np.float32)),
        valid=jnp.ones((batch, max_gt), bool),
    )

    totals = {}
    for name, (state, step) in states.items():
        losses = []
        for _ in range(4):
            state, metrics = step(state, images, targets)
            losses.append(float(np.asarray(metrics["total"])))
        totals[name] = losses
        leaves = jax.tree_util.tree_leaves(state.params)
        assert all(p.dtype == jnp.float32 for p in leaves), name
        assert all(np.isfinite(losses)), name
        assert losses[-1] < losses[0], name
    # Same init, same batch: first-step totals agree to bf16 activation noise.
    rel = abs(totals["bf16"][0] - totals["f32"][0]) / totals["f32"][0]
    assert rel < 0.05, (totals["f32"][0], totals["bf16"][0])
