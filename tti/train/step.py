"""Data-parallel training step (pjit/NamedSharding over a 'data' mesh).

New capability vs the reference (which only consumes offline-trained .pt
weights, reference: config.py:67): an in-framework trainer so stitch/fabric
models are produced on TPU. Parallelism is pure DP — the correct strategy for a
few-MB CNN (SURVEY.md §2 parallelism note): batch sharded over 'data', params
replicated, XLA inserts the gradient all-reduce over ICI from the output
shardings alone.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tti.model.yolo import REG_MAX, STRIDES, YOLOv8Seg
from tti.postprocess.decode import dfl_expectation, flatten_predictions, make_anchors
from tti.train.assigner import task_aligned_assign
from tti.train.losses import bbox_ciou, dfl_loss, seg_loss

Array = jax.Array

# YOLOv8 loss gains (box, cls, dfl, seg).
BOX_GAIN = 7.5
CLS_GAIN = 0.5
DFL_GAIN = 1.5
SEG_GAIN = 1.0  # applied on top of box gain in ultralytics; kept explicit here


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Array
    # Exponential moving average of params (the deployment weights — matches
    # the Ultralytics recipe, where the saved "best" model is the EMA).
    ema_params: Any = None


@flax.struct.dataclass
class Targets:
    """Fixed-size per-image ground truth (padded with valid=False)."""

    boxes: Array  # (B, G, 4) xyxy in model-input px
    classes: Array  # (B, G) int32
    masks: Array  # (B, G, Hm, Wm) binary at proto resolution
    valid: Array  # (B, G) bool


def create_train_state(
    model: YOLOv8Seg,
    variables: dict,
    learning_rate: float = 1e-3,
    weight_decay: float = 5e-4,
    total_steps: int | None = None,
    warmup_steps: int | None = None,
) -> tuple[TrainState, optax.GradientTransformation]:
    """Optimizer: AdamW under global-norm clipping. With ``total_steps`` the
    LR follows linear warmup -> cosine decay to 1% of peak (the standard
    detection recipe; Ultralytics uses warmup_epochs=3 + cosine/linear decay);
    without it the LR is constant (smoke tests, tiny runs)."""
    if total_steps is not None:
        warmup = warmup_steps if warmup_steps is not None else max(
            20, min(1000, total_steps // 20)
        )
        # Tiny runs (smoke tests): warmup must leave a positive cosine phase
        # (optax requires decay_steps - warmup_steps > 0, so warmup < total).
        warmup = min(warmup, max(total_steps // 5, 1), total_steps - 1)
        warmup = max(warmup, 0)
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=learning_rate * 1e-2,
            peak_value=learning_rate,
            warmup_steps=warmup,
            decay_steps=total_steps,
            end_value=learning_rate * 1e-2,
        )
    else:
        schedule = learning_rate
    tx = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.adamw(schedule, weight_decay=weight_decay),
    )
    # EMA starts equal to params but must be a DISTINCT buffer tree: the
    # jitted step donates the whole state, and aliased params/ema leaves would
    # be donated twice (XLA: "Attempt to donate the same buffer twice").
    ema0 = jax.tree_util.tree_map(lambda p: jnp.array(p, copy=True),
                                  variables["params"])
    return (
        TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
            ema_params=ema0,
        ),
        tx,
    )


def _loss_single(
    raw_flat: tuple[Array, Array, Array],
    protos: Array,
    anchors: Array,
    stride_per_anchor: Array,
    targets_boxes: Array,
    targets_classes: Array,
    targets_masks: Array,
    targets_valid: Array,
    input_hw: tuple[int, int],
    seg_class_gains: tuple[float, ...] | None = None,
) -> dict[str, Array]:
    """Per-image YOLOv8-seg loss."""
    box_logits, cls_logits, coefs = raw_flat  # (A, 64), (A, nc), (A, nm)
    probs = jax.nn.sigmoid(cls_logits)

    ltrb_grid = dfl_expectation(box_logits)  # (A, 4) grid units
    ltrb_px = ltrb_grid * stride_per_anchor[:, None]
    cx, cy = anchors[:, 0], anchors[:, 1]
    pred_boxes = jnp.stack(
        [cx - ltrb_px[:, 0], cy - ltrb_px[:, 1], cx + ltrb_px[:, 2], cy + ltrb_px[:, 3]],
        axis=-1,
    )

    assign = task_aligned_assign(
        pred_boxes, probs, anchors, targets_boxes, targets_classes, targets_valid
    )
    pos = assign["pos_mask"]
    tscores = assign["target_scores"]
    tboxes = assign["target_boxes"]

    score_sum = jnp.maximum(jnp.sum(tscores), 1.0)

    # Classification: BCE against soft aligned targets, over ALL anchors.
    cls_bce = optax.sigmoid_binary_cross_entropy(cls_logits, tscores)
    loss_cls = jnp.sum(cls_bce) / score_sum

    # Box: (1 - CIoU) weighted by target score, over positives. The weight is
    # floored for positives so geometry keeps training while classification
    # scores bootstrap from cold start (zero scores would otherwise zero the
    # box/DFL gradients and stall the alignment feedback loop).
    w = jnp.sum(tscores, axis=-1)  # (A,)
    w = jnp.where(pos, jnp.maximum(w, 0.05), 0.0)
    ciou = bbox_ciou(pred_boxes, tboxes)
    loss_box = jnp.sum(jnp.where(pos, (1.0 - ciou) * w, 0.0)) / score_sum

    # DFL: target ltrb in grid units.
    t_ltrb = jnp.stack(
        [
            (cx - tboxes[:, 0]) / stride_per_anchor,
            (cy - tboxes[:, 1]) / stride_per_anchor,
            (tboxes[:, 2] - cx) / stride_per_anchor,
            (tboxes[:, 3] - cy) / stride_per_anchor,
        ],
        axis=-1,
    )
    dfl = dfl_loss(box_logits.reshape(-1, 4, REG_MAX), t_ltrb)
    loss_dfl = jnp.sum(jnp.where(pos, dfl * w, 0.0)) / score_sum

    # Segmentation: per-positive mask BCE vs assigned GT mask.
    hm, wm = protos.shape[0], protos.shape[1]
    scale = jnp.array(
        [wm / input_hw[1], hm / input_hw[0], wm / input_hw[1], hm / input_hw[0]], jnp.float32
    )
    # Optional per-class seg weighting: positives assigned to a GT of class c
    # weigh gains[c] (stitch masks are the measured product output; fabric is
    # near-saturated — see TRAINING.md). gains=None keeps the plain recipe.
    anchor_w = None
    if seg_class_gains is not None:
        gains = jnp.asarray(seg_class_gains, jnp.float32)
        # Per-GT gain (a G-row gather is trivial), then a one-hot contraction
        # to anchors — avoiding the (A,)-sized tiny-table gather the train-step
        # profile showed lowering to a serialized scalar loop.
        gt_gains = gains[jnp.clip(targets_classes, 0)]  # (G,)
        anchor_w = jnp.einsum(
            "ag,g->a",
            jax.nn.one_hot(assign["assigned_gt"], targets_classes.shape[0],
                           dtype=jnp.float32),
            gt_gains,
        )
    loss_seg = seg_loss(
        coefs, protos, targets_masks, targets_boxes * scale, assign["assigned_gt"], pos,
        anchor_weights=anchor_w,
    )

    return {
        "cls": loss_cls,
        "box": loss_box,
        "dfl": loss_dfl,
        "seg": loss_seg,
    }


def make_train_step(
    model: YOLOv8Seg,
    tx: optax.GradientTransformation,
    input_hw: tuple[int, int],
    mesh: Mesh | None = None,
    ema_decay: float = 0.999,
    ema_tau: float = 2000.0,
    seg_class_gains: list[float] | tuple[float, ...] | None = None,
):
    """Build the jitted DP train step.

    With a mesh: donate state, shard the batch on 'data', replicate state via
    out_shardings — XLA inserts the gradient all-reduce.

    seg_class_gains: optional per-class seg-loss gains (index = class id);
    None keeps the plain YOLOv8 recipe. `tti train --stitch-seg-gain` sets it.
    """
    gains = tuple(seg_class_gains) if seg_class_gains is not None else None

    def loss_fn(params, batch_stats, images, targets: Targets):
        raw, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
        )
        # Mixed precision: with a bf16-compute model the trunk/head run bf16
        # (params stay f32 via param_dtype; the cast's transpose returns f32
        # grads), but the LOSS math — TAL alignment, CIoU, DFL expectations,
        # BCE log-space — runs f32. The head exits are the small tensors
        # ((B,A,64/nc/nm) + protos), so the upcast is cheap; the HBM/MXU win
        # lives in the trunk activations.
        raw = jax.tree_util.tree_map(
            lambda t: t.astype(jnp.float32) if t.dtype == jnp.bfloat16 else t,
            raw,
        )
        box_f, cls_f, coef_f, level_hw = flatten_predictions(raw)
        anchors, stride_per_anchor = make_anchors(level_hw, STRIDES)

        per_image = jax.vmap(
            lambda bf, cf, mf, pr, tb, tc, tm, tv: _loss_single(
                (bf, cf, mf), pr, anchors, stride_per_anchor, tb, tc, tm, tv,
                input_hw, seg_class_gains=gains,
            )
        )(
            box_f, cls_f, coef_f, raw.protos,
            targets.boxes, targets.classes, targets.masks, targets.valid,
        )
        losses = {k: jnp.mean(v) for k, v in per_image.items()}
        total = (
            BOX_GAIN * losses["box"]
            + CLS_GAIN * losses["cls"]
            + DFL_GAIN * losses["dfl"]
            + BOX_GAIN * SEG_GAIN * losses["seg"]
        )
        return total, (losses, updates["batch_stats"])

    def step_fn(state: TrainState, images: Array, targets: Targets):
        (total, (losses, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, images, targets
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # EMA with the Ultralytics ramp: d = decay*(1 - exp(-step/tau)) — near
        # zero early (EMA tracks the fast-moving young model), saturating to
        # `ema_decay` once training stabilizes.
        step1 = state.step + 1
        d = ema_decay * (1.0 - jnp.exp(-step1.astype(jnp.float32) / ema_tau))
        ema_src = state.ema_params if state.ema_params is not None else state.params
        new_ema = jax.tree_util.tree_map(
            lambda e, p: e * d + p * (1.0 - d), ema_src, new_params
        )
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=step1,
            ema_params=new_ema,
        )
        return new_state, {"total": total, **losses}

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        donate_argnums=(0,),
        # Pytree prefixes: state replicated, image batch + every target leaf
        # sharded on 'data'.
        in_shardings=(repl, data, data),
        out_shardings=(repl, repl),
    )


# Backwards-compatible aliases used by __init__.
train_step = make_train_step
