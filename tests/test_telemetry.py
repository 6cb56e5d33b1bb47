"""Static-budget overflow telemetry (VERDICT r1 item 5).

The fixed-shape design caps NMS candidates (nms_pre_topk), detections entering
mask statistics (max_stats_dets) and stitch rows (max_stitches). These caps are
exact only under budget; over-budget frames drop the lowest-score rows. The
telemetry counts make that VISIBLE: in-graph true counts -> PipelineOutputs ->
orchestrator warning log."""

import logging

import numpy as np
import pytest

import jax.numpy as jnp

from tti.core.config import MeasureConfig, ModelConfig
from tti.measure.pipeline import prepare_frame_inputs
from tti.parallel.runtime import PipelineOutputs
from tti.postprocess.decode import Detections
from tti.postprocess.nms import raw_candidate_counts
from tti.preprocess.letterbox import letterbox_spec


def test_raw_candidate_counts_exact():
    from tti.model.yolo import RawPredictions, REG_MAX

    b = 2
    hw = ((8, 8), (4, 4), (2, 2))  # 84 anchors
    nc, nm = 2, 32
    cls = []
    # Frame 0: exactly 10 anchors above conf=0.2 (logit > logit(0.2) ~= -1.386);
    # frame 1: none.
    per_level = [64, 16, 4]
    lift = 10
    for (h, w), n in zip(hw, per_level):
        t = np.full((b, h, w, nc), -8.0, np.float32)
        flat = t[0].reshape(-1, nc)
        take = min(lift, n)
        flat[:take, 0] = 3.0
        lift -= take
        cls.append(jnp.asarray(t))
    raw = RawPredictions(
        box=tuple(jnp.zeros((b, h, w, 4 * REG_MAX), jnp.float32) for h, w in hw),
        cls=tuple(cls),
        mcoef=tuple(jnp.zeros((b, h, w, nm), jnp.float32) for h, w in hw),
        protos=jnp.zeros((b, 4, 4, nm), jnp.float32),
    )
    counts = np.asarray(raw_candidate_counts(raw, 0.2))
    assert counts.tolist() == [10, 0]


def _dets(n_stitch: int, n_fabric: int, d: int = 16) -> Detections:
    boxes = np.zeros((d, 4), np.float32)
    classes = np.full((d,), -1, np.int32)
    scores = np.zeros((d,), np.float32)
    valid = np.zeros((d,), bool)
    for i in range(n_stitch + n_fabric):
        boxes[i] = [10 + 6 * i, 10, 20 + 6 * i, 20]
        classes[i] = 0 if i < n_stitch else 1
        scores[i] = 0.9 - 0.01 * i
        valid[i] = True
    return Detections(
        boxes=jnp.asarray(boxes), scores=jnp.asarray(scores),
        classes=jnp.asarray(classes), coefs=jnp.zeros((d, 8), jnp.float32),
        valid=jnp.asarray(valid),
    )


def test_prepare_frame_inputs_counts_over_budget():
    """7 stitches + 2 fabric with max_stitches=4: the counts report the TRUE
    totals even though the stitch set is capped at 4 rows."""
    spec = letterbox_spec(48, 64, 64)
    protos = jnp.zeros((16, 16, 8), jnp.float32)
    dets = _dets(n_stitch=7, n_fabric=2)
    stitches, envelope, fabric_any, counts = prepare_frame_inputs(
        dets, protos, spec, stitch_class_id=0, fabric_class_id=1,
        roi_bounds=None, max_stitches=4, max_stats_dets=8,
    )
    assert int(counts["n_stitches_raw"]) == 7
    assert int(counts["n_roi_valid"]) == 9
    assert stitches.valid.shape == (4,)
    assert int(stitches.valid.sum()) == 4  # capped, top-score rows kept


def test_budget_overflow_flags_and_orchestrator_logging(caplog):
    mcfg = ModelConfig(nms_pre_topk=256, max_detections=200)
    cfg = MeasureConfig(max_stitches=4, max_stats_dets=8)
    outs = PipelineOutputs(
        boxes_frame=np.zeros((1, 4, 4)), scores=np.zeros((1, 4)),
        classes=np.zeros((1, 4)), valid=np.zeros((1, 4), bool),
        masks=None, measurements=None,
        telemetry={
            "n_candidates": np.array([300], np.int32),
            # 200 POST-NMS survivors = the max_det cap saturated. (A high
            # pre-NMS candidate count alone must NOT flag max_detections —
            # suppressed candidates are not drops.)
            "n_valid": np.array([200], np.int32),
            "n_roi_valid": np.array([9], np.int32),
            "n_stitches_raw": np.array([7], np.int32),
        },
    )
    flags = outs.budget_overflows(mcfg, cfg)
    assert bool(flags["nms_pre_topk"][0])
    assert bool(flags["max_detections"][0])
    assert bool(flags["max_stats_dets"][0])
    assert bool(flags["max_stitches"][0])

    busy = PipelineOutputs(
        boxes_frame=np.zeros((1, 4, 4)), scores=np.zeros((1, 4)),
        classes=np.zeros((1, 4)), valid=np.zeros((1, 4), bool),
        masks=None, measurements=None,
        telemetry={"n_candidates": np.array([300], np.int32),
                   "n_valid": np.array([40], np.int32)},
    )
    # busy frame, NMS reduced 300 candidates to 40: nothing was dropped at
    # the max_det stage -> no false operator warning.
    assert not busy.budget_overflows(mcfg, cfg)["max_detections"][0]

    under = PipelineOutputs(
        boxes_frame=np.zeros((1, 4, 4)), scores=np.zeros((1, 4)),
        classes=np.zeros((1, 4)), valid=np.zeros((1, 4), bool),
        masks=None, measurements=None,
        telemetry={"n_candidates": np.array([12], np.int32)},
    )
    flags = under.budget_overflows(mcfg, cfg)
    assert not flags["nms_pre_topk"][0]
    assert "max_stitches" not in flags  # no measure counts present

    # No telemetry at all (older callers) -> empty dict, no crash.
    none = PipelineOutputs(
        boxes_frame=np.zeros((1, 4, 4)), scores=np.zeros((1, 4)),
        classes=np.zeros((1, 4)), valid=np.zeros((1, 4), bool),
        masks=None, measurements=None,
    )
    assert none.budget_overflows(mcfg, cfg) == {}


def test_pipeline_emits_telemetry(rng):
    """The jitted step surfaces telemetry end-to-end (counts are zero with
    random weights, but present and well-shaped)."""
    from tti.model.yolo import create_model, init_variables
    from tti.parallel.runtime import InspectionPipeline

    cfg = ModelConfig(variant="n", num_classes=2, image_size=64, dtype="float32",
                      max_detections=8)
    model = create_model("n", nc=2)
    pipeline = InspectionPipeline(
        model_cfg=cfg, variables=init_variables(model, image_size=32),
        frame_hw=(48, 64), model=model,
    )
    frames = rng.integers(0, 255, size=(2, 48, 64, 3), dtype=np.uint8)
    outs = pipeline.process_batch(frames)
    assert outs.telemetry is not None
    assert outs.telemetry["n_candidates"].shape == (2,)
    assert outs.telemetry["n_candidates"].dtype == np.int32
