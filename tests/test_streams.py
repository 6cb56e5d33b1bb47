"""Multi-stream runtime test: 4 synthetic cameras through one pipeline."""

import numpy as np
import pytest

from tti.app.sources import SyntheticSource
from tti.core.config import MeasureConfig, ModelConfig
from tti.model.yolo import create_model, init_variables
from tti.parallel.runtime import InspectionPipeline
from tti.parallel.streams import MultiStreamRunner

FRAME_HW = (48, 64)


def test_four_stream_line():
    cfg = ModelConfig(variant="n", num_classes=2, image_size=64, dtype="float32",
                      max_detections=8)
    model = create_model("n", nc=2)
    pipeline = InspectionPipeline(
        model_cfg=cfg, variables=init_variables(model, image_size=64),
        frame_hw=FRAME_HW, model=model, measure_cfg=MeasureConfig(max_stitches=8),
    )
    sources = [SyntheticSource(*FRAME_HW, seed=i) for i in range(4)]
    runner = MultiStreamRunner(pipeline, sources, FRAME_HW)
    runner.start()
    try:
        assert runner.wait_for_frames(timeout_s=10.0)
        results = runner.run(num_batches=3)
        assert len(results) == 3
        outs, _ = results[-1]
        assert outs.boxes_frame.shape == (4, 8, 4)
        assert all(w.stats.captured > 0 for w in runner.workers)

        # Pipelined (async host-fed) stepping: first call primes the double
        # buffer, each later call returns the PREVIOUS batch, flush drains.
        assert runner.step_pipelined() is None
        out1 = runner.step_pipelined()
        assert out1 is not None
        outs1, res1 = out1
        assert outs1.boxes_frame.shape == (4, 8, 4)
        assert res1 == []  # no calibration -> detection-only, no measurements
        out2 = runner.flush()
        assert out2 is not None
        assert runner.flush() is None  # nothing left in flight
        assert runner.batches == 3 + 2  # run(3) + two materialized pipelined
    finally:
        runner.stop()
