"""Orchestrator logic tests: fusion, gating, buffering, integration, daily reset
(reference semantics: main.py:104-125,209-314) — driven with a fake device
pipeline and fake services, no model compile."""

import numpy as np
import pytest
import random

import jax.numpy as jnp

from tti.core.config import AppConfig, DatabaseConfig
from tti.app.orchestrator import Orchestrator
from tti.app.sources import SyntheticSource
from tti.measure.pipeline import FrameMeasurement
from tti.parallel.runtime import PipelineOutputs


class FakePipeline:
    """Produces scripted per-frame (edge, width) measurements."""

    def __init__(self, script):
        self.script = list(script)
        self.roi_bounds = None

    def process_batch(self, frames):
        edge, width = self.script.pop(0) if self.script else (np.nan, np.nan)
        meas = FrameMeasurement(
            edge_distance_mm=jnp.asarray([edge], jnp.float32),
            stitch_width_mm=jnp.asarray([width], jnp.float32),
            raw_edge_mm=jnp.asarray([edge], jnp.float32),
            raw_width_mm=jnp.asarray([width], jnp.float32),
            n_dist=jnp.asarray([5], jnp.int32),
            n_width=jnp.asarray([5], jnp.int32),
            n_stitches=jnp.asarray([5], jnp.int32),
            fabric_detected=jnp.asarray([not np.isnan(edge)]),
        )
        d = 8
        return PipelineOutputs(
            boxes_frame=np.zeros((1, d, 4), np.float32),
            scores=np.zeros((1, d), np.float32),
            classes=np.full((1, d), -1, np.int32),
            valid=np.zeros((1, d), bool),
            masks=None,
            measurements=meas,
        )


class FakeSerial:
    def __init__(self, counts):
        self.counts = list(counts)

    def get_stitch_count(self):
        return self.counts.pop(0) if self.counts else 0

    def stop(self):
        pass


def _orch(tmp_path, script, counts, seed=0):
    cfg = AppConfig().replace(
        database=DatabaseConfig(backend="sqlite", table="t",
                                sqlite_path=str(tmp_path / "o.db"))
    )
    cfg = cfg.replace(runtime=cfg.runtime.__class__(
        save_dir=str(tmp_path / "ann"), inference_interval_s=0.0))
    pipeline = FakePipeline(script)
    source = SyntheticSource(height=32, width=48, count=100)
    orch = Orchestrator(cfg, pipeline, source, rng=random.Random(seed),
                        save_annotated=False)
    orch.serial = FakeSerial(counts)
    from tti.services.database import DatabaseHandler

    db = DatabaseHandler(cfg.database)
    assert db.connect()
    orch.db = db
    return orch


def test_valid_measurement_integrates_distance(tmp_path):
    # raw edge 7.8 + offset(-1.3) = 6.5 (valid 3.5..8); width 4.9 - 1.0 = 3.9
    # (valid 2.8..4.15). stitch delta 10 -> moved = 10 * 3.9 = 39mm.
    orch = _orch(tmp_path, [(7.8, 4.9)], [10])
    ok, frame = orch.source.read()
    result = orch.process_once(frame)
    assert result["valid"]
    assert result["seam_mm"] == pytest.approx(6.5, abs=1e-5)
    assert result["width_mm"] == pytest.approx(3.9, abs=1e-5)
    assert result["moved_mm"] == pytest.approx(39.0, abs=1e-3)
    assert result["total_mm"] == pytest.approx(39.0, abs=1e-3)
    assert result["inserted"]
    latest = orch.db.get_latest_measurement()
    assert latest["total_distance"] == pytest.approx(39.0, abs=0.1)


def test_invalid_measurement_uses_buffered_average(tmp_path):
    # Out-of-range seam (20mm) -> falls back to the seeded buffer averages
    # 6.5 / 3.9 with bounded jitter (reference: main.py:183-184,270-278).
    orch = _orch(tmp_path, [(20.0, 4.9)], [5])
    ok, frame = orch.source.read()
    result = orch.process_once(frame)
    assert result["valid"]
    assert abs(result["seam_mm"] - 6.5) <= 0.1 + 1e-9
    assert abs(result["width_mm"] - 3.9) <= 0.08 + 1e-9
    assert result["moved_mm"] == pytest.approx(5 * result["width_mm"], abs=1e-6)


def test_no_stitch_delta_no_insert(tmp_path):
    orch = _orch(tmp_path, [(7.8, 4.9)], [0])
    ok, frame = orch.source.read()
    result = orch.process_once(frame)
    assert result["valid"]
    assert result["moved_mm"] == 0.0
    assert not result["inserted"]
    assert orch.db.get_latest_measurement() is None


def test_nan_measurement_still_uses_buffer(tmp_path):
    orch = _orch(tmp_path, [(np.nan, np.nan)], [3])
    ok, frame = orch.source.read()
    result = orch.process_once(frame)
    assert result["valid"]  # buffered fallback kicks in
    assert result["stitch_delta"] == 3


def test_total_distance_resume(tmp_path):
    """Total distance continues from the last DB record (reference: main.py:168)."""
    orch = _orch(tmp_path, [(7.8, 4.9)], [10])
    orch.db.insert_measurement(total_distance=500.0, stitch_length=3.9, seam_allowance=6.5)
    last = orch.db.get_last_record_total_distance()
    orch.total_distance_mm = float(last)
    ok, frame = orch.source.read()
    result = orch.process_once(frame)
    assert result["total_mm"] == pytest.approx(539.0, abs=0.1)


def test_run_loop_bounded(tmp_path):
    orch = _orch(tmp_path, [(7.8, 4.9)] * 3, [1, 2, 3])
    orch.run(max_frames=3)
    assert orch.frame_count == 3


def test_measurement_dict_contract():
    from tti.app.results import measurement_to_dict, ERR_NO_FABRIC

    meas = FrameMeasurement(
        edge_distance_mm=jnp.asarray(np.nan), stitch_width_mm=jnp.asarray(np.nan),
        raw_edge_mm=jnp.asarray(np.nan), raw_width_mm=jnp.asarray(np.nan),
        n_dist=jnp.asarray(0), n_width=jnp.asarray(0), n_stitches=jnp.asarray(0),
        fabric_detected=jnp.asarray(False),
    )
    d = measurement_to_dict(meas)
    assert d["edge_distance_mm"] is None
    assert d["stitch_width_mm"] is None
    assert d["stitch_count"] == 0
    assert d["error"] == ERR_NO_FABRIC
    assert "timestamp" in d


def test_camera_reconnect_after_strikes(tmp_path):
    """10 consecutive failed reads trigger a source reconnect
    (reference: main.py:189-199)."""

    class FlakySource:
        def __init__(self):
            self.fails = 0
            self.reconnects = 0
            self.healthy = False

        def read(self):
            if self.healthy:
                return True, np.zeros((32, 48, 3), np.uint8)
            self.fails += 1
            return False, None

        def reconnect(self):
            self.reconnects += 1
            self.healthy = True

        def release(self):
            pass

    orch = _orch(tmp_path, [(7.8, 4.9)] * 2, [1, 2])
    orch.source = FlakySource()
    orch.sleep = lambda s: None
    orch.run(max_frames=1)
    assert orch.source.reconnects == 1
    assert orch.source.fails >= 10
    assert orch.frame_count == 1


def test_run_loop_pipelined_matches_sync(tmp_path):
    """The double-buffered loop (run(pipelined=True)) must process exactly
    max_frames frames and integrate the same total distance as the sync loop
    on the same scripted measurements/counts."""
    script = [(7.8, 4.9), (7.9, 4.8), (7.7, 5.0), (7.8, 4.9)]
    counts = [1, 2, 3, 4]

    sync = _orch(tmp_path, list(script), list(counts), seed=3)
    sync.run(max_frames=4)
    pipe = _orch(tmp_path, list(script), list(counts), seed=3)
    pipe.run(max_frames=4, pipelined=True)

    assert sync.frame_count == 4
    assert pipe.frame_count == 4
    assert pipe.total_distance_mm == pytest.approx(sync.total_distance_mm)
