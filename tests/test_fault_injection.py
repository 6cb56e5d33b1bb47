"""Fault injection for the service layer (SURVEY.md §5: the reference has none;
the framework's degrade-don't-die claims get exercised under injected failures)."""

import threading
import time

import numpy as np
import pytest

from tti.core.config import DatabaseConfig, SerialConfig
from tti.services.database import DatabaseHandler
from tti.services.serial_reader import SerialReader


class FlakyTransport:
    """Serial transport that dies after N reads, then a fresh one reconnects."""

    instances = 0

    def __init__(self, fail_after=3):
        FlakyTransport.instances += 1
        self.reads = 0
        self.fail_after = fail_after
        self._open = True

    @property
    def is_open(self):
        return self._open

    def read_available(self):
        self.reads += 1
        if self.reads > self.fail_after:
            raise OSError("injected: device unplugged")
        return f"{self.reads}\n".encode()

    def close(self):
        self._open = False


def test_serial_recovers_from_transport_death():
    FlakyTransport.instances = 0
    reader = SerialReader(
        SerialConfig(port="/dev/fake", reconnect_interval_s=0.0),
        transport_factory=lambda port: FlakyTransport(fail_after=2),
        port_detector=lambda: "/dev/fake",
    )
    assert reader.connect()
    assert reader._parse_available() == 1
    assert reader._parse_available() == 2
    # Next read raises inside the transport -> reader reconnects a new one.
    assert reader._parse_available() is None
    assert FlakyTransport.instances >= 2
    # New transport serves counts again.
    assert reader._parse_available() == 1


def test_serial_reconnect_rate_limited():
    calls = []

    def detector():
        calls.append(1)
        return None

    reader = SerialReader(
        SerialConfig(port=None, reconnect_interval_s=60.0),
        port_detector=detector,
    )
    reader._parse_available()
    reader._parse_available()
    reader._parse_available()
    # With a 60 s interval only the first attempt may probe the port
    # (it probes twice: once in _try_reconnect, once in connect()).
    assert len(calls) <= 2


class DyingCursor:
    """DB cursor that starts failing after N executes (connection loss)."""

    def __init__(self, real, fail_after):
        self._real = real
        self._fail_after = fail_after
        self._n = 0

    def execute(self, *a, **k):
        self._n += 1
        if self._n > self._fail_after:
            raise RuntimeError("injected: connection lost")
        return self._real.execute(*a, **k)

    def __getattr__(self, name):
        return getattr(self._real, name)


def test_db_insert_failure_rolls_back_and_recovers(tmp_path):
    cfg = DatabaseConfig(backend="sqlite", table="t", sqlite_path=str(tmp_path / "f.db"))
    db = DatabaseHandler(cfg)
    assert db.connect()
    assert db.insert_measurement(1.0, 2.0, 3.0)
    # Inject a dying cursor: the next insert fails but returns False (no raise).
    db.cursor = DyingCursor(db.cursor, fail_after=0)
    assert db.insert_measurement(4.0, 5.0, 6.0) is False
    # Manual recovery path (reconnect) restores service.
    assert db.connect()
    assert db.insert_measurement(7.0, 8.0, 9.0)
    latest = db.get_latest_measurement()
    assert latest["total_distance"] == pytest.approx(7.0)
    db.close()


def test_orchestrator_survives_db_loss(tmp_path):
    """The measurement loop continues when the DB dies mid-run
    (reference semantics: main.py:287-293 'will retry on next valid')."""
    import random

    import jax.numpy as jnp

    from tti.app.orchestrator import Orchestrator
    from tti.app.sources import SyntheticSource
    from tti.core.config import AppConfig
    from tti.measure.pipeline import FrameMeasurement
    from tti.parallel.runtime import PipelineOutputs

    class FakePipeline:
        roi_bounds = None

        def process_batch(self, frames):
            meas = FrameMeasurement(
                edge_distance_mm=jnp.asarray([7.8]), stitch_width_mm=jnp.asarray([4.9]),
                raw_edge_mm=jnp.asarray([7.8]), raw_width_mm=jnp.asarray([4.9]),
                n_dist=jnp.asarray([5]), n_width=jnp.asarray([5]),
                n_stitches=jnp.asarray([5]), fabric_detected=jnp.asarray([True]),
            )
            return PipelineOutputs(
                boxes_frame=np.zeros((1, 4, 4), np.float32),
                scores=np.zeros((1, 4), np.float32),
                classes=np.full((1, 4), -1, np.int32),
                valid=np.zeros((1, 4), bool), masks=None, measurements=meas,
            )

    cfg = AppConfig().replace(
        database=DatabaseConfig(backend="sqlite", table="t",
                                sqlite_path=str(tmp_path / "o.db"))
    )
    cfg = cfg.replace(runtime=cfg.runtime.__class__(
        save_dir=str(tmp_path / "ann"), inference_interval_s=0.0))
    orch = Orchestrator(cfg, FakePipeline(), SyntheticSource(32, 48, count=10),
                        rng=random.Random(0), save_annotated=False)
    db = DatabaseHandler(cfg.database)
    assert db.connect()
    orch.db = db

    class Counter:
        n = 0

        def get_stitch_count(self):
            Counter.n += 5
            return Counter.n

        def stop(self):
            pass

    orch.serial = Counter()

    ok, frame = orch.source.read()
    r1 = orch.process_once(frame)
    assert r1["inserted"]
    # Kill the DB mid-run: close the underlying connection.
    db.connection.close()
    ok, frame = orch.source.read()
    r2 = orch.process_once(frame)  # must not raise
    # sqlite reconnects lazily inside insert (fresh connection) or reports
    # False — either way the loop continues and totals keep integrating.
    assert r2["total_mm"] > r1["total_mm"]
