"""Service-layer tests with fake transports (SURVEY.md §4: fake serial,
sqlite DB stub, fake MQTT, retention cleaner)."""

import os
import threading
import time
from datetime import datetime

import numpy as np
import pytest

from tti.core.config import DatabaseConfig, MqttConfig, SerialConfig
from tti.services.cleaner import FileCleanerThread
from tti.services.database import DatabaseHandler
from tti.services.mqtt import MqttHeartbeat, NullClient
from tti.services.serial_reader import SerialReader


# -- serial -------------------------------------------------------------------


class ScriptedTransport:
    """Feeds pre-scripted byte chunks (SURVEY.md §4 'scripted count stream')."""

    def __init__(self, chunks):
        self.chunks = list(chunks)
        self._open = True

    @property
    def is_open(self):
        return self._open

    def read_available(self):
        return self.chunks.pop(0) if self.chunks else b""

    def close(self):
        self._open = False


def _reader_with(chunks):
    return SerialReader(
        SerialConfig(port="/dev/fake"),
        transport_factory=lambda port: ScriptedTransport(chunks),
        port_detector=lambda: "/dev/fake",
    )


def test_serial_parses_counts_and_partial_lines():
    reader = _reader_with([b"12\n", b"4", b"5\n78", b"\n"])
    assert reader.connect()
    assert reader._parse_available() == 12
    assert reader._parse_available() is None  # partial line buffered
    assert reader._parse_available() == 45
    assert reader._parse_available() == 78


def test_serial_ignores_garbage_lines():
    reader = _reader_with([b"abc\n17\n", b"\n\n"])
    reader.connect()
    assert reader._parse_available() == 17


def test_serial_thread_updates_latest():
    reader = _reader_with([b"5\n", b"9\n"] + [b""] * 100)
    assert reader.start_reading()
    deadline = time.time() + 2.0
    while reader.get_stitch_count() != 9 and time.time() < deadline:
        time.sleep(0.01)
    reader.stop()
    assert reader.get_stitch_count() == 9


def test_serial_buffer_bounded():
    reader = _reader_with([b"x" * 10000])
    reader.connect()
    reader._parse_available()
    assert len(reader._buffer) <= reader.config.max_buffer


def test_serial_connect_fails_gracefully():
    reader = SerialReader(SerialConfig(port=None), port_detector=lambda: None)
    assert not reader.start_reading()


# -- database -------------------------------------------------------------------


@pytest.fixture
def db(tmp_path):
    cfg = DatabaseConfig(backend="sqlite", table="m1",
                         sqlite_path=str(tmp_path / "test.db"))
    handler = DatabaseHandler(cfg)
    assert handler.connect()
    yield handler
    handler.close()


def test_db_roundtrip(db):
    """Insert -> fetch latest -> delete (the reference's own smoke test,
    database.py:195-223)."""
    assert db.insert_measurement(total_distance=250.5, stitch_length=5.0,
                                 seam_allowance=15.0)
    latest = db.get_latest_measurement()
    assert latest is not None
    assert latest["total_distance"] == pytest.approx(250.5)
    assert latest["stitch_length"] == pytest.approx(5.0)
    assert db.delete_measurements(latest["timestamp"])
    assert db.get_latest_measurement() is None


def test_db_last_record_date_and_total(db):
    assert db.get_last_record_date() is None
    assert db.get_last_record_total_distance() is None
    db.insert_measurement(total_distance=42.0, stitch_length=3.0, seam_allowance=5.0)
    assert db.get_last_record_date() == datetime.now().date()
    assert db.get_last_record_total_distance() == pytest.approx(42.0)


def test_db_context_manager(tmp_path):
    cfg = DatabaseConfig(backend="sqlite", table="m2", sqlite_path=str(tmp_path / "c.db"))
    with DatabaseHandler(cfg) as handler:
        assert handler.insert_measurement(1.0, 2.0, 3.0)


def test_db_mysql_backend_degrades_without_driver():
    cfg = DatabaseConfig(backend="mysql", host="nowhere.invalid", user="u",
                         password="p", database="d", table="t")
    handler = DatabaseHandler(cfg)
    assert handler.connect() is False  # no driver installed -> False, no raise
    assert handler.insert_measurement(1, 2, 3) is False


# -- mqtt -------------------------------------------------------------------------


def test_heartbeat_publishes_on_interval():
    cfg = MqttConfig(server="broker.test", device_id="t1", interval_s=0.02)
    client = NullClient()
    hb = MqttHeartbeat(cfg, client_factory=lambda c: client)
    hb.start()
    time.sleep(0.2)
    hb.stop()
    hb.join(timeout=2)
    assert client.published >= 3
    assert cfg.topic == "machine/t1/status/heartbeat"


def test_heartbeat_survives_connect_failure():
    class FailingClient(NullClient):
        def connect(self, *a, **k):
            raise OSError("unreachable")

    hb = MqttHeartbeat(MqttConfig(server="x", device_id="t"), client_factory=lambda c: FailingClient())
    hb.start()
    hb.join(timeout=2)  # thread exits, no raise
    assert not hb.is_alive()


# -- file cleaner -------------------------------------------------------------------


def test_cleaner_removes_old_files_and_empty_dirs(tmp_path):
    base = tmp_path / "annotations"
    session = base / "2026-01-01_00-00-00"
    session.mkdir(parents=True)
    old_file = session / "old.jpg"
    old_file.write_bytes(b"x" * 100)
    new_file = base / "new.jpg"
    new_file.write_bytes(b"y")
    old_mtime = time.time() - 48 * 3600
    os.utime(old_file, (old_mtime, old_mtime))

    cleaner = FileCleanerThread(str(base), retention_hours=24)
    deleted, freed = cleaner.force_cleanup()
    assert deleted == 1 and freed == 100
    assert not old_file.exists()
    assert not session.exists()  # emptied session dir removed
    assert new_file.exists()


def test_cleaner_start_stop(tmp_path):
    cleaner = FileCleanerThread(str(tmp_path), check_interval_s=1)
    assert cleaner.start()
    assert not cleaner.start()  # already running
    assert cleaner.stop()
    assert not cleaner.stop()
