"""Config system tests: env parsing, validation, reference defaults."""

import pytest

from tti.core.config import (
    AppConfig,
    DatabaseConfig,
    RoiConfig,
    load_config,
    load_dotenv_file,
)
from tti.core.errors import ConfigError


def test_defaults_match_reference_values():
    cfg = AppConfig()
    # Spot-check the reference constants (config.py citations in tti.core.config).
    assert cfg.camera.width == 1280 and cfg.camera.height == 960
    assert cfg.model.conf_thresh == 0.20
    assert cfg.model.iou_thresh == 0.25
    assert cfg.model.max_detections == 200
    assert cfg.measure.frame_buffer == 8
    assert cfg.measure.min_stitches == 3
    assert cfg.measure.max_px_distance == 250.0
    assert cfg.validation.seam_lower_mm == 3.5
    assert cfg.validation.seam_upper_mm == 8.0
    assert cfg.validation.stitch_lower_mm == 2.8
    assert cfg.validation.stitch_upper_mm == 4.15
    assert cfg.validation.seam_length_offset_mm == -1.3
    assert cfg.validation.stitch_width_offset_mm == -1.0
    assert cfg.serial.baudrate == 115200
    assert cfg.runtime.inference_interval_s == 2.0
    assert cfg.runtime.file_retention_hours == 24.0
    assert cfg.mqtt.interval_s == 2.0
    assert cfg.board.squares_x == 5 and cfg.board.squares_y == 6


def test_env_overrides():
    env = {
        "ROI_ENABLED": "false",
        "CONF_THRESH": "0.4",
        "SEAM_LENGTH_OFFSET": "-0.5",
        "DB_HOST": "db.example",
        "DB_USER": "u", "DB_PASSWORD": "p", "DB_DATABASE": "d", "DB_TABLE": "tbl",
    }
    cfg = load_config(dotenv_path=None, env=env)
    assert cfg.roi.enabled is False
    assert cfg.model.conf_thresh == 0.4
    assert cfg.validation.seam_length_offset_mm == -0.5
    assert cfg.database.backend == "mysql"
    assert cfg.mqtt.topic == "machine/tbl/status/heartbeat"


def test_bad_env_values_fall_back():
    env = {"CONF_THRESH": "not-a-number", "ROI_X_MIN": "zzz"}
    cfg = load_config(dotenv_path=None, env=env, validate=False)
    assert cfg.model.conf_thresh == 0.20
    assert cfg.roi.x_min == 10


def test_roi_validation_explicit():
    with pytest.raises(ConfigError):
        RoiConfig(enabled=True, x_min=100, x_max=50, y_min=0, y_max=10).validate(1280, 960)
    RoiConfig(enabled=False, x_min=100, x_max=50, y_min=0, y_max=10).validate(1280, 960)


def test_mysql_requires_all_vars():
    with pytest.raises(ConfigError, match="DB_USER"):
        DatabaseConfig(backend="mysql", host="h", user=None, password="p",
                       database="d", table="t").validate()
    DatabaseConfig(backend="sqlite").validate()  # no-op


def test_dotenv_parser(tmp_path):
    p = tmp_path / ".env"
    p.write_text("# comment\nDB_HOST=localhost\nQUOTED='abc'\nEMPTY\nKEY = spaced \n")
    env = load_dotenv_file(str(p))
    assert env == {"DB_HOST": "localhost", "QUOTED": "abc", "KEY": "spaced"}


def test_import_has_no_side_effects(tmp_path, monkeypatch):
    """Importing tti.core.config never probes hardware or validates env —
    the reference's biggest config footgun (SURVEY.md §5 'Config' row)."""
    import importlib

    import tti.core.config as mod

    monkeypatch.chdir(tmp_path)  # no .env here
    importlib.reload(mod)  # would raise if any import-time validation existed
