from tti.core.config import (
    AppConfig,
    BoardConfig,
    CameraConfig,
    DatabaseConfig,
    MeasureConfig,
    ModelConfig,
    MqttConfig,
    RoiConfig,
    RuntimeConfig,
    SerialConfig,
    ValidationConfig,
    load_config,
)
from tti.core.errors import CalibrationError, ConfigError, InferenceError, TtiError
from tti.core.logging import get_logger

__all__ = [
    "AppConfig",
    "BoardConfig",
    "CameraConfig",
    "DatabaseConfig",
    "MeasureConfig",
    "ModelConfig",
    "MqttConfig",
    "RoiConfig",
    "RuntimeConfig",
    "SerialConfig",
    "ValidationConfig",
    "load_config",
    "CalibrationError",
    "ConfigError",
    "InferenceError",
    "TtiError",
    "get_logger",
]
