"""Framework exception hierarchy.

The reference signals failure with prints + error keys inside the measurement dict
(reference: measurement.py:212-216,281-287,332-337) and hard ``raise`` at import
time for bad config (reference: config.py:128-133). Here failures are typed so the
supervisor layer (tti.app.orchestrator) can decide per-subsystem whether to degrade
or die.
"""


class TtiError(Exception):
    """Base class for all framework errors."""


class ConfigError(TtiError):
    """Invalid or missing configuration."""


class CalibrationError(TtiError):
    """Intrinsics/extrinsics missing or calibration failed."""


class InferenceError(TtiError):
    """Model load / forward / postprocess failure."""


class ServiceError(TtiError):
    """Side-channel service (serial / db / mqtt / cleaner) failure."""
