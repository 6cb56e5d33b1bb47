"""Typed configuration system.

The reference uses ~50 module-level constants with ``.env`` overrides and
import-time side effects: hardware probing at import (reference: config.py:58,114)
and hard validation failures at import (reference: config.py:99-107,128-133) —
which forces its own tooling to AST-parse the file instead of importing it
(reference: Utils/check_model.py:62-92).

Here configuration is a tree of frozen dataclasses with:

- explicit ``from_env()`` constructors (no dotenv dependency: a tiny .env parser
  is built in),
- validation as an explicit ``validate()`` call, not an import side effect,
- lazy hardware probing (``tti.services.hardware``) only when a consumer asks.

Every default matches the reference value; citations are inline.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Mapping

from tti.core.errors import ConfigError

# ---------------------------------------------------------------------------
# env helpers (reference: config.py:13-29 `_env_bool` / `_env_int`)
# ---------------------------------------------------------------------------


def env_bool(env: Mapping[str, str], name: str, default: bool) -> bool:
    raw = env.get(name)
    if raw is None:
        return default
    return raw.strip().lower() in ("1", "true", "yes", "on")


def env_int(env: Mapping[str, str], name: str, default: int) -> int:
    raw = env.get(name)
    if raw is None:
        return default
    try:
        return int(raw)
    except ValueError:
        return default


def env_float(env: Mapping[str, str], name: str, default: float) -> float:
    raw = env.get(name)
    if raw is None:
        return default
    try:
        return float(raw)
    except ValueError:
        return default


def env_str(env: Mapping[str, str], name: str, default: str | None) -> str | None:
    raw = env.get(name)
    return default if raw is None else raw


def load_dotenv_file(path: str = ".env") -> dict[str, str]:
    """Minimal .env parser (KEY=VALUE lines, # comments). Replaces python-dotenv
    (reference: config.py:6-10) without the dependency."""
    out: dict[str, str] = {}
    if not os.path.exists(path):
        return out
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            key, _, value = line.partition("=")
            value = value.strip().strip("'\"")
            out[key.strip()] = value
    return out


# ---------------------------------------------------------------------------
# Config sections
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CameraConfig:
    """Camera capture settings (reference: config.py:55-62)."""

    index: str | int | None = None  # None => lazy probe via services.hardware.find_camera()
    width: int = 1280  # CALIB_W (reference: config.py:59)
    height: int = 960  # CALIB_H (reference: config.py:60)
    auto_exposure: int = 3  # V4L2 1=manual 3=auto (reference: config.py:61)
    exposure: float = 3.5  # (reference: config.py:62)

    @staticmethod
    def from_env(env: Mapping[str, str]) -> "CameraConfig":
        return CameraConfig(
            index=env_str(env, "CAMERA_INDEX", None),
            width=env_int(env, "CALIB_W", 1280),
            height=env_int(env, "CALIB_H", 960),
            auto_exposure=env_int(env, "CAMERA_AUTO_EXPOSURE", 3),
            exposure=env_float(env, "CAMERA_EXPOSURE", 3.5),
        )


@dataclass(frozen=True)
class BoardConfig:
    """ChArUco board for extrinsic calibration (reference: config.py:44-50)."""

    dict_name: str = "DICT_4X4_50"
    squares_x: int = 5
    squares_y: int = 6
    square_length_m: float = 0.010
    marker_length_m: float = 0.008
    min_corners: int = 6  # MIN_CHARUCO_CORNERS (reference: config.py:49)
    capture_delay_s: float = 5.0  # CAPTURE_DELAY (reference: config.py:50)
    invert_gray: bool = True  # detection runs on inverted grayscale (reference: calibration.py:121-122)


@dataclass(frozen=True)
class ModelConfig:
    """Detector/segmenter settings (reference: config.py:67-73)."""

    weights: str = "single_needle_model.ckpt"  # converted from MODEL_PATH .pt (reference: config.py:67)
    variant: str = "n"  # yolov8 scale: n / s / m
    num_classes: int = 2
    stitch_class_id: int = 0  # (reference: config.py:69)
    fabric_class_id: int = 1  # (reference: config.py:70)
    conf_thresh: float = 0.20  # (reference: config.py:71)
    iou_thresh: float = 0.25  # (reference: config.py:72)
    max_detections: int = 200  # MAX_DETECTIONS (reference: config.py:73)
    nms_pre_topk: int = 256  # candidates entering the KxK NMS IoU matrix
    # (>= max_detections so any keep-set fits; 256 vs 512 measured +5% e2e)
    image_size: int = 960  # imgsz passed to predict (reference: measurement.py:210)
    letterbox: str = "rect"  # 'rect' = Ultralytics auto minimal-rect (the .pt
    # predict default the reference deployment sees at measurement.py:210:
    # 1280x960 @ imgsz=960 -> 960x736); 'square' pads to the full TxT canvas
    dtype: str = "bfloat16"  # TPU-native compute dtype; params kept fp32
    mask_stride: int = 4  # proto grid = input/mask_stride; 2 = hi-res proto
    # head (tti extension — the reference's fixed export is always /4)
    proto_head: str = "deconv"  # mask_stride=2 second stage: "deconv" (the
    # round-3 learned-deconv head) | "subpixel" (1x1 conv to 4*nm phases +
    # depth-to-space — ~20x cheaper; see tti.model.layers.Proto)

    def __post_init__(self) -> None:
        # Validate here, not only in create_model: the runtime's
        # weight-transform branch constructs YOLOv8Seg directly, and a bad
        # TTI_MASK_STRIDE would otherwise surface as a KeyError mid-trace.
        if self.mask_stride not in (2, 4):
            raise ValueError(
                f"mask_stride (TTI_MASK_STRIDE) must be 2 or 4, "
                f"got {self.mask_stride}"
            )
        if self.proto_head not in ("deconv", "subpixel"):
            raise ValueError(
                f"proto_head (TTI_PROTO_HEAD) must be 'deconv' or 'subpixel', "
                f"got {self.proto_head!r}"
            )

    @staticmethod
    def from_env(env: Mapping[str, str]) -> "ModelConfig":
        return ModelConfig(
            weights=env_str(env, "TTI_WEIGHTS", "single_needle_model.ckpt") or "",
            variant=env_str(env, "TTI_MODEL_VARIANT", "n") or "n",
            conf_thresh=env_float(env, "CONF_THRESH", 0.20),
            iou_thresh=env_float(env, "IOU_THRESH", 0.25),
            max_detections=env_int(env, "MAX_DETECTIONS", 200),
            image_size=env_int(env, "TTI_IMAGE_SIZE", 960),
            letterbox=env_str(env, "TTI_LETTERBOX", "rect") or "rect",
            dtype=env_str(env, "TTI_DTYPE", "bfloat16") or "bfloat16",
            mask_stride=env_int(env, "TTI_MASK_STRIDE", 4),
            proto_head=env_str(env, "TTI_PROTO_HEAD", "deconv") or "deconv",
        )


@dataclass(frozen=True)
class RoiConfig:
    """Pixel ROI gating: detections with bbox centers outside are dropped
    (reference: config.py:89-107, measurement.py:253-259)."""

    enabled: bool = True
    x_min: int = 10
    x_max: int = 1270  # CALIB_W - 10 (reference: config.py:93)
    y_min: int = 300
    y_max: int = 760  # CALIB_H - 200 (reference: config.py:95)

    @staticmethod
    def from_env(env: Mapping[str, str], width: int = 1280, height: int = 960) -> "RoiConfig":
        return RoiConfig(
            enabled=env_bool(env, "ROI_ENABLED", True),
            x_min=env_int(env, "ROI_X_MIN", 10),
            x_max=env_int(env, "ROI_X_MAX", width - 10),
            y_min=env_int(env, "ROI_Y_MIN", 300),
            y_max=env_int(env, "ROI_Y_MAX", height - 200),
        )

    def validate(self, width: int, height: int) -> None:
        """Bounds check (reference: config.py:99-107) — explicit, not at import."""
        if not self.enabled:
            return
        if not (0 <= self.x_min < self.x_max <= width):
            raise ConfigError(f"Invalid ROI X bounds: {self.x_min}..{self.x_max} for width {width}")
        if not (0 <= self.y_min < self.y_max <= height):
            raise ConfigError(f"Invalid ROI Y bounds: {self.y_min}..{self.y_max} for height {height}")


@dataclass(frozen=True)
class MeasureConfig:
    """Measurement-core knobs (reference: config.py:78-84)."""

    frame_buffer: int = 8  # temporal median window (reference: config.py:78)
    min_stitches: int = 3  # (reference: config.py:79)
    max_px_distance: float = 250.0  # envelope proximity gate (reference: config.py:81)
    envelope_neighborhood: int = 3  # +-columns around centroid (reference: config.py:82)
    skip_cluster: bool = False  # (reference: config.py:83)
    two_row_threshold_px: float = 30.0  # (reference: config.py:84)
    max_stitches: int = 64  # fixed-shape padding budget for per-stitch arrays (TPU static shapes)
    max_stats_dets: int = 64  # top-score detections entering mask statistics (static slice)
    undistort_iters: int = 5  # fixed-point iterations; 5 == exact cv2.undistortPoints parity
    # Occupancy-aware sub-cell boundary readout for soft-mask-trained nets
    # (tti train --soft-masks): boundaries from the 0.5-crossing of the
    # calibrated occupancy field instead of the eroding binary threshold.
    # None = AUTO: follow the checkpoint sidecar's `soft_masks` flag (the
    # readout must match the target semantics the net was trained to emit —
    # measured in MEASURE_REPORT.md: binary readout of a soft net erodes
    # boundaries by up to half a proto cell). Binary checkpoints keep the
    # reference-exact binary semantics. Env TTI_SUBCELL_EDGE=0/1 forces.
    subcell_edge: bool | None = None
    # Per-class readout split (round-5 edge-bias recovery): soft targets may
    # be trained PER CLASS (`tti train --soft-masks stitch` — stitch soft for
    # mask AP, fabric binary so the envelope keeps the reference-exact
    # integer bottom-row semantics that round 3 measured least-biased).
    # subcell_envelope overrides the ENVELOPE readout only; None = follow
    # subcell_edge (one flag for both, the r4 behavior). Auto-resolution
    # reads the sidecar's per-class keys (soft_fabric/soft_stitch) when
    # present. Env TTI_SUBCELL_ENVELOPE=0/1 forces.
    subcell_envelope: bool | None = None
    # Per-checkpoint readout calibration (round 5): constant mm offsets ADDED
    # to the raw edge/width outputs, measured on an independent synthetic
    # calibration set by tools/calibrate_offsets.py and carried in the
    # checkpoint sidecar (cal_edge_mm / cal_width_mm). This is the
    # reference's own mechanism — config.py:156-157 ships empirically
    # calibrated SEAM_LENGTH_OFFSET / STITCH_WIDTH_OFFSET constants applied
    # to the final measurements — here derived per-checkpoint because the
    # systematic part of the error (boundary-cell calibration of the learned
    # occupancy field) is a property of the NET, not the optics.
    # Env TTI_READOUT_CAL=0 disables (uncalibrated raw values).
    cal_edge_mm: float = 0.0
    cal_width_mm: float = 0.0

    @property
    def envelope_subcell(self) -> bool:
        """Effective envelope readout after auto-resolution."""
        if self.subcell_envelope is not None:
            return self.subcell_envelope
        return bool(self.subcell_edge)

    @staticmethod
    def from_env(env: Mapping[str, str]) -> "MeasureConfig":
        def tri(name: str) -> bool | None:
            raw = env.get(name)
            return (None if raw is None
                    else raw.strip().lower() in ("1", "true", "yes", "on"))

        return MeasureConfig(
            subcell_edge=tri("TTI_SUBCELL_EDGE"),
            subcell_envelope=tri("TTI_SUBCELL_ENVELOPE"),
        )

    def with_subcell_from(self, ckpt_meta: Mapping[str, Any]) -> "MeasureConfig":
        """Resolve subcell readouts left at None (auto) against a checkpoint's
        sidecar metadata: soft-trained classes read boundaries sub-cell,
        binary-trained classes keep the reference-exact threshold. Per-class
        sidecars (soft_stitch / soft_fabric, written by per-class
        `--soft-masks stitch|fabric` training) split the two readouts; the
        legacy all-classes `soft_masks` flag drives both. Explicit config
        wins."""
        sub = self.subcell_edge
        env = self.subcell_envelope
        legacy = bool(ckpt_meta.get("soft_masks", False))
        if sub is None:
            sub = bool(ckpt_meta.get("soft_stitch", legacy))
        if env is None and "subcell_envelope" in ckpt_meta:
            # Explicit sidecar pin: a deploy checkpoint can carry the
            # measured-best envelope readout (e.g. sub-cell logit crossing
            # on a binary fabric head — bias +0.009 vs -0.086 integer on
            # the r5 per-class net, STATUS.md round-5 item 2).
            env = bool(ckpt_meta["subcell_envelope"])
        if env is None and ("soft_fabric" in ckpt_meta
                            or "soft_stitch" in ckpt_meta):
            env = bool(ckpt_meta.get("soft_fabric", legacy))
        # Sidecar readout calibration (tools/calibrate_offsets.py); explicit
        # non-zero config wins, TTI_READOUT_CAL=0 disables.
        cal_e, cal_w = self.cal_edge_mm, self.cal_width_mm
        if os.environ.get("TTI_READOUT_CAL", "1").strip().lower() not in (
                "0", "false", "no", "off"):
            if cal_e == 0.0:
                cal_e = float(ckpt_meta.get("cal_edge_mm", 0.0))
            if cal_w == 0.0:
                cal_w = float(ckpt_meta.get("cal_width_mm", 0.0))
        else:
            cal_e = cal_w = 0.0
        # env stays None for single-flag sidecars: envelope follows
        # subcell_edge exactly as before per-class sidecars existed.
        return dataclasses.replace(self, subcell_edge=sub,
                                   subcell_envelope=env,
                                   cal_edge_mm=cal_e, cal_width_mm=cal_w)


@dataclass(frozen=True)
class ValidationConfig:
    """Measurement validity gates + offsets (reference: config.py:147-157)."""

    seam_lower_mm: float = 3.5
    seam_upper_mm: float = 8.0
    stitch_lower_mm: float = 2.8
    stitch_upper_mm: float = 4.15
    seam_length_offset_mm: float = -1.3  # (reference: config.py:156)
    stitch_width_offset_mm: float = -1.0  # (reference: config.py:157)
    valid_buffer: int = 5  # buffered-average window (reference: main.py:183-184)
    jitter_seam_mm: float = 0.1  # +-jitter on buffered fallback (reference: main.py:273)
    jitter_width_mm: float = 0.08  # (reference: main.py:274)

    @staticmethod
    def from_env(env: Mapping[str, str]) -> "ValidationConfig":
        return ValidationConfig(
            seam_length_offset_mm=env_float(env, "SEAM_LENGTH_OFFSET", -1.3),
            stitch_width_offset_mm=env_float(env, "STITCH_WIDTH_OFFSET", -1.0),
        )


@dataclass(frozen=True)
class SerialConfig:
    """ESP32 stitch-counter link (reference: config.py:112-116)."""

    port: str | None = None  # None => lazy probe find_esp32(); env fallback below
    baudrate: int = 115200
    timeout_s: float = 1.0
    reconnect_interval_s: float = 5.0  # (reference: serial_reader.py:23)
    max_buffer: int = 8192  # partial-line cap (reference: serial_reader.py:25-26)

    @staticmethod
    def from_env(env: Mapping[str, str]) -> "SerialConfig":
        return SerialConfig(port=env_str(env, "SERIAL_PORT", None))


@dataclass(frozen=True)
class DatabaseConfig:
    """Measurement persistence (reference: config.py:121-133, database.py).

    backend: 'mysql' (production parity) or 'sqlite' (local/tests; same API/schema).
    """

    backend: str = "sqlite"
    host: str | None = None
    user: str | None = None
    password: str | None = None
    database: str | None = None
    table: str | None = None
    sqlite_path: str = "tti_measurements.db"

    @staticmethod
    def from_env(env: Mapping[str, str]) -> "DatabaseConfig":
        host = env_str(env, "DB_HOST", None)
        return DatabaseConfig(
            backend=env_str(env, "TTI_DB_BACKEND", "mysql" if host else "sqlite") or "sqlite",
            host=host,
            user=env_str(env, "DB_USER", None),
            password=env_str(env, "DB_PASSWORD", None),
            database=env_str(env, "DB_DATABASE", None),
            table=env_str(env, "DB_TABLE", None),
            sqlite_path=env_str(env, "TTI_SQLITE_PATH", "tti_measurements.db") or "tti_measurements.db",
        )

    def validate(self) -> None:
        """Required-var check (reference: config.py:128-133) — explicit call."""
        if self.backend != "mysql":
            return
        missing = [
            key
            for key in ("host", "user", "password", "database", "table")
            if getattr(self, key) is None
        ]
        if missing:
            raise ConfigError(
                "Missing required environment variables: "
                + ", ".join(f"DB_{m.upper()}" for m in missing)
            )


@dataclass(frozen=True)
class MqttConfig:
    """Heartbeat publisher (reference: config.py:175-184, mqtt_heartbeat.py)."""

    server: str | None = None
    port: int = 8883
    username: str | None = None
    password: str | None = None
    device_id: str | None = None  # defaults to DB table name (reference: config.py:181)
    interval_s: float = 2.0  # (reference: config.py:183)
    tls_insecure: bool = True  # (reference: config.py:184)

    @property
    def topic(self) -> str:
        # machine/{DEVICE_ID}/status/heartbeat (reference: config.py:182)
        return f"machine/{self.device_id or 'unknown'}/status/heartbeat"

    @staticmethod
    def from_env(env: Mapping[str, str], device_id: str | None = None) -> "MqttConfig":
        return MqttConfig(
            server=env_str(env, "MQTT_SERVER", None),
            port=env_int(env, "MQTT_PORT", 8883),
            username=env_str(env, "MQTT_USERNAME", None),
            password=env_str(env, "MQTT_PASSWORD", None),
            device_id=device_id or env_str(env, "DB_TABLE", None),
            tls_insecure=env_bool(env, "MQTT_TLS_INSECURE", True),
        )


@dataclass(frozen=True)
class RuntimeConfig:
    """Application loop + runtime settings (reference: config.py:138-140,163-164,170)."""

    inference_interval_s: float = 2.0  # (reference: config.py:138)
    save_dir: str = "saved_annotations"  # (reference: config.py:139)
    log_debug: bool = True  # (reference: config.py:140)
    show_windows: bool = False  # (reference: config.py:170)
    file_retention_hours: float = 24.0  # (reference: config.py:163)
    file_cleanup_interval_s: float = 3600.0  # (reference: config.py:164)
    intrinsics_file: str = "camera_calibration.json"  # (reference: config.py:34)
    extrinsics_file: str = "extrinsics.json"  # (reference: config.py:35)
    # TPU runtime (new, no reference equivalent — SURVEY.md §2 parallelism note):
    batch_size: int = 8  # frames per device step (BASELINE.json config 3)
    num_streams: int = 1  # camera streams (BASELINE.json config 5)
    mesh_shape: tuple[int, ...] = ()  # () => all local devices on a 1-D 'data' axis


@dataclass(frozen=True)
class AppConfig:
    """Top-level config tree."""

    camera: CameraConfig = field(default_factory=CameraConfig)
    board: BoardConfig = field(default_factory=BoardConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    roi: RoiConfig = field(default_factory=RoiConfig)
    measure: MeasureConfig = field(default_factory=MeasureConfig)
    validation: ValidationConfig = field(default_factory=ValidationConfig)
    serial: SerialConfig = field(default_factory=SerialConfig)
    database: DatabaseConfig = field(default_factory=DatabaseConfig)
    mqtt: MqttConfig = field(default_factory=MqttConfig)
    runtime: RuntimeConfig = field(default_factory=RuntimeConfig)

    def validate(self) -> "AppConfig":
        self.roi.validate(self.camera.width, self.camera.height)
        self.database.validate()
        return self

    def replace(self, **sections) -> "AppConfig":
        return dataclasses.replace(self, **sections)


def load_config(
    dotenv_path: str | None = ".env", env: Mapping[str, str] | None = None, validate: bool = True
) -> AppConfig:
    """Build AppConfig from process env merged over a .env file (file loses).

    Unlike the reference (config.py:6-10 import-time dotenv + probing), this is an
    explicit call with injectable env for tests.
    """
    merged: dict[str, str] = {}
    if dotenv_path:
        merged.update(load_dotenv_file(dotenv_path))
    merged.update(dict(os.environ if env is None else env))

    camera = CameraConfig.from_env(merged)
    cfg = AppConfig(
        camera=camera,
        model=ModelConfig.from_env(merged),
        roi=RoiConfig.from_env(merged, camera.width, camera.height),
        measure=MeasureConfig.from_env(merged),
        validation=ValidationConfig.from_env(merged),
        serial=SerialConfig.from_env(merged),
        database=DatabaseConfig.from_env(merged),
        mqtt=MqttConfig.from_env(merged, device_id=merged.get("DB_TABLE")),
    )
    return cfg.validate() if validate else cfg
