"""Host-side frame annotation (cv2 when present; numpy fallback).

Reproduces the reference's overlay vocabulary (SURVEY.md §2
"Annotation/rendering"): ROI border (light green, reference:
measurement.py:230-236), stitch boxes cyan 1 px / fabric boxes magenta 2 px
(measurement.py:268,272), envelope polyline orange (measurement.py:292-296),
HUD text lines (measurement.py:487-504) and the orchestrator's status line
(main.py:296-309). Rendering is strictly a host concern — the device returns
geometry only (boxes, envelope, metrics), which is what keeps the hot path at
frame rate.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None  # type: ignore[assignment]
    _HAS_CV2 = False

COLOR_STITCH = (255, 255, 0)  # cyan-ish BGR (reference: measurement.py:268)
COLOR_FABRIC = (255, 0, 255)  # magenta (reference: measurement.py:272)
COLOR_ENVELOPE = (255, 128, 0)  # orange (reference: measurement.py:296)
COLOR_ROI = (144, 238, 144)  # light green (reference: config.py:96)
COLOR_TEXT = (0, 0, 255)


def _rect_np(img: np.ndarray, x1: int, y1: int, x2: int, y2: int, color, thickness: int) -> None:
    h, w = img.shape[:2]
    x1, x2 = np.clip([x1, x2], 0, w - 1)
    y1, y2 = np.clip([y1, y2], 0, h - 1)
    for t in range(thickness):
        img[y1 + t : y2 + 1 : max(y2 - y1 - 2 * t, 1), x1:x2] = color
        img[y1:y2, x1 + t : x2 + 1 : max(x2 - x1 - 2 * t, 1)] = color


def annotate_frame(
    frame_bgr: np.ndarray,
    boxes: np.ndarray,
    classes: np.ndarray,
    valid: np.ndarray,
    stitch_class_id: int = 0,
    fabric_class_id: int = 1,
    envelope_frame_xy: np.ndarray | None = None,
    roi_bounds: tuple[int, int, int, int] | None = None,
    hud_lines: list[str] | None = None,
) -> np.ndarray:
    """Draw detections + envelope + HUD onto a copy of the frame."""
    out = frame_bgr.copy()

    if roi_bounds is not None:
        x1, y1, x2, y2 = (int(v) for v in roi_bounds)
        if _HAS_CV2:
            cv2.rectangle(out, (x1, y1), (x2, y2), COLOR_ROI, 2)
        else:
            _rect_np(out, x1, y1, x2, y2, COLOR_ROI, 2)

    for box, cls, ok in zip(boxes, classes, valid):
        if not ok:
            continue
        x1, y1, x2, y2 = (int(round(float(v))) for v in box)
        color, thickness = (
            (COLOR_STITCH, 1) if int(cls) == stitch_class_id else (COLOR_FABRIC, 2)
        )
        if _HAS_CV2:
            cv2.rectangle(out, (x1, y1), (x2, y2), color, thickness)
        else:
            _rect_np(out, x1, y1, x2, y2, color, thickness)

    if envelope_frame_xy is not None and len(envelope_frame_xy) >= 2 and _HAS_CV2:
        step = max(1, len(envelope_frame_xy) // 1000)  # decimation like measurement.py:294
        poly = np.asarray(envelope_frame_xy[::step], np.int32)
        cv2.polylines(out, [poly], False, COLOR_ENVELOPE, 2)

    if hud_lines and _HAS_CV2:
        for i, line in enumerate(hud_lines):
            cv2.putText(out, line, (10, 30 + 25 * i), cv2.FONT_HERSHEY_SIMPLEX, 0.7,
                        COLOR_TEXT, 2)
    return out


def envelope_to_polyline(envelope_mask_grid: np.ndarray, spec) -> np.ndarray:
    """(Wm,) envelope with -1 sentinels -> (K, 2) frame-space polyline points."""
    from tti.measure.pipeline import PROTO_STRIDE

    cols = np.where(envelope_mask_grid >= 0)[0]
    if cols.size == 0:
        return np.zeros((0, 2), np.int32)
    xs = (cols * PROTO_STRIDE + 1.5 - spec.pad_left) / spec.scale
    ys = (envelope_mask_grid[cols] * PROTO_STRIDE + 3.0 - spec.pad_top) / spec.scale
    return np.stack([xs, ys], axis=-1).astype(np.int32)
