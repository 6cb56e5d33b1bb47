"""Frame sources: the host IO boundary for camera/file/synthetic input.

The reference couples directly to cv2.VideoCapture with V4L2
(reference: measurement.py:146-147, main.py:188-199). Here capture is a small
protocol so the orchestrator, tests (SURVEY.md §4 "fake camera") and the bench
harness share one loop:

- OpenCVCameraSource: V4L2 camera with the reference's resolution/exposure
  setup and reconnect,
- DirectorySource: replay of image files (check-model tooling, parity runs),
- SyntheticSource: generated frames (tests, benchmarking without hardware).
"""

from __future__ import annotations

import os
import time
from typing import Iterator, Protocol

import numpy as np

from tti.core.config import CameraConfig
from tti.core.logging import get_logger

log = get_logger("app.sources")


class FrameSource(Protocol):
    def read(self) -> tuple[bool, np.ndarray | None]: ...

    def reconnect(self) -> None: ...

    def release(self) -> None: ...


class SyntheticSource:
    """Deterministic generated frames (B-roll for tests/benches)."""

    def __init__(self, height: int = 960, width: int = 1280, seed: int = 0, count: int | None = None):
        self._rng = np.random.default_rng(seed)
        self.height, self.width = height, width
        self.count = count
        self._emitted = 0

    def read(self) -> tuple[bool, np.ndarray | None]:
        if self.count is not None and self._emitted >= self.count:
            return False, None
        self._emitted += 1
        frame = self._rng.integers(0, 255, size=(self.height, self.width, 3), dtype=np.uint8)
        return True, frame

    def reconnect(self) -> None: ...

    def release(self) -> None: ...


class DirectorySource:
    """Replays image files from a directory in sorted order."""

    def __init__(self, directory: str, loop: bool = False) -> None:
        import cv2

        self._cv2 = cv2
        self.paths = sorted(
            os.path.join(directory, f)
            for f in os.listdir(directory)
            if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp"))
        )
        if not self.paths:
            raise FileNotFoundError(f"no images in {directory}")
        self.loop = loop
        self._idx = 0

    def read(self) -> tuple[bool, np.ndarray | None]:
        if self._idx >= len(self.paths):
            if not self.loop:
                return False, None
            self._idx = 0
        frame = self._cv2.imread(self.paths[self._idx])
        self._idx += 1
        return (frame is not None), frame

    def reconnect(self) -> None: ...

    def release(self) -> None: ...


class OpenCVCameraSource:
    """V4L2 camera with the reference's setup semantics
    (measurement.py:23-42 force_camera_resolution, main.py:189-199 reconnect)."""

    def __init__(self, config: CameraConfig, index: str | int | None = None) -> None:
        import cv2

        self._cv2 = cv2
        self.config = config
        if index is None:
            index = config.index
        if index is None:
            from tti.services.hardware import find_camera

            index = find_camera()
        if index is None:
            raise RuntimeError("no camera found")
        self.index = index
        self.cap = None
        self._open()

    def _open(self) -> None:
        cv2 = self._cv2
        self.cap = cv2.VideoCapture(self.index, cv2.CAP_V4L2)
        cv2_cap = self.cap
        cv2_cap.set(cv2.CAP_PROP_FRAME_WIDTH, self.config.width)
        cv2_cap.set(cv2.CAP_PROP_FRAME_HEIGHT, self.config.height)
        time.sleep(2)  # allow the camera to settle (reference: measurement.py:27)
        aw = int(cv2_cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        ah = int(cv2_cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        cv2_cap.set(cv2.CAP_PROP_AUTO_EXPOSURE, self.config.auto_exposure)
        cv2_cap.set(cv2.CAP_PROP_EXPOSURE, self.config.exposure)
        if (aw, ah) != (self.config.width, self.config.height):
            log.warning(
                "camera resolution %dx%d, expected %dx%d",
                aw, ah, self.config.width, self.config.height,
            )

    def read(self) -> tuple[bool, np.ndarray | None]:
        ok, frame = self.cap.read()
        return ok, frame

    def reconnect(self) -> None:
        """Full re-open (the reference's 10-strike recovery, main.py:193-199)."""
        try:
            self.cap.release()
        except Exception:
            pass
        time.sleep(1)
        self._open()

    def release(self) -> None:
        if self.cap is not None:
            self.cap.release()


def frames_iter(source: FrameSource) -> Iterator[np.ndarray]:
    """Adapter: FrameSource -> iterator of frames (for calibration loops)."""
    while True:
        ok, frame = source.read()
        if not ok:
            return
        yield frame
