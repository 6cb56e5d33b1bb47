"""Multi-camera stream runtime (BASELINE.json config 5: 4-stream line).

Architecture: one capture thread per camera pushes frames into its native
FrameRing (tti.native — C++ seqlock ring, GIL-free copies); the device-feed
loop snapshots one frame per stream into a contiguous (S, H, W, 3) batch and
runs the shared InspectionPipeline step; measurement smoothing state is carried
per stream. Capture and device compute overlap naturally: the rings always
hold the freshest frame, so a slow step drops frames instead of building a
queue (the right semantics for a live line — the reference similarly skips
frames between its 2 s ticks, reference: main.py:209,320-323).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass
from typing import Sequence

import numpy as np

from tti.app.sources import FrameSource
from tti.core.logging import get_logger
from tti.measure.pipeline import init_measure_state, smooth_measurement
from tti.native import FrameRing

log = get_logger("parallel.streams")


@dataclass
class StreamStats:
    captured: int = 0
    processed_batches: int = 0
    dropped_reads: int = 0


class StreamWorker:
    """Capture thread: FrameSource -> FrameRing."""

    def __init__(self, source: FrameSource, frame_shape: tuple[int, int, int],
                 ring_capacity: int = 8) -> None:
        self.source = source
        self.ring = FrameRing(ring_capacity, frame_shape)
        self.stats = StreamStats()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self) -> None:
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="tti-stream-capture")
        self._thread.start()

    def _loop(self) -> None:
        while not self._stop.is_set():
            ok, frame = self.source.read()
            if not ok or frame is None:
                self.stats.dropped_reads += 1
                if self.stats.dropped_reads % 100 == 99:
                    self.source.reconnect()
                time.sleep(0.005)
                continue
            self.ring.push(frame)
            self.stats.captured += 1

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)
        self.source.release()


class MultiStreamRunner:
    """S capture workers + one shared device pipeline, per-stream smoothing."""

    def __init__(self, pipeline, sources: Sequence[FrameSource],
                 frame_hw: tuple[int, int], ring_capacity: int = 8) -> None:
        self.pipeline = pipeline
        shape = (frame_hw[0], frame_hw[1], 3)
        self.workers = [StreamWorker(s, shape, ring_capacity) for s in sources]
        self.frame_hw = frame_hw
        self.measure_states = [
            init_measure_state(pipeline.measure_cfg.frame_buffer)
            for _ in sources
        ]
        self.batches = 0
        self._inflight = None  # device buffers of the dispatched-but-unread step

    def start(self) -> None:
        for w in self.workers:
            w.start()

    def wait_for_frames(self, timeout_s: float = 5.0) -> bool:
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            if all(w.ring.head() > 0 for w in self.workers):
                return True
            time.sleep(0.01)
        return False

    def assemble_batch(self) -> np.ndarray:
        """One freshest frame per stream, stream-major (S, H, W, 3) — one
        native gather call over all rings (tti.native.gather_batch)."""
        from tti.native import gather_batch

        s = len(self.workers)
        batch = np.zeros((s, self.frame_hw[0], self.frame_hw[1], 3), np.uint8)
        gather_batch([w.ring for w in self.workers], batch)
        return batch

    def _finish(self, outs):
        """Host-side bookkeeping shared by the sync and pipelined paths."""
        import jax

        results = []
        if outs.measurements is not None:
            for i in range(len(self.workers)):
                per = jax.tree_util.tree_map(lambda x: x[i], outs.measurements)
                self.measure_states[i], smoothed = smooth_measurement(
                    self.measure_states[i], per
                )
                results.append(smoothed)
        self.batches += 1
        for w in self.workers:
            w.stats.processed_batches += 1
        return outs, results

    def step(self):
        """One blocking device step over all streams; returns per-stream
        smoothed measurements + raw outputs."""
        batch = self.assemble_batch()
        return self._finish(self.pipeline.process_batch(batch))

    def step_pipelined(self):
        """Double-buffered step: dispatch THIS batch asynchronously, then
        materialize the PREVIOUS batch's results — ring snapshot, H2D upload
        and host postprocessing all overlap the device compute of the batch in
        flight (the async host-fed path; reference has no equivalent — its loop
        is strictly synchronous, main.py:187-329). Returns None on the first
        call (nothing in flight yet); call flush() to drain the last batch."""
        batch = self.assemble_batch()
        inflight = self.pipeline.process_batch_async(batch)
        prev, self._inflight = self._inflight, inflight
        if prev is None:
            return None
        return self._finish(self.pipeline.outputs_to_host(prev))

    def flush(self):
        """Materialize the final in-flight batch (pipelined mode)."""
        prev, self._inflight = self._inflight, None
        if prev is None:
            return None
        return self._finish(self.pipeline.outputs_to_host(prev))

    def run(self, num_batches: int, interval_s: float = 0.0) -> list:
        out = []
        for _ in range(num_batches):
            out.append(self.step())
            if interval_s:
                time.sleep(interval_s)
        return out

    def stop(self) -> None:
        for w in self.workers:
            w.stop()
