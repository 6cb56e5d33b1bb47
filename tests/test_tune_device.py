"""tools/tune_device.py plumbing: one tiny baseline trial end-to-end —
builds a pipeline, times it, writes the .env + .json artifacts, and leaves
the process environment clean (gates reset after each trial)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_tune_device_baseline_trial(tmp_path):
    from tools.tune_device import GATES, main

    os.environ["TTI_MASKSTATS"] = "xla"  # caller's env must not leak into trials
    out = str(tmp_path / "tune.env")
    main(["--batches", "2", "--imgsz", "64", "--frame-h", "96",
          "--frame-w", "128", "--iters", "2", "--lat-iters", "2",
          "--trials", "baseline", "--out", out])

    text = open(out).read()
    assert "throughput winner at batch 2: baseline" in text
    rows = json.load(open(out + ".json"))
    assert len(rows) == 1 and rows[0]["error"] is None
    assert rows[0]["fps"] > 0 and rows[0]["p50_ms"] > 0
    # trials reset every gate so later pipelines see defaults, not tuner state
    for g in GATES:
        assert g not in os.environ


def test_tune_device_crossover_line(tmp_path, monkeypatch):
    """The latency winner's recommendation names the measured batch range it
    wins in (the crossover bound), not just the smallest tuned batch."""
    import tools.tune_device as td

    canned = {
        ("baseline", 1): (100.0, 30.0),
        ("baseline", 16): (400.0, 40.0),
        ("baseline", 128): (1600.0, 50.0),
        ("warp_blocked=64", 1): (290.0, 20.0),
        ("warp_blocked=64", 16): (380.0, 25.0),
        ("warp_blocked=64", 128): (1300.0, 45.0),
    }

    def fake_trial(name, env, batch, *a, **k):
        fps, p50 = canned[(name, batch)]
        return td.TrialResult(name, batch, fps, p50, 0.0)

    monkeypatch.setattr(td, "run_trial", fake_trial)
    out = str(tmp_path / "tune.env")
    td.main(["--batches", "1,16,128", "--trials", "baseline,warp_blocked=64",
             "--out", out])
    text = open(out).read()
    assert "latency winner at batch 1: warp_blocked=64" in text
    assert "wins at batch <= 1" in text
    assert "crossover inside (1, 16)" in text


def test_tune_device_failed_trial_reported(tmp_path, monkeypatch):
    import tools.tune_device as td

    def boom(*a, **k):
        raise RuntimeError("unsupported on this toolchain")

    monkeypatch.setattr(td, "build_pipeline", boom)
    out = str(tmp_path / "tune.env")
    td.main(["--batches", "2", "--imgsz", "64", "--frame-h", "96",
             "--frame-w", "128", "--trials", "baseline,warp_s2d=0",
             "--out", out])
    rows = json.load(open(out + ".json"))
    assert all(r["error"] for r in rows)  # every trial failed, none crashed
    assert os.path.exists(out)  # report still written
