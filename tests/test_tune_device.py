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
