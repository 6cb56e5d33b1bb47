"""`tti validate-reference` — the one-shot harness for the day the
reference's real trained weights (best_Model.pt / single_needle_model.pt,
reference: config.py:67, measurement.py:145) become available.

The real .pt files are absent from the reference mount
(.MISSING_LARGE_BLOBS), so the command is exercised end-to-end on a
synthetic-torch fixture: a real Ultralytics-format state dict saved with
torch.save, converted, strict-verified, and pushed through the predict-chain
parity harness against the torch oracle.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("jax")

from tests.torch_ref import TorchYOLOv8Seg  # noqa: E402
from tti.cli.__main__ import main  # noqa: E402


def _save_pt(tmp_path, wrap: str = "model"):
    tmodel = TorchYOLOv8Seg(variant="n", nc=2)
    pt = str(tmp_path / "best_Model.pt")
    obj = {"model": tmodel} if wrap == "model" else tmodel.state_dict()
    torch.save(obj, pt)
    return pt


def test_validate_reference_end_to_end(tmp_path, capsys):
    """convert -> strict load report -> parity + measure reports, one shot."""
    pt = _save_pt(tmp_path)
    out_dir = str(tmp_path / "validation")
    rc = main([
        "validate-reference", "--pt", pt, "--out-dir", out_dir,
        # Small but real: 2 parity frames + 2 analytic measure scenes at a
        # reduced imgsz (the deployment default is 960).
        "--frames", "2", "--scenes", "2", "--imgsz", "320",
        "--frame-h", "240", "--frame-w", "320",
    ])
    assert rc == 0
    report = json.load(open(os.path.join(out_dir, "load_report.json")))
    assert report["variant"] == "n"
    assert report["num_classes"] == 2
    assert report["strict_load_problems"] == []
    assert report["torch_keys"] > 100
    # Converted checkpoint + arch sidecar exist and are adoptable.
    ckpt = os.path.join(out_dir, "reference_model.msgpack")
    assert os.path.exists(ckpt)
    meta = json.load(open(ckpt + ".json"))
    assert meta["variant"] == "n" and meta["mask_stride"] == 4
    # Both validation artifacts were produced.
    assert os.path.exists(os.path.join(out_dir, "PARITY_REFERENCE.md"))
    assert os.path.exists(os.path.join(out_dir, "MEASURE_REFERENCE.md"))


def test_validate_reference_rejects_garbage(tmp_path):
    """A .pt that is not a YOLOv8-seg state dict must fail loudly with a
    structural report, not convert silently."""
    pt = str(tmp_path / "junk.pt")
    torch.save({"model.0.conv.weight": torch.zeros(16, 3, 3, 3)}, pt)
    rc = main(["validate-reference", "--pt", pt,
               "--out-dir", str(tmp_path / "v"),
               "--skip-parity", "--skip-measure"])
    assert rc == 1
