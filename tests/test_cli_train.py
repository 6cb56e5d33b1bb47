"""CLI `tti train --resume` smoke: interrupt-and-continue training.

The reference has no trainer at all (SURVEY.md §5 checkpoint row: its story
is "load the .pt by path"); here the full TrainState checkpoints atomically,
and --resume re-enters the SAME run — the device-aug stream is a pure
function of the step index, so a resumed run replays the schedule an
uninterrupted run would have seen.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _write_dataset(root, n):
    images = root / "images"
    labels = root / "labels"
    images.mkdir(parents=True)
    labels.mkdir(parents=True)
    rng = np.random.default_rng(1)
    for i in range(n):
        img = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
        img[40:, :] = 200
        img[30:36, 10:22] = 40
        cv2.imwrite(str(images / f"s_{i}.jpg"), img)
        (labels / f"s_{i}.txt").write_text(
            "1 0.0 0.625 1.0 0.625 1.0 1.0 0.0 1.0\n"
            "0 0.156 0.469 0.344 0.469 0.344 0.562 0.156 0.562\n"
        )
    return images


def test_cli_train_resume(tmp_path, capsys):
    from tti.cli.__main__ import main

    images = _write_dataset(tmp_path / "ds", 16)  # 2 steps/epoch at batch 8
    out = tmp_path / "ckpt"
    common = ["train", "--images", str(images), "--imgsz", "64",
              "--batch-size", "8", "--lr", "1e-4", "--max-gt", "4",
              "--log-every", "1", "--checkpoint-every", "1",
              "--out", str(out)]
    # Leg 1: 1 epoch of the 2-epoch run (2 of 4 steps), then "interrupted".
    assert main(common + ["--epochs", "1"]) == 0
    capsys.readouterr()
    # Leg 2: same run re-entered at its full length.
    assert main(common + ["--epochs", "2", "--resume"]) == 0
    text = capsys.readouterr().out
    assert "resumed" in text and "at step 2/4" in text
    assert "step 3/4" in text and "step 4/4" in text
    assert "step 2/4:" not in text  # completed steps are not re-run
    final = out / "step_4" if (out / "step_4").exists() else out / "step_4.msgpack"
    assert final.exists()


def test_cli_export_weights(tmp_path, capsys):
    """train -> export-weights -> the deploy msgpack loads and its sidecar
    drives both architecture adoption and the auto sub-cell readout."""
    from tti.cli.__main__ import main
    from tti.core.config import MeasureConfig
    from tti.model.convert import checkpoint_metadata, load_checkpoint
    from tti.model.yolo import create_model, init_variables

    images = _write_dataset(tmp_path / "ds3", 8)  # 1 step/epoch at batch 8
    out = tmp_path / "run"
    assert main(["train", "--images", str(images), "--imgsz", "64",
                 "--batch-size", "8", "--epochs", "1", "--lr", "1e-4",
                 "--max-gt", "4", "--checkpoint-every", "1",
                 "--soft-masks", "--out", str(out)]) == 0
    capsys.readouterr()
    deploy = tmp_path / "deploy.msgpack"
    assert main(["export-weights", "--train-dir", str(out),
                 "--out", str(deploy), "--imgsz", "64",
                 "--soft-masks", "--recipe", "test run"]) == 0
    meta = checkpoint_metadata(str(deploy))
    assert meta["soft_masks"] is True and meta["variant"] == "n"
    assert meta["recipe"] == "test run"
    # The auto readout keys on the sidecar flag.
    assert MeasureConfig().with_subcell_from(meta).subcell_edge is True
    # And the exported tree loads back into the declared architecture.
    model = create_model(meta["variant"], nc=meta["num_classes"],
                         mask_stride=meta["mask_stride"],
                         proto_head=meta["proto_head"])
    template = init_variables(model, image_size=64)
    variables = load_checkpoint(str(deploy), template)
    assert "params" in variables


def test_cli_train_resume_rejects_host_aug(tmp_path, capsys):
    from tti.cli.__main__ import main

    images = _write_dataset(tmp_path / "ds2", 8)
    rc = main(["train", "--images", str(images), "--imgsz", "64",
               "--batch-size", "8", "--epochs", "1", "--host-aug",
               "--resume", "--out", str(tmp_path / "c")])
    assert rc == 1
    assert "resume" in capsys.readouterr().out
