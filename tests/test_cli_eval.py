"""CLI `tti eval` smoke: the chunked predict loop end-to-end on a tiny
YOLO-format dataset (uneven final chunk included) with random-init weights.

Guards the eval harness plumbing — chunk padding, valid-prefix slicing,
src_index polygon realignment — not model quality (random weights may detect
nothing; the metrics just have to come back as numbers).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _write_dataset(root, n):
    images = root / "images"
    labels = root / "labels"
    images.mkdir(parents=True)
    labels.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
        img[40:, :] = 200  # fabric band
        img[30:36, 10:22] = 40  # one stitch
        cv2.imwrite(str(images / f"s_{i}.jpg"), img)
        (labels / f"s_{i}.txt").write_text(
            "1 0.0 0.625 1.0 0.625 1.0 1.0 0.0 1.0\n"
            "0 0.156 0.469 0.344 0.469 0.344 0.562 0.156 0.562\n"
        )
    return images


def test_cli_eval_smoke(tmp_path, capsys, monkeypatch):
    from tti.cli.__main__ import main

    images = _write_dataset(tmp_path / "ds", 3)  # 3 images: uneven last chunk
    monkeypatch.setenv("TTI_MODEL_WEIGHTS", "/nonexistent")  # random init
    rc = main(["eval", "--images", str(images), "--imgsz", "64"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "box:" in out and "mask(full-res):" in out
    # Metrics parse as floats (NaN-free dict reprs).
    assert "nan" not in out.lower()

def test_cli_eval_smoke_mask_stride2(tmp_path, capsys, monkeypatch):
    """Same harness at --mask-stride 2: the proto-res GT grid (imgsz/2) must
    match the hi-res model's proto output grid."""
    from tti.cli.__main__ import main

    images = _write_dataset(tmp_path / "ds2", 2)
    monkeypatch.setenv("TTI_MODEL_WEIGHTS", "/nonexistent")
    rc = main(["eval", "--images", str(images), "--imgsz", "64",
               "--mask-stride", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "box:" in out and "mask(full-res):" in out
    assert "nan" not in out.lower()


def test_load_pipeline_adopts_checkpoint_arch(tmp_path):
    """Pointing weights at a checkpoint whose sidecar declares a different
    architecture (here the stride-2 hi-res proto head) must reconfigure the
    model instead of dying on a shape mismatch at load — the sidecar is
    authoritative about the architecture the checkpoint was trained with."""
    from tti.cli.__main__ import _load_pipeline
    from tti.core.config import AppConfig, ModelConfig, RoiConfig
    from tti.model.convert import save_checkpoint
    from tti.model.yolo import create_model, init_variables

    model = create_model("n", nc=2, mask_stride=2)
    variables = init_variables(model, image_size=64)
    ckpt = str(tmp_path / "s2.msgpack")
    save_checkpoint(variables, ckpt, metadata={
        "variant": "n", "num_classes": 2, "mask_stride": 2})

    cfg = AppConfig(  # config says stride 4 — the checkpoint wins
        model=ModelConfig(weights=ckpt, image_size=64, mask_stride=4),
        roi=RoiConfig(enabled=False),
    )
    pipe = _load_pipeline(cfg, frame_hw=(64, 64))
    assert pipe.model.mask_stride == 2
    assert pipe.model_cfg.mask_stride == 2
