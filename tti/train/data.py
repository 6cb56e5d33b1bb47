"""Training data pipeline: YOLO-format segmentation datasets -> Targets batches.

The reference trains its stitch/fabric models offline with Ultralytics on
YOLO-format data (images/ + labels/*.txt with normalized polygons); this loader
brings that in-framework so tti.train can produce deployment checkpoints.

Label format per line: ``class x1 y1 x2 y2 ...`` (normalized polygon vertices).
Masks rasterize at proto resolution (input/4); boxes derive from polygon
extents. Everything is padded to ``max_gt`` with valid=False (fixed shapes).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

import numpy as np

from tti.core.logging import get_logger
from tti.train.step import Targets

log = get_logger("train.data")

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


@dataclass
class Sample:
    image_path: str
    polygons: list[np.ndarray]  # each (K, 2) normalized [0,1]
    classes: list[int]


def _labels_path(image_path: str) -> str:
    base, _ = os.path.splitext(image_path)
    candidate = base + ".txt"
    if os.path.exists(candidate):
        return candidate
    # Standard YOLO layout: .../images/x.jpg -> .../labels/x.txt
    return candidate.replace(f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}")


def parse_label_file(path: str) -> tuple[list[np.ndarray], list[int]]:
    polygons: list[np.ndarray] = []
    classes: list[int] = []
    if not os.path.exists(path):
        return polygons, classes
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if len(parts) < 7 or (len(parts) - 1) % 2 != 0:
                continue  # need >= 3 vertices
            classes.append(int(float(parts[0])))
            coords = np.asarray([float(v) for v in parts[1:]], np.float32).reshape(-1, 2)
            polygons.append(np.clip(coords, 0.0, 1.0))
    return polygons, classes


def discover_dataset(images_dir: str) -> list[Sample]:
    samples = []
    for name in sorted(os.listdir(images_dir)):
        if not name.lower().endswith(IMG_EXTS):
            continue
        path = os.path.join(images_dir, name)
        polygons, classes = parse_label_file(_labels_path(path))
        samples.append(Sample(path, polygons, classes))
    if not samples:
        raise FileNotFoundError(f"no images in {images_dir}")
    log.info("dataset: %d images from %s", len(samples), images_dir)
    return samples


def rasterize_polygon(poly_norm: np.ndarray, hw: tuple[int, int]) -> np.ndarray:
    """Normalized polygon -> binary mask at hw. cv2.fillPoly when available,
    else an even-odd scanline fill (no dependency)."""
    h, w = hw
    pts = poly_norm * np.array([w, h], np.float32)
    try:
        import cv2

        mask = np.zeros((h, w), np.uint8)
        cv2.fillPoly(mask, [np.round(pts).astype(np.int32)], 1)
        return mask.astype(np.float32)
    except ImportError:
        pass
    mask = np.zeros((h, w), np.float32)
    xs, ys = pts[:, 0], pts[:, 1]
    n = len(pts)
    for row in range(h):
        yc = row + 0.5
        crossings = []
        for i in range(n):
            x1, y1 = xs[i], ys[i]
            x2, y2 = xs[(i + 1) % n], ys[(i + 1) % n]
            if (y1 <= yc < y2) or (y2 <= yc < y1):
                crossings.append(x1 + (yc - y1) / (y2 - y1) * (x2 - x1))
        crossings.sort()
        for a, b in zip(crossings[0::2], crossings[1::2]):
            mask[row, max(0, int(np.ceil(a - 0.5))) : min(w, int(np.floor(b + 0.5)))] = 1.0
    return mask


def load_image(path: str, imgsz: int) -> np.ndarray:
    """Image file -> letterbox-free square resize (training uses square resize
    like Ultralytics' default mosaic-off val path), normalized RGB float."""
    try:
        import cv2

        img = cv2.imread(path)
        if img is None:
            raise IOError(f"unreadable image {path}")
        img = cv2.resize(img, (imgsz, imgsz), interpolation=cv2.INTER_LINEAR)
        return img[..., ::-1].astype(np.float32) / 255.0
    except ImportError:
        from PIL import Image

        img = Image.open(path).convert("RGB").resize((imgsz, imgsz))
        return np.asarray(img, np.float32) / 255.0


def sample_to_targets(
    sample: Sample, imgsz: int, max_gt: int, hflip: bool = False
) -> tuple[np.ndarray, dict]:
    image = load_image(sample.image_path, imgsz)
    hm = wm = imgsz // 4
    boxes = np.zeros((max_gt, 4), np.float32)
    classes = np.zeros((max_gt,), np.int32)
    masks = np.zeros((max_gt, hm, wm), np.float32)
    valid = np.zeros((max_gt,), bool)
    if hflip:
        image = image[:, ::-1].copy()
    n_kept = 0
    for poly, cls in zip(sample.polygons, sample.classes):
        if n_kept >= max_gt:
            log.debug("sample %s: dropping GT beyond max_gt=%d", sample.image_path, max_gt)
            break
        p = poly.copy()
        if hflip:
            p[:, 0] = 1.0 - p[:, 0]
        boxes[n_kept] = [
            p[:, 0].min() * imgsz, p[:, 1].min() * imgsz,
            p[:, 0].max() * imgsz, p[:, 1].max() * imgsz,
        ]
        classes[n_kept] = cls
        masks[n_kept] = rasterize_polygon(p, (hm, wm))
        valid[n_kept] = True
        n_kept += 1
    return image, {"boxes": boxes, "classes": classes, "masks": masks, "valid": valid}


def batches(
    samples: list[Sample],
    batch_size: int,
    imgsz: int,
    max_gt: int = 32,
    seed: int = 0,
    augment: bool = True,
    epochs: int | None = None,
) -> Iterator[tuple[np.ndarray, Targets]]:
    """Shuffled, padded (images (B,S,S,3), Targets) batches, forever unless
    ``epochs`` bounds it."""
    import jax.numpy as jnp

    if len(samples) < batch_size:
        raise ValueError(
            f"dataset has {len(samples)} images but batch_size={batch_size}; "
            "training would silently run zero steps"
        )
    remainder = len(samples) % batch_size
    if remainder:
        log.info("dropping %d trailing images per epoch (dataset %% batch_size)",
                 remainder)

    rng = np.random.default_rng(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(len(samples))
        for start in range(0, len(order) - batch_size + 1, batch_size):
            imgs, tgts = [], []
            for idx in order[start : start + batch_size]:
                flip = bool(augment and rng.uniform() < 0.5)
                img, t = sample_to_targets(samples[idx], imgsz, max_gt, hflip=flip)
                imgs.append(img)
                tgts.append(t)
            stack = {k: np.stack([t[k] for t in tgts]) for k in tgts[0]}
            yield (
                np.stack(imgs),
                Targets(
                    boxes=jnp.asarray(stack["boxes"]),
                    classes=jnp.asarray(stack["classes"]),
                    masks=jnp.asarray(stack["masks"]),
                    valid=jnp.asarray(stack["valid"]),
                ),
            )
        epoch += 1
