"""Training data pipeline: YOLO-format segmentation datasets -> Targets batches.

The reference trains its stitch/fabric models offline with Ultralytics on
YOLO-format data (images/ + labels/*.txt with normalized polygons); this loader
brings that in-framework so tti.train can produce deployment checkpoints.

Label format per line: ``class x1 y1 x2 y2 ...`` (normalized polygon vertices).
Masks rasterize at proto resolution (input/mask_stride); boxes derive from polygon
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


def rasterize_polygon_soft(poly_norm: np.ndarray, hw: tuple[int, int],
                           factor: int) -> np.ndarray:
    """Area-occupancy raster: binary raster at (h*factor, w*factor), exact
    box-filter down to hw — each cell holds the FRACTION of it inside the
    polygon. This is tools/proto_ceiling.py's soft-oracle definition (factor =
    mask_stride reproduces its full-res-then-area_downsample chain exactly).

    Why: the deployed mask chain bilinear-upsamples proto logits and
    thresholds at 0.5, so a calibrated fractional boundary cell places the
    boundary at SUB-CELL accuracy — the binary-target ceiling on
    camera-domain stitch AP is 0.605-0.646 (below the 0.65 bar) while the
    soft-target ceiling is 0.715-0.756 (MASK_CEILING.md)."""
    full = rasterize_polygon(poly_norm, (hw[0] * factor, hw[1] * factor))
    return full.reshape(hw[0], factor, hw[1], factor).mean(axis=(1, 3))


_IMAGE_CACHE: dict[tuple[str, int], np.ndarray] = {}
_IMAGE_CACHE_MAX_BYTES = 2 << 30  # ~2 GB of decoded u8 (mosaic re-reads every
_image_cache_bytes = 0            # image ~4x/epoch; decode+resize dominates)


def _load_resized_u8(path: str, imgsz: int) -> np.ndarray:
    """Decoded + square-resized RGB uint8, memoized. Callers must NOT mutate
    the returned array (every consumer copies before writing)."""
    global _image_cache_bytes
    key = (path, imgsz)
    cached = _IMAGE_CACHE.get(key)
    if cached is not None:
        return cached
    try:
        import cv2

        img = cv2.imread(path)
        if img is None:
            raise IOError(f"unreadable image {path}")
        img = cv2.resize(img, (imgsz, imgsz), interpolation=cv2.INTER_LINEAR)
        img = np.ascontiguousarray(img[..., ::-1])
    except ImportError:
        from PIL import Image

        img = np.asarray(Image.open(path).convert("RGB").resize((imgsz, imgsz)))
    if _image_cache_bytes + img.nbytes <= _IMAGE_CACHE_MAX_BYTES:
        _IMAGE_CACHE[key] = img
        _image_cache_bytes += img.nbytes
    return img


def load_image(path: str, imgsz: int) -> np.ndarray:
    """Image file -> letterbox-free square resize (training uses square resize
    like Ultralytics' default mosaic-off val path), normalized RGB float."""
    return _load_resized_u8(path, imgsz).astype(np.float32) / 255.0


def soft_class_ids(soft_masks, num_classes: int = 2,
                   stitch_class_id: int = 0,
                   fabric_class_id: int = 1) -> tuple[int, ...]:
    """Normalize every accepted `soft_masks` spelling to a tuple of class ids
    trained with soft (area-occupancy) targets.

    Accepted: False/None/"" -> (); True/"all" -> every class; "stitch" /
    "fabric" -> that class id; an iterable of ints -> as given. Per-class
    targets are the round-5 edge-bias recovery: stitch soft (mask AP,
    sub-cell width readout) while fabric stays binary so the envelope keeps
    the reference-exact integer bottom-row semantics (measurement.py:170-185
    semantics; see STATUS round-4 tradeoff table for why all-soft regressed
    edge mm)."""
    if soft_masks is None or soft_masks is False or soft_masks == "":
        return ()
    if soft_masks is True or soft_masks == "all":
        return tuple(range(num_classes))
    if soft_masks == "stitch":
        return (stitch_class_id,)
    if soft_masks == "fabric":
        return (fabric_class_id,)
    if isinstance(soft_masks, str):
        return tuple(int(t) for t in soft_masks.split(",") if t.strip())
    return tuple(int(c) for c in soft_masks)


def scene_to_targets(
    image: np.ndarray, polygons: list[np.ndarray], classes: list[int],
    imgsz: int, max_gt: int, mask_stride: int = 4, soft_masks: bool = False,
) -> tuple[np.ndarray, dict]:
    """(image [0,1] float (S,S,3), normalized polygons) -> padded Targets dict.
    Degenerate GT (clipped away by augmentation) is dropped. Masks rasterize
    on the model's proto grid (imgsz/mask_stride) — binary cells by default,
    fractional area-occupancy cells with soft_masks (rasterize_polygon_soft).
    soft_masks accepts every soft_class_ids spelling; per-class values
    rasterize only those classes soft."""
    hm = wm = imgsz // mask_stride
    boxes = np.zeros((max_gt, 4), np.float32)
    out_classes = np.zeros((max_gt,), np.int32)
    masks = np.zeros((max_gt, hm, wm), np.float32)
    valid = np.zeros((max_gt,), bool)
    # Which INPUT polygon each kept slot came from: degenerate GT is skipped,
    # so consumers re-deriving per-instance data from the raw polygon list
    # (e.g. full-res mask rasterization in `tti eval`) must index by this,
    # not by position.
    src_index = np.full((max_gt,), -1, np.int32)
    soft_ids = soft_class_ids(soft_masks)
    n_kept = 0
    for src_i, (poly, cls) in enumerate(zip(polygons, classes)):
        if n_kept >= max_gt:
            log.debug("scene: dropping GT beyond max_gt=%d", max_gt)
            break
        p = np.clip(poly, 0.0, 1.0)
        w = p[:, 0].max() - p[:, 0].min()
        h = p[:, 1].max() - p[:, 1].min()
        if w * imgsz < 2.0 or h * imgsz < 2.0:
            continue  # clipped to a sliver by augmentation
        boxes[n_kept] = [
            p[:, 0].min() * imgsz, p[:, 1].min() * imgsz,
            p[:, 0].max() * imgsz, p[:, 1].max() * imgsz,
        ]
        out_classes[n_kept] = cls
        masks[n_kept] = (rasterize_polygon_soft(p, (hm, wm), mask_stride)
                         if cls in soft_ids else rasterize_polygon(p, (hm, wm)))
        valid[n_kept] = True
        src_index[n_kept] = src_i
        n_kept += 1
    return image, {"boxes": boxes, "classes": out_classes, "masks": masks,
                   "valid": valid, "src_index": src_index}


def sample_to_targets(
    sample: Sample, imgsz: int, max_gt: int, hflip: bool = False,
    mask_stride: int = 4, soft_masks: bool = False,
) -> tuple[np.ndarray, dict]:
    image = load_image(sample.image_path, imgsz)
    polys = [p.copy() for p in sample.polygons]
    if hflip:
        image = image[:, ::-1].copy()
        for p in polys:
            p[:, 0] = 1.0 - p[:, 0]
    return scene_to_targets(image, polys, sample.classes, imgsz, max_gt,
                            mask_stride=mask_stride, soft_masks=soft_masks)


# ---------------------------------------------------------------------------
# Augmentation (the reference outsources training entirely — config.py:67;
# these mirror the Ultralytics train-time defaults: mosaic, hflip 0.5,
# HSV h=0.015/s=0.7/v=0.4, random scale +-0.5)
# ---------------------------------------------------------------------------


def hsv_jitter(image: np.ndarray, rng: np.random.Generator,
               hgain: float = 0.015, sgain: float = 0.7, vgain: float = 0.4) -> np.ndarray:
    """Random HSV color jitter on a [0,1] RGB float image."""
    try:
        import cv2
    except ImportError:
        # Value-only jitter fallback (no dependency).
        return np.clip(image * rng.uniform(1 - vgain, 1 + vgain), 0.0, 1.0)
    r = rng.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
    hsv = cv2.cvtColor((image * 255).astype(np.uint8), cv2.COLOR_RGB2HSV)
    h, s, v = cv2.split(hsv)
    h = ((h.astype(np.float32) * r[0]) % 180).astype(np.uint8)
    s = np.clip(s.astype(np.float32) * r[1], 0, 255).astype(np.uint8)
    v = np.clip(v.astype(np.float32) * r[2], 0, 255).astype(np.uint8)
    out = cv2.cvtColor(cv2.merge([h, s, v]), cv2.COLOR_HSV2RGB)
    return out.astype(np.float32) / 255.0


def random_scale_shift(
    image: np.ndarray, polygons: list[np.ndarray], rng: np.random.Generator,
    scale: float = 0.5, translate: float = 0.1,
) -> tuple[np.ndarray, list[np.ndarray]]:
    """Random zoom about the center + translation (the affine core of
    Ultralytics' RandomPerspective with degrees/shear off)."""
    s = rng.uniform(1 - scale, 1 + scale)
    tx = rng.uniform(-translate, translate)
    ty = rng.uniform(-translate, translate)
    h, w = image.shape[:2]
    # Normalized-coordinate affine: p' = (p - 0.5) * s + 0.5 + t
    out_polys = [((p - 0.5) * s + 0.5 + np.array([tx, ty], np.float32)).astype(np.float32)
                 for p in polygons]
    try:
        import cv2

        m = np.array([[s, 0, (0.5 + tx - 0.5 * s) * w],
                      [0, s, (0.5 + ty - 0.5 * s) * h]], np.float32)
        out = cv2.warpAffine(image, m, (w, h), flags=cv2.INTER_LINEAR,
                             borderValue=(0.447, 0.447, 0.447))  # 114/255 gray
        return out.astype(np.float32), out_polys
    except ImportError:
        # Gather-based nearest affine fallback.
        ys, xs = np.mgrid[0:h, 0:w]
        sx = ((xs + 0.5) / w - 0.5 - tx) / s + 0.5
        sy = ((ys + 0.5) / h - 0.5 - ty) / s + 0.5
        xi = np.clip((sx * w - 0.5).round().astype(int), 0, w - 1)
        yi = np.clip((sy * h - 0.5).round().astype(int), 0, h - 1)
        out = image[yi, xi]
        oob = (sx < 0) | (sx >= 1) | (sy < 0) | (sy >= 1)
        out[oob] = 0.447
        return out.astype(np.float32), out_polys


def mosaic4(
    samples: list[Sample], imgsz: int, rng: np.random.Generator,
) -> tuple[np.ndarray, list[np.ndarray], list[int]]:
    """4-image mosaic: a 2Sx2S canvas with one image per quadrant, randomly
    cropped back to SxS around a jittered center (the coverage-diversity
    workhorse of the YOLO training recipe)."""
    s = imgsz
    canvas = np.full((2 * s, 2 * s, 3), 114 / 255.0, np.float32)
    polys: list[np.ndarray] = []
    classes: list[int] = []
    for quadrant, sample in enumerate(samples[:4]):
        img = load_image(sample.image_path, s)
        oy, ox = (quadrant // 2) * s, (quadrant % 2) * s
        canvas[oy:oy + s, ox:ox + s] = img
        for poly, cls in zip(sample.polygons, sample.classes):
            p = poly * 0.5 + np.array([ox, oy], np.float32) / (2 * s)
            polys.append(p.astype(np.float32))
            classes.append(cls)
    # Crop an SxS window around a jittered center.
    cx = int(rng.uniform(0.25, 0.75) * 2 * s)
    cy = int(rng.uniform(0.25, 0.75) * 2 * s)
    x0 = int(np.clip(cx - s // 2, 0, s))
    y0 = int(np.clip(cy - s // 2, 0, s))
    image = canvas[y0:y0 + s, x0:x0 + s].copy()
    out_polys = [(p * 2 * s - np.array([x0, y0], np.float32)) / s for p in polys]
    return image, out_polys, classes


def augmented_scene(
    samples: list[Sample], idxs: np.ndarray, imgsz: int, rng: np.random.Generator,
    mosaic_p: float = 1.0, scale: float = 0.5, flip_p: float = 0.5,
) -> tuple[np.ndarray, list[np.ndarray], list[int]]:
    """One augmented training scene from dataset indices: mosaic (prob
    mosaic_p) or single image, then random scale/shift, HSV jitter, hflip."""
    if len(idxs) >= 4 and rng.uniform() < mosaic_p:
        image, polys, classes = mosaic4([samples[i] for i in idxs[:4]], imgsz, rng)
    else:
        sample = samples[idxs[0]]
        image = load_image(sample.image_path, imgsz)
        polys = [p.copy() for p in sample.polygons]
        classes = list(sample.classes)
    image, polys = random_scale_shift(image, polys, rng, scale=scale)
    image = hsv_jitter(image, rng)
    if rng.uniform() < flip_p:
        image = image[:, ::-1].copy()
        for p in polys:
            p[:, 0] = 1.0 - p[:, 0]
    return image, polys, classes


def batches(
    samples: list[Sample],
    batch_size: int,
    imgsz: int,
    max_gt: int = 32,
    seed: int = 0,
    augment: bool = True,
    epochs: int | None = None,
    mask_stride: int = 4,
    soft_masks: bool = False,
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
                if augment:
                    # Full train-time recipe: the epoch image is the mosaic
                    # primary, 3 random co-images, then scale/HSV/flip.
                    others = rng.integers(0, len(samples), 3)
                    img, polys, cls = augmented_scene(
                        samples, np.concatenate([[idx], others]), imgsz, rng
                    )
                    img, t = scene_to_targets(img, polys, cls, imgsz, max_gt,
                                              mask_stride=mask_stride,
                                              soft_masks=soft_masks)
                else:
                    img, t = sample_to_targets(samples[idx], imgsz, max_gt,
                                               mask_stride=mask_stride,
                                               soft_masks=soft_masks)
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
