"""Realistic synthetic textile dataset generator (YOLO-seg format).

The reference's model quality comes from offline-trained weights on a private
stitch/fabric dataset (reference config.py:67 — the framework only loads
`best_Model.pt`). That data does not exist in this environment, so the
trainer's done-criterion (VERDICT r1 item 4: train to a nontrivial, reported
box+mask mAP) runs on composites that reproduce the deployment scene geometry
(SURVEY §2 measurement core; reference measurement.py STEPs 1-4):

  * a woven fabric band with a wavy top edge (class 1 = fabric), tinted,
    textured, rotated a few degrees;
  * a row of dark stitches along that edge (class 0 = stitch) with spacing /
    size / rotation jitter and occasional gaps;
  * nuisance realism: illumination gradient + vignette, unlabeled distractor
    specks and lint, sensor noise, blur, JPEG compression.

Layout written:  OUT/{train,val}/images/*.jpg + OUT/{train,val}/labels/*.txt
(one `cls x1 y1 x2 y2 ...` normalized-polygon row per instance) — exactly what
`tti.train.data.discover_dataset` consumes.

Usage: python tools/synth_textile.py --out /tmp/textile_ds --train 256 --val 64
"""

from __future__ import annotations

import argparse
import os

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - generator is a dev tool; cv2 is in the image
    cv2 = None


def _weave_texture(h: int, w: int, rng: np.random.Generator) -> np.ndarray:
    """Woven-cloth luminance texture in [0,1]: warp/weft thread grids plus
    low-frequency cloth waviness."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    pitch = rng.uniform(3.0, 7.0)
    phase_x, phase_y = rng.uniform(0, 6.28, 2)
    warp = np.sin(xx * (2 * np.pi / pitch) + phase_x)
    weft = np.sin(yy * (2 * np.pi / pitch) + phase_y)
    tex = 0.5 + 0.08 * warp + 0.08 * weft + 0.06 * warp * weft
    tex += 0.05 * np.sin(xx / rng.uniform(40, 90) + np.sin(yy / rng.uniform(25, 60)))
    tex += rng.normal(0, 0.02, size=tex.shape).astype(np.float32)
    return np.clip(tex, 0.0, 1.0)


def _rot(points: np.ndarray, angle: float, about: np.ndarray) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    m = np.array([[c, -s], [s, c]], np.float32)
    return (points - about) @ m.T + about


def make_scene(size: int, rng: np.random.Generator):
    """One scene -> (bgr uint8 (S,S,3), polygons [(K,2) norm], classes)."""
    s = size
    img = np.zeros((s, s, 3), np.float32)

    # Background: dark workbench with gradient + streak clutter.
    base = rng.uniform(0.06, 0.22)
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
    grad = base * (1.0 + 0.5 * (rng.uniform(-1, 1) * xx + rng.uniform(-1, 1) * yy))
    img[:] = grad[..., None] * np.array(rng.uniform(0.8, 1.2, 3), np.float32)
    for _ in range(rng.integers(0, 4)):  # unlabeled clutter rectangles
        x0, y0 = rng.integers(0, s, 2)
        w0, h0 = rng.integers(s // 16, s // 4, 2)
        img[y0:y0 + h0, x0:x0 + w0] += rng.uniform(-0.05, 0.12)

    polygons: list[np.ndarray] = []
    classes: list[int] = []

    # Fabric band: wavy top edge at fy in [0.35, 0.65], small rotation.
    fy = rng.uniform(0.35, 0.65) * s
    amp = rng.uniform(1.0, 6.0)
    freq = rng.uniform(1.0, 3.0) * 2 * np.pi / s
    phase = rng.uniform(0, 6.28)
    angle = np.deg2rad(rng.uniform(-6, 6))
    edge_x = np.linspace(0, s, 33, dtype=np.float32)
    edge_y = fy + amp * np.sin(edge_x * freq + phase)

    top = np.stack([edge_x, edge_y], -1)
    margin = 0.25 * s  # extend beyond the frame so rotation leaves no gaps
    band = np.concatenate([
        [[-margin, edge_y[0]]], top, [[s + margin, edge_y[-1]]],
        [[s + margin, s + margin]], [[-margin, s + margin]],
    ]).astype(np.float32)
    center = np.array([s / 2, fy], np.float32)
    band = _rot(band, angle, center)

    tint = np.array([rng.uniform(0.55, 0.95) for _ in range(3)], np.float32)
    tint = tint / tint.max() * rng.uniform(0.6, 0.95)  # cream/pastel/grey cloth
    tex = _weave_texture(s, s, rng)
    fabric_mask = np.zeros((s, s), np.uint8)
    cv2.fillPoly(fabric_mask, [np.round(band).astype(np.int32)], 1)
    fm = fabric_mask.astype(np.float32)[..., None]
    img = img * (1 - fm) + fm * (tex[..., None] * tint)

    # The labeled fabric polygon: clip the band to the frame (the off-frame
    # margin vertices are a rasterization aid, not GT).
    band_clipped = np.clip(band / s, 0.0, 1.0)
    polygons.append(band_clipped)
    classes.append(1)

    # Stitch row: dark elongated marks straddling the fabric edge, tangent-
    # aligned, jittered spacing/size, occasional gaps.
    n_stitch = int(rng.integers(3, 9))
    pitch_px = rng.uniform(0.08, 0.16) * s
    start = rng.uniform(0.05, 0.25) * s
    stitch_col = np.array(rng.uniform(0.05, 0.25, 3), np.float32)
    for k in range(n_stitch):
        if rng.uniform() < 0.12:  # missing stitch (real lines have gaps)
            continue
        cx = start + k * pitch_px + rng.normal(0, 0.012 * s)
        if cx < 4 or cx > s - 4:
            continue
        cy = fy + amp * np.sin(cx * freq + phase) + rng.normal(0, 1.5)
        # straddle offset: stitches sit ON the edge, biased slightly down onto
        # the bright fabric (where a dark stitch is actually visible)
        cy += rng.uniform(0.0, 0.015) * s
        hw = rng.uniform(0.012, 0.03) * s   # half-width (along edge)
        hh = rng.uniform(0.006, 0.014) * s  # half-height
        local = np.deg2rad(rng.uniform(-10, 10))
        quad = np.array([[-hw, -hh], [hw, -hh], [hw, hh], [-hw, hh]], np.float32)
        quad = _rot(quad, local, np.zeros(2, np.float32)) + np.array([cx, cy], np.float32)
        quad = _rot(quad, angle, center)
        if quad[:, 0].max() < 2 or quad[:, 0].min() > s - 2:
            continue
        shade = stitch_col * rng.uniform(0.8, 1.2)
        poly_i = np.round(quad).astype(np.int32)
        stitch_mask = np.zeros((s, s), np.uint8)
        cv2.fillPoly(stitch_mask, [poly_i], 1)
        sm = stitch_mask.astype(np.float32)[..., None]
        img = img * (1 - sm) + sm * shade[None, None, :]
        polygons.append(np.clip(quad / s, 0.0, 1.0))
        classes.append(0)

    # Unlabeled distractors: specks + lint threads (must NOT be detected).
    for _ in range(rng.integers(0, 6)):
        x0, y0 = rng.integers(2, s - 2, 2)
        r = int(rng.integers(1, 3))
        cv2.circle(img, (int(x0), int(y0)), r,
                   tuple(float(v) for v in rng.uniform(0.05, 0.5, 3)), -1)
    for _ in range(rng.integers(0, 3)):
        p0 = rng.integers(0, s, 2)
        p1 = np.clip(p0 + rng.integers(-s // 4, s // 4, 2), 0, s - 1)
        cv2.line(img, tuple(int(v) for v in p0), tuple(int(v) for v in p1),
                 tuple(float(v) for v in rng.uniform(0.3, 0.7, 3)), 1)

    # Photometric chain: vignette, blur, sensor noise.
    r2 = ((xx - 0.5) ** 2 + (yy - 0.5) ** 2) * rng.uniform(0.0, 1.2)
    img *= (1.0 - r2)[..., None]
    sigma = rng.uniform(0.0, 1.3)
    if sigma > 0.2:
        img = cv2.GaussianBlur(img, (0, 0), sigma)
    img += rng.normal(0, rng.uniform(0.004, 0.02), size=img.shape).astype(np.float32)

    bgr = np.clip(img[..., ::-1] * 255, 0, 255).astype(np.uint8)
    return bgr, polygons, classes


def write_split(out_dir: str, n: int, size: int, seed: int, quality: int) -> None:
    images = os.path.join(out_dir, "images")
    labels = os.path.join(out_dir, "labels")
    os.makedirs(images, exist_ok=True)
    os.makedirs(labels, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        bgr, polys, classes = make_scene(size, rng)
        cv2.imwrite(os.path.join(images, f"scene_{i:05d}.jpg"), bgr,
                    [cv2.IMWRITE_JPEG_QUALITY, quality])
        with open(os.path.join(labels, f"scene_{i:05d}.txt"), "w") as f:
            for cls, poly in zip(classes, polys):
                coords = " ".join(f"{v:.6f}" for v in poly.reshape(-1))
                f.write(f"{cls} {coords}\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--train", type=int, default=256)
    ap.add_argument("--val", type=int, default=64)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--jpeg-quality", type=int, default=88)
    args = ap.parse_args()
    if cv2 is None:
        raise SystemExit("synth_textile.py requires cv2 (opencv)")
    write_split(os.path.join(args.out, "train"), args.train, args.size,
                args.seed, args.jpeg_quality)
    write_split(os.path.join(args.out, "val"), args.val, args.size,
                args.seed + 10_000, args.jpeg_quality)
    print(f"wrote {args.train} train + {args.val} val scenes to {args.out}")


if __name__ == "__main__":
    main()
