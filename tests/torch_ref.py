"""PyTorch YOLOv8-seg test oracle.

Ultralytics is not installed in this environment, so numerical parity of the
flax model (tti.model.yolo) is checked against this faithful torch
re-implementation of the public YOLOv8-seg architecture. Parameter names follow
the Ultralytics layout (``model.{idx}...``) so the same file also exercises
tti.model.convert's state-dict translation end-to-end.

Test-only code: never imported by the framework.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn

SCALES = {
    "n": (1 / 3, 0.25, 1024),
    "s": (1 / 3, 0.50, 1024),
    "m": (2 / 3, 0.75, 768),
}


def make_divisible(x, divisor=8):
    return int(math.ceil(x / divisor) * divisor)


class TConv(nn.Module):
    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TBottleneck(nn.Module):
    def __init__(self, c1, c2, shortcut=True):
        super().__init__()
        self.cv1 = TConv(c1, c2, 3)
        self.cv2 = TConv(c2, c2, 3)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC2f(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = TConv(c1, 2 * self.c, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(TBottleneck(self.c, self.c, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class TSPPF(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv(c_ * 4, c2, 1)
        self.m = nn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        for _ in range(3):
            y.append(self.m(y[-1]))
        return self.cv2(torch.cat(y, 1))


class TProto(nn.Module):
    def __init__(self, c1, c_, c2):
        super().__init__()
        self.cv1 = TConv(c1, c_, 3)
        self.upsample = nn.ConvTranspose2d(c_, c_, 2, 2, 0, bias=True)
        self.cv2 = TConv(c_, c_, 3)
        self.cv3 = TConv(c_, c2)

    def forward(self, x):
        return self.cv3(self.cv2(self.upsample(self.cv1(x))))


class TDFL(nn.Module):
    """Fixed arange projection (present in checkpoints; skipped by the converter)."""

    def __init__(self, c1=16):
        super().__init__()
        self.conv = nn.Conv2d(c1, 1, 1, bias=False)
        self.conv.weight.data[:] = torch.arange(c1, dtype=torch.float).view(1, c1, 1, 1)
        self.conv.weight.requires_grad_(False)


class TSegment(nn.Module):
    def __init__(self, nc, nm, npr, chs, reg_max=16):
        super().__init__()
        c2 = max(16, chs[0] // 4, reg_max * 4)
        c3 = max(chs[0], min(nc, 100))
        c4 = max(chs[0] // 4, nm)
        self.nc, self.nm, self.reg_max = nc, nm, reg_max
        self.cv2 = nn.ModuleList(
            nn.Sequential(TConv(ch, c2, 3), TConv(c2, c2, 3), nn.Conv2d(c2, 4 * reg_max, 1))
            for ch in chs
        )
        self.cv3 = nn.ModuleList(
            nn.Sequential(TConv(ch, c3, 3), TConv(c3, c3, 3), nn.Conv2d(c3, nc, 1))
            for ch in chs
        )
        self.cv4 = nn.ModuleList(
            nn.Sequential(TConv(ch, c4, 3), TConv(c4, c4, 3), nn.Conv2d(c4, nm, 1))
            for ch in chs
        )
        self.proto = TProto(chs[0], npr, nm)
        self.dfl = TDFL(reg_max)

    def forward(self, feats):
        protos = self.proto(feats[0])
        box = [m(f) for m, f in zip(self.cv2, feats)]
        cls = [m(f) for m, f in zip(self.cv3, feats)]
        coef = [m(f) for m, f in zip(self.cv4, feats)]
        return box, cls, coef, protos


class TorchYOLOv8Seg(nn.Module):
    """Backbone+neck+head with Ultralytics layer indices (model.0..model.22)."""

    def __init__(self, variant="n", nc=2, nm=32):
        super().__init__()
        d, w, maxc = SCALES[variant]
        ch = {c: make_divisible(min(c, maxc) * w, 8) for c in (64, 128, 256, 512, 1024)}
        n3, n6 = max(round(3 * d), 1), max(round(6 * d), 1)
        npr = make_divisible(256 * w, 8)

        m = nn.ModuleList()
        m.append(TConv(3, ch[64], 3, 2))                      # 0
        m.append(TConv(ch[64], ch[128], 3, 2))                # 1
        m.append(TC2f(ch[128], ch[128], n3, True))            # 2
        m.append(TConv(ch[128], ch[256], 3, 2))               # 3
        m.append(TC2f(ch[256], ch[256], n6, True))            # 4
        m.append(TConv(ch[256], ch[512], 3, 2))               # 5
        m.append(TC2f(ch[512], ch[512], n6, True))            # 6
        m.append(TConv(ch[512], ch[1024], 3, 2))              # 7
        m.append(TC2f(ch[1024], ch[1024], n3, True))          # 8
        m.append(TSPPF(ch[1024], ch[1024], 5))                # 9
        m.append(nn.Upsample(scale_factor=2, mode="nearest"))  # 10
        m.append(nn.Identity())                               # 11 Concat
        m.append(TC2f(ch[1024] + ch[512], ch[512], n3, False))  # 12
        m.append(nn.Upsample(scale_factor=2, mode="nearest"))  # 13
        m.append(nn.Identity())                               # 14 Concat
        m.append(TC2f(ch[512] + ch[256], ch[256], n3, False))  # 15
        m.append(TConv(ch[256], ch[256], 3, 2))               # 16
        m.append(nn.Identity())                               # 17 Concat
        m.append(TC2f(ch[256] + ch[512], ch[512], n3, False))  # 18
        m.append(TConv(ch[512], ch[512], 3, 2))               # 19
        m.append(nn.Identity())                               # 20 Concat
        m.append(TC2f(ch[512] + ch[1024], ch[1024], n3, False))  # 21
        m.append(TSegment(nc, nm, npr, (ch[256], ch[512], ch[1024])))  # 22
        self.model = m

    def forward(self, x):
        m = self.model
        x0 = m[0](x)
        x1 = m[1](x0)
        x2 = m[2](x1)
        x3 = m[3](x2)
        x4 = m[4](x3)
        x5 = m[5](x4)
        x6 = m[6](x5)
        x7 = m[7](x6)
        x8 = m[8](x7)
        x9 = m[9](x8)
        x12 = m[12](torch.cat([m[10](x9), x6], 1))
        x15 = m[15](torch.cat([m[13](x12), x4], 1))
        x18 = m[18](torch.cat([m[16](x15), x12], 1))
        x21 = m[21](torch.cat([m[19](x18), x9], 1))
        return m[22]((x15, x18, x21))


def randomize_running_stats(model: nn.Module, seed: int = 0) -> None:
    """Give BatchNorms non-trivial running stats so eval-mode parity is a real test."""
    gen = torch.Generator().manual_seed(seed)
    for mod in model.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.uniform_(-0.5, 0.5, generator=gen)
            mod.running_var.uniform_(0.5, 1.5, generator=gen)


def make_detecting_model(
    variant: str = "n", nc: int = 2, seed: int = 0,
    cls_gain: float = 1.0, bias_range: tuple[float, float] = (-4.0, -2.0),
) -> "TorchYOLOv8Seg":
    """A random but deterministic model whose outputs are INPUT-DEPENDENT and
    whose class logits actually cross the conf=0.20 operating point, so
    predict-chain tests exercise real detections, NMS and masks.

    Two ingredients:
    - BN running stats are CALIBRATED on smooth random images (cumulative
      average), not randomized: with random running stats the BN shift dwarfs
      the conv response and after ~20 layers the network output is constant in
      its input (measured: <1e-5 logit change between different frames).
    - The classification 1x1 convs get a gain and a moderate negative bias so
      a sparse subset of anchors crosses conf=0.20 (fresh-init detectors emit
      near-zero scores everywhere; un-tuned positive biases light up EVERY
      anchor)."""
    import torch.nn.functional as F

    torch.manual_seed(seed)
    model = TorchYOLOv8Seg(variant, nc=nc)
    for mod in model.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.reset_running_stats()
            mod.momentum = None  # cumulative average during calibration
    model.train()
    gen = torch.Generator().manual_seed(seed + 2)
    with torch.no_grad():
        for _ in range(2):
            low = torch.rand((2, 3, 32, 32), generator=gen)
            model(F.interpolate(low, scale_factor=8, mode="bilinear",
                                align_corners=False))
    for mod in model.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.momentum = 0.03
    gen = torch.Generator().manual_seed(seed + 1)
    seg = model.model[22]
    for branch in seg.cv3:
        branch[-1].weight.data.mul_(cls_gain)
        branch[-1].bias.data.uniform_(*bias_range, generator=gen)
    model.eval()
    return model


# ---------------------------------------------------------------------------
# Full Ultralytics predict-chain oracle.
#
# Ultralytics itself is not installable here (zero egress), so the predict
# pipeline is reproduced operation-for-operation from its public semantics:
# LetterBox(auto=True) preprocessing (cv2.INTER_LINEAR resize on uint8 +
# stride-aligned 114 padding), DFL decode over (grid+0.5)*stride anchors,
# class-aware greedy NMS with multi_label=False and strict `> conf` candidate
# filter, process_mask(upsample=True) = sigmoid(coef . proto) cropped at proto
# resolution then bilinear-upsampled to the model input and thresholded at 0.5,
# scale_boxes back to the frame, and finally the reference's own
# cv2.INTER_NEAREST mask resize to frame size (reference: measurement.py:70-86,
# 208-210). Where real Ultralytics is importable (ultralytics.YOLO), the
# parity test upgrades itself to run against it instead.
# ---------------------------------------------------------------------------

import numpy as np

ORACLE_STRIDES = (8, 16, 32)


def ultra_letterbox(img: np.ndarray, new_shape: tuple[int, int], stride: int = 32,
                    auto: bool = True) -> tuple[np.ndarray, float, tuple[int, int]]:
    """Ultralytics LetterBox.__call__: returns (letterboxed uint8 image, scale,
    (pad_left, pad_top))."""
    import cv2

    shape = img.shape[:2]
    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    new_unpad = int(round(shape[1] * r)), int(round(shape[0] * r))
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if auto:
        dw, dh = dw % stride, dh % stride
    dw /= 2
    dh /= 2
    if shape[::-1] != new_unpad:
        img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    img = cv2.copyMakeBorder(img, top, bottom, left, right, cv2.BORDER_CONSTANT,
                             value=(114, 114, 114))
    return img, r, (left, top)


def _flatten_levels(tensors: list[torch.Tensor]) -> torch.Tensor:
    """Per-level (1, C, H, W) -> (A, C) in the same y-major anchor order as
    tti.postprocess.decode.flatten_predictions."""
    return torch.cat([t.permute(0, 2, 3, 1).reshape(-1, t.shape[1]) for t in tensors], 0)


def _make_anchors_torch(shapes: list[tuple[int, int]]) -> tuple[torch.Tensor, torch.Tensor]:
    pts, strs = [], []
    for (h, w), s in zip(shapes, ORACLE_STRIDES):
        ys = (torch.arange(h, dtype=torch.float32) + 0.5) * s
        xs = (torch.arange(w, dtype=torch.float32) + 0.5) * s
        yy, xx = torch.meshgrid(ys, xs, indexing="ij")
        pts.append(torch.stack([xx.reshape(-1), yy.reshape(-1)], -1))
        strs.append(torch.full((h * w,), float(s)))
    return torch.cat(pts, 0), torch.cat(strs, 0)


def _greedy_nms_np(boxes: np.ndarray, scores: np.ndarray, classes: np.ndarray,
                   iou_thresh: float) -> list[int]:
    """torchvision.ops.nms semantics (score-sorted greedy, class-offset trick
    realised as a class equality mask). Inner pass vectorized over candidates."""
    order = np.argsort(-scores, kind="stable")
    keep: list[int] = []
    suppressed = np.zeros(len(boxes), bool)
    areas = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * np.maximum(boxes[:, 3] - boxes[:, 1], 0)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        lt = np.maximum(boxes[i, :2], boxes[:, :2])
        rb = np.minimum(boxes[i, 2:], boxes[:, 2:])
        wh = np.clip(rb - lt, 0.0, None)
        inter = wh[:, 0] * wh[:, 1]
        iou = inter / np.maximum(areas[i] + areas - inter, 1e-9)
        kill = (iou > iou_thresh) & (classes == classes[i])
        kill[i] = False
        suppressed |= kill
    return keep


def ultralytics_predict(
    model: TorchYOLOv8Seg,
    frame_bgr: np.ndarray,
    imgsz: int = 960,
    conf_thresh: float = 0.20,
    iou_thresh: float = 0.25,
    max_det: int = 200,
    stride: int = 32,
) -> dict:
    """The full predict chain on ONE frame, Ultralytics semantics end-to-end,
    plus the reference's frame-resolution mask extraction. Returns numpy
    {boxes (N,4) frame px, scores (N,), classes (N,), masks_input (N,Hi,Wi),
    masks_frame (N,H,W) uint8, letterbox (img, r, pad)}."""
    import cv2
    import torch.nn.functional as F

    h0, w0 = frame_bgr.shape[:2]
    img, r, (pad_l, pad_t) = ultra_letterbox(frame_bgr, (imgsz, imgsz), stride=stride)
    rgb = img[:, :, ::-1]
    x = torch.from_numpy(np.ascontiguousarray(rgb)).permute(2, 0, 1)[None].float() / 255.0
    ih, iw = x.shape[2], x.shape[3]

    with torch.no_grad():
        box_l, cls_l, coef_l, protos = model(x)

    shapes = [(t.shape[2], t.shape[3]) for t in box_l]
    anchors, stride_pa = _make_anchors_torch(shapes)
    box = _flatten_levels(box_l)  # (A, 64)
    cls = _flatten_levels(cls_l)  # (A, nc)
    coef = _flatten_levels(coef_l)  # (A, nm)

    # DFL decode (softmax expectation over 16 bins, exactly the arange conv).
    dist = (box.reshape(-1, 4, 16).softmax(-1) * torch.arange(16.0)).sum(-1)
    ltrb = dist * stride_pa[:, None]
    cx, cy = anchors[:, 0], anchors[:, 1]
    xyxy = torch.stack([cx - ltrb[:, 0], cy - ltrb[:, 1], cx + ltrb[:, 2], cy + ltrb[:, 3]], -1)

    probs = cls.sigmoid()
    best, cls_id = probs.max(-1)
    cand = best > conf_thresh  # strict >: Ultralytics non_max_suppression
    b_np = xyxy[cand].numpy()
    s_np = best[cand].numpy()
    c_np = cls_id[cand].numpy()
    m_np = coef[cand].numpy()

    keep = _greedy_nms_np(b_np, s_np, c_np, iou_thresh)[:max_det]
    b_np, s_np, c_np, m_np = b_np[keep], s_np[keep], c_np[keep], m_np[keep]

    # process_mask(upsample=True): crop at proto res, bilinear to input, >0.5.
    p = protos[0]  # (nm, Hm, Wm)
    nm, mh, mw = p.shape
    masks = torch.from_numpy(m_np) @ p.reshape(nm, -1)
    masks = masks.sigmoid().reshape(-1, mh, mw)
    down = torch.from_numpy(b_np.copy())
    down[:, [0, 2]] *= mw / iw
    down[:, [1, 3]] *= mh / ih
    rows = torch.arange(mh, dtype=torch.float32)[None, :, None]
    cols = torch.arange(mw, dtype=torch.float32)[None, None, :]
    inside = (
        (rows >= down[:, 1, None, None]) & (rows < down[:, 3, None, None])
        & (cols >= down[:, 0, None, None]) & (cols < down[:, 2, None, None])
    )
    masks = masks * inside
    if len(keep):
        masks = F.interpolate(masks[None], (ih, iw), mode="bilinear", align_corners=False)[0]
    else:
        masks = torch.zeros((0, ih, iw))
    masks_input = masks.gt(0.5).float().numpy()

    # scale_boxes: input px -> frame px, clipped.
    b_frame = b_np.copy()
    b_frame[:, [0, 2]] -= pad_l
    b_frame[:, [1, 3]] -= pad_t
    b_frame /= r
    b_frame[:, [0, 2]] = b_frame[:, [0, 2]].clip(0, w0)
    b_frame[:, [1, 3]] = b_frame[:, [1, 3]].clip(0, h0)

    # The reference's own frame-resolution mask extraction
    # (measurement.py:70-86): cv2 INTER_NEAREST resize, binarize > 0.
    masks_frame = np.stack(
        [
            (cv2.resize(m, (w0, h0), interpolation=cv2.INTER_NEAREST) > 0).astype(np.uint8)
            for m in masks_input
        ]
    ) if len(keep) else np.zeros((0, h0, w0), np.uint8)

    return {
        "boxes": b_frame,
        "scores": s_np,
        "classes": c_np.astype(np.int64),
        "coefs": m_np,
        "masks_input": masks_input,
        "masks_frame": masks_frame,
        "letterbox": (img, r, (pad_l, pad_t)),
    }
