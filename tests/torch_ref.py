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
