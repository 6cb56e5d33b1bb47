"""YOLOv8-seg in flax (NHWC), variants n/s/m/l/x.

Replaces the reference's third-party inference engine (``ultralytics.YOLO`` at
reference: measurement.py:145,208-210) with a native JAX implementation:
CSPDarknet/C2f backbone, SPPF, PAN-FPN neck, decoupled anchor-free Detect head
with DFL box regression, mask-coefficient head and mask prototype head
(SURVEY.md §2 "Inference engine" row — the component the TPU framework
re-implements from scratch).

Design notes (TPU-first):
- NHWC everywhere; convs land on the MXU with no layout transposes.
- Raw head outputs are returned per-level as (B, H, W, C) tensors; DFL decode,
  NMS and mask assembly live in ``tti.postprocess`` so the whole forward stays
  dense and static-shaped.
- ``dtype`` selects the compute precision (bfloat16 by default in production);
  parameters stay float32.
- Module names mirror the public YOLOv8 layer indices (m0..m22) so weight
  conversion from PyTorch checkpoints is a mechanical rename
  (see tti.model.convert).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from tti.model.layers import C2f, Conv, Proto, SPPF, make_divisible, upsample2x_nearest

Dtype = Any

# depth multiple, width multiple, max channels — public YOLOv8 scale table.
SCALES: dict[str, tuple[float, float, int]] = {
    "n": (1 / 3, 0.25, 1024),
    "s": (1 / 3, 0.50, 1024),
    "m": (2 / 3, 0.75, 768),
    "l": (1.0, 1.0, 512),
    "x": (1.0, 1.25, 512),
}

STRIDES = (8, 16, 32)
REG_MAX = 16  # DFL bins per box side


def model_channels(variant: str) -> dict[str, int]:
    """Resolved channel counts for a variant (useful for head/proto sizing)."""
    d, w, maxc = SCALES[variant]
    ch = {c: make_divisible(min(c, maxc) * w, 8) for c in (64, 128, 256, 512, 1024)}
    return {
        "p3": ch[256],
        "p4": ch[512],
        "p5": ch[1024],
        "npr": make_divisible(256 * w, 8),  # proto hidden channels
        "depth3": max(round(3 * d), 1),
        "depth6": max(round(6 * d), 1),
        **{f"c{c}": ch[c] for c in (64, 128, 256, 512, 1024)},
    }


@flax.struct.dataclass
class RawPredictions:
    """Per-level raw head outputs (logits; decode in tti.postprocess).

    box:   3 x (B, Hl, Wl, 4*REG_MAX)  DFL distribution logits
    cls:   3 x (B, Hl, Wl, nc)         class logits (pre-sigmoid)
    mcoef: 3 x (B, Hl, Wl, nm)         mask coefficients (tanh-free, raw)
    protos:    (B, H/ms, W/ms, nm)     mask prototypes (ms = mask_stride, 4
                                       by default; 2 with the hi-res head)
    """

    box: tuple[jnp.ndarray, ...]
    cls: tuple[jnp.ndarray, ...]
    mcoef: tuple[jnp.ndarray, ...]
    protos: jnp.ndarray


def _cls_bias_init(stride: int, nc: int, imgsz: int = 640):
    """Focal-style prior so a fresh model starts near the detection operating
    point (~5 objects per 640px image)."""
    value = math.log(5 / nc / (imgsz / stride) ** 2)

    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init


class Segment(nn.Module):
    """Decoupled Detect + mask-coefficient branches + shared Proto.

    fused_entry: run the three branches' FIRST 3x3 convs (which share the same
    input feature map) as ONE conv with concatenated output channels — exact
    (independent convs on one input == one conv with stacked filters) and a
    better MXU shape (c2+c3+c4 output channels instead of three small convs).
    Weight layout transform: tti.model.convert.fuse_head_entries.
    """

    nc: int = 2
    nm: int = 32
    npr: int = 64
    ch: tuple[int, int, int] = (64, 128, 256)
    dtype: Dtype = jnp.float32
    fused_entry: bool = False
    folded: bool = False
    qmode: str = ""
    mask_stride: int = 4  # proto grid = input/mask_stride (4 = Ultralytics; 2 = hi-res tti extension)
    proto_head: str = "deconv"  # mask_stride=2 second stage: "deconv" | "subpixel"

    @nn.compact
    def __call__(
        self, feats: Sequence[jnp.ndarray], train: bool = False
    ) -> RawPredictions:
        c2 = max(16, self.ch[0] // 4, REG_MAX * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        c4 = max(self.ch[0] // 4, self.nm)

        protos = Proto(self.npr, self.nm, dtype=self.dtype, folded=self.folded, qmode=self.qmode,
                       ups={4: 1, 2: 2}[self.mask_stride],
                       subpixel=self.proto_head == "subpixel",
                       name="proto")(feats[0], train)

        box_out, cls_out, coef_out = [], [], []
        for level, x in enumerate(feats):
            if self.fused_entry:
                bcm = Conv(c2 + c3 + c4, 3, 1, dtype=self.dtype, folded=self.folded, qmode=self.qmode,
                           name=f"cvh_{level}")(x, train)
                b = bcm[..., :c2]
                c_in = bcm[..., c2 : c2 + c3]
                m_in = bcm[..., c2 + c3 :]
            else:
                b = Conv(c2, 3, 1, dtype=self.dtype, folded=self.folded, qmode=self.qmode, name=f"cv2_{level}_0")(x, train)
                c_in = None
                m_in = None
            b = Conv(c2, 3, 1, dtype=self.dtype, folded=self.folded, qmode=self.qmode, name=f"cv2_{level}_1")(b, train)
            b = nn.Conv(
                4 * REG_MAX, (1, 1), use_bias=True, dtype=self.dtype,
                param_dtype=jnp.float32, bias_init=nn.initializers.ones,
                name=f"cv2_{level}_2",
            )(b)
            if not self.fused_entry:
                c_in = Conv(c3, 3, 1, dtype=self.dtype, folded=self.folded, qmode=self.qmode, name=f"cv3_{level}_0")(x, train)
            c = Conv(c3, 3, 1, dtype=self.dtype, folded=self.folded, qmode=self.qmode, name=f"cv3_{level}_1")(c_in, train)
            c = nn.Conv(
                self.nc, (1, 1), use_bias=True, dtype=self.dtype,
                param_dtype=jnp.float32,
                bias_init=_cls_bias_init(STRIDES[level], self.nc),
                name=f"cv3_{level}_2",
            )(c)
            if not self.fused_entry:
                m_in = Conv(c4, 3, 1, dtype=self.dtype, folded=self.folded, qmode=self.qmode, name=f"cv4_{level}_0")(x, train)
            m = Conv(c4, 3, 1, dtype=self.dtype, folded=self.folded, qmode=self.qmode, name=f"cv4_{level}_1")(m_in, train)
            m = nn.Conv(
                self.nm, (1, 1), use_bias=True, dtype=self.dtype,
                param_dtype=jnp.float32, name=f"cv4_{level}_2",
            )(m)
            box_out.append(b)
            cls_out.append(c)
            coef_out.append(m)

        return RawPredictions(
            box=tuple(box_out), cls=tuple(cls_out), mcoef=tuple(coef_out), protos=protos
        )


def space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel order (a, b, c) for spatial
    phase (a, b)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space2(x: jnp.ndarray) -> jnp.ndarray:
    """Exact inverse of space_to_depth2: (B, H/2, W/2, 4C) -> (B, H, W, C)
    (pure permutation — depth_to_space2(space_to_depth2(x)) == x bitwise)."""
    b, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h2, w2, 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h2 * 2, w2 * 2, c)


class YOLOv8Seg(nn.Module):
    """Full segmentation network: backbone + PAN neck + Segment head.

    s2d_stem: replace the k3/s2 stem conv with an EXACT space-to-depth
    equivalent (k2/s1 conv on the 2x2-blocked 12-channel input with
    rearranged weights — see tti.model.convert.stem_to_s2d). A TPU layout
    optimization: the 3-channel full-resolution input wastes 125/128 lanes;
    blocking trades spatial extent for channels before the first conv.
    """

    variant: str = "n"
    nc: int = 2
    nm: int = 32
    dtype: Dtype = jnp.float32
    s2d_stem: bool = False
    # Input is ALREADY space-to-depth blocked (B, H/2, W/2, 4C) — the warp
    # emitted it directly (TwoPassWarp(s2d_out=True)); skip the in-model
    # blocking transpose. Only meaningful with s2d_stem=True.
    s2d_input: bool = False
    fused_head_entry: bool = False
    folded_bn: bool = False  # expects fold_batchnorm-transformed params
    # '' | 'int8' (W8A8, dynamic act scales) | 'int8s' (W8A8, static calibrated
    # act scales) | 'calib' (float + absmax recording). See tti.model.quantize.
    qmode: str = ""
    mask_stride: int = 4  # 4 = Ultralytics proto grid; 2 = hi-res proto head
    proto_head: str = "deconv"  # hi-res second stage: "deconv" | "subpixel"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> RawPredictions:
        cc = model_channels(self.variant)
        n3, n6 = cc["depth3"], cc["depth6"]
        dt = self.dtype
        fold = self.folded_bn
        qm = self.qmode
        x = x.astype(dt)

        # Backbone (P1..P5).
        if self.s2d_stem:
            z = x if self.s2d_input else space_to_depth2(x)
            x0 = Conv(cc["c64"], 2, 1, dtype=dt, pad=0, folded=fold, qmode=qm, name="m0s2d")(
                jnp.pad(z, ((0, 0), (1, 0), (1, 0), (0, 0))), train
            )
        else:
            x0 = Conv(cc["c64"], 3, 2, dtype=dt, folded=fold, qmode=qm, name="m0")(x, train)
        x1 = Conv(cc["c128"], 3, 2, dtype=dt, folded=fold, qmode=qm, name="m1")(x0, train)
        x2 = C2f(cc["c128"], n3, True, dtype=dt, folded=fold, qmode=qm, name="m2")(x1, train)
        x3 = Conv(cc["c256"], 3, 2, dtype=dt, folded=fold, qmode=qm, name="m3")(x2, train)
        x4 = C2f(cc["c256"], n6, True, dtype=dt, folded=fold, qmode=qm, name="m4")(x3, train)  # P3
        x5 = Conv(cc["c512"], 3, 2, dtype=dt, folded=fold, qmode=qm, name="m5")(x4, train)
        x6 = C2f(cc["c512"], n6, True, dtype=dt, folded=fold, qmode=qm, name="m6")(x5, train)  # P4
        x7 = Conv(cc["c1024"], 3, 2, dtype=dt, folded=fold, qmode=qm, name="m7")(x6, train)
        x8 = C2f(cc["c1024"], n3, True, dtype=dt, folded=fold, qmode=qm, name="m8")(x7, train)
        x9 = SPPF(cc["c1024"], 5, dtype=dt, folded=fold, qmode=qm, name="m9")(x8, train)  # P5

        # PAN neck.
        t = jnp.concatenate([upsample2x_nearest(x9), x6], axis=-1)
        x12 = C2f(cc["c512"], n3, False, dtype=dt, folded=fold, qmode=qm, name="m12")(t, train)
        t = jnp.concatenate([upsample2x_nearest(x12), x4], axis=-1)
        x15 = C2f(cc["c256"], n3, False, dtype=dt, folded=fold, qmode=qm, name="m15")(t, train)  # N3 out
        t = Conv(cc["c256"], 3, 2, dtype=dt, folded=fold, qmode=qm, name="m16")(x15, train)
        t = jnp.concatenate([t, x12], axis=-1)
        x18 = C2f(cc["c512"], n3, False, dtype=dt, folded=fold, qmode=qm, name="m18")(t, train)  # N4 out
        t = Conv(cc["c512"], 3, 2, dtype=dt, folded=fold, qmode=qm, name="m19")(x18, train)
        t = jnp.concatenate([t, x9], axis=-1)
        x21 = C2f(cc["c1024"], n3, False, dtype=dt, folded=fold, qmode=qm, name="m21")(t, train)  # N5 out

        head = Segment(
            nc=self.nc,
            nm=self.nm,
            npr=cc["npr"],
            ch=(cc["p3"], cc["p4"], cc["p5"]),
            dtype=dt,
            fused_entry=self.fused_head_entry,
            folded=fold, qmode=qm,
            mask_stride=self.mask_stride,
            proto_head=self.proto_head,
            name="m22",
        )
        return head((x15, x18, x21), train)


def create_model(
    variant: str = "n", nc: int = 2, nm: int = 32, dtype: Dtype = jnp.float32,
    mask_stride: int = 4, proto_head: str = "deconv",
) -> YOLOv8Seg:
    if variant not in SCALES:
        raise ValueError(f"unknown variant {variant!r}; choose from {sorted(SCALES)}")
    if mask_stride not in (2, 4):
        raise ValueError(f"mask_stride must be 2 or 4, got {mask_stride}")
    if proto_head not in ("deconv", "subpixel"):
        raise ValueError(
            f"proto_head must be 'deconv' or 'subpixel', got {proto_head!r}")
    return YOLOv8Seg(variant=variant, nc=nc, nm=nm, dtype=dtype,
                     mask_stride=mask_stride, proto_head=proto_head)


def init_variables(model: YOLOv8Seg, image_size: int = 640, seed: int = 0):
    """Initialize {'params', 'batch_stats'} with a dummy NHWC batch."""
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    return model.init(jax.random.PRNGKey(seed), dummy, train=False)
