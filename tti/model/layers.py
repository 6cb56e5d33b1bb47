"""YOLOv8 building blocks in flax (NHWC, TPU-native).

The reference delegates all of this to the Ultralytics/PyTorch wheel
(reference: measurement.py:145,208-210 — SURVEY.md §2 "Inference engine"); here the
CSP blocks are re-implemented for XLA: NHWC layout (TPU conv-native), bf16-friendly
compute dtype with fp32 params, BatchNorm running stats in flax's ``batch_stats``
collection so inference folds BN into the conv at compile time.

Semantics (kernel sizes, channel math, activation, BN eps/momentum) follow the
public YOLOv8 architecture so that converted PyTorch weights reproduce identical
outputs — verified in tests/test_model_parity.py against a torch oracle.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def quantize_act_per_sample(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-sample int8 quantization of an NHWC activation.

    Per-SAMPLE (not per-batch) scales keep every frame's result independent of
    batch composition — the multi-device equivalence tests (sharded == single
    device) and the parity story both rely on that. Returns
    (x_q int8, scale (B, 1, 1, 1) f32) with x ~= x_q * scale.
    """
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127.0, 127.0)
    return q.astype(jnp.int8), scale


def make_divisible(x: float, divisor: int = 8) -> int:
    return int(math.ceil(x / divisor) * divisor)


def autopad(k: int, d: int = 1) -> int:
    k_eff = d * (k - 1) + 1
    return k_eff // 2


class Conv(nn.Module):
    """Conv2d(bias=False) + BatchNorm + SiLU — the YOLOv8 'Conv' block.

    pad: explicit symmetric padding override (None -> autopad; 0 for VALID
    when the caller pre-pads, e.g. the space-to-depth stem).

    qmode='int8' (requires folded): W8A8 post-training quantization for the
    v5e MXU's 2x int8 throughput. Params become qkernel (int8, per-output-
    channel symmetric, from tti.model.quantize.quantize_weights), qscale
    (f32 per-channel) and bias; the activation is quantized per-sample at
    runtime (dynamic symmetric — no calibration set needed) and the conv
    accumulates in int32. Symmetric quantization maps padding zeros to int8
    zero, so SAME padding stays exact."""

    c2: int
    k: int = 1
    s: int = 1
    d: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32
    pad: int | None = None
    folded: bool = False  # inference: BN folded into conv weights+bias
    # "" (float) | "int8" (W8A8, dynamic per-sample act scales) | "int8s"
    # (W8A8, STATIC act scales calibrated offline — tti.model.quantize.
    # calibrate_act_scales; removes the per-layer absmax reduce + quant/dequant
    # HBM round-trips that made the dynamic variant lose its throughput A/B) |
    # "calib" (float forward that records each block's input absmax for the
    # static calibration). int8/int8s/calib all require folded BatchNorm.
    qmode: str = ""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        p = autopad(self.k, self.d) if self.pad is None else self.pad
        if self.qmode in ("int8", "int8s"):
            if not self.folded:
                raise ValueError(f"qmode={self.qmode!r} requires folded BatchNorm")
            c1 = x.shape[-1]
            kq = self.param(
                "qkernel", nn.initializers.zeros, (self.k, self.k, c1, self.c2),
                jnp.int8,
            )
            wscale = self.param(
                "qscale", nn.initializers.ones, (self.c2,), jnp.float32
            )
            bias = self.param("bias", nn.initializers.zeros, (self.c2,), jnp.float32)
            if self.qmode == "int8s":
                # Calibrated per-tensor scale: a graph CONSTANT, so the
                # quantize step fuses into the producer and no reduction or
                # extra activation pass hits HBM.
                xscale = self.param("ascale", nn.initializers.ones, (),
                                    jnp.float32)
                xf = x.astype(jnp.float32)
                xq = jnp.clip(jnp.round(xf / xscale), -127.0, 127.0
                              ).astype(jnp.int8)
            else:
                xq, xscale = quantize_act_per_sample(x)
            y = jax.lax.conv_general_dilated(
                xq,
                kq,
                window_strides=(self.s, self.s),
                padding=[(p, p), (p, p)],
                rhs_dilation=(self.d, self.d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            y = (y.astype(jnp.float32) * (xscale * wscale) + bias).astype(self.dtype)
            return nn.silu(y) if self.act else y
        if self.qmode == "calib":
            # Float forward + record this block's input absmax (the statistic
            # the static int8 path quantizes against). reduce_fn folds repeat
            # applications (scan/chunking) into one running max.
            if not self.folded:
                raise ValueError("qmode='calib' requires folded BatchNorm")
            self.sow("quant_calib", "absmax",
                     jnp.max(jnp.abs(x.astype(jnp.float32))),
                     init_fn=lambda: jnp.zeros((), jnp.float32),
                     reduce_fn=jnp.maximum)
        x = nn.Conv(
            self.c2,
            (self.k, self.k),
            strides=(self.s, self.s),
            padding=[(p, p), (p, p)],
            kernel_dilation=(self.d, self.d),
            use_bias=self.folded,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        if not self.folded:
            # torch BatchNorm2d(eps=1e-3, momentum=0.03): flax momentum = 1 - 0.03.
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.97,
                epsilon=1e-3,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="bn",
            )(x)
        return nn.silu(x) if self.act else x


class Bottleneck(nn.Module):
    """Two 3x3 Convs with optional residual (C2f inner block, e=1.0)."""

    c2: int
    shortcut: bool = True
    e: float = 1.0
    dtype: Dtype = jnp.float32
    folded: bool = False
    qmode: str = ""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_hidden = int(self.c2 * self.e)
        y = Conv(c_hidden, 3, 1, dtype=self.dtype, folded=self.folded, qmode=self.qmode, name="cv1")(x, train)
        y = Conv(self.c2, 3, 1, dtype=self.dtype, folded=self.folded, qmode=self.qmode, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            y = x + y
        return y


class C2f(nn.Module):
    """Cross-stage partial block with n bottlenecks and dense skip concat."""

    c2: int
    n: int = 1
    shortcut: bool = False
    e: float = 0.5
    dtype: Dtype = jnp.float32
    folded: bool = False
    qmode: str = ""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, folded=self.folded, qmode=self.qmode, name="cv1")(x, train)
        y1, y2 = jnp.split(y, 2, axis=-1)
        outs = [y1, y2]
        prev = y2
        for i in range(self.n):
            prev = Bottleneck(c, self.shortcut, e=1.0, dtype=self.dtype,
                              folded=self.folded, qmode=self.qmode, name=f"m{i}")(prev, train)
            outs.append(prev)
        return Conv(self.c2, 1, 1, dtype=self.dtype, folded=self.folded, qmode=self.qmode, name="cv2")(
            jnp.concatenate(outs, axis=-1), train
        )


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained k-pools, concat, project."""

    c2: int
    k: int = 5
    dtype: Dtype = jnp.float32
    folded: bool = False
    qmode: str = ""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_hidden = x.shape[-1] // 2
        y = Conv(c_hidden, 1, 1, dtype=self.dtype, folded=self.folded, qmode=self.qmode, name="cv1")(x, train)
        p = self.k // 2
        pools = [y]
        for _ in range(3):
            pools.append(
                nn.max_pool(
                    pools[-1], (self.k, self.k), strides=(1, 1), padding=[(p, p), (p, p)]
                )
            )
        return Conv(self.c2, 1, 1, dtype=self.dtype, folded=self.folded, qmode=self.qmode, name="cv2")(
            jnp.concatenate(pools, axis=-1), train
        )


class Proto(nn.Module):
    """Mask prototype head: conv -> learned 2x deconv -> conv -> 1x1 to nm protos.

    ups=1 is the Ultralytics structure (protos at input/4 from the P3/8 map).
    ups=2 emits protos at input/2 — a tti extension (mask_stride=2): the
    measured resolution ceiling on small objects (MASK_CEILING.md) is set by
    the proto grid, not the network, and the reference's fixed export cannot
    move it. Two ups=2 architectures exist:

    - subpixel=False ("deconv", the round-3 head): a SECOND learned 2x deconv
      + 3x3 conv stage ("upsample2"/"cv2b") running at the full input/2 grid.
      The cv2b 3x3 conv at (imgsz/2)^2 alone is ~17 GFLOP/image at imgsz 960
      (variant n) — it nearly doubles the whole network's FLOPs.
    - subpixel=True ("subpixel", the round-4 head): a 1x1 conv to 4*nm
      channels at the input/4 grid, then depth-to-space — the ESPCN
      sub-pixel convolution. Every 2x2 output block's nm protos come from
      the same input/4 feature column through per-phase filters, so the
      head expresses input/2 spatial detail while ALL compute stays on the
      input/4 grid: ~0.9 GFLOP/image vs the deconv head's ~20 at imgsz 960.
      TPU-first: the MXU sees one dense 64->128-channel 1x1 matmul instead
      of a deconv + a huge fine-grid conv, and the depth-to-space is a pure
      layout op XLA folds into the consumer.
    """

    c_hidden: int
    nm: int = 32
    dtype: Dtype = jnp.float32
    folded: bool = False
    qmode: str = ""
    ups: int = 1
    subpixel: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = Conv(self.c_hidden, 3, 1, dtype=self.dtype, folded=self.folded, qmode=self.qmode, name="cv1")(x, train)
        x = nn.ConvTranspose(
            self.c_hidden,
            (2, 2),
            strides=(2, 2),
            padding="VALID",
            use_bias=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="upsample",
        )(x)
        x = Conv(self.c_hidden, 3, 1, dtype=self.dtype, folded=self.folded, qmode=self.qmode, name="cv2")(x, train)
        if self.ups == 2 and self.subpixel:
            # Sub-pixel second stage: 1x1 conv to the 4 spatial phases' protos,
            # then depth-to-space. SiLU (inside Conv) is elementwise, so
            # applying it before the d2s permutation equals applying it after.
            x = Conv(4 * self.nm, 1, 1, dtype=self.dtype, folded=self.folded,
                     qmode=self.qmode, name="cv3sp")(x, train)
            b, h, w, c4 = x.shape
            x = x.reshape(b, h, w, 2, 2, self.nm)
            x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
            return x.reshape(b, 2 * h, 2 * w, self.nm)
        if self.ups == 2:
            x = nn.ConvTranspose(
                self.c_hidden,
                (2, 2),
                strides=(2, 2),
                padding="VALID",
                use_bias=True,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="upsample2",
            )(x)
            x = Conv(self.c_hidden, 3, 1, dtype=self.dtype, folded=self.folded, qmode=self.qmode, name="cv2b")(x, train)
        return Conv(self.nm, 1, 1, dtype=self.dtype, folded=self.folded, qmode=self.qmode, name="cv3")(x, train)


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest 2x upsample as repeats — cheaper for XLA than gather-based resize."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
