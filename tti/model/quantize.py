"""Post-training int8 quantization (W8A8) for the inference path.

The reference runs its network through the Ultralytics predictor in float
(reference: measurement.py:208-210); this module is a tti-native capability on
top of that parity: the v5e MXU executes int8 x int8 -> int32 convolutions at
2x its bf16 rate, so for the compute-bound forward pass W8A8 is the principal
lever past the bf16 baseline.

Scheme (chosen for zero-calibration robustness):
- weights: per-OUTPUT-CHANNEL symmetric int8 (scale = absmax / 127), computed
  here, offline, from the BN-FOLDED float checkpoint;
- activations: per-SAMPLE symmetric int8, quantized dynamically in-graph
  (tti.model.layers.quantize_act_per_sample) — no calibration set, and each
  frame's result is independent of batch composition (the sharded==single
  equivalence contract relies on that);
- accumulation: int32, dequantized with (act_scale * weight_scale) + bias.

Only the YOLOv8 'Conv' blocks (conv+BN+SiLU) quantize; the final 1x1
predictor convs (DFL/class/coef logits), the proto ConvTranspose upsamples,
and everything in postprocess stay float — these are precision-critical and
computationally negligible.

Usage: variables = quantize_weights(fold_batchnorm(variables));
model = YOLOv8Seg(..., folded_bn=True, qmode="int8").
Env gate in the production pipeline: TTI_QUANT=int8.
"""

from __future__ import annotations

import numpy as np

Tree = dict


def quantize_conv_kernel(kernel: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(kh, kw, ci, co) f32 kernel -> (int8 kernel, (co,) f32 scales).

    Symmetric per-output-channel: scale_c = absmax_c / 127, q = round(w/scale).
    round-half-to-even matches the runtime activation quantizer.
    """
    k = np.asarray(kernel, np.float32)
    co = k.shape[-1]
    absmax = np.max(np.abs(k.reshape(-1, co)), axis=0)
    scale = np.maximum(absmax, 1e-12) / 127.0
    kq = np.clip(np.rint(k / scale), -127, 127).astype(np.int8)
    return kq, scale.astype(np.float32)


def quantize_weights(variables: Tree, skip: tuple[str, ...] = ()) -> Tree:
    """BN-folded float variables -> params for a qmode='int8' model.

    Every Conv-block node ({'conv': {'kernel', 'bias'}}, the shape
    fold_batchnorm emits) becomes {'qkernel' int8, 'qscale' f32, 'bias' f32}.
    Plain convs whose params sit directly at the module level (head exit 1x1s
    like m22/cv2_0_2, proto 'upsample' deconvs) are left untouched — the
    module definitions keep them float.

    skip: '/'-joined module paths to leave in float (accuracy escape hatch,
    e.g. ('m22/proto',) to keep the whole proto head float).
    """
    if "params" not in variables:
        raise ValueError("expected {'params': ...} (run fold_batchnorm first)")
    if "batch_stats" in variables and variables["batch_stats"]:
        raise ValueError("unfolded variables: run fold_batchnorm before quantize_weights")

    def skipped(path: tuple[str, ...]) -> bool:
        joined = "/".join(path)
        return any(joined == s or joined.startswith(s + "/") for s in skip)

    def walk(node: Tree, path: tuple[str, ...]) -> Tree:
        out: Tree = {}
        for key, val in node.items():
            if not isinstance(val, dict):
                out[key] = val
                continue
            sub = path + (key,)
            conv = val.get("conv")
            if (
                isinstance(conv, dict)
                and "kernel" in conv
                and np.asarray(conv["kernel"]).ndim == 4
                and not skipped(sub)
            ):
                kq, scale = quantize_conv_kernel(conv["kernel"])
                new: Tree = {
                    "qkernel": kq,
                    "qscale": scale,
                    "bias": np.asarray(conv["bias"], np.float32),
                }
                # Container blocks (C2f) hold sibling sub-blocks next to their
                # own conv node — recurse into those too.
                rest = {k: v for k, v in val.items() if k != "conv"}
                if rest:
                    new.update(walk(rest, sub))
                out[key] = new
            else:
                out[key] = walk(val, sub)
        return out

    return {"params": walk(dict(variables["params"]), ())}
