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

STATIC variant (VERDICT r3 item 3): the dynamic per-sample activation scales
cost per-layer absmax reductions + quant/dequant passes XLA cannot fuse into
the conv — the measured reason the int8 A/B lost at batch 128 (4953 vs 6029
frames/s). qmode="int8s" replaces them with per-tensor scales calibrated
OFFLINE (calibrate_act_scales over a representative set, absmax or percentile)
baked into the param tree as constants, so the quantize step fuses into each
producer. Env gate: TTI_QUANT=int8s + TTI_QUANT_SCALES=<json from
tools/calibrate_int8.py>.
"""

from __future__ import annotations

import numpy as np

Tree = dict


def calibrate_act_scales(model, variables: Tree, batches,
                         percentile: float = 100.0) -> dict[str, float]:
    """Measure per-Conv-block input activation scales on calibration data.

    model: the inference model built with qmode="calib" (folded BN) — its
    Conv blocks sow each block's input absmax into the 'quant_calib'
    collection. batches: iterable of preprocessed model inputs (the SAME
    tensors the int8 model will see, e.g. pipeline.preprocess output).
    percentile: 100 = absmax over the whole set; <100 takes that percentile
    of the per-batch absmax stream (clips outlier frames).

    Returns {"m1": scale, "m2/cv1": scale, ...} keyed by '/'-joined block
    path — the key set quantize_weights(act_scales=...) expects.
    """
    per_batch: dict[str, list[float]] = {}
    for x in batches:
        _, aux = model.apply(variables, x, train=False, mutable=["quant_calib"])

        def walk(node, path):
            for key, val in node.items():
                if key == "absmax":
                    # sow stores a tuple of reduced values (one entry here).
                    vals = val if isinstance(val, (tuple, list)) else (val,)
                    top = max(float(np.asarray(v)) for v in vals)
                    per_batch.setdefault("/".join(path), []).append(top)
                elif isinstance(val, dict):
                    walk(val, path + (key,))

        walk(aux["quant_calib"], ())
    if not per_batch:
        raise ValueError("no quant_calib statistics — was the model built "
                         "with qmode='calib'?")
    out: dict[str, float] = {}
    for path, vals in per_batch.items():
        a = np.asarray(vals, np.float64)
        absmax = float(np.max(a)) if percentile >= 100.0 else float(
            np.percentile(a, percentile))
        out[path] = max(absmax, 1e-12) / 127.0
    return out


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


def quantize_weights(variables: Tree, skip: tuple[str, ...] = (),
                     act_scales: dict[str, float] | None = None) -> Tree:
    """BN-folded float variables -> params for a qmode='int8'/'int8s' model.

    Every Conv-block node ({'conv': {'kernel', 'bias'}}, the shape
    fold_batchnorm emits) becomes {'qkernel' int8, 'qscale' f32, 'bias' f32}.
    Plain convs whose params sit directly at the module level (head exit 1x1s
    like m22/cv2_0_2, proto 'upsample' deconvs) are left untouched — the
    module definitions keep them float.

    skip: '/'-joined module paths to leave in float (accuracy escape hatch,
    e.g. ('m22/proto',) to keep the whole proto head float).

    act_scales: calibrated per-block input scales ({'m2/cv1': s, ...} from
    calibrate_act_scales) — attaches each as the block's 'ascale' param for
    the STATIC qmode='int8s' path. Every quantized block must have a scale
    (a block quantized without one would silently use ascale=1).
    """
    if "params" not in variables:
        raise ValueError("expected {'params': ...} (run fold_batchnorm first)")
    if "batch_stats" in variables and variables["batch_stats"]:
        raise ValueError("unfolded variables: run fold_batchnorm before quantize_weights")

    def skipped(path: tuple[str, ...]) -> bool:
        joined = "/".join(path)
        return any(joined == s or joined.startswith(s + "/") for s in skip)

    quantized: list[str] = []

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
                joined = "/".join(sub)
                quantized.append(joined)
                if act_scales is not None:
                    new["ascale"] = np.asarray(act_scales[joined], np.float32)
                # Container blocks (C2f) hold sibling sub-blocks next to their
                # own conv node — recurse into those too.
                rest = {k: v for k, v in val.items() if k != "conv"}
                if rest:
                    new.update(walk(rest, sub))
                out[key] = new
            else:
                out[key] = walk(val, sub)
        return out

    try:
        params = walk(dict(variables["params"]), ())
    except KeyError as e:
        raise ValueError(
            f"act_scales is missing calibrated block {e} — regenerate with "
            "tools/calibrate_int8.py against THIS checkpoint/architecture"
        ) from None
    del quantized
    return {"params": params}
