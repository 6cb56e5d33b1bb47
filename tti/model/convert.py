"""PyTorch -> flax weight conversion and native checkpoint IO.

The reference loads ``.pt`` weights by path (reference: config.py:67,
measurement.py:145). Here deployment checkpoints are msgpack flax variable trees
(via flax.serialization), and this module converts Ultralytics-format PyTorch
state dicts (``model.{idx}.{...}`` keys) into them.

Conversion is a mechanical rename + transpose:
- conv weights  (O, I, kH, kW) -> (kH, kW, I, O)
- deconv weights (I, O, kH, kW) -> (kH, kW, I, O)
- BatchNorm weight/bias -> params.bn.{scale,bias};
  running_mean/var -> batch_stats.bn.{mean,var}
- ``model.22.dfl.conv.weight`` is skipped: it is the fixed arange(16) projection,
  realised as softmax-expectation in tti.postprocess.decode (no parameters).

The torch module index map (m0..m22) matches tti.model.yolo by construction.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np

Tree = dict[str, Any]


def _set_path(tree: Tree, path: list[str], value: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _to_numpy(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


_HEAD_BRANCH = re.compile(r"^(cv[234])\.(\d)\.(\d)\.(.*)$")
_C2F_INNER = re.compile(r"^m\.(\d+)\.(.*)$")


def _convert_leaf(rest: str, tensor: np.ndarray, params_path: list[str],
                  params: Tree, batch_stats: Tree, transpose_deconv: bool = False) -> None:
    """Map one torch parameter suffix (e.g. 'conv.weight', 'bn.running_mean')
    into the flax tree rooted at params_path."""
    if rest == "conv.weight":
        _set_path(params, params_path + ["conv", "kernel"], tensor.transpose(2, 3, 1, 0))
    elif rest == "bn.weight":
        _set_path(params, params_path + ["bn", "scale"], tensor)
    elif rest == "bn.bias":
        _set_path(params, params_path + ["bn", "bias"], tensor)
    elif rest == "bn.running_mean":
        _set_path(batch_stats, params_path + ["bn", "mean"], tensor)
    elif rest == "bn.running_var":
        _set_path(batch_stats, params_path + ["bn", "var"], tensor)
    elif rest == "bn.num_batches_tracked":
        pass
    elif rest == "weight":  # plain conv / deconv with bias
        if transpose_deconv:
            # torch ConvTranspose2d is the gradient-of-conv (kernel applied
            # flipped relative to lax.conv_transpose's default): flip spatial
            # dims, then (I, O, kH, kW) -> flax (kH, kW, I, O). Verified
            # numerically against torch in tests/test_model_parity.py.
            _set_path(
                params,
                params_path + ["kernel"],
                tensor[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy(),
            )
        else:
            _set_path(params, params_path + ["kernel"], tensor.transpose(2, 3, 1, 0))
    elif rest == "bias":
        _set_path(params, params_path + ["bias"], tensor)
    else:
        raise ValueError(f"unhandled parameter suffix: {rest!r} at {'/'.join(params_path)}")


def convert_torch_state_dict(state_dict: Mapping[str, Any]) -> dict[str, Tree]:
    """Convert an Ultralytics-format state dict to flax variables
    {'params': ..., 'batch_stats': ...} matching tti.model.yolo.YOLOv8Seg."""
    params: Tree = {}
    batch_stats: Tree = {}

    for name, value in state_dict.items():
        if not name.startswith("model."):
            continue
        tensor = _to_numpy(value)
        _, idx_str, rest = name.split(".", 2)
        module = f"m{idx_str}"

        if "dfl" in rest:
            continue  # fixed arange projection, realised in postprocess

        path = [module]
        # Head branches: cv2/cv3/cv4 .level.block.suffix and proto.*
        head_match = _HEAD_BRANCH.match(rest)
        if head_match:
            branch, level, block, suffix = head_match.groups()
            path.append(f"{branch}_{level}_{block}")
            _convert_leaf(suffix, tensor, path, params, batch_stats)
            continue
        if rest.startswith("proto."):
            sub = rest[len("proto."):]
            if sub.startswith("upsample."):
                _convert_leaf(sub[len("upsample."):], tensor, path + ["proto", "upsample"],
                              params, batch_stats, transpose_deconv=True)
            else:
                inner, _, suffix = sub.partition(".")
                # cv1/cv2/cv3 are Conv blocks: suffix like 'conv.weight'/'bn.*'
                _convert_leaf(suffix, tensor, path + ["proto", inner], params, batch_stats)
            continue

        # C2f inner bottlenecks: m.{j}.cvX.* -> m{j}/cvX/*
        inner_match = _C2F_INNER.match(rest)
        if inner_match:
            j, sub = inner_match.groups()
            inner, _, suffix = sub.partition(".")
            _convert_leaf(suffix, tensor, path + [f"m{j}", inner], params, batch_stats)
            continue

        # cv1/cv2 of C2f/SPPF, or stem 'conv.weight'/'bn.*' directly.
        if rest.startswith(("cv1.", "cv2.")):
            inner, _, suffix = rest.partition(".")
            _convert_leaf(suffix, tensor, path + [inner], params, batch_stats)
        else:
            _convert_leaf(rest, tensor, path, params, batch_stats)

    return {"params": params, "batch_stats": batch_stats}


def to_torch_state_dict(variables: Tree, reg_max: int = 16) -> dict[str, np.ndarray]:
    """Inverse of convert_torch_state_dict: flax variables -> Ultralytics-format
    torch state dict (numpy float32 values; wrap each in torch.from_numpy to
    load). This lets tti-TRAINED checkpoints run through the torch/Ultralytics
    oracle, so predict-chain parity is measured with production weights rather
    than argued from untrained seeded networks.

    Emits the fixed DFL arange projection (``model.22.dfl.conv.weight``) and
    zero ``num_batches_tracked`` entries so ``load_state_dict(strict=True)``
    passes. Requires UNFOLDED variables (params + batch_stats): fold_batchnorm
    output has no running statistics to export."""
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    proto = params.get("m22", {}).get("proto", {})
    if "upsample2" in proto or "cv2b" in proto:
        raise ValueError(
            "mask_stride=2 checkpoints (hi-res proto head) have no Ultralytics "
            "counterpart — the torch Segment head is fixed at proto=input/4")
    out: dict[str, np.ndarray] = {}

    _head = re.compile(r"^cv[234]_\d+_\d+$")
    _inner = re.compile(r"^m\d+$")

    def torch_prefix(path: list[str]) -> str:
        parts: list[str] = []
        for depth, key in enumerate(path):
            if depth == 0:
                if not _inner.fullmatch(key):
                    raise ValueError(
                        f"cannot export transformed module {key!r} — export the "
                        "raw (pre-s2d/pre-head-fusion) checkpoint")
                parts += ["model", key[1:]]  # "m22" -> "model.22"
            elif _head.fullmatch(key):
                branch, level, block = key.split("_")
                parts += [branch, level, block]  # cv2_0_1 -> cv2.0.1
            elif _inner.fullmatch(key):
                parts += ["m", key[1:]]  # C2f bottleneck list: m0 -> m.0
            else:
                parts.append(key)  # cv1/cv2/cv3/proto/upsample/conv/bn
        return ".".join(parts)

    def emit(path: list[str], pnode: Tree, snode) -> None:
        prefix = torch_prefix(path)
        if "kernel" in pnode:  # plain conv (head exit 1x1s) or the proto deconv
            k = np.asarray(pnode["kernel"], np.float32)
            if path[-1] == "upsample":
                # Invert the deconv import transform (see _convert_leaf):
                # flax (kH, kW, I, O) -> spatial flip -> torch (I, O, kH, kW).
                out[prefix + ".weight"] = k.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1].copy()
            else:
                out[prefix + ".weight"] = k.transpose(3, 2, 0, 1).copy()
            if "bias" in pnode:
                out[prefix + ".bias"] = np.asarray(pnode["bias"], np.float32)
            return
        if "conv" in pnode and "bn" not in pnode and "kernel" in pnode["conv"]:
            raise ValueError(
                f"{prefix}: BN-folded variables cannot be exported — pass the "
                "unfolded checkpoint (torch needs running statistics)")
        if "conv" in pnode and "bn" in pnode:
            out[prefix + ".conv.weight"] = (
                np.asarray(pnode["conv"]["kernel"], np.float32).transpose(3, 2, 0, 1).copy()
            )
            out[prefix + ".bn.weight"] = np.asarray(pnode["bn"]["scale"], np.float32)
            out[prefix + ".bn.bias"] = np.asarray(pnode["bn"]["bias"], np.float32)
            sbn = (snode or {}).get("bn")
            if sbn is None:
                raise ValueError(f"{prefix}: missing batch_stats for BN export")
            out[prefix + ".bn.running_mean"] = np.asarray(sbn["mean"], np.float32)
            out[prefix + ".bn.running_var"] = np.asarray(sbn["var"], np.float32)
            out[prefix + ".bn.num_batches_tracked"] = np.zeros((), np.int64)
            return
        for key, child in pnode.items():
            if isinstance(child, dict):
                emit(path + [key],
                     child,
                     snode.get(key, {}) if isinstance(snode, dict) else {})

    for module, pnode in params.items():
        emit([module], pnode, batch_stats.get(module, {}))

    out["model.22.dfl.conv.weight"] = (
        np.arange(reg_max, dtype=np.float32).reshape(1, reg_max, 1, 1)
    )
    return out


def verify_tree_shapes(converted: Tree, reference: Tree, path: str = "") -> list[str]:
    """Compare converted tree against a model-initialized tree; returns a list of
    mismatch descriptions (empty = structurally identical)."""
    problems: list[str] = []
    ref_keys = set(reference)
    conv_keys = set(converted)
    for missing in sorted(ref_keys - conv_keys):
        problems.append(f"missing {path}/{missing}")
    for extra in sorted(conv_keys - ref_keys):
        problems.append(f"unexpected {path}/{extra}")
    for key in sorted(ref_keys & conv_keys):
        r, c = reference[key], converted[key]
        if isinstance(r, dict):
            if not isinstance(c, dict):
                problems.append(f"type mismatch at {path}/{key}")
            else:
                problems.extend(verify_tree_shapes(c, r, f"{path}/{key}"))
        else:
            if tuple(np.shape(c)) != tuple(np.shape(r)):
                problems.append(
                    f"shape mismatch at {path}/{key}: {np.shape(c)} vs {np.shape(r)}"
                )
    return problems


def stem_to_s2d(variables: Tree) -> Tree:
    """Rewrite the k3/s2 stem (m0) into the exact space-to-depth form (m0s2d):
    a k2/s1 conv over the 2x2-blocked 12-channel input.

    Derivation: out(i,j) = sum_{di,dj in 0..2} W[di,dj] x(2i+di-1, 2j+dj-1);
    with z(p,q,(a,b,c)) = x(2p+a, 2q+b), row 2i+di-1 lands in block p=i-1+P
    phase a with di = 2P+a-1 — valid for (P,a) in {(0,1),(1,0),(1,1)}, zero for
    (0,0). Same for columns. Numerically exact (test_model_parity)."""
    import copy

    new_vars = {
        "params": dict(variables["params"]),
        "batch_stats": dict(variables["batch_stats"]),
    }
    w = np.asarray(variables["params"]["m0"]["conv"]["kernel"])  # (3,3,3,C)
    c_in, c_out = w.shape[2], w.shape[3]
    k2 = np.zeros((2, 2, 4 * c_in, c_out), w.dtype)
    for P in (0, 1):
        for a in (0, 1):
            di = 2 * P + a - 1
            if not 0 <= di <= 2:
                continue
            for Q in (0, 1):
                for b in (0, 1):
                    dj = 2 * Q + b - 1
                    if not 0 <= dj <= 2:
                        continue
                    # s2d channel order matches space_to_depth2: (a, b, c).
                    k2[P, Q, (a * 2 + b) * c_in : (a * 2 + b + 1) * c_in] = w[di, dj]
    m0 = copy.deepcopy(dict(variables["params"]["m0"]))
    m0["conv"] = {"kernel": k2}
    new_vars["params"].pop("m0")
    new_vars["params"]["m0s2d"] = m0
    bs = dict(new_vars["batch_stats"])
    bs["m0s2d"] = bs.pop("m0")
    new_vars["batch_stats"] = bs
    return new_vars


def fuse_head_entries(variables: Tree) -> Tree:
    """Concatenate the three head branches' entry convs (cv2_L_0 / cv3_L_0 /
    cv4_L_0 — all consuming the same level feature map) into one conv cvh_L
    with stacked output channels. Exact: independent convs on one input equal
    a single conv with concatenated filters; BN folds per-channel."""
    import copy

    params = dict(variables["params"])
    stats = dict(variables["batch_stats"])
    m22p = copy.deepcopy(dict(params["m22"]))
    m22s = copy.deepcopy(dict(stats["m22"]))
    for level in range(3):
        branches = [f"cv2_{level}_0", f"cv3_{level}_0", f"cv4_{level}_0"]
        kernel = np.concatenate(
            [np.asarray(m22p[b]["conv"]["kernel"]) for b in branches], axis=-1
        )
        fused_p = {
            "conv": {"kernel": kernel},
            "bn": {
                key: np.concatenate(
                    [np.asarray(m22p[b]["bn"][key]) for b in branches]
                )
                for key in ("scale", "bias")
            },
        }
        fused_s = {
            "bn": {
                key: np.concatenate(
                    [np.asarray(m22s[b]["bn"][key]) for b in branches]
                )
                for key in ("mean", "var")
            }
        }
        for b in branches:
            m22p.pop(b)
            m22s.pop(b)
        m22p[f"cvh_{level}"] = fused_p
        m22s[f"cvh_{level}"] = fused_s
    params["m22"] = m22p
    stats["m22"] = m22s
    return {"params": params, "batch_stats": stats}


def fold_batchnorm(variables: Tree) -> Tree:
    """Fold every Conv-block BatchNorm into the conv's weights and a new bias
    (the canonical inference transform): W' = W * s/sqrt(v+eps),
    b' = beta - m * s/sqrt(v+eps). Returns {'params': ...} with no 'bn' nodes
    and no batch_stats; exact at fp32 (test_model_parity)."""
    eps = 1e-3  # matches the BatchNorm epsilon in tti.model.layers.Conv

    def fold(params: Tree, stats: Tree) -> Tree:
        out: Tree = {}
        for key, node in params.items():
            if not isinstance(node, dict):
                out[key] = node
                continue
            if "conv" in node and "bn" in node and "kernel" in node.get("conv", {}):
                kernel = np.asarray(node["conv"]["kernel"], np.float64)
                scale = np.asarray(node["bn"]["scale"], np.float64)
                beta = np.asarray(node["bn"]["bias"], np.float64)
                mean = np.asarray(stats[key]["bn"]["mean"], np.float64)
                var = np.asarray(stats[key]["bn"]["var"], np.float64)
                g = scale / np.sqrt(var + eps)
                folded = dict(node)
                folded["conv"] = {
                    "kernel": (kernel * g).astype(np.float32),
                    "bias": (beta - mean * g).astype(np.float32),
                }
                folded.pop("bn")
                # Recurse into any nested blocks alongside conv/bn (e.g. C2f).
                rest = {k: v for k, v in folded.items() if k not in ("conv",)}
                if any(isinstance(v, dict) for v in rest.values()):
                    inner = fold(rest, stats.get(key, {}))
                    folded.update(inner)
                out[key] = folded
            else:
                out[key] = fold(node, stats.get(key, {}))
        return out

    return {"params": fold(dict(variables["params"]), dict(variables["batch_stats"]))}


def save_checkpoint(variables: Tree, path: str, metadata: dict | None = None) -> None:
    """Serialize flax variables (+ JSON metadata sidecar) to msgpack."""
    import json

    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.to_bytes(variables))
    if metadata is not None:
        with open(path + ".json", "w", encoding="utf-8") as f:
            json.dump(metadata, f, indent=2)


def checkpoint_metadata(path: str) -> dict:
    """Read the JSON metadata sidecar written by save_checkpoint (``{path}.json``).

    Returns {} when the sidecar is absent (e.g. orbax train dirs, converted
    checkpoints saved without metadata). Callers use this to recover the
    architecture knobs a checkpoint was trained with (variant, num_classes,
    mask_stride) instead of hard-coding them."""
    import json
    import os

    sidecar = path + ".json"
    if not os.path.isfile(sidecar):
        return {}
    with open(sidecar, "r", encoding="utf-8") as f:
        return json.load(f)


def load_checkpoint(path: str, template: Tree) -> Tree:
    """Load inference variables: a flax msgpack file, or an orbax train-state
    checkpoint DIRECTORY as written by tti.train.checkpoint.save_train_state
    (the `tti train` CLI's output) — the optimizer state is dropped and only
    {params, batch_stats} are extracted."""
    import os

    if os.path.isdir(path):
        import jax
        import orbax.checkpoint as ocp

        # Restore against an ABSTRACT target built from the checkpoint's own
        # metadata: the stored sharding pins the device the trainer ran on
        # (e.g. "TPU v5 lite0"), which fails on any other platform; shape/dtype
        # structs make orbax place arrays on the current default device, so a
        # TPU-trained checkpoint deploys on CPU hosts and vice versa.
        ckptr = ocp.StandardCheckpointer()
        meta = ckptr.metadata(os.path.abspath(path))
        here = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
        abstract = jax.tree_util.tree_map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=here),
            meta.item_metadata.tree,
        )
        restored = ckptr.restore(os.path.abspath(path), abstract)
        # Deploy the EMA weights when the trainer produced them (the
        # Ultralytics-recipe "best" model is the EMA, not the raw params).
        params = restored.get("ema_params") or restored["params"]
        out = {"params": params}
        if "batch_stats" in template and restored.get("batch_stats") is not None:
            out["batch_stats"] = restored["batch_stats"]
        problems = verify_tree_shapes(out, {k: template[k] for k in out})
        if problems:
            raise ValueError(
                f"checkpoint {path} does not match the model: {problems[:5]}"
            )
        return out
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
