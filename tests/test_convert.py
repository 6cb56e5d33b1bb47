"""Weight converter robustness: naming, shapes, error paths, checkpoint IO."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from tests.torch_ref import TorchYOLOv8Seg
from tti.model.convert import (
    convert_torch_state_dict,
    load_checkpoint,
    save_checkpoint,
    stem_to_s2d,
    verify_tree_shapes,
)
from tti.model.yolo import YOLOv8Seg, init_variables


def test_dfl_weights_skipped():
    tmodel = TorchYOLOv8Seg(variant="n", nc=2)
    variables = convert_torch_state_dict(tmodel.state_dict())
    assert "dfl" not in variables["params"].get("m22", {})


def test_non_model_keys_ignored():
    tmodel = TorchYOLOv8Seg(variant="n", nc=2)
    sd = dict(tmodel.state_dict())
    sd["epoch"] = torch.tensor(3)
    sd["optimizer.lr"] = torch.tensor(0.1)
    variables = convert_torch_state_dict(sd)
    ref = init_variables(YOLOv8Seg(variant="n", nc=2), image_size=64)
    assert verify_tree_shapes(variables["params"], ref["params"]) == []


def test_unknown_suffix_raises():
    with pytest.raises(ValueError, match="unhandled"):
        convert_torch_state_dict({"model.0.conv.weird_stat": torch.zeros(3)})


def test_checkpoint_roundtrip(tmp_path):
    model = YOLOv8Seg(variant="n", nc=2)
    variables = init_variables(model, image_size=64)
    path = str(tmp_path / "m.ckpt")
    save_checkpoint(variables, path, metadata={"variant": "n"})
    restored = load_checkpoint(path, variables)
    a = jnp.ravel(variables["params"]["m0"]["conv"]["kernel"])
    b = jnp.ravel(restored["params"]["m0"]["conv"]["kernel"])
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    import json

    meta = json.load(open(path + ".json"))
    assert meta["variant"] == "n"


def test_stem_to_s2d_structure():
    model = YOLOv8Seg(variant="n", nc=2)
    variables = init_variables(model, image_size=64)
    out = stem_to_s2d(variables)
    assert "m0" not in out["params"] and "m0s2d" in out["params"]
    assert out["params"]["m0s2d"]["conv"]["kernel"].shape == (2, 2, 12, 16)
    assert "m0s2d" in out["batch_stats"] and "m0" not in out["batch_stats"]
    # Original tree untouched.
    assert "m0" in variables["params"]


def test_load_checkpoint_from_orbax_train_dir(tmp_path):
    """`tti eval --weights <dir>` must accept the orbax train-state directory
    that `tti train` writes: params/batch_stats extracted, optimizer state
    dropped, shape-verified against the model template."""
    import jax.numpy as jnp
    import pytest

    from tti.model.convert import load_checkpoint
    from tti.model.yolo import create_model, init_variables
    from tti.train.checkpoint import save_train_state
    from tti.train.step import create_train_state

    model = create_model("n", nc=2)
    variables = init_variables(model, image_size=64)
    state, _ = create_train_state(model, variables, learning_rate=1e-3)
    path = save_train_state(state, str(tmp_path / "ckpt"), step=0)

    template = init_variables(model, image_size=64, seed=9)
    if not path.endswith(".msgpack"):
        loaded = load_checkpoint(path, template)
        assert set(loaded) == {"params", "batch_stats"}
        w0 = np.asarray(variables["params"]["m0"]["conv"]["kernel"])
        np.testing.assert_array_equal(
            np.asarray(loaded["params"]["m0"]["conv"]["kernel"]), w0
        )
        # Mismatched model must be rejected.
        bad = init_variables(create_model("s", nc=2), image_size=64)
        with pytest.raises(ValueError):
            load_checkpoint(path, bad)


def test_to_torch_state_dict_roundtrip():
    """torch -> flax -> torch must reproduce every tensor exactly and load
    under strict=True (the inverse converter is what lets tti-trained weights
    run through the torch parity oracle)."""
    from tti.model.convert import to_torch_state_dict

    tmodel = TorchYOLOv8Seg(variant="n", nc=2)
    original = {k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()}
    variables = convert_torch_state_dict(tmodel.state_dict())
    sd = to_torch_state_dict(variables)

    assert set(sd) == set(original)
    for key in original:
        np.testing.assert_array_equal(sd[key], original[key], err_msg=key)

    fresh = TorchYOLOv8Seg(variant="n", nc=2)
    fresh.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                           for k, v in sd.items()}, strict=True)


def test_to_torch_state_dict_flax_native_forward_parity():
    """Export FLAX-initialized (i.e. trained-in-tti-shaped) variables to torch
    and check the two forward passes agree — the direction the trained-weights
    parity report depends on."""
    import jax

    from tti.model.convert import to_torch_state_dict

    model = YOLOv8Seg(variant="n", nc=2)
    variables = init_variables(model, image_size=64, seed=3)
    # Non-trivial running stats so BN eval-mode is a real test.
    bs = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    rng = np.random.default_rng(0)
    bs = jax.tree_util.tree_map(
        lambda x: (x + rng.uniform(-0.3, 0.3, x.shape)).astype(np.float32), bs
    )
    variables = {"params": variables["params"], "batch_stats": bs}

    sd = to_torch_state_dict(variables)
    tmodel = TorchYOLOv8Seg(variant="n", nc=2)
    tmodel.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                            for k, v in sd.items()}, strict=True)
    tmodel.eval()

    x = np.random.default_rng(1).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    raw = model.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        t_box, t_cls, t_coef, t_protos = tmodel(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        )
    for fl, tt in zip(list(raw.box) + list(raw.cls) + list(raw.mcoef) + [raw.protos],
                      list(t_box) + list(t_cls) + list(t_coef) + [t_protos]):
        np.testing.assert_allclose(
            np.asarray(fl), tt.numpy().transpose(0, 2, 3, 1), rtol=2e-4, atol=2e-4
        )


def test_to_torch_state_dict_rejects_folded():
    from tti.model.convert import fold_batchnorm, to_torch_state_dict

    variables = init_variables(YOLOv8Seg(variant="n", nc=2), image_size=64)
    with pytest.raises(ValueError, match="folded|batch_stats"):
        to_torch_state_dict(fold_batchnorm(variables))
