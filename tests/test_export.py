"""Checkpoint-interchange tests: our pytree <-> reference .pth layout."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from fast_neural_style_transfer_tpu.export import (
    from_torch_state_dict,
    load_torch_checkpoint,
    save_torch_checkpoint,
    to_torch_state_dict,
)
from fast_neural_style_transfer_tpu.models import TransformerNet

# every key the reference StyleTransferNet state_dict contains
# (/root/reference/models/model.py:24-90 module tree)
EXPECTED_KEYS = sorted(
    [f"{m}.conv.{p}" for m in ["conv1", "conv2", "final_conv"] for p in ["weight", "bias"]]
    + [f"{m}.{p}" for m in ["norm1", "norm2", "norm3", "norm4"] for p in ["weight", "bias"]]
    + [f"{m}.upsample_conv.{p}" for m in ["up1", "up2"] for p in ["weight", "bias"]]
    + [
        f"res_blocks.{i}.{sub}.{p}"
        for i in range(5)
        for sub in ["conv1.conv", "conv2.conv"]
        for p in ["weight", "bias"]
    ]
    + [
        f"res_blocks.{i}.{sub}.{p}"
        for i in range(5)
        for sub in ["in1", "in2"]
        for p in ["weight", "bias"]
    ]
)


def test_to_torch_state_dict_key_and_shape_layout():
    params = TransformerNet.init(jax.random.PRNGKey(0))
    sd = to_torch_state_dict(params)
    assert sorted(sd.keys()) == EXPECTED_KEYS
    assert sd["conv1.conv.weight"].shape == (64, 3, 9, 9)  # OIHW
    assert sd["up1.upsample_conv.weight"].shape == (256, 64, 3, 3)  # IOHW
    assert sd["norm2.weight"].shape == (256,)


def test_state_dict_roundtrip_identity():
    params = TransformerNet.init(jax.random.PRNGKey(0))
    back = from_torch_state_dict(to_torch_state_dict(params))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        back,
    )


def test_pth_file_roundtrip_and_forward_parity(tmp_path):
    """Save to .pth, load through the checkpoint loader, forward must match."""
    params = TransformerNet.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "model.pth")
    save_torch_checkpoint(params, path)

    # file content must be the checkpoint-dict layout reference inference.py:33 expects
    raw = torch.load(path, map_location="cpu", weights_only=False)
    assert "model_state_dict" in raw

    loaded = load_torch_checkpoint(path)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    a = TransformerNet.apply(params, x, train=False)
    b = TransformerNet.apply(loaded, x, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_load_bare_state_dict():
    params = TransformerNet.init(jax.random.PRNGKey(2))
    sd = {k: torch.from_numpy(v.copy()) for k, v in to_torch_state_dict(params).items()}
    back = from_torch_state_dict(sd)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        params,
        back,
    )
