"""VGG19 weight IO: npz roundtrip, torchvision state_dict conversion, fallback."""

import numpy as np
import pytest
import torch

import jax

from fast_neural_style_transfer_tpu.models import VGG19Features
from fast_neural_style_transfer_tpu.models.vgg import CONV_NAMES, TORCHVISION_CONV_INDEX
from fast_neural_style_transfer_tpu.models.vgg_weights import (
    from_torch_state_dict,
    load_npz,
    resolve_params,
    save_npz,
)


def test_npz_roundtrip(tmp_path):
    params = VGG19Features.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "vgg.npz")
    save_npz(params, path)
    loaded = load_npz(path)
    for name in CONV_NAMES:
        np.testing.assert_array_equal(
            np.asarray(params[name]["w"]), np.asarray(loaded[name]["w"])
        )


def test_from_torchvision_layout_state_dict():
    """A synthetic state_dict in torchvision vgg19().features layout converts
    with OIHW->HWIO transposition at the right indices."""
    rng = np.random.default_rng(0)
    sd = {}
    cin = 3
    shapes = {}
    for name in CONV_NAMES:
        idx = TORCHVISION_CONV_INDEX[name]
        cout = {"1": 64, "2": 128, "3": 256, "4": 512, "5": 512}[name[4]]
        w = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32)
        sd[f"features.{idx}.weight"] = torch.from_numpy(w)
        sd[f"features.{idx}.bias"] = torch.from_numpy(
            rng.standard_normal(cout).astype(np.float32)
        )
        shapes[name] = (w, cout)
        cin = cout
    params = from_torch_state_dict(sd)
    for name in CONV_NAMES:
        w, cout = shapes[name]
        got = np.asarray(params[name]["w"])
        assert got.shape[-1] == cout
        np.testing.assert_array_equal(got, np.transpose(w, (2, 3, 1, 0)))


def test_bare_features_prefix_also_accepted():
    sd = {}
    cin = 3
    for name in CONV_NAMES:
        idx = TORCHVISION_CONV_INDEX[name]
        cout = {"1": 64, "2": 128, "3": 256, "4": 512, "5": 512}[name[4]]
        sd[f"{idx}.weight"] = np.zeros((cout, cin, 3, 3), np.float32)
        sd[f"{idx}.bias"] = np.zeros(cout, np.float32)
        cin = cout
    params = from_torch_state_dict(sd)
    assert np.asarray(params["conv5_4"]["w"]).shape == (3, 3, 512, 512)


def test_resolve_params_fallback_warns_and_missing_file_raises(tmp_path):
    with pytest.warns(UserWarning, match="VGG19"):
        params = resolve_params(None)
    assert "conv1_1" in params
    with pytest.raises(FileNotFoundError):
        resolve_params(str(tmp_path / "nope.npz"))
