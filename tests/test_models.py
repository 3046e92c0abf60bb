"""Model-level parity tests.

A torch mirror of the reference StyleTransferNet architecture
(/root/reference/models/model.py:24-90) is built functionally here, our params
are copied into it, and full-forward outputs are compared (eval mode). VGG19
taps are checked against a functional torch VGG19 with identical weights.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from fast_neural_style_transfer_tpu.models import TransformerNet, VGG19Features
from fast_neural_style_transfer_tpu.models.vgg import _CFG, CONV_NAMES


def _t(a):  # jax array -> torch tensor
    return torch.from_numpy(np.array(a))


def _w_t(p):  # HWIO -> torch conv weight OIHW
    return _t(p["w"]).permute(3, 2, 0, 1).contiguous()


def _w_tt(p):  # HWIO (in,out on dims 2,3) -> torch transposed-conv weight IOHW
    return _t(p["w"]).permute(2, 3, 0, 1).contiguous()


def torch_reflect_conv(x, p, stride=1):
    k = p["w"].shape[0]
    x = F.pad(x, [k // 2] * 4, mode="reflect")
    return F.conv2d(x, _w_t(p), _t(p["b"]), stride=stride)


def torch_inorm(x, p):
    return F.instance_norm(x, weight=_t(p["gamma"]), bias=_t(p["beta"]), eps=1e-5)


def torch_upconv(x, p):
    return F.conv_transpose2d(x, _w_tt(p), _t(p["b"]), stride=2, padding=1,
                              output_padding=1)


def torch_stylizer(params, x):
    """Functional torch mirror of the reference forward (model.py:49-65)."""
    h = F.relu(torch_inorm(torch_reflect_conv(x, params["conv1"], 2), params["norm1"]))
    h = F.relu(torch_inorm(torch_reflect_conv(h, params["conv2"], 2), params["norm2"]))
    for rb in params["res_blocks"]:
        y = F.relu(torch_inorm(torch_reflect_conv(h, rb["conv1"]), rb["in1"]))
        # dropout disabled (eval)
        y = torch_inorm(torch_reflect_conv(y, rb["conv2"]), rb["in2"])
        h = h + y
    h = F.relu(torch_inorm(torch_upconv(h, params["up1"]), params["norm3"]))
    h = F.relu(torch_inorm(torch_upconv(h, params["up2"]), params["norm4"]))
    return torch_reflect_conv(h, params["final_conv"])


def test_transformer_matches_torch_mirror(rng):
    params = TransformerNet.init(jax.random.PRNGKey(0))
    x = rng.standard_normal((2, 32, 32, 3), dtype=np.float32)
    got = TransformerNet.apply(params, jnp.asarray(x), train=False)
    with torch.no_grad():
        want = torch_stylizer(params, _t(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, rtol=1e-3, atol=1e-4
    )


def test_transformer_param_count():
    """Reference net has exactly this many parameters (conv + IN affine)."""
    params = TransformerNet.init(jax.random.PRNGKey(0))

    def conv_n(k, cin, cout):
        return k * k * cin * cout + cout

    def in_n(c):
        return 2 * c

    expected = (
        conv_n(9, 3, 64) + in_n(64)
        + conv_n(3, 64, 256) + in_n(256)
        + 5 * (2 * conv_n(3, 256, 256) + 2 * in_n(256))
        + conv_n(3, 256, 64) + in_n(64)
        + conv_n(3, 64, 32) + in_n(32)
        + conv_n(9, 32, 3)
    )
    assert TransformerNet.param_count(params) == expected


@pytest.mark.parametrize("hw", [32, 64, 128])
def test_transformer_output_shape_roundtrip(hw):
    params = TransformerNet.init(jax.random.PRNGKey(1))
    x = jnp.zeros((1, hw, hw, 3))
    y = TransformerNet.apply(params, x)
    assert y.shape == (1, hw, hw, 3)


def test_transformer_dropout_train_vs_eval():
    params = TransformerNet.init(jax.random.PRNGKey(2))
    x = jnp.ones((1, 16, 16, 3))
    key = jax.random.PRNGKey(3)
    y_train1 = TransformerNet.apply(params, x, train=True, rng=key)
    y_train2 = TransformerNet.apply(params, x, train=True, rng=key)
    y_eval = TransformerNet.apply(params, x, train=False)
    np.testing.assert_array_equal(np.asarray(y_train1), np.asarray(y_train2))
    # with p=0.1 over 5 blocks x 256 channels, dropout virtually surely fires
    assert not np.allclose(np.asarray(y_train1), np.asarray(y_eval))


def torch_vgg_forward(params, x, upto):
    """Functional torch VGG19 over the same HWIO params, tap dict out."""
    acts = {}
    h = x
    for name, cout in _CFG:
        if cout:
            h = F.conv2d(h, _w_t(params[name]), _t(params[name]["b"]), padding=1)
            acts[name] = h
            h = F.relu(h)
            acts["relu" + name[4:]] = h
        else:
            h = F.max_pool2d(h, 2, 2)
            acts[name] = h
        if name == upto:
            break
    return acts


def test_vgg19_taps_match_torch(rng):
    params = VGG19Features.init(jax.random.PRNGKey(0))
    x = rng.standard_normal((1, 3, 32, 32), dtype=np.float32)
    taps = ["relu1_2", "relu2_2", "relu3_3", "conv4_2", "relu4_3"]
    got = VGG19Features.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), taps)
    with torch.no_grad():
        acts = torch_vgg_forward(params, torch.from_numpy(x), "conv4_4")
    for tap, g in zip(taps, got):
        want = acts[tap].numpy()
        np.testing.assert_allclose(
            np.transpose(np.asarray(g), (0, 3, 1, 2)), want, rtol=2e-3, atol=1e-4,
            err_msg=tap,
        )


def test_vgg19_tap_shapes():
    """Tap spatial/channel shapes at 256 input match torchvision slice outputs
    (reference vgg19_net.py:56-65: 64@256, 128@128, 256@64, 512@32, 512@32)."""
    params = VGG19Features.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 256, 256, 3))
    feats = VGG19Features.apply(params, x)
    shapes = [f.shape for f in feats]
    assert shapes == [
        (1, 256, 256, 64),
        (1, 128, 128, 128),
        (1, 64, 64, 256),
        (1, 32, 32, 512),
        (1, 32, 32, 512),
    ]


def test_vgg19_conv4_2_is_preactivation(rng):
    """Defect #3: the reference's 4th tap is conv4_2 PRE-ReLU — ours must be
    addressable as such and differ from relu4_2."""
    params = VGG19Features.init(jax.random.PRNGKey(4))
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3), dtype=np.float32))
    conv, relu = VGG19Features.apply(params, x, ["conv4_2", "relu4_2"])
    assert (np.asarray(conv) < 0).any()
    np.testing.assert_allclose(np.maximum(np.asarray(conv), 0), np.asarray(relu),
                               rtol=1e-6, atol=1e-6)
