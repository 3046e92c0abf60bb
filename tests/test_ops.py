"""Op-level parity tests against PyTorch (CPU) ground truth.

torch (without torchvision) is available in this image, so every op with
PyTorch-defined semantics in the reference is verified numerically against a
freshly-constructed torch equivalent — reflection-padded conv
(/root/reference/models/model.py:67-75), ConvTranspose2d with output_padding
(model.py:7-22), InstanceNorm2d affine (model.py:29-44), Gram via bmm
(/root/reference/losses/losses.py:6-13), and the VGG building blocks.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from fast_neural_style_transfer_tpu.ops import (
    conv2d_same,
    conv_transpose2d,
    gram_matrix,
    instance_norm,
    max_pool2d,
    reflect_conv2d,
)


def to_nhwc(x_nchw: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def to_hwio(w_oihw: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0)))


def from_nhwc(y: jnp.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(y), (0, 3, 1, 2))


@pytest.mark.parametrize("k,stride,cin,cout,hw", [
    (9, 2, 3, 8, 32),   # encoder conv1 shape family
    (3, 2, 8, 16, 16),  # encoder conv2
    (3, 1, 16, 16, 16), # residual conv
    (9, 1, 8, 3, 20),   # final conv
    (3, 1, 4, 4, 17),   # odd spatial size
])
def test_reflect_conv2d_matches_torch(rng, k, stride, cin, cout, hw):
    x = rng.standard_normal((2, cin, hw, hw), dtype=np.float32)
    conv = nn.Conv2d(cin, cout, k, stride=stride)
    ref = nn.Sequential(nn.ReflectionPad2d(k // 2), conv)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = reflect_conv2d(
        to_nhwc(x),
        to_hwio(conv.weight.detach().numpy()),
        jnp.asarray(conv.bias.detach().numpy()),
        stride=stride,
    )
    np.testing.assert_allclose(from_nhwc(got), want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,stride,cin,cout,hw", [
    (3, 2, 16, 8, 8),    # decoder up1/up2 family: k3 s2 p1 op1
    (3, 2, 8, 4, 15),    # odd input
    (4, 2, 6, 6, 9),     # different kernel
    (3, 3, 5, 7, 6),     # stride 3, output_padding 2
])
def test_conv_transpose2d_matches_torch(rng, k, stride, cin, cout, hw):
    pad = k // 2
    out_pad = stride - 1
    x = rng.standard_normal((2, cin, hw, hw), dtype=np.float32)
    ref = nn.ConvTranspose2d(cin, cout, k, stride=stride, padding=pad,
                             output_padding=out_pad)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    # torch ConvTranspose2d weight: (in, out, kh, kw) -> our (kh, kw, in, out)
    w = np.transpose(ref.weight.detach().numpy(), (2, 3, 0, 1))
    got = conv_transpose2d(
        to_nhwc(x), jnp.asarray(w), jnp.asarray(ref.bias.detach().numpy()),
        stride=stride, padding=pad, output_padding=out_pad,
    )
    assert got.shape[1] == want.shape[2] and got.shape[2] == want.shape[3]
    np.testing.assert_allclose(from_nhwc(got), want, rtol=1e-4, atol=1e-4)


def test_conv2d_same_matches_torch(rng):
    x = rng.standard_normal((2, 8, 14, 14), dtype=np.float32)
    conv = nn.Conv2d(8, 16, 3, padding=1)
    with torch.no_grad():
        want = conv(torch.from_numpy(x)).numpy()
    got = conv2d_same(to_nhwc(x), to_hwio(conv.weight.detach().numpy()),
                      jnp.asarray(conv.bias.detach().numpy()))
    np.testing.assert_allclose(from_nhwc(got), want, rtol=1e-4, atol=1e-4)


def test_max_pool2d_matches_torch(rng):
    x = rng.standard_normal((2, 8, 13, 13), dtype=np.float32)
    with torch.no_grad():
        want = nn.MaxPool2d(2, 2)(torch.from_numpy(x)).numpy()
    got = max_pool2d(to_nhwc(x))
    np.testing.assert_allclose(from_nhwc(got), want, rtol=0, atol=0)


@pytest.mark.parametrize("affine_scale", [1.0, 0.3])
def test_instance_norm_matches_torch(rng, affine_scale):
    c = 12
    x = rng.standard_normal((3, c, 9, 9), dtype=np.float32) * 4 + 1
    ref = nn.InstanceNorm2d(c, affine=True)
    with torch.no_grad():
        ref.weight.mul_(affine_scale)
        ref.bias.add_(0.1)
        want = ref(torch.from_numpy(x)).numpy()
    got = instance_norm(to_nhwc(x), jnp.asarray(ref.weight.detach().numpy()),
                        jnp.asarray(ref.bias.detach().numpy()))
    np.testing.assert_allclose(from_nhwc(got), want, rtol=1e-4, atol=1e-4)


def test_gram_matches_torch_bmm(rng):
    x = rng.standard_normal((2, 6, 5, 7), dtype=np.float32)  # NCHW
    xt = torch.from_numpy(x)
    feats = xt.view(2, 6, 35)
    want = torch.bmm(feats, feats.transpose(1, 2)).numpy()
    got = np.asarray(gram_matrix(to_nhwc(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("cin,cout,stride,hw", [
    (32, 3, 1, 32), (3, 64, 2, 32), (32, 3, 1, 20), (8, 16, 2, 64),
])
def test_reflect_conv2d_s2d_lowering_matches_direct(rng, cin, cout, stride, hw):
    """The space-to-depth 9x9 lowering (MXU-shaped) is bit-equivalent to the
    direct conv up to float reassociation."""
    from fast_neural_style_transfer_tpu.ops.conv import reflect_conv2d

    x = jnp.asarray(rng.standard_normal((2, hw, hw, cin), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((9, 9, cin, cout), dtype=np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(cout, dtype=np.float32))
    direct = reflect_conv2d(x, w, b, stride=stride, lowering="direct")
    s2d = reflect_conv2d(x, w, b, stride=stride, lowering="s2d")
    np.testing.assert_allclose(np.asarray(s2d), np.asarray(direct), rtol=1e-4, atol=1e-4)


def test_reflect_conv2d_s2d_gradients_match_direct(rng):
    from fast_neural_style_transfer_tpu.ops.conv import reflect_conv2d

    x = jnp.asarray(rng.standard_normal((1, 16, 16, 8), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((9, 9, 8, 4), dtype=np.float32) * 0.1)

    def loss(lowering):
        return lambda w_, x_: jnp.sum(
            jnp.sin(reflect_conv2d(x_, w_, None, stride=1, lowering=lowering))
        )

    gd = jax.grad(loss("direct"), argnums=(0, 1))(w, x)
    gs = jax.grad(loss("s2d"), argnums=(0, 1))(w, x)
    for a, b_ in zip(gd, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4)


def test_reflect_conv2d_bad_lowering_raises(rng):
    from fast_neural_style_transfer_tpu.ops.conv import reflect_conv2d

    x = jnp.zeros((1, 8, 8, 3))
    w = jnp.zeros((3, 3, 3, 4))
    with pytest.raises(ValueError):
        reflect_conv2d(x, w, None, lowering="bogus")


@pytest.mark.parametrize("cin,cout,hw", [(256, 64, 16), (64, 32, 32), (8, 8, 7)])
def test_conv_transpose_subpixel_lowering_matches_direct(rng, cin, cout, hw):
    from fast_neural_style_transfer_tpu.ops.conv import conv_transpose2d

    x = jnp.asarray(rng.standard_normal((2, hw, hw, cin), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout), dtype=np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(cout, dtype=np.float32))
    kw = dict(stride=2, padding=1, output_padding=1)
    d = conv_transpose2d(x, w, b, **kw, lowering="direct")
    s = conv_transpose2d(x, w, b, **kw, lowering="subpixel")
    np.testing.assert_allclose(np.asarray(s), np.asarray(d), rtol=1e-4, atol=1e-4)


def test_reflect_conv2d_s2d_adaptive_factor_and_errors(rng):
    """s2d picks a compatible factor for awkward shapes and raises a clear
    ValueError (not a bare assert) when none fits."""
    from fast_neural_style_transfer_tpu.ops.conv import (
        _reflect_conv2d_s2d,
        reflect_conv2d,
    )

    # H=30, stride=2: padded 38 -> s=4 unusable, s=2 picked automatically
    x = jnp.asarray(rng.standard_normal((1, 30, 30, 3), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((9, 9, 3, 8), dtype=np.float32) * 0.1)
    d = reflect_conv2d(x, w, None, stride=2, lowering="direct")
    v = reflect_conv2d(x, w, None, stride=2, lowering="s2d")
    np.testing.assert_allclose(np.asarray(v), np.asarray(d), rtol=1e-4, atol=1e-4)

    # H=31, stride=2: padded 39 odd -> no factor fits -> clear error
    x_odd = jnp.zeros((1, 31, 31, 3))
    with pytest.raises(ValueError, match="space-to-depth factor"):
        _reflect_conv2d_s2d(x_odd, w, None, stride=2)


def test_s2d_lowering_works_with_sharded_batch(rng):
    """The s2d reshapes must stay one-split/one-merge per reshape: sharding
    propagation on a device-sharded batch rejects multi-axis reshapes (hit
    in real DP training on TPU, where s2d auto-activates)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fast_neural_style_transfer_tpu.ops.conv import reflect_conv2d
    from fast_neural_style_transfer_tpu.parallel import make_mesh_plan

    plan = make_mesh_plan()
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3), dtype=np.float32))
    xs = jax.device_put(x, NamedSharding(plan.mesh, P("data", None, None, None)))
    w = jnp.asarray(rng.standard_normal((9, 9, 3, 8), dtype=np.float32) * 0.1)

    fwd = jax.jit(lambda v: reflect_conv2d(v, w, None, stride=2, lowering="s2d"))
    got = np.asarray(fwd(xs))
    want = np.asarray(reflect_conv2d(x, w, None, stride=2, lowering="direct"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # stride-1 path (output depth-to-space) with sharded batch too
    w1 = jnp.asarray(rng.standard_normal((9, 9, 3, 4), dtype=np.float32) * 0.1)
    fwd1 = jax.jit(lambda v: reflect_conv2d(v, w1, None, stride=1, lowering="s2d"))
    got1 = np.asarray(fwd1(xs))
    want1 = np.asarray(reflect_conv2d(x, w1, None, stride=1, lowering="direct"))
    np.testing.assert_allclose(got1, want1, rtol=1e-4, atol=1e-4)
