"""Pallas fused instance-norm kernel: forward/grad parity vs the XLA path
(interpret mode on CPU; the same kernel compiles on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fast_neural_style_transfer_tpu.ops.norm import _xla_instance_norm, instance_norm
from fast_neural_style_transfer_tpu.ops.pallas_norm import fits_vmem, fused_instance_norm


@pytest.mark.parametrize("relu", [False, True])
def test_pallas_in_forward_matches_xla(rng, relu):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32), dtype=np.float32)) * 3
    gamma = jnp.asarray(rng.standard_normal(32, dtype=np.float32))
    beta = jnp.asarray(rng.standard_normal(32, dtype=np.float32))
    got = fused_instance_norm(x, gamma, beta, 1e-5, relu, True)  # interpret
    want = _xla_instance_norm(x, gamma, beta, eps=1e-5, relu=relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("relu", [False, True])
def test_pallas_in_grads_match_xla(rng, relu):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32), dtype=np.float32))
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(32, dtype=np.float32))
    beta = jnp.asarray(0.1 * rng.standard_normal(32, dtype=np.float32))

    def loss_pallas(x, g, b):
        return jnp.sum(jnp.sin(fused_instance_norm(x, g, b, 1e-5, relu, True)))

    def loss_xla(x, g, b):
        return jnp.sum(jnp.sin(_xla_instance_norm(x, g, b, eps=1e-5, relu=relu)))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, gamma, beta)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("relu", [False, True])
def test_pallas_in_channel_split_grads_match_xla(rng, relu):
    """C=256 exercises the (N, C/128) channel-split grid in fwd AND bwd."""
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 256), dtype=np.float32)) * 2
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(256, dtype=np.float32))
    beta = jnp.asarray(0.1 * rng.standard_normal(256, dtype=np.float32))

    got = fused_instance_norm(x, gamma, beta, 1e-5, relu, True)
    want = _xla_instance_norm(x, gamma, beta, eps=1e-5, relu=relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)

    gp = jax.grad(
        lambda *a: jnp.sum(jnp.sin(fused_instance_norm(*a, 1e-5, relu, True))),
        argnums=(0, 1, 2),
    )(x, gamma, beta)
    gx = jax.grad(
        lambda *a: jnp.sum(jnp.sin(_xla_instance_norm(*a, eps=1e-5, relu=relu))),
        argnums=(0, 1, 2),
    )(x, gamma, beta)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_instance_norm_method_dispatch(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 8), dtype=np.float32))
    gamma = jnp.ones(8)
    beta = jnp.zeros(8)
    a = instance_norm(x, gamma, beta, method="xla")
    b = instance_norm(x, gamma, beta, method="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError):
        instance_norm(x, gamma, beta, method="bogus")


def test_fits_vmem_gate():
    assert fits_vmem(64, 64, 256)  # res-block IN: c splits to 128 -> 1 MB blocks
    assert not fits_vmem(128, 128, 64)  # c=64 can't split; 2 MB OOM'd bwd VMEM
    assert not fits_vmem(512, 512, 256)  # big-image inference -> XLA path


@pytest.mark.slow
def test_transformer_forward_same_with_pallas_norms(rng):
    from fast_neural_style_transfer_tpu.models import TransformerNet

    params = TransformerNet.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3), dtype=np.float32))
    a = TransformerNet.apply(params, x, train=False, norm_method="xla")
    b = TransformerNet.apply(params, x, train=False, norm_method="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-4)
