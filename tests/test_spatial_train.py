"""Spatially-sharded training parity: the H-sharded loss, gradients, and
full train step must reproduce the unsharded math exactly (virtual 8-device
CPU mesh, 4-way 'space' axis)."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from fast_neural_style_transfer_tpu.core.dtypes import Precision
from fast_neural_style_transfer_tpu.losses import (
    LossTaps,
    style_targets_from_features,
)
from fast_neural_style_transfer_tpu.models import TransformerNet, VGG19Features
from fast_neural_style_transfer_tpu.models.spatial import vgg_features_sharded
from fast_neural_style_transfer_tpu.parallel import make_mesh_plan
from fast_neural_style_transfer_tpu.train import create_train_state, make_train_step
from fast_neural_style_transfer_tpu.train.schedule import LossWeightSchedule
from fast_neural_style_transfer_tpu.train.spatial_step import (
    make_spatial_train_step,
    spatial_loss_fn,
)
from fast_neural_style_transfer_tpu.train.state import make_optimizer
from fast_neural_style_transfer_tpu.train.step import loss_fn

HW = 64  # local H = 16 per shard on the 4-way axis (divisible by 8)


def _shard_map(fn, mesh, in_specs, out_specs):
    from fast_neural_style_transfer_tpu.parallel import shard_map_checked

    return shard_map_checked(fn, mesh, in_specs=in_specs, out_specs=out_specs,
                             check=False)


def _setup():
    key = jax.random.PRNGKey(0)
    taps = LossTaps(content_tap="relu4_2")
    vgg = VGG19Features.init(key)
    params = TransformerNet.init(key)
    batch = jax.random.normal(jax.random.PRNGKey(3), (2, HW, HW, 3))
    style = jax.random.normal(jax.random.PRNGKey(7), (1, HW, HW, 3))
    grams = tuple(
        style_targets_from_features(VGG19Features.apply(vgg, style, taps.style_taps))
    )
    return taps, vgg, params, batch, grams


def test_sharded_vgg_matches_local():
    taps, vgg, _, batch, _ = _setup()
    plan = make_mesh_plan(spatial=4)
    want = VGG19Features.apply(vgg, batch, taps.all_taps)

    fn = _shard_map(
        lambda v, x: vgg_features_sharded(v, x, taps.all_taps),
        plan.mesh,
        (P(), P(None, "space", None, None)),
        [P(None, "space", None, None)] * len(taps.all_taps),
    )
    got = jax.jit(fn)(vgg, batch)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_spatial_loss_matches_local():
    taps, vgg, params, batch, grams = _setup()
    plan = make_mesh_plan(spatial=4)
    weights = LossWeightSchedule()(jnp.asarray(0))

    want, want_m = loss_fn(params, vgg, batch, grams, weights, None,
                           taps=taps, precision=Precision.f32())

    fn = _shard_map(
        lambda p, v, x, g: spatial_loss_fn(p, v, x, g, weights, None,
                                           taps=taps, precision=Precision.f32()),
        plan.mesh,
        (P(), P(), P(None, "space", None, None), P()),
        (P(), P()),
    )
    got, got_m = jax.jit(fn)(params, vgg, batch, grams)
    assert np.isclose(float(got), float(want), rtol=1e-4), (float(got), float(want))
    for k in ("content_loss", "style_loss", "tv_loss"):
        assert np.isclose(float(got_m[k]), float(want_m[k]), rtol=1e-3), k


@pytest.mark.slow
def test_spatial_gradients_match_local():
    """Gradients from the H-sharded loss (shard_map with replication
    checking on, which inserts the cross-shard psum in the transpose) equal
    the unsharded gradients leaf-by-leaf. Near-zero-gradient leaves (pre-IN
    biases, whose true gradient cancels exactly) are compared absolutely —
    they are float noise in both computations."""
    taps, vgg, params, batch, grams = _setup()
    plan = make_mesh_plan(spatial=4)
    weights = LossWeightSchedule()(jnp.asarray(0))

    g_local = jax.grad(
        lambda p: loss_fn(p, vgg, batch, grams, weights, None,
                          taps=taps, precision=Precision.f32())[0]
    )(params)

    def sharded(p, v, x, g):
        return jax.grad(
            lambda pp: spatial_loss_fn(pp, v, x, g, weights, None,
                                       taps=taps, precision=Precision.f32())[0]
        )(p)

    from fast_neural_style_transfer_tpu.parallel import shard_map_checked

    fn = shard_map_checked(sharded, plan.mesh,
                           in_specs=(P(), P(), P(None, "space", None, None), P()),
                           out_specs=P(), check=True)
    g_spatial = jax.jit(fn)(params, vgg, batch, grams)

    scale = max(np.linalg.norm(np.asarray(l).ravel())
                for l in jax.tree.leaves(g_local))
    for a, b in zip(jax.tree.leaves(g_local), jax.tree.leaves(g_spatial)):
        a = np.asarray(a).ravel()
        b = np.asarray(b).ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na < 1e-6 * scale:  # true gradient ~0: both sides are noise
            assert nb < 1e-6 * scale, (na, nb)
            continue
        assert abs(na - nb) / na < 2e-3, (na, nb)
        cos = float(a @ b / (na * nb))
        assert cos > 0.99999, cos


@pytest.mark.slow
def test_spatial_train_step_matches_local_step():
    """One full H-sharded train step == one unsharded step (loss identical;
    params equal up to Adam's amplification of reduction-order noise on
    near-zero gradient elements, bounded by ~2*lr)."""
    taps, vgg, params, batch, grams = _setup()
    plan = make_mesh_plan(spatial=4)
    opt = make_optimizer(1e-3, 100)
    kw = dict(taps=taps, weight_schedule=LossWeightSchedule(), lr=1e-3,
              total_steps=100, donate=False)

    local_step = make_train_step(opt, **kw)
    s1, m1 = local_step(create_train_state(params, opt), vgg, batch, grams, None)

    spatial_step = make_spatial_train_step(opt, plan, **kw)
    s2, m2 = spatial_step(create_train_state(params, opt), vgg, batch, grams, None)

    assert np.isclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=2.5e-3
        ),
        s1.params,
        s2.params,
    )
    assert int(s2.step) == 1


@pytest.mark.slow
def test_spatial_remat_step_matches_baseline():
    """remat=True on the H-sharded step (jax.checkpoint around the sharded
    forwards, collectives replaying in the recompute) must change nothing
    numerically."""
    taps, vgg, params, batch, grams = _setup()
    plan = make_mesh_plan(spatial=4)
    opt = make_optimizer(1e-3, 100)
    kw = dict(taps=taps, weight_schedule=LossWeightSchedule(), lr=1e-3,
              total_steps=100, donate=False)

    s_base, m_base = make_spatial_train_step(opt, plan, **kw)(
        create_train_state(params, opt), vgg, batch, grams, None)
    s_rm, m_rm = make_spatial_train_step(opt, plan, remat=True, **kw)(
        create_train_state(params, opt), vgg, batch, grams, None)

    np.testing.assert_allclose(float(m_rm["loss"]), float(m_base["loss"]),
                               rtol=1e-6)
    # params: same bound as test_spatial_train_step_matches_local_step —
    # the recomputed backward reassociates reductions, and Adam amplifies
    # that noise to ~2*lr on near-zero gradient elements
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=2.5e-3),
        s_rm.params, s_base.params,
    )


@pytest.mark.slow
def test_spatial_step_trains_loss_down():
    taps, vgg, params, batch, grams = _setup()
    plan = make_mesh_plan(spatial=4)
    opt = make_optimizer(1e-3, 100)
    step = make_spatial_train_step(
        opt, plan, taps=taps, weight_schedule=LossWeightSchedule(),
        lr=1e-3, total_steps=100, donate=False,
    )
    state = create_train_state(params, opt)
    rng = jax.random.PRNGKey(1)
    first = None
    for _ in range(8):
        rng, k = jax.random.split(rng)
        state, m = step(state, vgg, batch, grams, k)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first


@pytest.mark.slow
def test_spatial_training_end_to_end(tmp_path):
    """train_style_transfer with spatial=8: full orchestration (pipeline,
    sharded step, checkpoint, final artifact) on the virtual mesh."""
    from PIL import Image

    from fast_neural_style_transfer_tpu.train import TrainConfig, train_style_transfer

    rng = np.random.default_rng(0)
    data = tmp_path / "data"
    data.mkdir()
    for i in range(4):
        Image.fromarray(rng.integers(0, 256, (140, 70, 3), dtype=np.uint8)).save(
            data / f"img_{i}.jpg"
        )
    style = tmp_path / "style.jpg"
    Image.fromarray(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)).save(style)

    import pytest

    cfg = TrainConfig(
        style_image=str(style),
        dataset_dir=str(data),
        output_dir=str(tmp_path / "out"),
        total_steps=2,
        batch_size=2,
        image_size=(128, 64),  # local H = 16 per shard on the 8-way axis
        spatial=8,
        log_every=1,
        monitor_every=100,
        checkpoint_every=100,
        num_workers=2,
        resume=False,
    )
    with pytest.warns(UserWarning, match="VGG19"):
        final = train_style_transfer(cfg)
    import os

    assert os.path.exists(final)

    # invalid spatial configs fail fast
    cfg_bad = TrainConfig(
        style_image=str(style), dataset_dir=str(data),
        output_dir=str(tmp_path / "o2"), image_size=(100, 64), spatial=8,
    )
    with pytest.raises(ValueError, match="image height"):
        train_style_transfer(cfg_bad)


@pytest.mark.slow
def test_2d_mesh_data_x_spatial_step_matches_local():
    """Combined 2-D (data=2 x space=4) training: batch sharded over 'data',
    H over 'space'; one step must match the unsharded step."""
    taps, vgg, params, batch, grams = _setup()  # batch (2, 64, 64, 3)
    plan = make_mesh_plan(spatial=4)  # 8 devices -> data=2, space=4
    assert plan.mesh.shape == {"data": 2, "space": 4}
    opt = make_optimizer(1e-3, 100)
    kw = dict(taps=taps, weight_schedule=LossWeightSchedule(), lr=1e-3,
              total_steps=100, donate=False)

    local_step = make_train_step(opt, **kw)
    s1, m1 = local_step(create_train_state(params, opt), vgg, batch, grams, None)

    step_2d = make_spatial_train_step(opt, plan, **kw)
    s2, m2 = step_2d(create_train_state(params, opt), vgg, batch, grams, None)

    assert np.isclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4), (
        float(m1["loss"]), float(m2["loss"]))
    for k in ("content_loss", "style_loss", "tv_loss"):
        assert np.isclose(float(m1[k]), float(m2[k]), rtol=1e-3), k
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=2.5e-3
        ),
        s1.params,
        s2.params,
    )


@pytest.mark.slow
def test_2d_mesh_step_with_dropout_runs():
    taps, vgg, params, batch, grams = _setup()
    plan = make_mesh_plan(spatial=4)
    opt = make_optimizer(1e-3, 100)
    step = make_spatial_train_step(
        opt, plan, taps=taps, weight_schedule=LossWeightSchedule(),
        lr=1e-3, total_steps=100, donate=False,
    )
    state = create_train_state(params, opt)
    state, m = step(state, vgg, batch, grams, jax.random.PRNGKey(5))
    assert np.isfinite(float(m["loss"]))
