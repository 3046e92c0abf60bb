"""SPMD tests on the 8-virtual-device CPU mesh (conftest.py forces
xla_force_host_platform_device_count=8 — the multi-node stand-in per
SURVEY.md §4)."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from fast_neural_style_transfer_tpu.losses import LossTaps, style_targets_from_features
from fast_neural_style_transfer_tpu.models import TransformerNet, VGG19Features
from fast_neural_style_transfer_tpu.parallel import make_mesh_plan
from fast_neural_style_transfer_tpu.train import (
    LossWeightSchedule,
    create_train_state,
    make_train_step,
)
from fast_neural_style_transfer_tpu.train.state import make_optimizer, replicate_state


def test_mesh_plan_shapes():
    plan = make_mesh_plan()
    assert plan.mesh.shape == {"data": 8}
    plan.check_batch(16)
    try:
        plan.check_batch(3)
        assert False, "expected divisibility error"
    except ValueError:
        pass


def test_mesh_plan_spatial_axis():
    plan = make_mesh_plan(spatial=2)
    assert plan.mesh.shape == {"data": 4, "space": 2}
    spec = plan.batch_sharding.spec
    assert spec[0] == "data" and spec[1] == "space"


def _setup(batch, hw=32, total_steps=10):
    key = jax.random.PRNGKey(0)
    taps = LossTaps(content_tap="relu4_2")
    vgg = VGG19Features.init(key)
    style = jax.random.normal(jax.random.PRNGKey(7), (1, hw, hw, 3))
    grams = tuple(
        style_targets_from_features(VGG19Features.apply(vgg, style, taps.style_taps))
    )
    opt = make_optimizer(1e-3, total_steps)
    state = create_train_state(TransformerNet.init(key), opt)
    step = make_train_step(opt, taps=taps, weight_schedule=LossWeightSchedule(),
                           lr=1e-3, total_steps=total_steps, donate=False)
    batch_x = jax.random.normal(jax.random.PRNGKey(3), (batch, hw, hw, 3))
    return state, vgg, batch_x, grams, step


@pytest.mark.slow
def test_dp_sharded_step_matches_single_device():
    """Gradient psum over the mesh must reproduce single-device math."""
    state, vgg, batch, grams, step = _setup(batch=8)

    # single-device (fully local) result — dropout off so runs are comparable
    s1, m1 = step(state, vgg, batch, grams, None)

    # DP-sharded result
    plan = make_mesh_plan()
    state_r = replicate_state(state, plan.replicated)
    vgg_r = jax.device_put(vgg, plan.replicated)
    grams_r = tuple(jax.device_put(g, plan.replicated) for g in grams)
    batch_s = jax.device_put(batch, plan.batch_sharding)
    s8, m8 = step(state_r, vgg_r, batch_s, grams_r, None)

    assert float(m1["loss"]) == np.float32(float(m8["loss"])) or np.isclose(
        float(m1["loss"]), float(m8["loss"]), rtol=1e-5
    )
    jax.tree.map(
        # absolute tolerance: Adam normalizes near-zero grads to +-lr, so a
        # reduction-order sign flip on a ~0 grad element gives a bounded
        # absolute (not relative) param difference
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=3e-4
        ),
        s1.params,
        s8.params,
    )


def test_graft_entry_single_chip():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 256, 256, 3)


@pytest.mark.slow
def test_graft_entry_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_spatially_sharded_inference_matches_local():
    """The shard_map halo-exchange forward (infer/spatial.py) must be
    numerically identical to the unsharded forward: per-layer halos make the
    convs exact and psum'd IN stats are truly global."""
    from fast_neural_style_transfer_tpu.infer.spatial import stylize_spatial

    plan = make_mesh_plan(spatial=4)
    params = TransformerNet.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))

    want = np.asarray(jax.jit(
        lambda p, v: TransformerNet.apply(p, v, train=False)
    )(params, x))
    got = np.asarray(stylize_spatial(params, x, plan))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_spatially_sharded_inference_unaligned_height():
    """H not divisible by 4*n_shards is EXACT, not merely shape-correct:
    the active-extent machinery (reflect-pin rows, masked IN moments, zeroed
    transpose boundary row — models/spatial.py) makes the sharded route
    equal the single-device pad-4/run/crop route. 52 rows is already a
    multiple of 4, so the canonical input is UNPADDED and the 12 slab-fill
    rows (-> 64 over 4 shards) must be completely invisible; 49 rows also
    exercises the canonical reflect pad itself."""
    from fast_neural_style_transfer_tpu.core.shapes import (
        pad_to_multiple_reflect,
    )
    from fast_neural_style_transfer_tpu.infer.spatial import stylize_spatial

    plan = make_mesh_plan(spatial=4)
    params = TransformerNet.init(jax.random.PRNGKey(0))
    fwd = jax.jit(lambda p, v: TransformerNet.apply(p, v, train=False))
    for h, w in ((52, 40), (49, 40)):
        x = jax.random.normal(jax.random.PRNGKey(2), (1, h, w, 3))
        canon, _ = pad_to_multiple_reflect(x, 4)
        want = np.asarray(fwd(params, canon))[:, :h, :w, :]
        out = stylize_spatial(params, x, plan)
        assert out.shape == (1, h, w, 3)
        np.testing.assert_allclose(np.asarray(out), want,
                                   rtol=1e-3, atol=1e-4)


def test_spatial_tiny_image_pads_to_safe_local_height():
    """H=32 over 8 'space' shards is only 4 local rows — fewer than the k9
    encoder halo needs (p+1 = 5). stylize_spatial must pad to >=8 rows per
    shard and still return the caller's shape (previously: an opaque
    concatenate shape error)."""
    from fast_neural_style_transfer_tpu.infer.spatial import stylize_spatial

    plan = make_mesh_plan(spatial=8)
    params = TransformerNet.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 32, 40, 3))
    out = stylize_spatial(params, x, plan)
    assert out.shape == (1, 32, 40, 3)


def test_sharded_halo_rejects_too_small_slab():
    """A local slab shorter than the halo must raise a clear error, not a
    cryptic shape mismatch deep in concatenate."""
    import pytest
    from jax.sharding import PartitionSpec as P

    from fast_neural_style_transfer_tpu.ops import sharded as sh
    from fast_neural_style_transfer_tpu.parallel.mesh import shard_map_checked

    plan = make_mesh_plan(spatial=4)
    w = jnp.zeros((9, 9, 3, 8), jnp.float32)

    def fwd(x):
        return sh.reflect_conv2d_sharded(x, w, None, stride=1)

    mapped = shard_map_checked(
        fwd, plan.mesh,
        in_specs=(P(None, "space", None, None),),
        out_specs=P(None, "space", None, None),
        check=False,
    )
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)  # 4 local rows < p+1 = 5
    with pytest.raises(ValueError, match="halo"):
        jax.jit(mapped)(x)


def test_sharded_strided_conv_rejects_unaligned_local_height():
    import pytest
    from jax.sharding import PartitionSpec as P

    from fast_neural_style_transfer_tpu.ops import sharded as sh
    from fast_neural_style_transfer_tpu.parallel.mesh import shard_map_checked

    plan = make_mesh_plan(spatial=4)
    w = jnp.zeros((3, 3, 3, 8), jnp.float32)

    def fwd(x):
        return sh.reflect_conv2d_sharded(x, w, None, stride=2)

    mapped = shard_map_checked(
        fwd, plan.mesh,
        in_specs=(P(None, "space", None, None),),
        out_specs=P(None, "space", None, None),
        check=False,
    )
    x = jnp.zeros((1, 20, 16, 3), jnp.float32)  # 5 local rows, stride 2
    with pytest.raises(ValueError, match="stride"):
        jax.jit(mapped)(x)


def test_spatial_forward_cached_and_precision_forwarded():
    """make_spatial_forward must return the SAME jitted callable for the
    same (mesh, precision) — a fresh closure per call would recompile every
    frame of a bulk job — and must honor the requested precision."""
    from fast_neural_style_transfer_tpu.core.dtypes import Precision
    from fast_neural_style_transfer_tpu.infer.spatial import (
        make_spatial_forward,
        stylize_spatial,
    )

    plan = make_mesh_plan(spatial=4)
    f1 = make_spatial_forward(plan)
    f2 = make_spatial_forward(plan)
    assert f1 is f2
    fb = make_spatial_forward(plan, precision=Precision.bf16())
    assert fb is not f1

    params = TransformerNet.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 3))
    out_b = np.asarray(stylize_spatial(params, x, plan,
                                       precision=Precision.bf16()))
    want = np.asarray(jax.jit(
        lambda p, v: TransformerNet.apply(p, v, train=False,
                                          precision=Precision.bf16())
    )(params, x))
    np.testing.assert_allclose(out_b, want, rtol=2e-2, atol=2e-2)
    # and bf16 compute actually diverges from f32 (i.e. the flag is live)
    out_f = np.asarray(stylize_spatial(params, x, plan))
    assert np.abs(out_b - out_f).max() > 0


def test_sharded_row_primitives():
    """The active-extent toolkit (ops/sharded.py): fetch/set a global row by
    traced index across shard boundaries, mask rows past an extent, and pin
    the virtual reflect rows — the pieces that make non-shard-aligned sizes
    exact in infer/spatial.py and infer/spatial_adain.py."""
    from jax.sharding import PartitionSpec as P

    from fast_neural_style_transfer_tpu.ops import sharded as sh
    from fast_neural_style_transfer_tpu.parallel.mesh import shard_map_checked

    plan = make_mesh_plan(spatial=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 4, 3)), jnp.float32)  # 4 rows/shard

    def run(fn, *extra):
        mapped = shard_map_checked(
            fn, plan.mesh,
            in_specs=(P(None, "space", None, None),) + (P(),) * len(extra),
            out_specs=P(None, "space", None, None),
            check=False,
        )
        return np.asarray(jax.jit(mapped)(x, *extra))

    xn = np.asarray(x)

    # fetch: global row i (traced), replicated — incl. cross-shard indices
    def fetch_then_broadcast(v, i):
        row = sh.fetch_global_row(v, i)          # (B, 1, W, C)
        return jnp.broadcast_to(row, v.shape)

    for i in (0, 5, 11, 15):
        got = run(fetch_then_broadcast, jnp.int32(i))
        np.testing.assert_allclose(got[:, 0], xn[:, i], rtol=1e-6)

    # set: write a fetched row into another global row, crossing shards
    def set_row(v, i, j):
        return sh.set_global_row(v, j, sh.fetch_global_row(v, i))

    got = run(set_row, jnp.int32(2), jnp.int32(13))
    want = xn.copy()
    want[:, 13] = xn[:, 2]
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # out-of-range target: a no-op (the aligned case)
    got = run(set_row, jnp.int32(2), jnp.int32(16))
    np.testing.assert_allclose(got, xn, rtol=1e-6)

    # mask: rows >= extent zeroed, extent traced
    got = run(lambda v, e: sh.mask_rows_from(v, e), jnp.int32(9))
    want = xn.copy()
    want[:, 9:] = 0.0
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # pin: rows [e, e+pad) become the reflect continuation rows e-2-i
    got = run(lambda v, e: sh.pin_reflect_rows(v, e, 3), jnp.int32(10))
    want = xn.copy()
    for i in range(3):
        want[:, 10 + i] = xn[:, 8 - i]
    np.testing.assert_allclose(got, want, rtol=1e-6)
