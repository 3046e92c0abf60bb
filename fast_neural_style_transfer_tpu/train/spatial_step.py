"""Spatially-sharded training: the FULL train step with image height sharded
over the mesh 'space' axis.

Use case: high-resolution fine-tuning (512² – 4K) where one chip can't hold
the activations. Everything crossing the H dimension is sharding-aware
(models/spatial.py + ops/sharded.py): stylizer and VGG convs exchange halos
over ICI, instance-norm statistics and every loss reduction psum over the
axis, TV adds its shard-seam terms. The resulting loss — and therefore the
gradients — are numerically identical to unsharded training (verified in
tests/test_spatial_train.py on a virtual mesh).

Gradient flow: inside shard_map each shard differentiates its local slice of
the computation (collectives transpose to collectives), yielding PARTIAL
parameter gradients whose psum over the axis is the true global gradient —
the same shape as data-parallel gradient aggregation, riding ICI. The Adam
update runs outside shard_map on the replicated psum'd gradients.

Shard-size constraint: local H divisible by 8 (stylizer needs 4, VGG's three
pools before relu4_3 need 8).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import PartitionSpec as P

from fast_neural_style_transfer_tpu.core.dtypes import Precision
from fast_neural_style_transfer_tpu.losses import LossTaps
from fast_neural_style_transfer_tpu.models.spatial import (
    transformer_forward_sharded,
    vgg_features_sharded,
)
from fast_neural_style_transfer_tpu.ops import sharded as sh
from fast_neural_style_transfer_tpu.parallel.mesh import MeshPlan, shard_map_checked
from fast_neural_style_transfer_tpu.train.schedule import (
    LossWeightSchedule,
    cosine_lr_schedule,
)
from fast_neural_style_transfer_tpu.train.state import TrainState
from fast_neural_style_transfer_tpu.train.step import (
    ACTIVATION_CLAMP,
    normalize_u8_batch,
)

AXIS = "space"


def spatial_loss_fn(
    params: Any,
    vgg_params: Any,
    batch: jnp.ndarray,
    style_grams: Tuple[jnp.ndarray, ...],
    weights,
    rng,
    *,
    taps: LossTaps,
    precision: Precision,
    axis: str = AXIS,
    batch_axes: Tuple[str, ...] = (),
    remat: bool = False,
):
    """Per-shard weighted perceptual loss; every reduction is global (over
    the 'space' axis plus any ``batch_axes`` the batch dim is sharded over),
    so the returned scalar is identical on all shards.

    ``remat``: jax.checkpoint the two gradient-bearing forwards (sharded
    stylizer, sharded VGG over its output) — the HBM trade matters MOST
    here, where the whole point is images too big for one chip's
    activations. Collectives inside the segments (halo ppermutes, stat
    psums) replay in the recompute like any other op."""
    cw, sw, tw = weights
    batch = normalize_u8_batch(batch)
    if rng is not None:
        # distinct dropout masks per data shard (each holds different
        # samples); 'space' shards of the SAME sample must share the mask,
        # so never fold the space index in
        for a in batch_axes:
            rng = jax.random.fold_in(rng, lax.axis_index(a))

    def net_fwd(p, b, r):
        out = transformer_forward_sharded(
            p, b, train=True, rng=r, precision=precision, axis=axis
        )
        return jnp.clip(out, -ACTIVATION_CLAMP, ACTIVATION_CLAMP)

    if remat:
        net_fwd = jax.checkpoint(net_fwd)
    stylized = net_fwd(params, batch, rng)

    tap_names = taps.all_taps
    content_feats = vgg_features_sharded(
        lax.stop_gradient(vgg_params), lax.stop_gradient(batch), tap_names,
        precision=precision, axis=axis,
    )
    content_feats = [lax.stop_gradient(f) for f in content_feats]

    def vgg_fwd(vp, s):
        return vgg_features_sharded(vp, s, tap_names, precision=precision,
                                    axis=axis)

    if remat:
        vgg_fwd = jax.checkpoint(vgg_fwd)
    stylized_feats = vgg_fwd(vgg_params, stylized)
    s_feats, c_stylized = taps.split(stylized_feats)
    _, c_target = taps.split(content_feats)

    c_loss = cw * sh.content_loss_sharded(c_stylized, c_target, axis, batch_axes)
    s_total = jnp.asarray(0.0, jnp.float32)
    for feat, tgt, w in zip(s_feats, style_grams, taps.style_weights):
        g = sh.gram_matrix_sharded(feat, axis)
        c = tgt.shape[0]
        layer = jnp.sum(jnp.square(g - tgt.astype(jnp.float32)[None]))
        if batch_axes:  # batch sharded: the over-batch sum spans those axes
            layer = lax.psum(layer, batch_axes)
        s_total = s_total + (w * layer) / (c * c)
    s_loss = sw * s_total
    t_loss = tw * sh.total_variation_loss_sharded(stylized, axis, batch_axes)
    total = c_loss + s_loss + t_loss
    return total, {
        "loss": total,
        "content_loss": c_loss,
        "style_loss": s_loss,
        "tv_loss": t_loss,
    }


def make_spatial_train_step(
    optimizer: optax.GradientTransformation,
    plan: MeshPlan,
    *,
    taps: LossTaps = LossTaps(),
    weight_schedule: LossWeightSchedule = LossWeightSchedule(),
    precision: Precision = Precision.f32(),
    lr: float = 1e-3,
    total_steps: int = 80_000,
    grad_accum: int = 1,
    donate: bool = True,
    remat: bool = False,
) -> Callable:
    """Build the jitted H-sharded ``step(state, vgg_params, batch_global,
    style_grams, rng)``. ``batch_global`` is the full-resolution NHWC batch,
    sharded (or shardable) as P(None, 'space', None, None) on the mesh.

    Step unit matches make_train_step: schedules are functions of APPLIED
    optimizer updates (``state.step // grad_accum``)."""
    if AXIS not in plan.mesh.axis_names:
        raise ValueError("mesh has no 'space' axis; build with make_mesh_plan(spatial=N)")
    lr_fn = cosine_lr_schedule(lr, max(total_steps // grad_accum, 1))
    # 2-D mesh: the batch dim additionally shards over 'data'; loss sums
    # then psum over it too (instance norm and halos stay 'space'-only —
    # they never cross samples)
    data_sharded = "data" in plan.mesh.axis_names and plan.mesh.shape["data"] > 1
    batch_axes: Tuple[str, ...] = ("data",) if data_sharded else ()
    batch_spec = P("data" if data_sharded else None, AXIS, None, None)
    lfn = functools.partial(spatial_loss_fn, taps=taps, precision=precision,
                            batch_axes=batch_axes, remat=remat)

    def sharded_grads(params, vgg_params, batch, style_grams, weights, rng):
        (loss, metrics), grads = jax.value_and_grad(lfn, has_aux=True)(
            params, vgg_params, batch, style_grams, weights, rng
        )
        # With replication checking ON, shard_map's transpose machinery
        # inserts the cross-shard psum for gradients of replicated inputs
        # itself — the grads come out global and replicated. (Disabling the
        # check silently yields wrong bias grads, and an extra manual psum
        # multiplies everything by the shard count — both found the hard
        # way; see tests/test_spatial_train.py.)
        return grads, metrics

    mapped = shard_map_checked(
        sharded_grads,
        plan.mesh,
        in_specs=(P(), P(), batch_spec, P(), P(), P()),
        out_specs=(P(), P()),
        check=True,
    )

    def step_fn(state: TrainState, vgg_params, batch, style_grams, rng):
        applied_step = state.step // grad_accum
        weights = weight_schedule(applied_step)
        grads, metrics = mapped(
            state.params, vgg_params, batch, style_grams, weights, rng
        )
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        finite = jnp.isfinite(metrics["loss"])
        select = lambda new, old: jax.tree.map(
            lambda a, o: jnp.where(finite, a, o), new, old
        )
        new_params = select(new_params, state.params)
        new_opt_state = select(new_opt_state, state.opt_state)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["lr"] = lr_fn(applied_step)
        metrics["skipped_nonfinite"] = (~finite).astype(jnp.float32)
        # as in train/step.py: a skipped step advances nothing, keeping
        # state.step aligned with the optimizer's reverted schedule count
        new_step = state.step + finite.astype(state.step.dtype)
        return TrainState(new_params, new_opt_state, new_step), metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
