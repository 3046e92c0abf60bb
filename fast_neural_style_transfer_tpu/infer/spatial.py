"""Spatially-sharded inference: H sharded over the mesh 'space' axis.

Large-image (4K) inference can exceed one chip's HBM/VMEM comfort zone; the
TPU answer is to shard the image height over chips and exchange only the
convolution halos over ICI (SURVEY.md §5.7's "spatial analogue of long
context"). Plain GSPMD can't propagate reflect-pad on a sharded dim, so this
runs the explicit H-sharded forward (models/spatial.py, built from the
halo-exchange / psum ops in ops/sharded.py) under ``shard_map`` — exact, not
an overlap-tile approximation. The training-side counterpart is
``train/spatial_step.py``.

Requires local H divisible by 4 (global H divisible by 4 * n_space_shards);
``stylize_spatial`` pads/crops to satisfy that.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from fast_neural_style_transfer_tpu.core.dtypes import Precision
from fast_neural_style_transfer_tpu.core.shapes import pad_to_multiple_reflect
from fast_neural_style_transfer_tpu.models.spatial import transformer_forward_sharded
from fast_neural_style_transfer_tpu.parallel.mesh import MeshPlan, shard_map_checked

AXIS = "space"

# (mesh, precision) -> jitted forward. Without this, every stylize_spatial
# call would build a fresh shard_map closure whose new function identity
# defeats jit's trace cache — a full recompile per frame on bulk jobs.
_FWD_CACHE: dict = {}


def make_spatial_forward(plan: MeshPlan, *, precision: Precision = Precision.f32()):
    """Jitted H-sharded eval forward over ``plan``'s 'space' axis, cached
    per (mesh, precision).

    Input: NHWC with H divisible by 4 * n_space_shards. Params replicated.
    """
    if "space" not in plan.mesh.axis_names:
        raise ValueError("mesh has no 'space' axis; build with make_mesh_plan(spatial=N)")
    key = (plan.mesh, precision)
    cached = _FWD_CACHE.get(key)
    if cached is not None:
        return cached

    def fwd(params: Any, x: jnp.ndarray, active_h) -> jnp.ndarray:
        return transformer_forward_sharded(
            params, x, train=False, precision=precision, axis=AXIS,
            extent=active_h)

    mapped = shard_map_checked(
        fwd,
        plan.mesh,
        in_specs=(P(), P(None, AXIS, None, None), P()),
        out_specs=P(None, AXIS, None, None),
        check=False,
    )
    jitted = jax.jit(mapped)
    _FWD_CACHE[key] = jitted
    return jitted


def stylize_spatial(
    params: Any,
    image: jnp.ndarray,
    plan: MeshPlan,
    *,
    precision: Precision = Precision.f32(),
) -> jnp.ndarray:
    """Stylize an NHWC batch with H sharded across the 'space' axis.

    Matches the single-device route — reflect-pad to a multiple of 4
    (``TransformerNet.apply``'s constraint), run, crop — to f32 tolerance
    at ANY size. Stage 1 applies that exact canonical pad (min 8 rows: the
    k9 conv's reflect needs 5); stage 2 zero-fills up to the equal-slab
    height (multiple of 4 * n_shards, >= 8 rows per shard for the k9 halo),
    and the forward's active-extent machinery (models/spatial.py) pins
    reflect boundary rows, masks the IN moments, and zeroes the transpose
    convs' boundary row so the fill never exists mathematically.
    """
    n_shards = plan.mesh.shape[AXIS]
    n, h, w, c = image.shape
    # stage 1: the single-device route's canonical pad — byte-for-byte
    x, _ = pad_to_multiple_reflect(image, 4)
    if x.shape[1] < 8:
        x = jnp.pad(x, ((0, 0), (0, 8 - x.shape[1]), (0, 0), (0, 0)),
                    mode="edge")
    h4 = x.shape[1]
    # stage 2: zero rows up to the equal-slab height (masked out of the math)
    mult = 4 * n_shards
    target_h = max(-(-h4 // mult) * mult, 8 * n_shards)
    if target_h > h4:
        x = jnp.pad(x, ((0, 0), (0, target_h - h4), (0, 0), (0, 0)))
    fwd = make_spatial_forward(plan, precision=precision)
    out = fwd(params, x, jnp.asarray(h4, jnp.int32))
    if (target_h, x.shape[2]) != (h, w):
        # crop host-side: slicing a sharded dim to a non-divisible extent is
        # not expressible as a sharded op
        return jnp.asarray(jax.device_get(out)[:, :h, :w, :])
    return out
