"""Device mesh + sharding policy (first-class, per SURVEY.md §2.2/§5.8).

The reference is single-device eager PyTorch (/root/reference/train.py:22, no
torch.distributed anywhere). The TPU rebuild scales via SPMD: a 1-D ``data``
mesh over all chips, batches sharded over it, params/optimizer state
replicated. Gradient all-reduce is *implicit* — jit sees sharded batch inputs
and replicated params and inserts the ``psum`` over ICI itself; there is no
hand-written collective in the train step (the XLA way, not the NCCL way).

For >256px inference a 2-D ``(data, space)`` mesh additionally shards image
height; the stylizer is convolutional so XLA inserts halo exchanges for the
spatial convs automatically when H is sharded.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map as _shard_map
except ImportError:  # older JAX
    from jax.experimental.shard_map import shard_map as _shard_map


def shard_map_checked(fn, mesh, in_specs, out_specs, *, check: bool = True):
    """Version-portable ``shard_map``: jax>=0.8 names the replication check
    ``check_vma``, older versions ``check_rep``. The check matters for
    gradients — with it ON, shard_map's transpose inserts the cross-shard
    psums for replicated inputs itself (see train/spatial_step.py)."""
    kwargs = dict(mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    try:
        return _shard_map(fn, check_vma=check, **kwargs)
    except TypeError:
        return _shard_map(fn, check_rep=check, **kwargs)


def place_on_data_axis(sharding, batch):
    """Shard ``batch`` over the mesh's 'data' axis when its leading dim
    divides; otherwise leave it for the default device (single images and
    ragged final chunks must not crash a data-parallel server). Shared by
    every serving path so the divisibility rule can never diverge."""
    if sharding is None:
        return batch
    n_shards = dict(sharding.mesh.shape).get("data", sharding.mesh.size)
    if batch.shape[0] % max(n_shards, 1):
        return batch
    import jax

    return jax.device_put(batch, sharding)


@dataclasses.dataclass(frozen=True)
class MeshPlan:
    """A mesh plus the canonical shardings the framework uses on it."""

    mesh: Mesh

    @property
    def batch_sharding(self) -> NamedSharding:
        """NHWC activations sharded over batch (and H over 'space' if present)."""
        axes = [None, None, None, None]
        axes[0] = "data"
        if "space" in self.mesh.axis_names:
            axes[1] = "space"
        return NamedSharding(self.mesh, P(*axes))

    @property
    def replicated(self) -> NamedSharding:
        """Params / optimizer state / scalars: replicated on every chip."""
        return NamedSharding(self.mesh, P())

    @property
    def num_data_shards(self) -> int:
        return self.mesh.shape["data"]

    def check_batch(self, global_batch_size: int) -> None:
        if global_batch_size % self.num_data_shards != 0:
            raise ValueError(
                f"global batch {global_batch_size} not divisible by "
                f"data-parallel degree {self.num_data_shards}"
            )


def make_mesh_plan(
    devices: Optional[Sequence[jax.Device]] = None,
    *,
    spatial: int = 1,
) -> MeshPlan:
    """Build the framework mesh over all (or given) devices.

    ``spatial`` > 1 carves a 'space' axis for H-sharded big-image inference;
    the remaining devices form the 'data' axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % spatial != 0:
        raise ValueError(f"{n} devices not divisible by spatial={spatial}")
    if spatial > 1:
        mesh = jax.make_mesh((n // spatial, spatial), ("data", "space"), devices=devices)
    else:
        mesh = jax.make_mesh((n,), ("data",), devices=devices)
    return MeshPlan(mesh=mesh)
