"""Precision policy for TPU compute.

Params are always stored in float32. Compute may run in bfloat16 (MXU-native)
with float32 accumulation; instance-norm statistics and loss reductions always
run in float32 to match the reference's float32 PyTorch numerics closely enough
for SSIM>=0.98 parity.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Precision:
    """Precision policy threaded through model apply functions.

    Attributes:
        compute_dtype: dtype activations/weights are cast to for conv/matmul.
        accum_dtype: accumulation dtype for MXU ops (``preferred_element_type``).
        norm_dtype: dtype used for normalization statistics and loss reductions.
    """

    compute_dtype: jnp.dtype = jnp.float32
    accum_dtype: jnp.dtype = jnp.float32
    norm_dtype: jnp.dtype = jnp.float32

    @staticmethod
    def f32() -> "Precision":
        return Precision()

    @staticmethod
    def bf16() -> "Precision":
        return Precision(compute_dtype=jnp.bfloat16)


def canonical_compute_dtype(name: str) -> Precision:
    name = name.lower()
    if name in ("f32", "float32", "fp32"):
        return Precision.f32()
    if name in ("bf16", "bfloat16"):
        return Precision.bf16()
    raise ValueError(f"unknown precision {name!r}; expected 'f32' or 'bf16'")
