"""Batched Gram matrix for style representation.

Reference computes ``bmm(F, F^T)`` on a (b, c, h*w) reshape with NO internal
normalization (/root/reference/losses/losses.py:6-13); normalization by c^2
happens inside the style loss (/root/reference/losses/losses.py:42). We keep
those semantics so the published loss-weight schedule transfers.

NHWC form: G[b, c, d] = sum_{h,w} F[b,h,w,c] * F[b,h,w,d] — a single batched
matmul that XLA tiles straight onto the MXU. Accumulation is forced to float32
(Gram entries are sums over h*w*... terms and overflow bf16 range quickly).
"""

from __future__ import annotations

import jax.numpy as jnp


def gram_matrix(feat: jnp.ndarray, *, accum_dtype=jnp.float32) -> jnp.ndarray:
    """(b, h, w, c) -> (b, c, c) unnormalized Gram, f32 accumulation."""
    b, h, w, c = feat.shape
    f = feat.reshape(b, h * w, c)
    return jnp.einsum("bnc,bnd->bcd", f, f, preferred_element_type=accum_dtype)
