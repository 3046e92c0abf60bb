"""Color control for stylization (AdaIN paper arXiv:1703.06868 §7.2).

Two standard ways to keep the CONTENT's palette in a stylized output:

- ``match_color``: affine-transform the STYLE image's pixels so their RGB
  mean and covariance equal the content's (whitening-coloring transform) —
  the AdaIN paper's method; the stylization then paints with content-like
  colors. Applied BEFORE encoding the style.
- ``luminance_transfer``: keep the stylized LUMINANCE, take the chrominance
  from the content (YIQ space) — Gatys et al. color control (option 2),
  applied AFTER stylization. Works for any stylizer, including the flagship
  one-style-per-net family.

Both are pure jnp on [0, 1]-ish RGB arrays (any float range works — the
transforms are affine), jittable, and batch-aware (leading dims preserved;
statistics per image over H, W).
"""

from __future__ import annotations

import jax.numpy as jnp

# NTSC YIQ <-> RGB (the classic luminance/chrominance split)
_RGB2YIQ = jnp.array([
    [0.299, 0.587, 0.114],
    [0.595716, -0.274453, -0.321263],
    [0.211456, -0.522591, 0.311135],
], jnp.float32)
_YIQ2RGB = jnp.linalg.inv(_RGB2YIQ)


def _mean_cov(x: jnp.ndarray, eps: float):
    """Per-image RGB mean (B,1,3) and covariance (B,3,3) over H*W pixels."""
    b = x.shape[0]
    flat = x.reshape(b, -1, 3).astype(jnp.float32)
    mean = jnp.mean(flat, axis=1, keepdims=True)
    centered = flat - mean
    cov = jnp.einsum("bnc,bnd->bcd", centered, centered) / centered.shape[1]
    cov = cov + eps * jnp.eye(3, dtype=jnp.float32)
    return flat, mean, cov


def _cov_sqrt(cov: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Symmetric (inverse) square root of a batch of SPD 3x3 matrices."""
    vals, vecs = jnp.linalg.eigh(cov)
    vals = jnp.maximum(vals, 1e-12)
    d = jnp.where(inverse, 1.0 / jnp.sqrt(vals), jnp.sqrt(vals))
    return jnp.einsum("bij,bj,bkj->bik", vecs, d, vecs)


def match_color(source: jnp.ndarray, target: jnp.ndarray,
                eps: float = 1e-5) -> jnp.ndarray:
    """Affine-map ``source``'s pixels so their RGB mean/covariance equal
    ``target``'s (whitening-coloring). NHWC in, NHWC out, dtype preserved.
    ``target`` may have a different H, W, or batch of 1 (broadcasts)."""
    if source.ndim != 4 or target.ndim != 4:
        raise ValueError("match_color expects NHWC batches")
    s_flat, s_mean, s_cov = _mean_cov(source, eps)
    _, t_mean, t_cov = _mean_cov(target, eps)
    a = jnp.einsum("bij,bjk->bik", _cov_sqrt(t_cov),
                   _cov_sqrt(s_cov, inverse=True))
    out = jnp.einsum("bnc,bdc->bnd", s_flat - s_mean, a) + t_mean
    return out.reshape(source.shape).astype(source.dtype)


def luminance_transfer(stylized: jnp.ndarray, content: jnp.ndarray) -> jnp.ndarray:
    """Stylized luminance + content chrominance, in YIQ. Shapes must match
    (NHWC); dtype preserved. The luminance channel is histogram-shifted to
    the content's mean/std first (Gatys color-control detail), so overall
    brightness stays the content's."""
    if stylized.shape != content.shape:
        raise ValueError(
            f"stylized {stylized.shape} and content {content.shape} must "
            "match for luminance transfer")
    s = jnp.einsum("...c,dc->...d", stylized.astype(jnp.float32), _RGB2YIQ)
    c = jnp.einsum("...c,dc->...d", content.astype(jnp.float32), _RGB2YIQ)
    y_s, y_c = s[..., :1], c[..., :1]
    axes = tuple(range(1, y_s.ndim - 1))
    mu_s = jnp.mean(y_s, axis=axes, keepdims=True)
    mu_c = jnp.mean(y_c, axis=axes, keepdims=True)
    sd_s = jnp.std(y_s, axis=axes, keepdims=True) + 1e-6
    sd_c = jnp.std(y_c, axis=axes, keepdims=True)
    y = (y_s - mu_s) / sd_s * sd_c + mu_c
    out = jnp.concatenate([y, c[..., 1:]], axis=-1)
    out = jnp.einsum("...c,dc->...d", out, _YIQ2RGB)
    return out.astype(stylized.dtype)
