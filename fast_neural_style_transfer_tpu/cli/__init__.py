"""Command-line front-ends (reference-flag-compatible)."""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: first compile of the train step is
    ~20-40 s on TPU; subsequent CLI invocations hit the cache. Override the
    location with JAX_COMPILATION_CACHE_DIR; disable with FNST_NO_JIT_CACHE."""
    if os.environ.get("FNST_NO_JIT_CACHE"):
        return
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "fnst_jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs


def resolve_style_flags(style_index, style_blend):
    """One definition of the --style_index/--style_blend contract for every
    CLI (inference, export): mutually exclusive; returns the value to pass
    as ``Stylizer.from_checkpoint(style=...)`` (None when neither given)."""
    if style_index is not None and style_blend is not None:
        raise ValueError("--style_index and --style_blend are mutually exclusive")
    return style_index if style_index is not None else style_blend
