"""Mixed-precision policy: bf16 compute, f32 master params/optimizer.

TPU MXUs are bf16-native; at default XLA precision f32 matmuls already run
as bf16 passes with f32 accumulation, so bf16 compute mainly halves HBM
traffic for activations/weights — the usual bottleneck on memory-bound
models. Losses are always reduced in f32.

Usage: step factories take ``compute_dtype=jnp.bfloat16``; params are cast
inside the loss (the cast's transpose returns f32 grads, so optax state and
updates stay full-precision).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype):
    """Cast every floating leaf of ``tree`` to ``dtype`` (no-op if None)."""
    if dtype is None:
        return tree
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        tree,
    )


def resolve_compute_dtype(name: str | None):
    """Map a CLI/env string ('bf16', 'f32', None) to a dtype or None."""
    if name in (None, "", "f32", "float32"):
        return None
    if name in ("bf16", "bfloat16"):
        return jnp.bfloat16
    raise ValueError(f"unknown compute dtype: {name!r}")
