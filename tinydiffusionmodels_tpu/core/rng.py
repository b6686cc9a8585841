"""PRNG key discipline helpers.

JAX PRNG is explicit and splittable; these helpers centralize the patterns
the framework uses so every site is deterministic and reproducible:
- per-step keys derived by folding the step counter into a root key,
- named substreams (e.g. "time", "noise", "dropout") folded from a step key.
"""

from __future__ import annotations

import hashlib

import jax


def key_for_step(root: jax.Array, step: jax.Array | int) -> jax.Array:
    """Derive the key for a given global step (works under jit/scan)."""
    return jax.random.fold_in(root, step)


def _name_to_int(name: str) -> int:
    digest = hashlib.sha1(name.encode("utf-8")).digest()
    return int.from_bytes(digest[:4], "little") & 0x7FFFFFFF


def substream(key: jax.Array, name: str) -> jax.Array:
    """Derive a named substream from a key (static name, trace-safe)."""
    return jax.random.fold_in(key, _name_to_int(name))
