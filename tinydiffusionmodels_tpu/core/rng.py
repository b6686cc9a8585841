"""PRNG key discipline helpers.

JAX PRNG is explicit and splittable; these helpers centralize the patterns
the framework uses so every site is deterministic and reproducible:
- per-step keys derived by folding the step counter into a root key,
- named substreams (e.g. "time", "noise", "dropout") folded from a step key.
"""

from __future__ import annotations

import hashlib
import math
import os

import jax
import jax.numpy as jnp


def key_for_step(root: jax.Array, step: jax.Array | int) -> jax.Array:
    """Derive the key for a given global step (works under jit/scan)."""
    return jax.random.fold_in(root, step)


def _name_to_int(name: str) -> int:
    digest = hashlib.sha1(name.encode("utf-8")).digest()
    return int.from_bytes(digest[:4], "little") & 0x7FFFFFFF


def substream(key: jax.Array, name: str) -> jax.Array:
    """Derive a named substream from a key (static name, trace-safe)."""
    return jax.random.fold_in(key, _name_to_int(name))


# ---------------------------------------------------------------------------
# Counter-based fast normals (train-noise fast path)
# ---------------------------------------------------------------------------

def _fmix32(h: jax.Array) -> jax.Array:
    """murmur3 finalizer — the same avalanche mix the Pallas flash-dropout
    kernel uses for counter-based masks (ops/pallas_kernels._dropout_scale)."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def counter_normal(key: jax.Array, shape: tuple[int, ...],
                   dtype=jnp.float32) -> jax.Array:
    """Standard normals from a counter-based hash + Box-Muller.

    Why this exists: profiling the bs=512 bf16 MNIST train step
    (tools/xprof_ops.py) showed ~22% of device time in the stock
    jax.random.normal chain (random bits materialized to HBM, then a
    separate uniform->erfinv fusion). This draw is pure elementwise u32/
    transcendental VPU work on an iota counter — XLA fuses it INTO the
    q_sample consumer, so the noise never round-trips HBM and the erfinv
    polynomial is replaced by one log+sqrt+sincos pair per TWO samples
    (exact Box-Muller, not an approximation).

    Determinism: seeded from jax.random.key_data(key), so the stream is a
    pure function of the JAX key regardless of the global PRNG impl
    (threefry or rbg) and identical on CPU/TPU. Not crypto-grade —
    training noise needs uniformity and independence at diffusion scale,
    not unpredictability (same argument as the flash-dropout mask).
    """
    n = math.prod(shape)
    if n == 0:
        return jnp.zeros(shape, dtype)
    half = (n + 1) // 2
    kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    # Mix all key words into two independent 32-bit seeds.
    seed = kd[0]
    for i in range(1, kd.shape[0]):
        seed = _fmix32(seed ^ (kd[i] + jnp.uint32(0x9E3779B9)))
    seed2 = _fmix32(seed ^ jnp.uint32(0x632BE59B))
    idx = jax.lax.iota(jnp.uint32, half)
    h1 = _fmix32(idx * jnp.uint32(0x9E3779B9) + seed)
    h2 = _fmix32(idx * jnp.uint32(0x85EBCA6B) + seed2)
    # 24-bit mantissa uniforms; u1 in (0, 1] so log(u1) is finite.
    u1 = (h1 >> 8).astype(jnp.float32) * jnp.float32(2**-24) \
        + jnp.float32(2**-25)
    u2 = (h2 >> 8).astype(jnp.float32) * jnp.float32(2**-24)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = jnp.float32(2.0 * math.pi) * u2
    z = jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)])[:n]
    return z.reshape(shape).astype(dtype)


def counter_bernoulli(key: jax.Array, p: float,
                      shape: tuple[int, ...]) -> jax.Array:
    """Boolean keep-mask: P(True) = p, from the same counter hash as
    counter_normal (dropout needs uniformity, not unpredictability)."""
    n = math.prod(shape)
    if n == 0:
        return jnp.zeros(shape, bool)
    kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    seed = kd[0]
    for i in range(1, kd.shape[0]):
        seed = _fmix32(seed ^ (kd[i] + jnp.uint32(0x9E3779B9)))
    # Salt so a same-key mask never shares counter_normal's h1 stream.
    seed = _fmix32(seed ^ jnp.uint32(0x38D1BB47))
    h = _fmix32(jax.lax.iota(jnp.uint32, n) * jnp.uint32(0x9E3779B9) + seed)
    thresh = jnp.uint32(min(int((1.0 - p) * 2**32), 2**32 - 1))
    return (h >= thresh).reshape(shape)


def _fast_noise() -> bool:
    """TDM_FAST_NOISE: '1' / '0' / 'auto' (default — on for TPU backends,
    same policy as runtime.configure_fast_rng). Measured solo on v5e-1
    (tools/solo_r4.sh xprof, bs=512 bf16, 20-step scan device time): the
    text train step drops 439 -> 372 ms (-15.3%) — the stock bernoulli's
    rng-bit-generator materialized 268 MB of mask bits to HBM per step —
    and MNIST 58.4 -> 57.1 ms (its normal draw was already fused).
    Read at trace time — a knob, not a traced value."""
    mode = os.environ.get("TDM_FAST_NOISE", "auto")
    if mode in ("0", "1"):
        return mode == "1"
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def draw_noise(key: jax.Array, shape: tuple[int, ...],
               dtype=jnp.float32) -> jax.Array:
    """Train-loop noise draw: counter_normal on TPU (see _fast_noise),
    stock jax.random.normal elsewhere."""
    if _fast_noise():
        return counter_normal(key, shape, dtype)
    return jax.random.normal(key, shape, dtype)


def draw_keep(key: jax.Array, keep_prob: float,
              shape: tuple[int, ...]) -> jax.Array:
    """Dropout keep-mask draw: counter_bernoulli on TPU (see _fast_noise),
    stock jax.random.bernoulli elsewhere."""
    if _fast_noise():
        return counter_bernoulli(key, keep_prob, shape)
    return jax.random.bernoulli(key, keep_prob, shape)
