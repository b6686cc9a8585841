"""Parameter initializers matching torch's module defaults.

Training-dynamics parity with the reference requires matching init
*distributions* (exact streams are impossible across RNGs — SURVEY.md §7
"Sampler parity with different RNG"). torch defaults replicated here:

- nn.Linear / nn.Conv2d weight: kaiming_uniform_(a=sqrt(5)) which reduces to
  U(-1/sqrt(fan_in), 1/sqrt(fan_in)); bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
- nn.MultiheadAttention: xavier_uniform_ in_proj, zero in_proj_bias and
  out_proj bias; out_proj weight keeps the Linear default.
- nn.LayerNorm: weight=1, bias=0.
- nn.Embedding: N(0, 1); the reference's LearnedEmbedding overrides to
  N(0, 0.02) (reference src/shakespeare.py:69).

Layout convention is JAX-native: linear weights are (in, out), conv kernels
HWIO. The torch .pth bridge (io/checkpoint.py) transposes at the boundary.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def linear_params(key, in_dim: int, out_dim: int, *, bias: bool = True) -> dict:
    """torch nn.Linear default init, stored as w:(in,out), b:(out,)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(in_dim)
    p = {"w": _uniform(kw, (in_dim, out_dim), bound)}
    if bias:
        p["b"] = _uniform(kb, (out_dim,), bound)
    return p


def conv_params(key, kh: int, kw_: int, in_ch: int, out_ch: int) -> dict:
    """torch nn.Conv2d default init, kernel stored HWIO."""
    k1, k2 = jax.random.split(key)
    fan_in = in_ch * kh * kw_
    bound = 1.0 / np.sqrt(fan_in)
    return {
        "w": _uniform(k1, (kh, kw_, in_ch, out_ch), bound),
        "b": _uniform(k2, (out_ch,), bound),
    }


def xavier_uniform(key, shape, fan_in: int, fan_out: int, dtype=jnp.float32):
    bound = np.sqrt(6.0 / (fan_in + fan_out))
    return _uniform(key, shape, bound, dtype)


def layernorm_params(dim: int) -> dict:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def layernorm_apply(p: dict, x: jax.Array, *, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis (torch nn.LayerNorm default eps)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def linear_apply(p: dict, x: jax.Array) -> jax.Array:
    out = x @ p["w"]
    if "b" in p:
        out = out + p["b"]
    return out


def dropout(
    key: jax.Array | None,
    x: jax.Array,
    rate: float,
    *,
    deterministic: bool,
) -> jax.Array:
    """Inverted dropout matching torch nn.Dropout semantics.

    Mask draws route through core.rng.draw_keep, so TDM_FAST_NOISE=1 swaps
    the stock bernoulli (bits materialized to HBM) for the counter-based
    hash that fuses into the consumer."""
    if deterministic or rate == 0.0:
        return x
    if key is None:
        raise ValueError("dropout in training mode requires a PRNG key")
    from tinydiffusionmodels_tpu.core.rng import draw_keep

    keep = draw_keep(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)
