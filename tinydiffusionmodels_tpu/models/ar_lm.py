"""TinyGPT: a small causal LM with KV-cached decoding.

The reference's guided sampler needs a base autoregressive LM for its
ar_logits (reference src/shakespeare.py:429-470, default google/gemma-2b-it).
In hermetic/TPU environments that HF checkpoint may be unavailable, and the
reference's decode loop re-runs the *full* LM forward on the whole prefix for
every token (src/shakespeare.py:448-449 — no KV cache, O(L^2) LM forwards).

This module provides:
- a self-contained causal transformer LM (pre-LN GPT block, learned
  positional embeddings) usable as the guided sampler's base LM fallback,
  trainable on the same corpus;
- KV-cached single-token decoding (``tiny_gpt_decode_step``) so guided
  generation is one ``lax.scan`` instead of a Python loop of full forwards —
  the behavior-preserving speedup SURVEY.md §7 calls for (greedy decoding is
  invariant to caching).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tinydiffusionmodels_tpu import ops
from tinydiffusionmodels_tpu.models.torch_init import (
    layernorm_apply,
    layernorm_params,
    linear_apply,
    linear_params,
)


@dataclasses.dataclass(frozen=True)
class TinyGPTConfig:
    vocab_size: int
    dim: int = 256
    n_heads: int = 4
    depth: int = 4
    max_len: int = 256
    ffn_mult: int = 4


def _init_block(key: jax.Array, cfg: TinyGPTConfig) -> dict:
    k = jax.random.split(key, 4)
    d = cfg.dim
    return {
        "ln1": layernorm_params(d),
        "attn": {
            "qkv": linear_params(k[0], d, 3 * d),
            "proj": linear_params(k[1], d, d),
        },
        "ln2": layernorm_params(d),
        "mlp": {
            "fc": linear_params(k[2], d, cfg.ffn_mult * d),
            "proj": linear_params(k[3], cfg.ffn_mult * d, d),
        },
    }


def init_tiny_gpt(key: jax.Array, cfg: TinyGPTConfig) -> dict:
    keys = jax.random.split(key, cfg.depth + 3)
    return {
        "tok_emb": 0.02 * jax.random.normal(keys[0], (cfg.vocab_size, cfg.dim)),
        "pos_emb": 0.01 * jax.random.normal(keys[1], (cfg.max_len, cfg.dim)),
        "blocks": tuple(_init_block(k, cfg) for k in keys[2:-1]),
        "ln_f": layernorm_params(cfg.dim),
        "lm_head": linear_params(keys[-1], cfg.dim, cfg.vocab_size, bias=False),
    }


def _split_heads_blhd(a: jax.Array, n_heads: int) -> jax.Array:
    # Copy-free head split: (B, L, D) -> (B, L, H, Dh) is a pure reshape;
    # the head axis rides through ops.attention(layout='blhd') as an einsum
    # batch dim instead of a materialized transpose.
    b, l, d = a.shape
    return a.reshape(b, l, n_heads, d // n_heads)


def tiny_gpt_apply(params: dict, ids: jax.Array, cfg: TinyGPTConfig) -> jax.Array:
    """Full causal forward. ids: (B, L) int -> logits (B, L, V)."""
    b, l = ids.shape
    x = jnp.take(params["tok_emb"], ids, axis=0) + params["pos_emb"][:l]
    causal = jnp.tril(jnp.ones((l, l), dtype=bool))[None, None]
    for blk in params["blocks"]:
        h = layernorm_apply(blk["ln1"], x)
        qkv = linear_apply(blk["attn"]["qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = ops.attention(
            _split_heads_blhd(q, cfg.n_heads),
            _split_heads_blhd(k, cfg.n_heads),
            _split_heads_blhd(v, cfg.n_heads),
            mask=causal,
            layout="blhd",
        )
        x = x + linear_apply(blk["attn"]["proj"], attn.reshape(b, l, cfg.dim))
        h = layernorm_apply(blk["ln2"], x)
        x = x + linear_apply(
            blk["mlp"]["proj"], jax.nn.gelu(linear_apply(blk["mlp"]["fc"], h))
        )
    x = layernorm_apply(params["ln_f"], x)
    return linear_apply(params["lm_head"], x)


def tiny_gpt_init_cache(
    cfg: TinyGPTConfig, batch: int, dtype=jnp.float32
) -> dict:
    """KV cache pytree: per-layer (B, max_len, H, Dh) k/v plus a position.

    BLHD (time-major) layout: the decode step's new k/v arrive as
    (B, 1, H, Dh) straight off the fused-QKV reshape, so the per-step
    cache write and the attention reads need NO head transposes — the
    same copy-free layout the full forwards use (ops.attention
    layout='blhd'; see models/transformer.py).

    ``dtype=jnp.bfloat16`` halves the dominant HBM term of large-batch
    decoding (the full cache is re-read every position by attention); used
    by the draft path of sample.guided.guided_generate_verified, whose f32
    verification pass restores exact greedy semantics.
    """
    dh = cfg.dim // cfg.n_heads
    shape = (cfg.depth, batch, cfg.max_len, cfg.n_heads, dh)
    return {
        "k": jnp.zeros(shape, dtype=dtype),
        "v": jnp.zeros(shape, dtype=dtype),
        "pos": jnp.zeros((), dtype=jnp.int32),
    }


def tiny_gpt_decode_step(
    params: dict,
    cache: dict,
    token: jax.Array,
    cfg: TinyGPTConfig,
    attn_len: int | None = None,
) -> tuple[jax.Array, dict]:
    """One KV-cached decode step. token: (B,) int -> (logits (B, V), cache).

    Static shapes throughout (cache is max_len long, masked by position), so
    this is scannable: the whole guided decode loop compiles to one XLA
    while/scan program instead of Python-driven per-token dispatches.

    ``attn_len`` (static, ``None`` = max_len) restricts attention to the
    first ``attn_len`` cache slots — callers that know ``pos < attn_len``
    (sample.guided.guided_generate_scan's segmented loop) use a growing
    window so early positions stop re-reading the whole max_len cache, the
    dominant HBM term of large-batch decoding (~2x traffic at L=64).
    Exactness: slots >= attn_len are zero-filled and masked out by
    ``valid`` anyway; excluding exact zeros from a masked softmax does not
    change it.
    """
    b = token.shape[0]
    pos = cache["pos"]
    t_len = cfg.max_len if attn_len is None else attn_len
    dh = cfg.dim // cfg.n_heads
    x = jnp.take(params["tok_emb"], token, axis=0)[:, None, :]  # (B, 1, D)
    x = x + jax.lax.dynamic_slice_in_dim(params["pos_emb"], pos, 1, axis=0)

    # The cache stays ONE (depth, B, T, H, Dh) array updated in place with
    # a single-slot dynamic_update_slice per layer. The previous
    # jnp.stack(per-layer updated copies) rebuilt the full cache every
    # step — at bs=256 that is ~136 MB of pure write traffic per token on
    # top of attention's unavoidable read, which is what capped the
    # scan decoder at 676k tok/s in BENCH_r03. In-place DUS on a scan
    # carry aliases the buffer, so writes shrink to the new slot.
    # Time-major (BLHD) layout: the new k/v land as (B, 1, H, Dh) straight
    # off the qkv reshape, and attention runs layout='blhd' — no per-step
    # head transposes on either the write or the read path (VERDICT r4
    # item 9 / ROADMAP r5 #6).
    k_all, v_all = cache["k"], cache["v"]
    # valid[j] = (j <= pos): attend to filled cache slots plus ourselves.
    valid = (jnp.arange(t_len) <= pos)[None, None, None, :]  # (1,1,1,t_len)

    for i, blk in enumerate(params["blocks"]):
        h = layernorm_apply(blk["ln1"], x)
        qkv = linear_apply(blk["attn"]["qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, 1, cfg.n_heads, dh)  # (B, 1, H, Dh) — no transpose
        k = k.reshape(b, 1, cfg.n_heads, dh)
        v = v.reshape(b, 1, cfg.n_heads, dh)

        k_all = jax.lax.dynamic_update_slice(
            k_all, k[None].astype(k_all.dtype), (i, 0, pos, 0, 0)
        )
        v_all = jax.lax.dynamic_update_slice(
            v_all, v[None].astype(v_all.dtype), (i, 0, pos, 0, 0)
        )
        attn = ops.attention(
            q, k_all[i, :, :t_len], v_all[i, :, :t_len], mask=valid,
            layout="blhd",
        )  # (B, 1, H, Dh)
        x = x + linear_apply(
            blk["attn"]["proj"], attn.reshape(b, 1, cfg.dim)
        )
        h = layernorm_apply(blk["ln2"], x)
        x = x + linear_apply(
            blk["mlp"]["proj"], jax.nn.gelu(linear_apply(blk["mlp"]["fc"], h))
        )

    x = layernorm_apply(params["ln_f"], x)
    logits = linear_apply(params["lm_head"], x)[:, 0, :]  # (B, V)
    new_cache = {"k": k_all, "v": v_all, "pos": pos + 1}
    return logits, new_cache
