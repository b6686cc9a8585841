"""Minimal JAX Gemma (v1) causal LM for guided sampling.

The reference's guided sampler uses HF ``google/gemma-2b-it`` as its base LM
(reference src/shakespeare.py:482,509). Running a 2B torch model on host CPU
inside a TPU program would bottleneck the whole pipeline, so this module
implements the Gemma architecture natively in JAX — enough to load the HF
checkpoint's weights and serve ar_logits on the TPU, with a KV-cached
single-token decode step that drops into the same ``lax.scan`` guided
decoder as TinyGPT (sample/guided.py).

Architecture (matching HF ``transformers.GemmaForCausalLM``):
- embeddings scaled by sqrt(hidden_size); lm_head tied to the embedding,
- RMSNorm with the Gemma ``(1 + weight)`` formulation, eps computed in f32,
- rotary position embeddings (rotate-half convention, theta=10000),
- grouped-query attention (n_kv_heads <= n_heads), scale 1/sqrt(head_dim),
- gated MLP: down(gelu_tanh(gate(x)) * up(x)).

Weight layouts convert from torch (out, in) to JAX (in, out) at load time.
Verified against a randomly-initialized torch GemmaForCausalLM in
tests/test_gemma.py (logits parity + cached-decode parity).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class GemmaConfig:
    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    intermediate_size: int
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6
    max_len: int = 512

    @classmethod
    def from_hf(cls, hf_config, max_len: int = 512) -> "GemmaConfig":
        return cls(
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            head_dim=hf_config.head_dim,
            intermediate_size=hf_config.intermediate_size,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rms_eps=getattr(hf_config, "rms_norm_eps", 1e-6),
            max_len=max_len,
        )


def gemma_from_hf_state_dict(sd: dict, cfg: GemmaConfig) -> dict:
    """HF torch state_dict (numpy leaves ok) -> JAX params pytree."""

    def t(name):  # torch (out, in) -> (in, out)
        return jnp.asarray(np.asarray(sd[name]), jnp.float32).T

    def w(name):
        return jnp.asarray(np.asarray(sd[name]), jnp.float32)

    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        layers.append(
            {
                "input_norm": w(f"{p}.input_layernorm.weight"),
                "q_proj": t(f"{p}.self_attn.q_proj.weight"),
                "k_proj": t(f"{p}.self_attn.k_proj.weight"),
                "v_proj": t(f"{p}.self_attn.v_proj.weight"),
                "o_proj": t(f"{p}.self_attn.o_proj.weight"),
                "post_attn_norm": w(f"{p}.post_attention_layernorm.weight"),
                "gate_proj": t(f"{p}.mlp.gate_proj.weight"),
                "up_proj": t(f"{p}.mlp.up_proj.weight"),
                "down_proj": t(f"{p}.mlp.down_proj.weight"),
            }
        )
    return {
        "embed": w("model.embed_tokens.weight"),  # (V, H); lm_head is tied
        "layers": tuple(layers),
        "final_norm": w("model.norm.weight"),
    }


def _rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """Gemma RMSNorm: f32 compute, (1 + weight) scaling."""
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (normed * (1.0 + weight.astype(jnp.float32))).astype(x.dtype)


def _rope(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """Rotary embedding, rotate-half convention. x: (B, H, L, Dh);
    positions: (L,) or (B, L)."""
    dh = x.shape[-1]
    half = dh // 2
    inv_freq = theta ** (-jnp.arange(0, half, dtype=jnp.float32) * 2.0 / dh)
    if positions.ndim == 1:
        angles = positions[:, None].astype(jnp.float32) * inv_freq  # (L, half)
        angles = angles[None, None]  # (1, 1, L, half)
    else:
        angles = positions[..., None].astype(jnp.float32) * inv_freq
        angles = angles[:, None]  # (B, 1, L, half)
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


def _attention(q, k, v, mask):
    """q: (B, H, Lq, Dh); k/v: (B, KVH, Lk, Dh) with GQA head repetition."""
    b, h, lq, dh = q.shape
    kvh = k.shape[1]
    if kvh != h:
        rep = h // kvh
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def _split(x, n, dh):  # (B, L, n*dh) -> (B, n, L, dh)
    b, l, _ = x.shape
    return x.reshape(b, l, n, dh).transpose(0, 2, 1, 3)


def _merge(x):  # (B, n, L, dh) -> (B, L, n*dh)
    b, n, l, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, n * dh)


def _layer(p, cfg, x, positions, mask, kv=None, cache_pos=None):
    """One Gemma block. If ``kv`` (k_cache, v_cache) is given, this is a
    cached decode step: new k/v are written at ``cache_pos`` and attention
    runs over the cache. Returns (x, (k, v))."""
    h = _rms_norm(x, p["input_norm"], cfg.rms_eps)
    q = _split(h @ p["q_proj"], cfg.num_heads, cfg.head_dim)
    k = _split(h @ p["k_proj"], cfg.num_kv_heads, cfg.head_dim)
    v = _split(h @ p["v_proj"], cfg.num_kv_heads, cfg.head_dim)
    q = _rope(q, positions, cfg.rope_theta)
    k = _rope(k, positions, cfg.rope_theta)

    if kv is not None:
        k_cache, v_cache = kv
        k_cache = jax.lax.dynamic_update_slice(k_cache, k, (0, 0, cache_pos, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v, (0, 0, cache_pos, 0))
        k, v = k_cache, v_cache

    attn = _attention(q, k, v, mask)
    x = x + _merge(attn) @ p["o_proj"]

    h = _rms_norm(x, p["post_attn_norm"], cfg.rms_eps)
    gated = jax.nn.gelu(h @ p["gate_proj"], approximate=True) * (h @ p["up_proj"])
    x = x + gated @ p["down_proj"]
    return x, (k, v)


def gemma_apply(params: dict, ids: jax.Array, cfg: GemmaConfig) -> jax.Array:
    """Full causal forward. ids: (B, L) -> logits (B, L, V)."""
    b, l = ids.shape
    x = jnp.take(params["embed"], ids, axis=0) * jnp.sqrt(
        jnp.asarray(cfg.hidden_size, jnp.float32)
    )
    positions = jnp.arange(l)
    mask = jnp.tril(jnp.ones((l, l), bool))[None, None]
    for p in params["layers"]:
        x, _ = _layer(p, cfg, x, positions, mask)
    x = _rms_norm(x, params["final_norm"], cfg.rms_eps)
    return x @ params["embed"].T  # tied lm_head


def gemma_init_cache(cfg: GemmaConfig, batch: int) -> dict:
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, cfg.max_len, cfg.head_dim)
    return {
        "k": jnp.zeros(shape, jnp.float32),
        "v": jnp.zeros(shape, jnp.float32),
        "pos": jnp.zeros((), jnp.int32),
    }


def gemma_decode_step(
    params: dict, cache: dict, token: jax.Array, cfg: GemmaConfig
) -> tuple[jax.Array, dict]:
    """KV-cached single-token decode: token (B,) -> (logits (B, V), cache).

    Scannable (static cache length, position-masked), same contract as
    models.ar_lm.tiny_gpt_decode_step.
    """
    b = token.shape[0]
    pos = cache["pos"]
    x = jnp.take(params["embed"], token, axis=0)[:, None, :] * jnp.sqrt(
        jnp.asarray(cfg.hidden_size, jnp.float32)
    )
    positions = jnp.full((1,), pos, dtype=jnp.int32)
    valid = (jnp.arange(cfg.max_len) <= pos)[None, None, None, :]

    new_k, new_v = [], []
    for i, p in enumerate(params["layers"]):
        x, (k, v) = _layer(
            p, cfg, x, positions, valid,
            kv=(cache["k"][i], cache["v"][i]), cache_pos=pos,
        )
        new_k.append(k)
        new_v.append(v)
    x = _rms_norm(x, params["final_norm"], cfg.rms_eps)
    logits = (x @ params["embed"].T)[:, 0, :]
    return logits, {"k": jnp.stack(new_k), "v": jnp.stack(new_v),
                    "pos": pos + 1}


def load_gemma_from_hf(model_id: str, *, max_len: int = 512,
                       local_files_only: bool = True):
    """Load an HF Gemma checkpoint into JAX params.

    Returns (params, cfg). Raises if the model isn't available locally (or
    at all); callers fall back to TinyGPT.
    """
    from transformers import AutoConfig, AutoModelForCausalLM

    hf_cfg = AutoConfig.from_pretrained(model_id,
                                        local_files_only=local_files_only)
    if hf_cfg.model_type not in ("gemma",):
        raise ValueError(f"not a Gemma-v1 checkpoint: {hf_cfg.model_type}")
    model = AutoModelForCausalLM.from_pretrained(
        model_id, local_files_only=local_files_only
    )
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    cfg = GemmaConfig.from_hf(hf_cfg, max_len=max_len)
    return gemma_from_hf_state_dict(sd, cfg), cfg
