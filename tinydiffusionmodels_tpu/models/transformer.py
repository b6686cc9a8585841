"""TinyTransformer: the epsilon-prediction denoiser for text diffusion.

Functional rebuild of reference src/shakespeare.py:105-120: a torch
nn.TransformerEncoder(d_model=dim, nhead=4, num_layers=3, dropout=p,
batch_first=True) with torch defaults — post-LayerNorm, ReLU feed-forward of
width 2048, attention-weight dropout — plus the reference's additions:
time conditioning as Linear(1, dim) of t/T added as a per-sequence bias, and
input dropout. Bidirectional (no causal mask), no positional encoding, as in
the reference.

Parameter layout is JAX-native ((in, out) linears, fused (d, 3d) qkv); the
.pth bridge maps to torch's ``encoder.layers.N.self_attn.in_proj_weight``
names/layouts at the boundary (io/checkpoint.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tinydiffusionmodels_tpu import ops
from tinydiffusionmodels_tpu.core.rng import substream
from tinydiffusionmodels_tpu.models.torch_init import (
    dropout,
    layernorm_apply,
    layernorm_params,
    linear_apply,
    linear_params,
    xavier_uniform,
)

# torch nn.TransformerEncoderLayer default feed-forward width.
FFN_DIM = 2048


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    dim: int
    n_heads: int = 4          # reference src/shakespeare.py:106
    depth: int = 3
    dropout: float = 0.1
    ffn_dim: int = FFN_DIM
    timesteps: int = 1000
    # Sequence-parallel: route attention through the ring over this mesh
    # axis (ops.register_sequence_mesh must have registered it). None =
    # single-chip attention (flash/XLA via the ops registry).
    seq_axis: str | None = None
    # Learned absolute positional embedding (framework extension): the
    # reference denoiser has NO positional signal (src/shakespeare.py:
    # 105-120, nn.TransformerEncoder without posenc), making it
    # permutation-equivariant — measured round 3: an honestly-trained
    # (non-collapsed) no-posenc model generates correct character
    # FREQUENCIES but no ordering. Diffusion-LM proper uses positional
    # embeddings; this adds the standard learned table.
    # 'none' (reference), 'abs' (learned absolute table), or 'rope'
    # (rotary relative positions on q/k — no parameters; language structure
    # is translation-invariant, so relative encoding is the better prior;
    # measured round 3: 'abs' at 0.02-init changed honest-regime quality
    # by <2%). bool True is accepted as 'abs' for compatibility.
    pos_emb: str | bool = "none"
    max_len: int = 512

    @property
    def pos_kind(self) -> str:
        if self.pos_emb is True:
            return "abs"
        if self.pos_emb in (False, None):
            return "none"
        return self.pos_emb
    # Self-conditioning (Analog Bits, Chen et al. 2022 — PAPERS.md): feed
    # the previous x0 estimate back as an extra input through a zero-init
    # projection. Framework extension beyond the reference denoiser
    # (src/shakespeare.py:105-120); the biggest known quality lever for
    # embedding-space text diffusion after x0 parameterization.
    self_cond: bool = False


def _init_layer(key: jax.Array, cfg: TransformerConfig) -> dict:
    d = cfg.dim
    k = jax.random.split(key, 6)
    return {
        "self_attn": {
            # torch MHA: xavier_uniform in_proj, zero biases, Linear-default
            # out_proj weight (see models/torch_init.py docstring).
            "in_proj": {
                "w": xavier_uniform(k[0], (d, 3 * d), fan_in=d, fan_out=3 * d),
                "b": jnp.zeros((3 * d,)),
            },
            "out_proj": {
                "w": linear_params(k[1], d, d)["w"],
                "b": jnp.zeros((d,)),
            },
        },
        "linear1": linear_params(k[2], d, cfg.ffn_dim),
        "linear2": linear_params(k[3], cfg.ffn_dim, d),
        "norm1": layernorm_params(d),
        "norm2": layernorm_params(d),
    }


def init_tiny_transformer(key: jax.Array, cfg: TransformerConfig) -> dict:
    keys = jax.random.split(key, cfg.depth + 1)
    params = {
        "time_emb": linear_params(keys[0], 1, cfg.dim),
        "layers": tuple(_init_layer(k, cfg) for k in keys[1:]),
    }
    if cfg.pos_kind == "abs":
        # torch-style N(0, 0.02) init, one row per absolute position.
        params["pos_emb"] = 0.02 * jax.random.normal(
            jax.random.fold_in(keys[0], 1), (cfg.max_len, cfg.dim)
        )
    if cfg.self_cond:
        # Zero-init: with no previous estimate (or at the start of
        # training) the self-conditioned model computes exactly the same
        # function as the unconditioned one, so enabling the flag never
        # regresses the t=first-pass behavior.
        params["selfcond_proj"] = {
            "w": jnp.zeros((cfg.dim, cfg.dim)),
            "b": jnp.zeros((cfg.dim,)),
        }
    return params


def _rope(x: jax.Array, base: float = 10000.0, *, l_axis: int = 2) -> jax.Array:
    """Rotary position embedding with GLOBAL positions.

    Standard RoPE (Su et al.): rotate feature pairs by position-dependent
    angles so q.k becomes a function of relative offset. Parameter-free, so
    checkpoints record the mode as a dict key (not a weight); applied
    before ops.attention so every backend (XLA, flash, ring) sees rotated
    q/k. Under GSPMD the array is global, so positions are correct even
    with sequence sharding.

    ``l_axis`` selects the sequence axis: 2 for (B, H, L, Dh) tensors,
    1 for the copy-free (B, L, H, Dh) layout.
    """
    dh = x.shape[-1]
    half = dh // 2
    freqs = base ** (-jnp.arange(half, dtype=jnp.float32) / half)
    pos = jnp.arange(x.shape[l_axis], dtype=jnp.float32)
    ang = pos[:, None] * freqs[None, :]                      # (L, half)
    cos = jnp.cos(ang).astype(x.dtype)
    sin = jnp.sin(ang).astype(x.dtype)
    if l_axis == 1:
        cos, sin = cos[:, None, :], sin[:, None, :]          # (L, 1, half)
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
    )


def _mha(
    p: dict,
    x: jax.Array,
    cfg: TransformerConfig,
    *,
    deterministic: bool,
    key: jax.Array | None,
) -> jax.Array:
    """Self-attention matching torch nn.MultiheadAttention semantics.

    Single-chip attention runs in the copy-free (B, L, H, Dh) layout: the
    head split/merge around the fused-QKV projection are pure reshapes, and
    the head axis rides through the attention einsums as a batch dim. The
    old (B, H, L, Dh) transposes materialized as HBM copies around the
    kernels — 82 ms of the 372 ms bs=512 bf16 text train scan
    (docs/docs/assets/r5/xprof_text_train_fast.txt). Ring attention
    shards the L axis and
    keeps the BHLD layout (transposes are noise next to ICI hops there).
    """
    b, l, d = x.shape
    dh = d // cfg.n_heads
    qkv = linear_apply(p["in_proj"], x)  # (B, L, 3D)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    blhd = cfg.seq_axis is None

    def heads(a):  # (B, L, D) -> (B, L, H, Dh) or (B, H, L, Dh)
        a = a.reshape(b, l, cfg.n_heads, dh)
        return a if blhd else a.transpose(0, 2, 1, 3)

    qh, kh = heads(q), heads(k)
    if cfg.pos_kind == "rope":
        l_axis = 1 if blhd else 2
        qh, kh = _rope(qh, l_axis=l_axis), _rope(kh, l_axis=l_axis)
    out = ops.attention(
        qh,
        kh,
        heads(v),
        dropout_rate=0.0 if deterministic else cfg.dropout,
        dropout_key=None if deterministic else substream(key, "attn_weights"),
        seq_axis=cfg.seq_axis,
        layout="blhd" if blhd else "bhld",
    )
    if not blhd:
        out = out.transpose(0, 2, 1, 3)
    out = out.reshape(b, l, d)
    return linear_apply(p["out_proj"], out)


def _encoder_layer(
    p: dict,
    x: jax.Array,
    cfg: TransformerConfig,
    *,
    deterministic: bool,
    key: jax.Array | None,
) -> jax.Array:
    """Post-LN torch TransformerEncoderLayer (norm_first=False, relu)."""
    sa = _mha(p["self_attn"], x, cfg, deterministic=deterministic, key=key)
    sa = dropout(
        None if deterministic else substream(key, "dropout1"),
        sa, cfg.dropout, deterministic=deterministic,
    )
    x = layernorm_apply(p["norm1"], x + sa)

    ff = jax.nn.relu(linear_apply(p["linear1"], x))
    ff = dropout(
        None if deterministic else substream(key, "dropout_ffn"),
        ff, cfg.dropout, deterministic=deterministic,
    )
    ff = linear_apply(p["linear2"], ff)
    ff = dropout(
        None if deterministic else substream(key, "dropout2"),
        ff, cfg.dropout, deterministic=deterministic,
    )
    return layernorm_apply(p["norm2"], x + ff)


def tiny_transformer_apply(
    params: dict,
    x: jax.Array,
    t: jax.Array,
    cfg: TransformerConfig,
    *,
    deterministic: bool = True,
    key: jax.Array | None = None,
    x0_prev: jax.Array | None = None,
) -> jax.Array:
    """x: (B, L, dim) noisy embeddings; t: (B,) int timesteps -> eps_hat.

    Mirrors reference src/shakespeare.py:115-120: additive time bias, input
    dropout, then the encoder stack.

    ``x0_prev``: previous clean-embedding estimate for self-conditioning
    (cfg.self_cond=True); None means "no estimate" (the zeros channel).
    """
    if not deterministic and key is None:
        raise ValueError("training mode requires a PRNG key")
    t_scaled = (t.astype(x.dtype) / cfg.timesteps)[:, None]      # (B, 1)
    time_bias = linear_apply(params["time_emb"], t_scaled)[:, None, :]
    x = x + time_bias
    if "pos_emb" in params:
        # Keyed on params (not cfg) so checkpoints self-configure at load.
        # Shapes are static under jit, so this raises at trace time with a
        # clear message instead of an opaque broadcast error.
        if x.shape[1] > params["pos_emb"].shape[0]:
            raise ValueError(
                f"seq_len {x.shape[1]} exceeds the absolute-position table "
                f"trained for max_len={params['pos_emb'].shape[0]}; sample "
                "with a shorter --seq_len, or train with --pos_emb rope "
                "for length extrapolation"
            )
        x = x + params["pos_emb"][: x.shape[1]][None].astype(x.dtype)
    if cfg.self_cond:
        if x0_prev is not None:
            x = x + linear_apply(
                params["selfcond_proj"], x0_prev.astype(x.dtype)
            )
    elif x0_prev is not None:
        raise ValueError("x0_prev passed but cfg.self_cond is False")
    x = dropout(
        None if deterministic else substream(key, "input_dropout"),
        x, cfg.dropout, deterministic=deterministic,
    )
    for i, layer in enumerate(params["layers"]):
        layer_key = None if deterministic else jax.random.fold_in(key, i)
        x = _encoder_layer(
            layer, x, cfg, deterministic=deterministic, key=layer_key
        )
    return x
