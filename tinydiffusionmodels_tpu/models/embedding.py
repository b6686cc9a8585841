"""LearnedEmbedding + LearnedRounding for embedding-space text diffusion.

Rebuild of reference src/shakespeare.py:46-102:
- LearnedEmbedding: trainable (vocab, dim) table, N(0, 0.02) init, optionally
  initialized from a pretrained LM embedding matrix — projected through a
  *random untrained* linear map when dims differ, faithfully reproducing the
  reference's quirk (src/shakespeare.py:58-63).
- LearnedRounding: one Linear(dim, vocab) decoding embeddings to token logits
  (the Diffusion-LM "learned rounding" head).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tinydiffusionmodels_tpu.models.torch_init import linear_params


def init_learned_embedding(
    key: jax.Array,
    vocab_size: int,
    embed_dim: int,
    pretrained: jax.Array | np.ndarray | None = None,
) -> dict:
    """Params: {'weight': (vocab, dim)}."""
    if pretrained is not None:
        pretrained = jnp.asarray(pretrained, dtype=jnp.float32)
        if pretrained.shape[0] != vocab_size:
            raise ValueError(
                f"pretrained vocab {pretrained.shape[0]} != {vocab_size}"
            )
        if pretrained.shape[1] != embed_dim:
            # Reference quirk: project through a freshly-initialized,
            # untrained Linear(pre_dim, embed_dim, bias=False)
            # (src/shakespeare.py:58-63).
            proj = linear_params(
                key, pretrained.shape[1], embed_dim, bias=False
            )["w"]
            weight = pretrained @ proj
        else:
            weight = pretrained
        return {"weight": weight}
    weight = 0.02 * jax.random.normal(key, (vocab_size, embed_dim))
    return {"weight": weight}


def rms_normalize_rows(w: jax.Array) -> jax.Array:
    """Scale each row to L2 = sqrt(dim), i.e. per-coordinate RMS 1.

    Why: with the reference's N(0, 0.02) init (src/shakespeare.py:51) and a
    joint MSE objective, learned embeddings never grow toward the unit
    Gaussian noise scale of q_sample — measured after a 100-epoch dim-512
    run, rows sit at L2 ~ 0.7 vs the ~ 22.6 of unit-RMS, so the per-
    coordinate signal is ~ 30x smaller than the noise at EVERY diffusion
    step and the x0-MSE saturates near zero while samples stay noise-bound
    (the Diffusion-LM "embedding scale collapse"; cf. Difformer). Pinning
    rows to the noise sphere makes the beta schedule's SNR range meaningful.
    Gradients flow through the normalization (tangential component)."""
    d = w.shape[-1]
    scale = jnp.sqrt(jnp.float32(d)) / (
        jnp.linalg.norm(w, axis=-1, keepdims=True) + 1e-12
    )
    return w * scale


def _apply_norm(x: jax.Array, norm: str) -> jax.Array:
    if norm == "none":
        return x
    if norm == "rms":
        return rms_normalize_rows(x)
    raise ValueError(f"unknown embed_norm: {norm!r}")


def embedding_apply(
    params: dict, token_ids: jax.Array, *, norm: str = "none"
) -> jax.Array:
    """(B, L) int -> (B, L, dim). ``norm='rms'``: rows pinned to the noise
    sphere (rms_normalize_rows)."""
    return _apply_norm(jnp.take(params["weight"], token_ids, axis=0), norm)


def embedding_matrix(params: dict, *, norm: str = "none") -> jax.Array:
    """(vocab, dim) table for cosine-similarity/clamp decoding; ``norm``
    must match how the checkpoint was trained (ckpt key 'embed_norm')."""
    return _apply_norm(params["weight"], norm)


def init_learned_rounding(key: jax.Array, embed_dim: int, vocab_size: int) -> dict:
    """Params: {'decoder': {'w': (dim, vocab), 'b': (vocab,)}}."""
    return {"decoder": linear_params(key, embed_dim, vocab_size)}


def rounding_apply(params: dict, embeddings: jax.Array) -> jax.Array:
    """(B, L, dim) or (B, dim) -> token logits over vocab."""
    p = params["decoder"]
    return embeddings @ p["w"] + p["b"]


def cosine_logits(embed_matrix: jax.Array, x: jax.Array) -> jax.Array:
    """Cosine-similarity decoding fallback (reference src/shakespeare.py:392-401).

    embed_matrix: (V, dim); x: (..., dim). Returns (..., V) similarities.
    """
    emb_n = embed_matrix / (
        jnp.linalg.norm(embed_matrix, axis=-1, keepdims=True) + 1e-12
    )
    x_n = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
    return x_n @ emb_n.T
