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


def embedding_apply(params: dict, token_ids: jax.Array) -> jax.Array:
    """(B, L) int -> (B, L, dim)."""
    return jnp.take(params["weight"], token_ids, axis=0)


def embedding_matrix(params: dict) -> jax.Array:
    """(vocab, dim) table for cosine-similarity decoding."""
    return params["weight"]


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
