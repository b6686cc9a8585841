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


def zscore_table(w: jax.Array) -> jax.Array:
    """Whiten the (vocab, dim) table per coordinate: zero mean, unit std
    across the vocab axis.

    Why this and not row normalization: pinning rows to the noise sphere
    (rms) removes the radial collapse but a 100-epoch dim-512 run then
    collapsed ANGULARLY instead — mean pairwise cosine 0.96, per-coordinate
    between-token std 0.14 vs the unit noise, so the x0-MSE still saturates
    by predicting the common direction. Z-scoring across the vocab makes
    the between-token signal variance exactly 1 per coordinate — equal to
    q_sample's noise variance — by construction; neither the radial nor the
    common-direction cheat survives, and the beta schedule's SNR applies as
    designed. (Latents normalized to zero-mean/unit-variance is also how
    latent text diffusion a la Lovelace et al. conditions its space.)
    Gradients flow through the statistics, batch-norm style; vocab-sized
    reductions are trivial on TPU."""
    mu = jnp.mean(w, axis=0, keepdims=True)
    sd = jnp.std(w, axis=0, keepdims=True) + 1e-6
    return (w - mu) / sd


def _apply_norm(x: jax.Array, norm: str) -> jax.Array:
    """Normalize a (vocab, dim) TABLE (zscore uses vocab-axis statistics,
    so callers must normalize the table before row lookup)."""
    if norm == "none":
        return x
    if norm == "rms":
        return rms_normalize_rows(x)
    if norm == "zscore":
        return zscore_table(x)
    raise ValueError(f"unknown embed_norm: {norm!r}")


def embedding_apply(
    params: dict, token_ids: jax.Array, *, norm: str = "none"
) -> jax.Array:
    """(B, L) int -> (B, L, dim). ``norm``: 'rms' pins rows to the noise
    sphere; 'zscore' whitens the table across the vocab (the complete
    scale-collapse fix — see zscore_table)."""
    return jnp.take(_apply_norm(params["weight"], norm), token_ids, axis=0)


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
