"""Learned positional embedding for the text denoiser (--pos_emb).

The reference TinyTransformer has no positional signal
(src/shakespeare.py:105-120): it is permutation-equivariant, so an
honestly-trained (non-collapsed) denoiser can model character FREQUENCIES
but not order — measured in round 3 (docs/.../2026-08-17-embedding-scale.md).
Diffusion-LM proper uses positional embeddings; this is that extension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tinydiffusionmodels_tpu.io.checkpoint import (
    transformer_from_state_dict,
    transformer_to_state_dict,
)
from tinydiffusionmodels_tpu.models.transformer import (
    TransformerConfig,
    init_tiny_transformer,
    tiny_transformer_apply,
)

CFG = TransformerConfig(dim=16, n_heads=2, depth=1, ffn_dim=32,
                        dropout=0.0, timesteps=10, pos_emb=True, max_len=32)


def test_without_pos_emb_model_is_permutation_equivariant():
    cfg = TransformerConfig(dim=16, n_heads=2, depth=1, ffn_dim=32,
                            dropout=0.0, timesteps=10)
    p = init_tiny_transformer(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 16))
    perm = jnp.asarray([3, 1, 5, 0, 4, 2])
    out = tiny_transformer_apply(p, x, jnp.asarray([2]), cfg)
    out_p = tiny_transformer_apply(p, x[:, perm], jnp.asarray([2]), cfg)
    # Permuting the input permutes the output identically — the reference
    # denoiser cannot represent absolute order.
    np.testing.assert_allclose(
        np.asarray(out[:, perm]), np.asarray(out_p), rtol=2e-5, atol=2e-5
    )


def test_pos_emb_breaks_permutation_equivariance():
    p = init_tiny_transformer(jax.random.PRNGKey(0), CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 16))
    perm = jnp.asarray([3, 1, 5, 0, 4, 2])
    out = tiny_transformer_apply(p, x, jnp.asarray([2]), CFG)
    out_p = tiny_transformer_apply(p, x[:, perm], jnp.asarray([2]), CFG)
    assert float(jnp.abs(out[:, perm] - out_p).max()) > 1e-3


def test_pos_emb_state_dict_roundtrip_and_autodetect():
    p = init_tiny_transformer(jax.random.PRNGKey(0), CFG)
    sd = transformer_to_state_dict(p)
    assert sd["pos_emb.weight"].shape == (32, 16)
    p2 = transformer_from_state_dict(sd)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 16))
    # Apply is keyed on params, so a loaded checkpoint self-configures even
    # with a cfg that doesn't set pos_emb.
    cfg_plain = TransformerConfig(dim=16, n_heads=2, depth=1, ffn_dim=32,
                                  dropout=0.0, timesteps=10)
    o1 = tiny_transformer_apply(p, x, jnp.asarray([1, 2]), CFG)
    o2 = tiny_transformer_apply(p2, x, jnp.asarray([1, 2]), cfg_plain)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-6)


def test_pos_emb_truncates_to_sequence_length():
    p = init_tiny_transformer(jax.random.PRNGKey(0), CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 16))
    out = tiny_transformer_apply(p, x, jnp.asarray([0]), CFG)
    assert out.shape == (1, 5, 16)


def test_pos_emb_over_length_raises_clear_error():
    # Sampling longer than the trained abs-posenc table must fail with an
    # actionable message, not an opaque in-jit broadcast error (ADVICE r3).
    import pytest

    p = init_tiny_transformer(jax.random.PRNGKey(0), CFG)
    max_len = p["pos_emb"].shape[0]
    x = jax.random.normal(jax.random.PRNGKey(1), (1, max_len + 3, 16))
    with pytest.raises(ValueError, match="absolute-position table"):
        tiny_transformer_apply(p, x, jnp.asarray([0]), CFG)


def test_rope_breaks_permutation_but_adds_no_params():
    cfg = TransformerConfig(dim=16, n_heads=2, depth=1, ffn_dim=32,
                            dropout=0.0, timesteps=10, pos_emb="rope")
    p = init_tiny_transformer(jax.random.PRNGKey(0), cfg)
    assert "pos_emb" not in p
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 16))
    perm = jnp.asarray([3, 1, 5, 0, 4, 2])
    out = tiny_transformer_apply(p, x, jnp.asarray([2]), cfg)
    out_p = tiny_transformer_apply(p, x[:, perm], jnp.asarray([2]), cfg)
    assert float(jnp.abs(out[:, perm] - out_p).max()) > 1e-3


def test_rope_attention_is_translation_covariant():
    """RoPE scores depend only on relative offset: shifting every position
    by a constant leaves q.k inner products unchanged."""
    from tinydiffusionmodels_tpu.models.transformer import _rope

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 12, 8))
    q = _rope(x)
    k = _rope(x)
    s0 = jnp.einsum("bhld,bhmd->bhlm", q, k)
    # Emulate a shift by rotating a longer sequence and slicing the tail.
    pad = jnp.concatenate(
        [jnp.zeros((1, 1, 5, 8), x.dtype), x], axis=2
    )
    qs = _rope(pad)[:, :, 5:]
    ks = _rope(pad)[:, :, 5:]
    s1 = jnp.einsum("bhld,bhmd->bhlm", qs, ks)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                               rtol=1e-4, atol=1e-4)


def test_bool_pos_emb_compat():
    assert TransformerConfig(dim=8, pos_emb=True).pos_kind == "abs"
    assert TransformerConfig(dim=8, pos_emb=False).pos_kind == "none"
