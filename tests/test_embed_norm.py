"""Embedding-scale normalization (--embed_norm rms).

Motivation (measured, round 3): with the reference's N(0, 0.02) embedding
init (src/shakespeare.py:51) and the joint MSE objective, a 100-epoch
dim-512 run leaves embedding rows at L2 ~ 0.7 while q_sample's unit
Gaussian noise has L2 ~ sqrt(512) ~ 22.6 — per-coordinate signal ~30x
smaller than the noise at every diffusion step, so the x0-MSE saturates
(~1e-4) by predicting near-zero and samples stay noise-bound. ``rms``
pins every row to the noise sphere so the beta schedule's SNR range is
meaningful (the Diffusion-LM "embedding scale collapse" fix).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tinydiffusionmodels_tpu.core import make_schedule
from tinydiffusionmodels_tpu.models.embedding import (
    embedding_apply,
    embedding_matrix,
    rms_normalize_rows,
)
from tinydiffusionmodels_tpu.models.transformer import TransformerConfig


def test_rms_rows_sit_on_noise_sphere():
    w = jax.random.normal(jax.random.PRNGKey(0), (11, 32)) * 0.02
    out = rms_normalize_rows(w)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.full(11, np.sqrt(32.0)), rtol=1e-5,
    )
    # Per-coordinate RMS 1 = the scale of q_sample's unit Gaussian noise.
    np.testing.assert_allclose(
        np.sqrt(np.mean(np.square(np.asarray(out)), axis=-1)),
        np.ones(11), rtol=1e-5,
    )


def test_rms_gradient_flows_tangentially():
    w = jax.random.normal(jax.random.PRNGKey(1), (5, 16))

    def loss(w):
        return jnp.sum(rms_normalize_rows(w)[:, 0])

    g = jax.grad(loss)(w)
    assert np.isfinite(np.asarray(g)).all()
    # Radial component is projected out: d/ds ||normalize(s*w)|| = 0.
    radial = np.sum(np.asarray(g) * np.asarray(w), axis=-1)
    np.testing.assert_allclose(radial, np.zeros(5), atol=1e-4)


def test_apply_and_matrix_agree():
    params = {"weight": jax.random.normal(jax.random.PRNGKey(2), (9, 24))}
    ids = jnp.asarray([[0, 3, 8]])
    via_apply = embedding_apply(params, ids, norm="rms")
    via_matrix = jnp.take(embedding_matrix(params, norm="rms"), ids, axis=0)
    np.testing.assert_allclose(
        np.asarray(via_apply), np.asarray(via_matrix), rtol=1e-6
    )


def test_loss_is_scale_invariant_under_rms():
    """Shrinking the raw table 100x must not change the normalized loss —
    the degenerate 'make MSE small by shrinking embeddings' direction is
    exactly what embed_norm removes."""
    from tinydiffusionmodels_tpu.models import (
        init_learned_embedding,
        init_learned_rounding,
        init_tiny_transformer,
    )
    from tinydiffusionmodels_tpu.train.text_train import _losses

    key = jax.random.PRNGKey(3)
    cfg = TransformerConfig(dim=16, n_heads=2, depth=1, ffn_dim=32,
                            dropout=0.0, timesteps=10)
    sched = make_schedule(timesteps=10)
    params = {
        "diffusion_model": init_tiny_transformer(key, cfg),
        "rounding_fn": init_learned_rounding(key, 16, 12),
        "embedding_fn": init_learned_embedding(key, 12, 16),
    }
    tokens = jnp.asarray([[1, 4, 7, 2]])
    t = jnp.asarray([3])
    noise = jax.random.normal(key, (1, 4, 16))

    def run(scale):
        p = dict(params)
        p["embedding_fn"] = {
            "weight": params["embedding_fn"]["weight"] * scale
        }
        total, (diff, round_) = _losses(
            p, tokens, t, noise, jnp.asarray(1.0), cfg=cfg, sched=sched,
            use_learned_embeddings=True, pretrained_matrix=None,
            deterministic=True, key=None, parameterization="x0",
            embed_norm="rms",
        )
        return float(diff)

    assert abs(run(1.0) - run(0.01)) < 1e-5


def test_checkpoint_records_and_roundtrips_embed_norm(tmp_path):
    """train() writes embed_norm into the reference-format checkpoint and
    the sampler-side loaders can rebuild the normalized decode matrix."""
    from tinydiffusionmodels_tpu.io import load_checkpoint
    from tinydiffusionmodels_tpu.io.checkpoint import (
        embedding_from_state_dict,
    )
    from tinydiffusionmodels_tpu.models import (
        init_learned_embedding,
        init_learned_rounding,
        init_tiny_transformer,
    )
    from tinydiffusionmodels_tpu.train.text_train import train

    key = jax.random.PRNGKey(0)
    cfg = TransformerConfig(dim=16, n_heads=2, depth=1, ffn_dim=32,
                            dropout=0.0, timesteps=10)
    sched = make_schedule(timesteps=10)
    params = {
        "diffusion_model": init_tiny_transformer(key, cfg),
        "rounding_fn": init_learned_rounding(key, 16, 12),
        "embedding_fn": init_learned_embedding(key, 12, 16),
    }
    chunks = np.arange(64, dtype=np.int32).reshape(16, 4) % 12
    ckpt_path = str(tmp_path / "t.pth")
    train(
        params, chunks, chunks[:8], cfg=cfg, sched=sched,
        ckpt_path=ckpt_path, epochs=1, batch_size=8,
        use_learned_embeddings=True, parameterization="x0",
        embed_norm="rms", use_lr_scheduling=False, log_fn=lambda *a: None,
    )
    ckpt = load_checkpoint(ckpt_path)
    assert ckpt["embed_norm"] == "rms"
    emb = embedding_from_state_dict(ckpt["embedding_fn"])
    mat = embedding_matrix(emb, norm=ckpt["embed_norm"])
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(mat), axis=-1),
        np.full(12, 4.0), rtol=1e-4,
    )


def test_zscore_whitens_across_vocab():
    w = jax.random.normal(jax.random.PRNGKey(4), (54, 64)) * 0.02 + 0.5
    from tinydiffusionmodels_tpu.models.embedding import zscore_table

    out = np.asarray(zscore_table(w))
    np.testing.assert_allclose(out.mean(axis=0), np.zeros(64), atol=1e-5)
    np.testing.assert_allclose(out.std(axis=0), np.ones(64), atol=1e-3)


def test_zscore_kills_common_direction_cheat():
    """A table collapsed to a narrow cone (the measured rms failure mode)
    still whitens to unit between-token variance per coordinate."""
    from tinydiffusionmodels_tpu.models.embedding import zscore_table

    base = jax.random.normal(jax.random.PRNGKey(5), (1, 32))
    jitter = 0.01 * jax.random.normal(jax.random.PRNGKey(6), (54, 32))
    w = base + jitter  # pairwise cosine ~1
    out = np.asarray(zscore_table(w))
    np.testing.assert_allclose(out.std(axis=0), np.ones(32), atol=1e-3)


def test_freeze_embeddings_stops_table_gradient():
    from tinydiffusionmodels_tpu.models import (
        init_learned_embedding,
        init_learned_rounding,
        init_tiny_transformer,
    )
    from tinydiffusionmodels_tpu.train.text_train import _losses

    key = jax.random.PRNGKey(7)
    cfg = TransformerConfig(dim=16, n_heads=2, depth=1, ffn_dim=32,
                            dropout=0.0, timesteps=10)
    sched = make_schedule(timesteps=10)
    params = {
        "diffusion_model": init_tiny_transformer(key, cfg),
        "rounding_fn": init_learned_rounding(key, 16, 12),
        "embedding_fn": init_learned_embedding(key, 12, 16),
    }
    tokens = jnp.asarray([[1, 4, 7, 2]])
    t = jnp.asarray([3])
    noise = jax.random.normal(key, (1, 4, 16))

    def total(p, freeze):
        loss, _ = _losses(
            p, tokens, t, noise, jnp.asarray(1.0), cfg=cfg, sched=sched,
            use_learned_embeddings=True, pretrained_matrix=None,
            deterministic=True, key=None, parameterization="x0",
            embed_norm="zscore", freeze_embeddings=freeze,
        )
        return loss

    g_frozen = jax.grad(lambda p: total(p, True))(params)
    g_live = jax.grad(lambda p: total(p, False))(params)
    assert float(jnp.abs(g_frozen["embedding_fn"]["weight"]).max()) == 0.0
    assert float(jnp.abs(g_live["embedding_fn"]["weight"]).max()) > 0.0
    # Denoiser still trains in both regimes.
    leaves = jax.tree_util.tree_leaves(g_frozen["diffusion_model"])
    assert max(float(jnp.abs(leaf).max()) for leaf in leaves) > 0.0
