"""Unit tests for the text sampling pipeline (decode paths, artifact
writing) on small shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from tinydiffusionmodels_tpu.core import make_schedule
from tinydiffusionmodels_tpu.data.tokenizer import CharTokenizer
from tinydiffusionmodels_tpu.models import (
    init_learned_rounding,
    init_tiny_transformer,
)
from tinydiffusionmodels_tpu.models.transformer import TransformerConfig
from tinydiffusionmodels_tpu.sample.text import (
    decode_embeddings,
    diffusion_position_logits,
    sample_diffusion_embeddings,
    sample_text,
)


class TestDecodeEmbeddings:
    def test_learned_rounding_argmax(self):
        rounding = init_learned_rounding(jax.random.PRNGKey(0), 8, 20)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 8))
        tokens = decode_embeddings(
            x, rounding_params=rounding, embed_matrix=None,
            use_learned_rounding=True,
        )
        assert tokens.shape == (2, 5)
        assert tokens.dtype in (jnp.int32, jnp.int64)
        assert int(tokens.max()) < 20

    def test_cosine_fallback(self):
        emb = jnp.eye(6)
        x = jnp.asarray([[[0, 0, 3.0, 0, 0, 0]]])  # nearest to row 2
        tokens = decode_embeddings(
            x, rounding_params=None, embed_matrix=emb,
            use_learned_rounding=False,
        )
        assert int(tokens[0, 0]) == 2


class TestSampleText:
    def test_end_to_end_writes_files(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        monkeypatch.delenv("AIP_MODEL_DIR", raising=False)
        sched = make_schedule(20)
        cfg = TransformerConfig(dim=16, n_heads=4, depth=1, ffn_dim=32,
                                timesteps=20)
        diff = init_tiny_transformer(jax.random.PRNGKey(0), cfg)
        tok = CharTokenizer("abcdefghij")
        rounding = init_learned_rounding(
            jax.random.PRNGKey(1), 16, tok.vocab_size
        )
        texts = sample_text(
            diff, cfg, sched, tok, jax.random.PRNGKey(2),
            rounding_params=rounding,
            n_samples=2, seq_len=6, embed_dim=16,
            use_learned_rounding=True,
            log_fn=lambda *a: None,
        )
        assert len(texts) == 2
        assert (tmp_path / "samples" / "sample_0.txt").exists()
        assert (tmp_path / "samples" / "sample_1.txt").exists()

    def test_clamped_sampling(self, tmp_path, monkeypatch):
        """Clamping keeps every intermediate x0 on the embedding manifold;
        output decodes to valid tokens."""
        monkeypatch.chdir(tmp_path)
        monkeypatch.delenv("AIP_MODEL_DIR", raising=False)
        from tinydiffusionmodels_tpu.models import init_learned_embedding
        from tinydiffusionmodels_tpu.models.embedding import embedding_matrix

        sched = make_schedule(20)
        cfg = TransformerConfig(dim=16, n_heads=4, depth=1, ffn_dim=32,
                                timesteps=20)
        diff = init_tiny_transformer(jax.random.PRNGKey(0), cfg)
        tok = CharTokenizer("abcdefghij")
        rounding = init_learned_rounding(jax.random.PRNGKey(1), 16,
                                         tok.vocab_size)
        emb = init_learned_embedding(jax.random.PRNGKey(2), tok.vocab_size, 16)
        texts = sample_text(
            diff, cfg, sched, tok, jax.random.PRNGKey(3),
            rounding_params=rounding,
            embed_matrix=embedding_matrix(emb),
            n_samples=2, seq_len=6, embed_dim=16,
            use_learned_rounding=True, clamp=True, save=False,
            log_fn=lambda *a: None,
        )
        assert len(texts) == 2

    def test_clamp_requires_embeddings(self):
        sched = make_schedule(10)
        cfg = TransformerConfig(dim=16, n_heads=4, depth=1, ffn_dim=32,
                                timesteps=10)
        diff = init_tiny_transformer(jax.random.PRNGKey(0), cfg)
        tok = CharTokenizer("ab")
        import pytest as _pytest

        with _pytest.raises(ValueError):
            sample_text(
                diff, cfg, sched, tok, jax.random.PRNGKey(1),
                n_samples=1, seq_len=4, embed_dim=16, clamp=True, save=False,
            )

    def test_embeddings_shape(self):
        sched = make_schedule(10)
        cfg = TransformerConfig(dim=16, n_heads=4, depth=1, ffn_dim=32,
                                timesteps=10)
        diff = init_tiny_transformer(jax.random.PRNGKey(0), cfg)
        z = sample_diffusion_embeddings(
            diff, cfg, sched, jax.random.PRNGKey(1),
            n=3, seq_len=4, embed_dim=16,
        )
        assert z.shape == (3, 4, 16)
        assert np.isfinite(np.asarray(z)).all()

    def test_temperature_semantics(self):
        """temperature=1.0 is bit-identical to the default (reference
        semantics untouched); 0.0 is the deterministic posterior-mean path;
        intermediate values change the draw (frontier knob, round 4)."""
        sched = make_schedule(10)
        cfg = TransformerConfig(dim=16, n_heads=4, depth=1, ffn_dim=32,
                                timesteps=10)
        diff = init_tiny_transformer(jax.random.PRNGKey(0), cfg)

        def draw(temp, key=1):
            return np.asarray(sample_diffusion_embeddings(
                diff, cfg, sched, jax.random.PRNGKey(key),
                n=2, seq_len=4, embed_dim=16, temperature=temp,
            ))

        default = np.asarray(sample_diffusion_embeddings(
            diff, cfg, sched, jax.random.PRNGKey(1),
            n=2, seq_len=4, embed_dim=16,
        ))
        np.testing.assert_array_equal(draw(1.0), default)
        assert not np.allclose(draw(0.5), default)
        assert not np.allclose(draw(0.0), draw(1.0))
        assert np.isfinite(draw(0.0)).all()

    def test_temperature_rejected_with_deterministic_solvers(self):
        """temperature != 1 with ddim/dpm++ raises instead of silently
        no-opping (VERDICT r4 item 8: ladder_r4 line 35 was bit-identical
        to its temperature=1 twin under dpm++)."""
        import pytest as _pytest

        sched = make_schedule(10)
        cfg = TransformerConfig(dim=16, n_heads=4, depth=1, ffn_dim=32,
                                timesteps=10)
        diff = init_tiny_transformer(jax.random.PRNGKey(0), cfg)

        for method in ("dpm++", "ddim"):
            with _pytest.raises(ValueError, match="no effect"):
                sample_diffusion_embeddings(
                    diff, cfg, sched, jax.random.PRNGKey(1),
                    n=1, seq_len=4, embed_dim=16,
                    method=method, num_steps=4, temperature=1.1,
                )
            # temperature=1.0 (the default) stays accepted.
            z = sample_diffusion_embeddings(
                diff, cfg, sched, jax.random.PRNGKey(1),
                n=1, seq_len=4, embed_dim=16,
                method=method, num_steps=4, temperature=1.0,
            )
            assert np.isfinite(np.asarray(z)).all()

    def test_position_logits_paths_agree_on_shape(self):
        rounding = init_learned_rounding(jax.random.PRNGKey(0), 8, 12)
        emb = jax.random.normal(jax.random.PRNGKey(1), (12, 8))
        z = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8))
        a = diffusion_position_logits(
            z, rounding_params=rounding, embed_matrix=None,
            use_learned_rounding=True,
        )
        b = diffusion_position_logits(
            z, rounding_params=None, embed_matrix=emb,
            use_learned_rounding=False,
        )
        assert a.shape == b.shape == (2, 4, 12)
