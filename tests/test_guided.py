"""Guided AR+diffusion sampler tests: the scanned KV-cached decode must be
behavior-identical to the reference's Python loop of full LM forwards
(greedy decoding makes this exact — reference src/shakespeare.py:429-470)."""

import jax
import jax.numpy as jnp
import numpy as np

from tinydiffusionmodels_tpu.models import (
    init_tiny_gpt,
    tiny_gpt_apply,
    tiny_gpt_decode_step,
    tiny_gpt_init_cache,
)
from tinydiffusionmodels_tpu.models.ar_lm import TinyGPTConfig
from tinydiffusionmodels_tpu.sample.guided import guided_generate_scan, mix_logits


class TestMixLogits:
    def test_formula(self):
        ar = jnp.array([[1.0, 2.0]])
        diff = jnp.array([[3.0, 0.0]])
        out = mix_logits(ar, diff, alpha=0.25)
        np.testing.assert_allclose(
            np.asarray(out), [[0.75 * 1 + 0.25 * 3, 0.75 * 2]], rtol=1e-6
        )

    def test_temperature(self):
        ar = jnp.array([[2.0]])
        diff = jnp.array([[4.0]])
        out = mix_logits(ar, diff, alpha=0.5, temperature=2.0)
        np.testing.assert_allclose(np.asarray(out), [[1.5]], rtol=1e-6)

    def test_alpha_extremes(self):
        ar = jnp.array([[1.0, 0.0]])
        diff = jnp.array([[0.0, 1.0]])
        np.testing.assert_allclose(
            np.asarray(mix_logits(ar, diff, 0.0)), np.asarray(ar)
        )
        np.testing.assert_allclose(
            np.asarray(mix_logits(ar, diff, 1.0)), np.asarray(diff)
        )

    def test_normalized_mix_bounds_influence(self):
        """normalize=True is a linear opinion pool: shift-invariant, and an
        arbitrarily over-confident diffusion head can contribute at most
        alpha of probability mass — unlike the raw reference mix, where a
        100x-larger diffusion head hijacks the argmax at any alpha."""
        import jax

        ar = jnp.array([[2.0, 1.0, 0.0]])
        diff = jnp.array([[0.0, 1.0, 2.0]])
        base = mix_logits(ar, diff, 0.3, normalize=True)
        shifted = mix_logits(ar + 7.0, diff - 3.0, 0.3, normalize=True)
        np.testing.assert_allclose(
            np.asarray(jax.nn.softmax(base)),
            np.asarray(jax.nn.softmax(shifted)), rtol=1e-6,
        )
        # Over-confident diffusion head (effectively one-hot on token 2).
        big_diff = 100.0 * diff
        raw = mix_logits(ar, big_diff, 0.1)
        norm = mix_logits(ar, big_diff, 0.1, normalize=True)
        assert int(jnp.argmax(raw)) == 2      # hijacked at alpha=0.1
        assert int(jnp.argmax(norm)) == 0     # bounded: AR's 0.9*0.67 wins
        # At alpha high enough, the pool follows the diffusion head.
        norm_hi = mix_logits(ar, big_diff, 0.9, normalize=True)
        assert int(jnp.argmax(norm_hi)) == 2

    def test_normalized_alpha_extremes(self):
        import jax

        ar = jnp.array([[1.0, 0.0, -1.0]])
        diff = jnp.array([[-5.0, 9.0, 2.0]])
        np.testing.assert_allclose(
            np.asarray(jax.nn.softmax(mix_logits(ar, diff, 0.0, normalize=True))),
            np.asarray(jax.nn.softmax(ar)), rtol=1e-5, atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(jax.nn.softmax(mix_logits(ar, diff, 1.0, normalize=True))),
            np.asarray(jax.nn.softmax(diff)), rtol=1e-5, atol=1e-7,
        )


class TestGuidedScan:
    cfg = TinyGPTConfig(vocab_size=40, dim=32, n_heads=4, depth=2, max_len=16)

    def _reference_loop(self, params, diff_logits, bos, alpha):
        """The reference algorithm verbatim: full forward on the growing
        prefix each step, greedy argmax (src/shakespeare.py:445-468)."""
        b, seq_len, _ = diff_logits.shape
        ids = jnp.full((b, 1), bos, dtype=jnp.int32)
        for pos in range(seq_len):
            ar_logits = tiny_gpt_apply(params, ids, self.cfg)[:, -1, :]
            mixed = (1 - alpha) * ar_logits + alpha * diff_logits[:, pos, :]
            nxt = jnp.argmax(mixed, axis=-1, keepdims=True).astype(jnp.int32)
            ids = jnp.concatenate([ids, nxt], axis=1)
        return ids[:, 1:]

    def test_scan_matches_reference_loop(self):
        params = init_tiny_gpt(jax.random.PRNGKey(0), self.cfg)
        diff_logits = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 40))
        bos = 0
        alpha = 0.3

        expected = self._reference_loop(params, diff_logits, bos, alpha)

        decode = lambda cache, tok: tiny_gpt_decode_step(
            params, cache, tok, self.cfg
        )
        got = guided_generate_scan(
            decode, tiny_gpt_init_cache(self.cfg, 2), diff_logits, bos,
            alpha=alpha,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))

    def test_alpha_one_ignores_lm(self):
        """alpha=1 -> tokens = argmax of diffusion logits, LM irrelevant."""
        params = init_tiny_gpt(jax.random.PRNGKey(0), self.cfg)
        diff_logits = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 40))
        decode = lambda cache, tok: tiny_gpt_decode_step(
            params, cache, tok, self.cfg
        )
        got = guided_generate_scan(
            decode, tiny_gpt_init_cache(self.cfg, 1), diff_logits, 0,
            alpha=1.0,
        )
        np.testing.assert_array_equal(
            np.asarray(got)[0], np.asarray(jnp.argmax(diff_logits[0], axis=-1))
        )

    def test_output_shape(self):
        params = init_tiny_gpt(jax.random.PRNGKey(0), self.cfg)
        diff_logits = jnp.zeros((3, 5, 40))
        decode = lambda cache, tok: tiny_gpt_decode_step(
            params, cache, tok, self.cfg
        )
        got = guided_generate_scan(
            decode, tiny_gpt_init_cache(self.cfg, 3), diff_logits, 0,
            alpha=0.5,
        )
        assert got.shape == (3, 5)


class TestResume:
    def test_mnist_resume_restores_state(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        monkeypatch.setenv("TDM_DATA_LIMIT", "128")
        monkeypatch.delenv("AIP_MODEL_DIR", raising=False)
        from tinydiffusionmodels_tpu.train import mnist_train

        logs = []
        mnist_train.train(
            epochs=1, batch_size=64, ckpt_path="c.pth",
            sample_every_epoch=False, resume=True,
            log_fn=lambda *a: logs.append(" ".join(map(str, a))),
        )
        assert (tmp_path / "c_state.pth").exists()

        # Second run with more epochs resumes from epoch 1.
        logs2 = []
        mnist_train.train(
            epochs=2, batch_size=64, ckpt_path="c.pth",
            sample_every_epoch=False, resume=True,
            log_fn=lambda *a: logs2.append(" ".join(map(str, a))),
        )
        assert any("[resume] restored epoch 1" in l for l in logs2)
        # Only one additional epoch was run.
        assert sum("Epoch" in l and "steps in" in l for l in logs2) == 1
