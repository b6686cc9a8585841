"""x0-prediction parameterization (original Diffusion-LM; the reference
trains eps-prediction only, src/shakespeare.py:232-236)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tinydiffusionmodels_tpu.core import make_schedule, q_sample
from tinydiffusionmodels_tpu.core.diffusion import eps_from_x0
from tinydiffusionmodels_tpu.models import (
    init_learned_embedding,
    init_learned_rounding,
    init_tiny_transformer,
)
from tinydiffusionmodels_tpu.models.transformer import TransformerConfig
from tinydiffusionmodels_tpu.sample.text import (
    make_denoiser,
    sample_diffusion_embeddings,
)
from tinydiffusionmodels_tpu.train.state import TrainState
from tinydiffusionmodels_tpu.train.text_train import (
    make_text_train_step_multi,
)


class TestEpsFromX0:
    def test_inverts_q_sample(self):
        """Given the true x0, eps_from_x0 recovers the exact noise."""
        sched = make_schedule(50)
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (4, 8, 16))
        noise = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
        t = jnp.array([0, 7, 23, 49])
        x_t = q_sample(sched, x0, t, noise)
        rec = eps_from_x0(sched, x_t, t, x0)
        np.testing.assert_allclose(
            np.asarray(rec), np.asarray(noise), rtol=1e-4, atol=1e-5
        )


def _joint(cfg, vocab=31, dim=16):
    key = jax.random.PRNGKey(0)
    return {
        "diffusion_model": init_tiny_transformer(key, cfg),
        "rounding_fn": init_learned_rounding(
            jax.random.fold_in(key, 1), dim, vocab
        ),
        "embedding_fn": init_learned_embedding(
            jax.random.fold_in(key, 2), vocab, dim
        ),
    }


class TestX0Training:
    def test_x0_loss_decreases(self):
        sched = make_schedule(10)
        cfg = TransformerConfig(dim=16, n_heads=2, depth=1, ffn_dim=32,
                                dropout=0.0, timesteps=sched.timesteps)
        tx = optax.adam(1e-2)
        state = TrainState.create(_joint(cfg), tx)
        step = make_text_train_step_multi(
            sched, cfg, tx, use_learned_embeddings=True,
            parameterization="x0",
        )
        tokens = jax.random.randint(jax.random.PRNGKey(5), (30, 8, 8), 0, 31)
        w = jnp.asarray(0.5)
        state, first = step(
            state, tokens[:5], w, jax.random.PRNGKey(1)
        )
        for i in range(4):
            state, last = step(
                state, tokens[5 * (i + 1):5 * (i + 2)], w,
                jax.random.fold_in(jax.random.PRNGKey(1), i)
            )
        assert float(last[2]) < float(first[2])

    def test_x0_differs_from_eps_loss(self):
        """Same params/batch/key: the two parameterizations compute
        different diffusion losses (different regression targets)."""
        sched = make_schedule(10)
        cfg = TransformerConfig(dim=16, n_heads=2, depth=1, ffn_dim=32,
                                dropout=0.0, timesteps=sched.timesteps)
        tx = optax.sgd(0.0)
        tokens = jax.random.randint(jax.random.PRNGKey(5), (1, 8, 8), 0, 31)
        losses = {}
        for mode in ("eps", "x0"):
            state = TrainState.create(_joint(cfg), tx)
            step = make_text_train_step_multi(
                sched, cfg, tx, use_learned_embeddings=True,
                parameterization=mode,
            )
            _, sums = step(state, tokens, jnp.asarray(0.0),
                           jax.random.PRNGKey(7))
            losses[mode] = float(sums[0])
        assert losses["eps"] != losses["x0"]


class TestX0Sampling:
    def test_denoiser_converts_and_samples(self):
        sched = make_schedule(10)
        cfg = TransformerConfig(dim=16, n_heads=2, depth=1, ffn_dim=32,
                                timesteps=sched.timesteps)
        params = init_tiny_transformer(jax.random.PRNGKey(0), cfg)
        den = make_denoiser(params, cfg, sched, parameterization="x0")
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 16))
        t = jnp.array([3, 3])
        assert np.isfinite(np.asarray(den(x, t))).all()

        z = sample_diffusion_embeddings(
            params, cfg, sched, jax.random.PRNGKey(2),
            n=2, seq_len=8, embed_dim=16, parameterization="x0",
        )
        assert z.shape == (2, 8, 16)
        assert np.isfinite(np.asarray(z)).all()


class TestCkptRoundTrip:
    def test_cli_records_and_autodetects(self, tmp_path, monkeypatch,
                                         eight_devices, capsys):
        """--parameterization x0 is recorded in the checkpoint and picked up
        by a later --sample invocation without the flag."""
        import os

        from tinydiffusionmodels_tpu import shakespeare as cli
        from tinydiffusionmodels_tpu.io import load_checkpoint

        monkeypatch.chdir(tmp_path)
        monkeypatch.setenv("TDM_DATA_LIMIT", "4000")
        monkeypatch.setenv("TDM_SCAN_CHUNK", "2")
        common = ["--model_id", "char", "--seq_len", "16",
                  "--embed_dim", "32", "--use_learned_embeddings",
                  "--ckpt", "x0.pth"]
        cli.main(["--train", "--epochs", "1", "--batch_size", "8",
                  "--warmup_steps", "2", "--parameterization", "x0",
                  *common])
        ckpt = load_checkpoint("x0.pth")
        assert ckpt["parameterization"] == "x0"

        cli.main(["--sample", "--sampler", "ddim", "--steps", "4",
                  "--n", "2", *common])
        out = capsys.readouterr().out
        assert "parameterization=x0" in out
        assert os.path.exists("samples/sample_0.txt")
