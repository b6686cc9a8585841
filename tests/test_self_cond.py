"""Self-conditioning + clamp-aware training (round-3 quality levers).

Self-conditioning (Analog Bits, Chen et al. 2022): the denoiser takes its
previous x0 estimate back as input through a zero-init projection; training
feeds a gradient-free first-pass estimate half the time. Clamp-aware
training: a straight-through loss term against the nearest-embedding
clamped prediction the sampler uses (sample/text.make_clamped_denoiser).
Both are framework extensions beyond the reference denoiser
(/root/reference/src/shakespeare.py:105-120, 224-243).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinydiffusionmodels_tpu.core import make_schedule
from tinydiffusionmodels_tpu.io.checkpoint import (
    transformer_from_state_dict,
    transformer_to_state_dict,
)
from tinydiffusionmodels_tpu.models import (
    init_learned_embedding,
    init_learned_rounding,
    init_tiny_transformer,
    tiny_transformer_apply,
)
from tinydiffusionmodels_tpu.models.transformer import TransformerConfig
from tinydiffusionmodels_tpu.sample.ancestral import sample_loop
from tinydiffusionmodels_tpu.train.optim import adamw
from tinydiffusionmodels_tpu.train.state import TrainState
from tinydiffusionmodels_tpu.train.text_train import (
    make_text_eval_step,
    make_text_train_step,
)

CFG = TransformerConfig(dim=32, depth=1, ffn_dim=64, timesteps=50,
                        self_cond=True)
CFG_PLAIN = dataclasses.replace(CFG, self_cond=False)


@pytest.fixture(scope="module")
def sched():
    return make_schedule(50)


def _joint_params(key, cfg=CFG, vocab=30):
    return {
        "diffusion_model": init_tiny_transformer(key, cfg),
        "rounding_fn": init_learned_rounding(
            jax.random.fold_in(key, 1), cfg.dim, vocab
        ),
        "embedding_fn": init_learned_embedding(
            jax.random.fold_in(key, 2), vocab, cfg.dim
        ),
    }


class TestSelfCondModel:
    def test_zero_init_is_noop(self):
        """At init the self-cond projection is zeros: any x0_prev input
        (None, zeros, random) produces the identical output, and that
        output equals the plain (non-self-cond) model's."""
        key = jax.random.PRNGKey(0)
        p_sc = init_tiny_transformer(key, CFG)
        p_plain = init_tiny_transformer(key, CFG_PLAIN)
        x = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 32))
        t = jnp.array([3, 7])
        prev = jax.random.normal(jax.random.fold_in(key, 2), x.shape)

        out_none = tiny_transformer_apply(p_sc, x, t, CFG)
        out_zero = tiny_transformer_apply(
            p_sc, x, t, CFG, x0_prev=jnp.zeros_like(x)
        )
        out_rand = tiny_transformer_apply(p_sc, x, t, CFG, x0_prev=prev)
        out_plain = tiny_transformer_apply(p_plain, x, t, CFG_PLAIN)
        np.testing.assert_array_equal(np.asarray(out_none), np.asarray(out_zero))
        np.testing.assert_array_equal(np.asarray(out_none), np.asarray(out_rand))
        np.testing.assert_array_equal(np.asarray(out_none), np.asarray(out_plain))

    def test_trained_proj_changes_output(self):
        key = jax.random.PRNGKey(0)
        p = init_tiny_transformer(key, CFG)
        p["selfcond_proj"]["w"] = jax.random.normal(
            jax.random.fold_in(key, 9), (32, 32)
        ) * 0.1
        x = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 32))
        t = jnp.array([3, 7])
        prev = jax.random.normal(jax.random.fold_in(key, 2), x.shape)
        out_none = tiny_transformer_apply(p, x, t, CFG)
        out_prev = tiny_transformer_apply(p, x, t, CFG, x0_prev=prev)
        assert not np.allclose(np.asarray(out_none), np.asarray(out_prev))

    def test_x0_prev_rejected_without_self_cond(self):
        key = jax.random.PRNGKey(0)
        p = init_tiny_transformer(key, CFG_PLAIN)
        x = jnp.zeros((1, 4, 32))
        with pytest.raises(ValueError, match="self_cond"):
            tiny_transformer_apply(
                p, x, jnp.array([0]), CFG_PLAIN, x0_prev=x
            )

    def test_state_dict_round_trip(self):
        key = jax.random.PRNGKey(0)
        p = init_tiny_transformer(key, CFG)
        p["selfcond_proj"]["w"] = jax.random.normal(key, (32, 32))
        sd = transformer_to_state_dict(p)
        assert "selfcond_proj.weight" in sd
        back = transformer_from_state_dict(sd)
        np.testing.assert_allclose(
            np.asarray(back["selfcond_proj"]["w"]),
            np.asarray(p["selfcond_proj"]["w"]),
        )
        x = jax.random.normal(jax.random.fold_in(key, 1), (1, 4, 32))
        prev = jax.random.normal(jax.random.fold_in(key, 2), x.shape)
        t = jnp.array([3])
        np.testing.assert_allclose(
            np.asarray(tiny_transformer_apply(back, x, t, CFG, x0_prev=prev)),
            np.asarray(tiny_transformer_apply(p, x, t, CFG, x0_prev=prev)),
            rtol=1e-6,
        )


class TestSelfCondTraining:
    @pytest.mark.parametrize("parameterization", ["eps", "x0"])
    def test_loss_decreases(self, sched, parameterization):
        key = jax.random.PRNGKey(0)
        params = _joint_params(key)
        tx = adamw(1e-3)
        step = make_text_train_step(
            sched, CFG, tx, use_learned_embeddings=True,
            parameterization=parameterization,
        )
        state = TrainState.create(params, tx)
        tokens = jax.random.randint(jax.random.fold_in(key, 3), (8, 8), 0, 30)
        w = jnp.asarray(1.0)
        losses = []
        for i in range(30):
            state, (_, _, total) = step(
                state, tokens, w, jax.random.fold_in(key, 100 + i)
            )
            losses.append(float(total))
        assert losses[-1] < losses[0]

    def test_selfcond_proj_receives_gradient(self, sched):
        """Over enough steps the 50% coin lands on the estimate branch and
        the zero-init projection moves."""
        key = jax.random.PRNGKey(1)
        params = _joint_params(key)
        tx = adamw(1e-3)
        step = make_text_train_step(
            sched, CFG, tx, use_learned_embeddings=True,
            parameterization="x0",
        )
        state = TrainState.create(params, tx)
        tokens = jax.random.randint(jax.random.fold_in(key, 3), (8, 8), 0, 30)
        w = jnp.asarray(1.0)
        for i in range(10):
            state, _ = step(state, tokens, w, jax.random.fold_in(key, i))
        assert float(
            jnp.abs(state.params["diffusion_model"]["selfcond_proj"]["w"]).max()
        ) > 0.0

    def test_eval_step_runs(self, sched):
        key = jax.random.PRNGKey(2)
        params = _joint_params(key)
        ev = make_text_eval_step(
            sched, CFG, use_learned_embeddings=True, parameterization="x0",
        )
        tokens = jax.random.randint(key, (4, 8), 0, 30)
        d, r, t = ev(params, tokens, jnp.asarray(1.0), key)
        assert np.isfinite(float(t))


class TestClampTrain:
    def test_loss_decreases_and_finite(self, sched):
        key = jax.random.PRNGKey(0)
        params = _joint_params(key)
        tx = adamw(1e-3)
        step = make_text_train_step(
            sched, CFG_PLAIN, tx, use_learned_embeddings=True,
            parameterization="x0", clamp_train=True,
        )
        state = TrainState.create(params, tx)
        tokens = jax.random.randint(jax.random.fold_in(key, 3), (8, 8), 0, 30)
        w = jnp.asarray(1.0)
        losses = []
        for i in range(30):
            state, (_, _, total) = step(
                state, tokens, w, jax.random.fold_in(key, 100 + i)
            )
            losses.append(float(total))
        assert np.all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    def test_requires_x0(self, sched, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from tinydiffusionmodels_tpu.train import text_train

        params = _joint_params(jax.random.PRNGKey(0))
        chunks = np.zeros((8, 8), dtype=np.int64)
        with pytest.raises(ValueError, match="x0"):
            text_train.train(
                params, chunks, chunks, cfg=CFG_PLAIN, sched=make_schedule(50),
                epochs=1, batch_size=4, clamp_train=True,
                parameterization="eps", log_fn=lambda *a: None,
            )

    def test_composes_with_self_cond(self, sched):
        key = jax.random.PRNGKey(4)
        params = _joint_params(key)
        tx = adamw(1e-3)
        step = make_text_train_step(
            sched, CFG, tx, use_learned_embeddings=True,
            parameterization="x0", clamp_train=True,
        )
        state = TrainState.create(params, tx)
        tokens = jax.random.randint(key, (8, 8), 0, 30)
        state, (_, _, total) = step(state, tokens, jnp.asarray(1.0), key)
        assert np.isfinite(float(total))


class TestSelfCondSampling:
    @pytest.mark.parametrize("method,steps", [
        ("ancestral", None), ("ddim", 4), ("dpm++", 4),
    ])
    def test_sample_loop_self_cond(self, sched, method, steps):
        """Self-cond samplers run for every method; carry is deterministic
        given the key."""
        key = jax.random.PRNGKey(0)
        calls = []

        def denoise(x, t, x0_prev):
            calls.append(1)
            eps = 0.1 * x + 0.01 * x0_prev
            return eps, x - eps

        out1 = sample_loop(
            denoise, sched, (2, 4, 8), key, method=method, num_steps=steps,
            self_cond=True,
        )
        out2 = sample_loop(
            denoise, sched, (2, 4, 8), key, method=method, num_steps=steps,
            self_cond=True,
        )
        assert out1.shape == (2, 4, 8)
        assert np.all(np.isfinite(np.asarray(out1)))
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    def test_carry_feeds_next_step(self, sched):
        """The x0 estimate returned at step k must arrive as x0_prev at
        step k+1 (zeros at the first step): a denoiser that *echoes its
        carry as eps* produces a different trajectory from a zero-eps one
        only if the carry is live (both see zeros at step one)."""
        key = jax.random.PRNGKey(0)
        out_echo = sample_loop(
            lambda x, t, p: (p, jnp.full_like(x, 7.0)),
            sched, (1, 2, 4), key, method="ddim", num_steps=2, self_cond=True,
        )
        out_zero = sample_loop(
            lambda x, t, p: (jnp.zeros_like(x), jnp.full_like(x, 7.0)),
            sched, (1, 2, 4), key, method="ddim", num_steps=2, self_cond=True,
        )
        assert not np.allclose(np.asarray(out_echo), np.asarray(out_zero))

    def test_text_denoisers_self_cond(self, sched):
        from tinydiffusionmodels_tpu.models.embedding import embedding_matrix
        from tinydiffusionmodels_tpu.sample.text import (
            make_clamped_denoiser,
            make_denoiser,
        )

        key = jax.random.PRNGKey(0)
        joint = _joint_params(key)
        emb = embedding_matrix(joint["embedding_fn"])
        x = jax.random.normal(jax.random.fold_in(key, 1), (2, 4, 32))
        t = jnp.array([5, 5])
        prev = jnp.zeros_like(x)

        for par in ("eps", "x0"):
            dn = make_denoiser(
                joint["diffusion_model"], CFG, sched, parameterization=par
            )
            eps, x0e = dn(x, t, prev)
            assert eps.shape == x.shape and x0e.shape == x.shape
            cd = make_clamped_denoiser(
                joint["diffusion_model"], CFG, sched,
                rounding_params=joint["rounding_fn"], embedding_table=emb,
                parameterization=par,
            )
            eps_c, x0c = cd(x, t, prev)
            assert eps_c.shape == x.shape
            # Clamped carry lies on the embedding manifold: every position
            # equals some embedding row.
            x0c_np = np.asarray(x0c).reshape(-1, 32)
            emb_np = np.asarray(emb)
            for row in x0c_np[:4]:
                assert np.min(np.abs(emb_np - row).sum(axis=1)) < 1e-5


class TestSelfCondCli:
    def test_train_then_sample_auto_detect(self, tmp_path, monkeypatch, capsys):
        from tinydiffusionmodels_tpu import shakespeare as cli

        monkeypatch.chdir(tmp_path)
        monkeypatch.setenv("TDM_DATA_LIMIT", "256")
        monkeypatch.delenv("AIP_MODEL_DIR", raising=False)
        common = ["--model_id", "char", "--seq_len", "16",
                  "--embed_dim", "32", "--batch_size", "8", "--n", "2"]
        cli.main([
            "--train", "--epochs", "1", "--use_learned_embeddings",
            "--warmup_steps", "2", "--parameterization", "x0",
            "--self_cond", "--clamp_train", "--depth", "2", *common,
        ])
        assert (tmp_path / "text_ckpt.pth").exists()

        # Sampling WITHOUT --self_cond must auto-detect it from the ckpt.
        cli.main([
            "--sample", "--use_learned_embeddings", "--sampler", "ddim",
            "--steps", "4", "--clamp", *common,
        ])
        out = capsys.readouterr().out
        assert "self_cond=True (from checkpoint)" in out
        assert (tmp_path / "samples" / "sample_0.txt").exists()
