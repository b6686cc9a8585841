"""Smoke tests: train steps reduce loss; samplers produce valid output.

These are the model-validation tests the reference lacks entirely
(SURVEY.md §4: "zero tests for models, diffusion math, training, sampling").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinydiffusionmodels_tpu.core import make_schedule
from tinydiffusionmodels_tpu.models import (
    init_unet,
    unet_apply,
    init_tiny_transformer,
    init_learned_embedding,
    init_learned_rounding,
)
from tinydiffusionmodels_tpu.models.transformer import TransformerConfig
from tinydiffusionmodels_tpu.sample.ancestral import sample_loop
from tinydiffusionmodels_tpu.train.mnist_train import make_train_step
from tinydiffusionmodels_tpu.train.optim import (
    adamw,
    cosine_schedule_with_warmup,
    dynamic_rounding_weight_schedule,
)
from tinydiffusionmodels_tpu.train.state import TrainState
from tinydiffusionmodels_tpu.train.text_train import (
    make_text_eval_step,
    make_text_train_step,
)


@pytest.fixture(scope="module")
def sched():
    return make_schedule(100)  # short schedule keeps tests fast


class TestMnistTrainStep:
    def test_loss_decreases(self, sched):
        tx = adamw(1e-3)
        params = init_unet(jax.random.PRNGKey(0))
        state = TrainState.create(params, tx)
        step = make_train_step(sched, tx)
        batch = jax.random.normal(jax.random.PRNGKey(1), (8, 28, 28, 1))
        losses = []
        for i in range(30):
            state, loss = step(state, batch, jax.random.PRNGKey(100 + i))
            losses.append(float(loss))
        # Average of late losses must be below the first loss.
        assert np.mean(losses[-5:]) < losses[0]

    def test_step_counter(self, sched):
        tx = adamw(1e-3)
        state = TrainState.create(init_unet(jax.random.PRNGKey(0)), tx)
        step = make_train_step(sched, tx)
        batch = jnp.zeros((2, 28, 28, 1))
        state, _ = step(state, batch, jax.random.PRNGKey(0))
        assert int(state.step) == 1


class TestTextTrainStep:
    def _setup(self, sched, use_learned_embeddings=True):
        cfg = TransformerConfig(dim=32, depth=1, dropout=0.1, ffn_dim=64,
                                timesteps=sched.timesteps)
        key = jax.random.PRNGKey(0)
        params = {
            "diffusion_model": init_tiny_transformer(key, cfg),
            "rounding_fn": init_learned_rounding(
                jax.random.fold_in(key, 1), 32, 50
            ),
        }
        if use_learned_embeddings:
            params["embedding_fn"] = init_learned_embedding(
                jax.random.fold_in(key, 2), 50, 32
            )
        tx = adamw(1e-3)
        return cfg, params, tx

    def test_joint_loss_decreases(self, sched):
        cfg, params, tx = self._setup(sched)
        state = TrainState.create(params, tx)
        step = make_text_train_step(
            sched, cfg, tx, use_learned_embeddings=True
        )
        tokens = jax.random.randint(jax.random.PRNGKey(3), (4, 16), 0, 50)
        w = jnp.asarray(1.0)
        totals = []
        for i in range(30):
            state, (d, r, t) = step(state, tokens, w, jax.random.PRNGKey(i))
            totals.append(float(t))
        assert np.mean(totals[-5:]) < totals[0]

    def test_pretrained_embedding_path(self, sched):
        cfg, params, tx = self._setup(sched, use_learned_embeddings=False)
        matrix = jax.random.normal(jax.random.PRNGKey(9), (50, 32))
        state = TrainState.create(params, tx)
        step = make_text_train_step(
            sched, cfg, tx, use_learned_embeddings=False,
            pretrained_matrix=matrix,
        )
        tokens = jax.random.randint(jax.random.PRNGKey(3), (4, 16), 0, 50)
        state, (d, r, t) = step(state, tokens, jnp.asarray(0.5), jax.random.PRNGKey(0))
        assert np.isfinite(float(t))

    def test_eval_step_deterministic_given_key(self, sched):
        cfg, params, tx = self._setup(sched)
        eval_step = make_text_eval_step(sched, cfg, use_learned_embeddings=True)
        tokens = jax.random.randint(jax.random.PRNGKey(3), (4, 16), 0, 50)
        a = eval_step(params, tokens, jnp.asarray(1.0), jax.random.PRNGKey(7))
        b = eval_step(params, tokens, jnp.asarray(1.0), jax.random.PRNGKey(7))
        for x, y in zip(a, b):
            assert float(x) == float(y)


class TestSampler:
    def test_ancestral_shapes_and_determinism(self, sched):
        params = init_unet(jax.random.PRNGKey(0))
        denoise = lambda x, t: unet_apply(params, x, t, timesteps=sched.timesteps)
        key = jax.random.PRNGKey(5)
        a = sample_loop(denoise, sched, (2, 28, 28, 1), key)
        b = sample_loop(denoise, sched, (2, 28, 28, 1), key)
        assert a.shape == (2, 28, 28, 1)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.isfinite(np.asarray(a)).all()

    def test_ddim_runs_with_few_steps(self, sched):
        params = init_unet(jax.random.PRNGKey(0))
        denoise = lambda x, t: unet_apply(params, x, t, timesteps=sched.timesteps)
        out = sample_loop(
            denoise, sched, (2, 28, 28, 1), jax.random.PRNGKey(5),
            method="ddim", num_steps=10,
        )
        assert out.shape == (2, 28, 28, 1)
        assert np.isfinite(np.asarray(out)).all()

    def test_dpm_solver_runs(self, sched):
        params = init_unet(jax.random.PRNGKey(0))
        denoise = lambda x, t: unet_apply(params, x, t, timesteps=sched.timesteps)
        out = sample_loop(
            denoise, sched, (2, 28, 28, 1), jax.random.PRNGKey(5),
            method="dpm++", num_steps=10,
        )
        assert out.shape == (2, 28, 28, 1)
        assert np.isfinite(np.asarray(out)).all()

    def test_dpm_solver_close_to_ancestral_on_linear_model(self, sched):
        """With a linear (exact-score-free) oracle model eps_hat = 0, all
        samplers reduce to deterministic scaling of the init noise; dpm++
        and ddim must approximately agree with each other."""
        denoise = lambda x, t: jnp.zeros_like(x)
        key = jax.random.PRNGKey(7)
        a = sample_loop(denoise, sched, (2, 8, 8, 1), key,
                        method="ddim", num_steps=10)
        b = sample_loop(denoise, sched, (2, 8, 8, 1), key,
                        method="dpm++", num_steps=10)
        # eps=0 -> x0_hat = x/alpha; both solvers converge toward x/alpha_0.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-2
        )

    def test_text_rank(self, sched):
        cfg = TransformerConfig(dim=32, depth=1, ffn_dim=64,
                                timesteps=sched.timesteps)
        params = init_tiny_transformer(jax.random.PRNGKey(0), cfg)
        denoise = lambda x, t: tiny_transformer_apply_wrap(params, x, t, cfg)
        out = sample_loop(denoise, sched, (2, 8, 32), jax.random.PRNGKey(1))
        assert out.shape == (2, 8, 32)

    def test_unknown_method(self, sched):
        with pytest.raises(ValueError):
            sample_loop(
                lambda x, t: x, sched, (1, 4), jax.random.PRNGKey(0),
                method="nope",
            )


def tiny_transformer_apply_wrap(params, x, t, cfg):
    from tinydiffusionmodels_tpu.models import tiny_transformer_apply

    return tiny_transformer_apply(params, x, t, cfg)


class TestSchedules:
    def test_cosine_warmup_matches_reference_formula(self):
        import math

        sched_fn = cosine_schedule_with_warmup(1e-3, 10, 100)
        # Reference lambda (src/shakespeare.py:161-165)
        def ref(step):
            if step < 10:
                return step / 10
            progress = (step - 10) / 90
            return max(0.0, 0.5 * (1.0 + math.cos(math.pi * progress)))

        for s in [0, 1, 5, 10, 11, 50, 99, 100]:
            np.testing.assert_allclose(
                float(sched_fn(s)), 1e-3 * ref(s), rtol=1e-5, atol=1e-9
            )

    def test_rounding_weight_schedule(self):
        assert dynamic_rounding_weight_schedule(0, 100) == pytest.approx(1.0)
        assert dynamic_rounding_weight_schedule(100, 100) == pytest.approx(0.1)
        assert dynamic_rounding_weight_schedule(50, 100) == pytest.approx(0.55)
