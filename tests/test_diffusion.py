"""Tests for q_sample / p_sample / ddim_step: closed forms and torch parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinydiffusionmodels_tpu.core import (
    make_schedule,
    q_sample,
    p_sample,
    p_sample_mean,
    ddim_step,
    ddpm_loss,
)


@pytest.fixture(scope="module")
def sched():
    return make_schedule(1000)


class TestQSample:
    def test_closed_form_4d(self, sched):
        """q_sample = sqrt(acp_t) x0 + sqrt(1-acp_t) eps, image rank
        (reference src/mnist.py:36-42)."""
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (4, 28, 28, 1))
        noise = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
        t = jnp.array([0, 10, 500, 999])
        out = q_sample(sched, x0, t, noise)
        acp = np.asarray(sched.alphas_cumprod)[np.asarray(t)]
        expected = (
            np.sqrt(acp)[:, None, None, None] * np.asarray(x0)
            + np.sqrt(1 - acp)[:, None, None, None] * np.asarray(noise)
        )
        # atol accounts for the f32 catastrophic cancellation in this test's
        # (1 - acp) recompute; the table itself is f64-accurate.
        np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-5, atol=5e-6)

    def test_rank_generic_3d(self, sched):
        """Same function serves the text rank (reference src/shakespeare.py:37-44)."""
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (2, 64, 256))
        noise = jnp.zeros_like(x0)
        t = jnp.array([0, 0])
        out = q_sample(sched, x0, t, noise)
        # At t=0 with zero noise, output ~= sqrt(1 - 1e-4) * x0.
        np.testing.assert_allclose(
            np.asarray(out), np.sqrt(1 - 1e-4) * np.asarray(x0), rtol=1e-6
        )

    def test_torch_value_parity(self, sched):
        """Feed identical inputs through the reference math written in torch."""
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        x0 = rng.standard_normal((3, 1, 28, 28)).astype(np.float32)
        noise = rng.standard_normal((3, 1, 28, 28)).astype(np.float32)
        t = np.array([5, 250, 999])

        betas = torch.linspace(1e-4, 2e-2, 1000)
        acp = torch.cumprod(1.0 - betas, dim=0)
        sa, so = torch.sqrt(acp), torch.sqrt(1.0 - acp)
        ref = (
            sa[t][:, None, None, None] * torch.from_numpy(x0)
            + so[t][:, None, None, None] * torch.from_numpy(noise)
        ).numpy()

        ours = q_sample(
            sched,
            jnp.asarray(np.moveaxis(x0, 1, -1)),  # NCHW -> NHWC
            jnp.asarray(t),
            jnp.asarray(np.moveaxis(noise, 1, -1)),
        )
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(ours), -1, 1), ref, rtol=1e-5, atol=1e-6
        )


class TestPSample:
    def test_mean_closed_form(self, sched):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 8, 8, 1)).astype(np.float32)
        eps = rng.standard_normal((2, 8, 8, 1)).astype(np.float32)
        t = np.array([100, 100])
        mean = p_sample_mean(sched, jnp.asarray(x), jnp.asarray(t), jnp.asarray(eps))
        b = np.asarray(sched.betas)[100]
        so = np.asarray(sched.sqrt_one_minus_alphas_cumprod)[100]
        ra = 1.0 / np.sqrt(np.asarray(sched.alphas)[100])
        expected = ra * (x - b / so * eps)
        np.testing.assert_allclose(np.asarray(mean), expected, rtol=2e-5, atol=1e-6)

    def test_no_noise_at_t0(self, sched):
        """t=0 returns the mean exactly (reference src/mnist.py:176-177)."""
        key = jax.random.PRNGKey(2)
        x = jax.random.normal(key, (4, 8, 8, 1))
        eps = jax.random.normal(jax.random.fold_in(key, 1), x.shape)
        t = jnp.zeros((4,), dtype=jnp.int32)
        out = p_sample(sched, x, t, eps, jax.random.fold_in(key, 2))
        mean = p_sample_mean(sched, x, t, eps)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(mean))

    def test_noise_added_at_t_positive(self, sched):
        key = jax.random.PRNGKey(3)
        x = jnp.zeros((4, 8, 8, 1))
        eps = jnp.zeros_like(x)
        t = jnp.full((4,), 500, dtype=jnp.int32)
        out = p_sample(sched, x, t, eps, key)
        assert np.abs(np.asarray(out)).max() > 0  # sqrt(beta_t) z != 0

    def test_mixed_batch_timesteps(self, sched):
        """Per-element masking generalizes the reference's t[0]==0 check."""
        key = jax.random.PRNGKey(4)
        x = jnp.zeros((2, 4, 4, 1))
        eps = jnp.zeros_like(x)
        t = jnp.array([0, 500])
        out = np.asarray(p_sample(sched, x, t, eps, key))
        assert np.all(out[0] == 0)  # t=0 element gets no noise
        assert np.abs(out[1]).max() > 0


class TestDDIM:
    def test_eta0_deterministic(self, sched):
        key = jax.random.PRNGKey(5)
        x = jax.random.normal(key, (2, 8, 8, 1))
        eps = jax.random.normal(jax.random.fold_in(key, 1), x.shape)
        t = jnp.array([500, 500])
        tp = jnp.array([400, 400])
        a = ddim_step(sched, x, t, tp, eps)
        b = ddim_step(sched, x, t, tp, eps)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_final_step_returns_x0hat(self, sched):
        x = jnp.ones((1, 4, 4, 1))
        eps = jnp.zeros_like(x)
        t = jnp.array([0])
        tp = jnp.array([-1])
        out = ddim_step(sched, x, t, tp, eps)
        acp0 = float(np.asarray(sched.alphas_cumprod)[0])
        np.testing.assert_allclose(
            np.asarray(out), 1.0 / np.sqrt(acp0), rtol=1e-5
        )

    def test_eta_requires_key(self, sched):
        x = jnp.ones((1, 4, 4, 1))
        with pytest.raises(ValueError):
            ddim_step(sched, x, jnp.array([10]), jnp.array([5]), x, eta=0.5)


class TestLoss:
    def test_perfect_model_zero_loss(self, sched):
        key = jax.random.PRNGKey(6)
        x0 = jax.random.normal(key, (4, 8, 8, 1))
        noise = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
        t = jnp.array([1, 2, 3, 4])

        # An oracle that returns the exact noise -> loss must be 0.
        loss = ddpm_loss(sched, lambda xt, tt: noise, x0, t, noise)
        assert float(loss) == 0.0

    def test_loss_is_mse(self, sched):
        x0 = jnp.zeros((2, 4, 4, 1))
        noise = jnp.zeros_like(x0)
        t = jnp.array([10, 10])
        loss = ddpm_loss(sched, lambda xt, tt: jnp.ones_like(xt), x0, t, noise)
        assert float(loss) == pytest.approx(1.0)
