"""Forward noising, reverse (ancestral + DDIM) steps, and the training loss.

One rank-generic implementation replaces the reference's two copies of
q_sample / p_sample with hardcoded broadcast ranks (reference
src/mnist.py:36-42,167-180 = 4-D images; src/shakespeare.py:37-44,343-352 =
3-D embeddings). Timesteps may differ per batch element; the reference's
``t[0] == 0`` batch-uniform assumption (src/mnist.py:176) becomes a
per-element ``where`` mask, which is identical for batch-uniform t and
correct otherwise — and, unlike a Python ``if``, is jit/scan-compatible.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from tinydiffusionmodels_tpu.core.schedule import DiffusionSchedule

# An eps-prediction model: (x_t, t) -> predicted noise, same shape as x_t.
DenoiseFn = Callable[[jax.Array, jax.Array], jax.Array]


def _bcast(table: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather per-timestep coefficients and broadcast to rank ``ndim``.

    table: (T,) schedule column; t: (B,) int timesteps.
    Returns shape (B, 1, ..., 1) with ndim axes total.
    """
    coef = jnp.take(table, t, axis=0)
    return coef.reshape(coef.shape[0], *((1,) * (ndim - 1)))


def q_sample(
    sched: DiffusionSchedule,
    x_start: jax.Array,
    t: jax.Array,
    noise: jax.Array,
) -> jax.Array:
    """Forward diffusion q(x_t | x_0) (reference src/mnist.py:36-42).

    x_t = sqrt(acp_t) * x_0 + sqrt(1 - acp_t) * eps. Noise is an explicit
    argument (pure function); callers draw it from their PRNG stream.
    """
    sqrt_acp = _bcast(sched.sqrt_alphas_cumprod, t, x_start.ndim)
    sqrt_om = _bcast(sched.sqrt_one_minus_alphas_cumprod, t, x_start.ndim)
    return sqrt_acp * x_start + sqrt_om * noise


def eps_from_x0(
    sched: DiffusionSchedule,
    x_t: jax.Array,
    t: jax.Array,
    x0_pred: jax.Array,
) -> jax.Array:
    """Convert an x0-prediction into the equivalent eps-prediction.

    Inverts q_sample: eps = (x_t - sqrt(acp_t) * x0) / sqrt(1 - acp_t).
    Lets an x0-parameterized denoiser (the original Diffusion-LM choice;
    the reference trains eps-prediction, src/shakespeare.py:232-236) reuse
    every eps-based sampler unchanged.
    """
    sqrt_acp = _bcast(sched.sqrt_alphas_cumprod, t, x_t.ndim)
    sqrt_om = _bcast(sched.sqrt_one_minus_alphas_cumprod, t, x_t.ndim)
    return (x_t - sqrt_acp * x0_pred) / sqrt_om


def p_sample_mean(
    sched: DiffusionSchedule,
    x: jax.Array,
    t: jax.Array,
    eps_pred: jax.Array,
) -> jax.Array:
    """Posterior mean of the DDPM ancestral step (reference src/mnist.py:169-175).

    mu = 1/sqrt(alpha_t) * (x - beta_t / sqrt(1 - acp_t) * eps_hat)
    """
    betas_t = _bcast(sched.betas, t, x.ndim)
    sqrt_om = _bcast(sched.sqrt_one_minus_alphas_cumprod, t, x.ndim)
    sqrt_recip = _bcast(sched.sqrt_recip_alphas, t, x.ndim)
    return sqrt_recip * (x - betas_t / sqrt_om * eps_pred)


def p_sample(
    sched: DiffusionSchedule,
    x: jax.Array,
    t: jax.Array,
    eps_pred: jax.Array,
    key: jax.Array,
    *,
    noise_scale: float = 1.0,
) -> jax.Array:
    """One reverse ancestral step with posterior variance beta_t.

    Matches reference src/mnist.py:167-180 / src/shakespeare.py:343-352:
    adds sqrt(beta_t) * z noise except at t == 0 (masked per element here).

    ``noise_scale``: scales the injected noise (reduced-temperature
    sampling, a framework extension; 1.0 = exact reference semantics,
    0.0 = deterministic posterior-mean path).
    """
    mean = p_sample_mean(sched, x, t, eps_pred)
    noise = jax.random.normal(key, x.shape, dtype=x.dtype)
    sqrt_beta = _bcast(sched.sqrt_betas, t, x.ndim)
    nonzero = (t > 0).astype(x.dtype).reshape(t.shape[0], *((1,) * (x.ndim - 1)))
    return mean + noise_scale * nonzero * sqrt_beta * noise


def ddim_step(
    sched: DiffusionSchedule,
    x: jax.Array,
    t: jax.Array,
    t_prev: jax.Array,
    eps_pred: jax.Array,
    *,
    eta: float = 0.0,
    key: jax.Array | None = None,
) -> jax.Array:
    """One DDIM step (Song et al. 2020), enabling few-step sampling.

    Not in the reference; an accelerated sampler the framework adds. With
    eta=0 the update is deterministic:
      x0_hat = (x - sqrt(1-acp_t) * eps) / sqrt(acp_t)
      x_prev = sqrt(acp_prev) * x0_hat + sqrt(1-acp_prev-sigma^2)*eps + sigma*z
    ``t_prev`` < 0 means "final step": return x0_hat.
    """
    acp_t = _bcast(sched.alphas_cumprod, t, x.ndim)
    t_prev_c = jnp.clip(t_prev, 0, sched.timesteps - 1)
    acp_prev = _bcast(sched.alphas_cumprod, t_prev_c, x.ndim)
    is_final = (t_prev < 0).astype(x.dtype).reshape(
        t_prev.shape[0], *((1,) * (x.ndim - 1))
    )
    acp_prev = acp_prev * (1.0 - is_final) + is_final  # acp_{-1} := 1

    x0_hat = (x - jnp.sqrt(1.0 - acp_t) * eps_pred) / jnp.sqrt(acp_t)
    sigma = eta * jnp.sqrt(
        (1.0 - acp_prev) / (1.0 - acp_t) * (1.0 - acp_t / acp_prev)
    )
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - acp_prev - sigma**2, 0.0)) * eps_pred
    x_prev = jnp.sqrt(acp_prev) * x0_hat + dir_xt
    if eta > 0.0:
        if key is None:
            raise ValueError("eta > 0 requires a PRNG key")
        z = jax.random.normal(key, x.shape, dtype=x.dtype)
        x_prev = x_prev + (1.0 - is_final) * sigma * z
    return x_prev


def ddpm_loss(
    sched: DiffusionSchedule,
    denoise_fn: DenoiseFn,
    x_start: jax.Array,
    t: jax.Array,
    noise: jax.Array,
) -> jax.Array:
    """Epsilon-prediction MSE (reference src/mnist.py:154-158)."""
    x_noisy = q_sample(sched, x_start, t, noise)
    eps_pred = denoise_fn(x_noisy, t)
    return jnp.mean((eps_pred - noise) ** 2)
