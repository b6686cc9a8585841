"""The reverse-diffusion sampling loop as a single lax.scan.

The reference drives 1000 reverse steps from Python, dispatching a fresh
forward per step (src/mnist.py:105-107,191-193; src/shakespeare.py:383-385).
Here the whole trajectory is one ``lax.scan`` inside one jitted program: the
state x never leaves HBM, per-step noise keys are folded from one root key,
and the t==0 noise-skip is a masked elementwise select — the north-star
"HBM-resident 1000-step sampler" (BASELINE.json).

Also provides strided DDIM sampling (fewer steps, same trained model) as the
framework's accelerated path, and a self-conditioning carry
(``self_cond=True``): the denoiser's x0 estimate from step k is fed back as
an input at step k+1 (Analog Bits, Chen et al. 2022 — PAPERS.md).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from tinydiffusionmodels_tpu.core.diffusion import ddim_step, p_sample
from tinydiffusionmodels_tpu.core.schedule import DiffusionSchedule

DenoiseFn = Callable[[jax.Array, jax.Array], jax.Array]


def sample_loop(
    denoise_fn: DenoiseFn,
    sched: DiffusionSchedule,
    shape: tuple[int, ...],
    key: jax.Array,
    *,
    method: str = "ancestral",
    num_steps: int | None = None,
    eta: float = 0.0,
    dtype=jnp.float32,
    self_cond: bool = False,
    temperature: float = 1.0,
) -> jax.Array:
    """Run the full reverse process from N(0, I) noise.

    denoise_fn: (x_t, t) -> eps_hat (already closed over params); with
    ``self_cond=True`` the signature is (x_t, t, x0_prev) -> (eps_hat,
    x0_est) and x0_est is carried to the next step (zeros at the first).
    method 'ancestral': DDPM, always sched.timesteps steps (reference parity).
    method 'ddim': ``num_steps`` strided DDIM steps (default 50).
    method 'dpm++': DPM-Solver++(2M), ``num_steps`` steps (default 20).

    ``temperature``: scales the per-step injected noise on the ancestral
    path (framework extension; 1.0 = reference semantics). The initial
    x_T ~ N(0, I) draw is NOT scaled — the trained prior at t=T is unit
    variance regardless of how much noise the reverse path re-injects.
    DDIM's knob is ``eta``; dpm++ is deterministic. Passing
    temperature != 1 with those solvers is rejected rather than silently
    ignored (a round-4 ladder cell was bit-identical to its temperature=1
    twin because of exactly this no-op).
    """
    if temperature != 1.0 and method != "ancestral":
        raise ValueError(
            f"temperature={temperature} has no effect with method="
            f"'{method}': dpm++ is deterministic and ddim's noise knob is "
            "eta. Use method='ancestral' (or eta for ddim)."
        )
    init_key, loop_key = jax.random.split(key)
    x0 = jax.random.normal(init_key, shape, dtype=dtype)
    batch = shape[0]

    if self_cond:
        sc0 = jnp.zeros(shape, dtype=dtype)

        def call(x, t_b, sc):
            return denoise_fn(x, t_b, sc)
    else:
        # Scalar zero passthrough: keeps the scan carry structure uniform
        # at no cost (XLA carries one scalar).
        sc0 = jnp.zeros((), dtype=dtype)

        def call(x, t_b, sc):
            return denoise_fn(x, t_b), sc

    if method == "ancestral":
        ts = jnp.arange(sched.timesteps - 1, -1, -1)

        def step(carry, t):
            x, sc = carry
            t_b = jnp.full((batch,), t, dtype=jnp.int32)
            eps, sc = call(x, t_b, sc)
            x = p_sample(sched, x, t_b, eps, jax.random.fold_in(loop_key, t),
                         noise_scale=temperature)
            return (x, sc), None

        # unroll=2: +5% on the latency-bound small-denoiser (text) sampler,
        # neutral on the compute-bound UNet sampler (measured on v5e).
        (x, _), _ = jax.lax.scan(step, (x0, sc0), ts, unroll=2)
        return x

    if method == "dpm++":
        # DPM-Solver++(2M) (Lu et al. 2022, arXiv:2211.01095 — PAPERS.md):
        # second-order multistep in log-SNR space on the data prediction.
        # Typically matches ancestral quality in 15-25 steps.
        n = num_steps or 20
        ts = jnp.linspace(0, sched.timesteps - 1, n + 1).round().astype(
            jnp.int32
        )[::-1]  # t_0=T-1 ... t_n=0

        acp = sched.alphas_cumprod
        alphas = jnp.sqrt(jnp.take(acp, ts))
        sigmas = jnp.sqrt(jnp.maximum(1.0 - jnp.take(acp, ts), 1e-12))
        lams = jnp.log(alphas / sigmas)

        def bshape(v):
            return v.reshape(*([1] * len(shape)))

        def dstep(carry, i):
            x, x0_prev, h_prev, sc = carry
            t_cur = ts[i]
            t_b = jnp.full((batch,), t_cur, dtype=jnp.int32)
            eps, sc = call(x, t_b, sc)
            a_cur, s_cur = bshape(alphas[i]), bshape(sigmas[i])
            a_nxt, s_nxt = bshape(alphas[i + 1]), bshape(sigmas[i + 1])
            x0 = (x - s_cur * eps) / a_cur
            h = lams[i + 1] - lams[i]
            r = h_prev / h
            # First step (h_prev=0 -> r=0 guarded): first-order update.
            use_2m = (i > 0).astype(x.dtype)
            r_safe = jnp.where(i > 0, r, 1.0)
            d = x0 + use_2m * (0.5 / r_safe) * (x0 - x0_prev)
            x_next = (s_nxt / s_cur) * x - a_nxt * jnp.expm1(-h) * d
            return (x_next, x0, h, sc), None

        (x, _, _, _), _ = jax.lax.scan(
            dstep, (x0, jnp.zeros_like(x0), jnp.zeros(()), sc0),
            jnp.arange(n), unroll=2,
        )
        return x

    if method == "ddim":
        n = num_steps or 50
        # Strided timestep ladder t_i = round(i * T / n), descending, with
        # t_prev below each; final t_prev = -1 means "emit x0_hat".
        ts = jnp.linspace(0, sched.timesteps - 1, n).round().astype(jnp.int32)[::-1]
        ts_prev = jnp.concatenate([ts[1:], jnp.array([-1], dtype=jnp.int32)])

        def dstep(carry, tt):
            x, sc = carry
            t, t_prev = tt
            t_b = jnp.full((batch,), t, dtype=jnp.int32)
            tp_b = jnp.full((batch,), t_prev, dtype=jnp.int32)
            eps, sc = call(x, t_b, sc)
            x = ddim_step(
                sched, x, t_b, tp_b, eps,
                eta=eta,
                key=jax.random.fold_in(loop_key, t) if eta > 0 else None,
            )
            return (x, sc), None

        (x, _), _ = jax.lax.scan(dstep, (x0, sc0), (ts, ts_prev), unroll=2)
        return x

    raise ValueError(f"unknown sampling method: {method!r}")
