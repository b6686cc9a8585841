"""The reverse-diffusion sampling loop as a single lax.scan.

The reference drives 1000 reverse steps from Python, dispatching a fresh
forward per step (src/mnist.py:105-107,191-193; src/shakespeare.py:383-385).
Here the whole trajectory is one ``lax.scan`` inside one jitted program: the
state x never leaves HBM, per-step noise keys are folded from one root key,
and the t==0 noise-skip is a masked elementwise select — the north-star
"HBM-resident 1000-step sampler" (BASELINE.json).

Also provides strided DDIM sampling (fewer steps, same trained model) as the
framework's accelerated path.
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
) -> jax.Array:
    """Run the full reverse process from N(0, I) noise.

    denoise_fn: (x_t, t) -> eps_hat (already closed over params).
    method 'ancestral': DDPM, always sched.timesteps steps (reference parity).
    method 'ddim': ``num_steps`` strided DDIM steps (default 50).
    """
    init_key, loop_key = jax.random.split(key)
    x0 = jax.random.normal(init_key, shape, dtype=dtype)
    batch = shape[0]

    if method == "ancestral":
        ts = jnp.arange(sched.timesteps - 1, -1, -1)

        def step(x, t):
            t_b = jnp.full((batch,), t, dtype=jnp.int32)
            eps = denoise_fn(x, t_b)
            x = p_sample(sched, x, t_b, eps, jax.random.fold_in(loop_key, t))
            return x, None

        x, _ = jax.lax.scan(step, x0, ts)
        return x

    if method == "ddim":
        n = num_steps or 50
        # Strided timestep ladder t_i = round(i * T / n), descending, with
        # t_prev below each; final t_prev = -1 means "emit x0_hat".
        ts = jnp.linspace(0, sched.timesteps - 1, n).round().astype(jnp.int32)[::-1]
        ts_prev = jnp.concatenate([ts[1:], jnp.array([-1], dtype=jnp.int32)])

        def dstep(x, tt):
            t, t_prev = tt
            t_b = jnp.full((batch,), t, dtype=jnp.int32)
            tp_b = jnp.full((batch,), t_prev, dtype=jnp.int32)
            eps = denoise_fn(x, t_b)
            x = ddim_step(
                sched, x, t_b, tp_b, eps,
                eta=eta,
                key=jax.random.fold_in(loop_key, t) if eta > 0 else None,
            )
            return x, None

        x, _ = jax.lax.scan(dstep, x0, (ts, ts_prev))
        return x

    raise ValueError(f"unknown sampling method: {method!r}")
