"""Explicit shard_map data-parallel train step.

The default DP path relies on GSPMD: shard the batch, replicate params, and
let XLA insert the gradient all-reduce. This module is the *explicit*
formulation of the same program — per-device local grads + a hand-placed
``psum`` over the 'data' axis inside ``jax.shard_map`` — useful when you
want manual control of where the collective happens (e.g. to overlap it, or
to fuse with optimizer logic) and as executable documentation of what GSPMD
synthesizes. Both paths are asserted numerically identical in
tests/test_parallel.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from tinydiffusionmodels_tpu.core.diffusion import q_sample
from tinydiffusionmodels_tpu.core.rng import substream
from tinydiffusionmodels_tpu.core.schedule import DiffusionSchedule
from tinydiffusionmodels_tpu.models import unet_apply
from tinydiffusionmodels_tpu.train.state import TrainState


def make_shardmap_train_step(sched: DiffusionSchedule, tx, mesh: Mesh,
                             axis: str = "data"):
    """(state, batch (B, H, W, C) sharded on ``axis``, key) -> (state, loss).

    Semantics contract: identical update to train.mnist_train.make_train_step
    given the same key. The per-device timestep/noise draw uses the SAME
    global key + per-sample fold so the noise stream matches the global
    formulation regardless of device count.
    """
    n_dev = mesh.shape[axis]

    def local_loss(params, batch, t, noise):
        x_noisy = q_sample(sched, batch, t, noise)
        eps_pred = unet_apply(params, x_noisy, t, timesteps=sched.timesteps)
        # Sum (not mean): the global mean is assembled after the psum so the
        # result is exactly the single-device MSE over the global batch.
        return jnp.sum((eps_pred - noise) ** 2)

    def per_device(state, batch, t, noise, global_count):
        loss_sum, grads_sum = jax.value_and_grad(local_loss)(
            state.params, batch, t, noise
        )
        # The explicit collective: one psum over ICI for loss and grads.
        loss_sum = jax.lax.psum(loss_sum, axis)
        grads_sum = jax.lax.psum(grads_sum, axis)
        loss = loss_sum / global_count
        grads = jax.tree_util.tree_map(lambda g: g / global_count, grads_sum)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, key):
        b = batch.shape[0]
        # Draw t/noise globally (replicated computation) then shard with the
        # batch, so the stream is device-count-invariant.
        t = jax.random.randint(substream(key, "timesteps"), (b,), 0,
                               sched.timesteps)
        noise = jax.random.normal(substream(key, "noise"), batch.shape)
        global_count = jnp.asarray(batch.size, dtype=jnp.float32)

        sharded = jax.shard_map(
            lambda s, bt, tt, nn: per_device(s, bt, tt, nn, global_count),
            mesh=mesh,
            in_specs=(
                P(),                                  # state replicated
                P(axis, *([None] * (batch.ndim - 1))),
                P(axis),
                P(axis, *([None] * (noise.ndim - 1))),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return sharded(state, batch, t, noise)

    return step
