"""The explicit shard_map DP step must be numerically identical to the
GSPMD (jit + sharded batch) step and to single-device execution."""

import jax
import numpy as np
import pytest

from tinydiffusionmodels_tpu.core import make_schedule
from tinydiffusionmodels_tpu.models import init_unet
from tinydiffusionmodels_tpu.parallel import make_mesh, replicate_tree, shard_batch
from tinydiffusionmodels_tpu.parallel.shard_map_step import (
    make_shardmap_train_step,
)
from tinydiffusionmodels_tpu.train.mnist_train import make_train_step
from tinydiffusionmodels_tpu.train.optim import adamw
from tinydiffusionmodels_tpu.train.state import TrainState


class TestShardMapStep:
    def test_matches_gspmd_step(self, eight_devices):
        sched = make_schedule(100)
        tx = adamw(1e-3)
        mesh = make_mesh()
        batch = jax.random.normal(jax.random.PRNGKey(1), (16, 28, 28, 1))
        key = jax.random.PRNGKey(2)

        # GSPMD path.
        state_a = replicate_tree(
            mesh, TrainState.create(init_unet(jax.random.PRNGKey(0)), tx)
        )
        step_a = make_train_step(sched, tx)
        state_a, loss_a = step_a(state_a, shard_batch(mesh, batch), key)

        # Explicit shard_map path.
        state_b = replicate_tree(
            mesh, TrainState.create(init_unet(jax.random.PRNGKey(0)), tx)
        )
        step_b = make_shardmap_train_step(sched, tx, mesh)
        state_b, loss_b = step_b(state_b, shard_batch(mesh, batch), key)

        np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(jax.device_get(state_a.params)),
            jax.tree_util.tree_leaves(jax.device_get(state_b.params)),
        ):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

    def test_multiple_steps_finite(self, eight_devices):
        sched = make_schedule(50)
        tx = adamw(1e-3)
        mesh = make_mesh()
        state = replicate_tree(
            mesh, TrainState.create(init_unet(jax.random.PRNGKey(0)), tx)
        )
        step = make_shardmap_train_step(sched, tx, mesh)
        batch = shard_batch(
            mesh, jax.random.normal(jax.random.PRNGKey(1), (16, 28, 28, 1))
        )
        for i in range(3):
            state, loss = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(loss))
        assert int(state.step) == 3
