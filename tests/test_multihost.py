"""Multi-host helpers under single-process semantics (identity behavior),
plus the global-array assembly path on the 8-device mesh."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tinydiffusionmodels_tpu.parallel import make_mesh
from tinydiffusionmodels_tpu.parallel.multihost import (
    initialize,
    make_global_batch,
    process_batch_slice,
)


class TestMultihost:
    def test_initialize_noop_single_process(self, monkeypatch):
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
        initialize()  # must not raise or try to connect anywhere

    def test_batch_slice_single_process(self):
        s = process_batch_slice(64)
        assert (s.start, s.stop) == (0, 64)

    def test_batch_slice_divisibility(self):
        # Single process: everything divides; the error path needs n > 1,
        # so just check the formula via the public surface.
        assert process_batch_slice(8) == slice(0, 8)

    def test_make_global_batch_sharded(self, eight_devices):
        mesh = make_mesh()
        local = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
        arr = make_global_batch(mesh, local)
        assert arr.shape == (16, 4)
        assert arr.sharding.spec == P("data", None)
        np.testing.assert_array_equal(np.asarray(arr), local)

    def test_global_batch_feeds_train_step(self, eight_devices):
        from tinydiffusionmodels_tpu.core import make_schedule
        from tinydiffusionmodels_tpu.models import init_unet
        from tinydiffusionmodels_tpu.parallel import replicate_tree
        from tinydiffusionmodels_tpu.train.mnist_train import make_train_step
        from tinydiffusionmodels_tpu.train.optim import adamw
        from tinydiffusionmodels_tpu.train.state import TrainState

        mesh = make_mesh()
        sched = make_schedule(50)
        tx = adamw(1e-3)
        state = replicate_tree(
            mesh, TrainState.create(init_unet(jax.random.PRNGKey(0)), tx)
        )
        step = make_train_step(sched, tx)
        local = np.random.default_rng(0).standard_normal(
            (16, 28, 28, 1)
        ).astype(np.float32)
        batch = make_global_batch(mesh, local)
        state, loss = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
