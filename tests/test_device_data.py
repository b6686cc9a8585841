"""Device-resident dataset path (TDM_DEVICE_DATA).

On the remote-tunnel TPU, shipping image batches host->device capped MNIST
training at ~36 it/s (188 MB/epoch over the tunnel) while the step itself
runs at ~1,100 it/s. The device path puts the dataset in HBM once and
ships (chunk, B) int32 indices instead; the gather runs on device. Batch
order comes from the same batch_iterator over indices, so training is
bit-identical to the host path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tinydiffusionmodels_tpu.core import make_schedule
from tinydiffusionmodels_tpu.models.unet import init_unet
from tinydiffusionmodels_tpu.parallel import (
    make_mesh,
    replicate_tree,
    shard_stacked_batch,
)
from tinydiffusionmodels_tpu.train.mnist_train import (
    make_train_step_multi,
    make_train_step_multi_ema,
)
from tinydiffusionmodels_tpu.train.optim import adamw
from tinydiffusionmodels_tpu.train.state import TrainState


def _setup():
    sched = make_schedule(timesteps=10)
    tx = adamw(1e-3)
    key = jax.random.PRNGKey(0)
    params = init_unet(key)
    data = np.random.RandomState(0).randn(64, 28, 28, 1).astype(np.float32)
    mesh = make_mesh()
    return sched, tx, params, data, mesh


def test_index_path_matches_host_path_bitwise():
    sched, tx, params, data, mesh = _setup()
    key = jax.random.PRNGKey(1)
    idx = np.arange(64, dtype=np.int32).reshape(2, 32)  # (K, B)
    batches_host = shard_stacked_batch(mesh, jnp.asarray(data.reshape(2, 32, 28, 28, 1)))
    batches_idx = shard_stacked_batch(mesh, jnp.asarray(idx))
    dataset_dev = replicate_tree(mesh, jnp.asarray(data))

    host_step = make_train_step_multi(sched, tx)
    idx_step = make_train_step_multi(sched, tx, dataset=dataset_dev)

    # Independent copies: the jitted steps donate their state, so sharing
    # leaves between the two states would use deleted buffers.
    s0 = replicate_tree(
        mesh,
        TrainState.create(jax.tree_util.tree_map(jnp.copy, params), tx),
    )
    s1 = replicate_tree(
        mesh,
        TrainState.create(jax.tree_util.tree_map(jnp.copy, params), tx),
    )
    s0, loss_host = host_step(s0, batches_host, key)
    s1, loss_idx = idx_step(s1, batches_idx, key)
    assert float(loss_host) == float(loss_idx)
    for a, b in zip(
        jax.tree_util.tree_leaves(s0.params),
        jax.tree_util.tree_leaves(s1.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_index_path_ema_variant():
    sched, tx, params, data, mesh = _setup()
    key = jax.random.PRNGKey(2)
    idx = np.arange(32, dtype=np.int32).reshape(1, 32)
    dataset_dev = replicate_tree(mesh, jnp.asarray(data))
    step = make_train_step_multi_ema(
        sched, tx, ema_decay=0.99, dataset=dataset_dev
    )
    state = replicate_tree(mesh, TrainState.create(params, tx))
    ema = replicate_tree(
        mesh, jax.tree_util.tree_map(jnp.copy, state.params)
    )
    state, ema, loss = step(
        state, ema, shard_stacked_batch(mesh, jnp.asarray(idx)), key
    )
    assert np.isfinite(float(loss))


def test_cli_train_uses_device_data(tmp_path, monkeypatch):
    """End-to-end: TDM_DEVICE_DATA=1 trains and writes the same-format
    checkpoint."""
    import os

    from tinydiffusionmodels_tpu import mnist as mnist_cli

    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("TDM_DEVICE_DATA", "1")
    monkeypatch.setenv("TDM_DATA_LIMIT", "256")
    mnist_cli.main(
        ["--train", "--epochs", "1", "--batch_size", "32",
         "--no_epoch_samples", "--ckpt", str(tmp_path / "m.pth")]
    )
    assert os.path.exists(tmp_path / "m.pth")


class TestSplitDecoder:
    """Concat-free rb4 (ops.fused_resblock_split) — exact on CPU."""

    def test_split_matches_concat(self):
        import jax
        import jax.numpy as jnp

        from tinydiffusionmodels_tpu import ops
        from tinydiffusionmodels_tpu.models.unet import _init_resblock

        key = jax.random.PRNGKey(0)
        p = _init_resblock(key, 96, 32)
        a = jax.random.normal(key, (2, 8, 8, 64))
        b = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 8, 32))
        tb = jax.random.normal(jax.random.fold_in(key, 2), (2, 1, 1, 32))
        ref = ops.fused_resblock(jnp.concatenate([a, b], -1), p, tb)
        split = ops.fused_resblock_split(a, b, p, tb)
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(split), rtol=2e-5, atol=2e-5
        )

    def test_unet_routing_modes(self, monkeypatch):
        import jax
        import jax.numpy as jnp

        from tinydiffusionmodels_tpu.models.unet import init_unet, unet_apply

        key = jax.random.PRNGKey(0)
        p = init_unet(key)
        x = jax.random.normal(key, (4, 28, 28, 1))
        t = jnp.asarray([1, 2, 3, 4])
        monkeypatch.setenv("TDM_SPLIT_DECODER", "0")
        ref = unet_apply(p, x, t)
        monkeypatch.setenv("TDM_SPLIT_DECODER", "1")
        out = unet_apply(p, x, t)
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(out), rtol=2e-5, atol=2e-5
        )
