"""Multi-device tests on the virtual 8-CPU mesh (conftest forces
--xla_force_host_platform_device_count=8): data-parallel training is
numerically equivalent to single-device, and tensor-parallel sharding rules
produce the same transformer outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tinydiffusionmodels_tpu.core import make_schedule
from tinydiffusionmodels_tpu.models import (
    init_unet,
    init_tiny_transformer,
    tiny_transformer_apply,
)
from tinydiffusionmodels_tpu.models.transformer import TransformerConfig
from tinydiffusionmodels_tpu.parallel import (
    make_mesh,
    shard_batch,
    replicate_tree,
    transformer_tp_rules,
    apply_rules,
)
from tinydiffusionmodels_tpu.train.mnist_train import make_train_step
from tinydiffusionmodels_tpu.train.optim import adamw
from tinydiffusionmodels_tpu.train.state import TrainState


class TestMesh:
    def test_default_mesh_all_data(self, eight_devices):
        mesh = make_mesh()
        assert mesh.shape["data"] == 8

    def test_2d_mesh(self, eight_devices):
        mesh = make_mesh({"data": 4, "model": 2})
        assert mesh.shape == {"data": 4, "model": 2}

    def test_minus_one_axis(self, eight_devices):
        mesh = make_mesh({"data": -1, "model": 2})
        assert mesh.shape["data"] == 4

    def test_bad_shape_raises(self, eight_devices):
        with pytest.raises(ValueError):
            make_mesh({"data": 3})

    def test_shard_batch_layout(self, eight_devices):
        mesh = make_mesh()
        x = shard_batch(mesh, np.zeros((16, 4), np.float32))
        assert x.sharding.spec == P("data", None)


class TestDataParallelEquivalence:
    def test_dp_train_step_matches_single_device(self, eight_devices):
        """One DP step over 8 devices must equal the same step on one device
        (same batch, same key): GSPMD's psum-of-grads is exact for MSE mean."""
        sched = make_schedule(100)
        tx = adamw(1e-3)
        params = init_unet(jax.random.PRNGKey(0))
        batch = jax.random.normal(jax.random.PRNGKey(1), (16, 28, 28, 1))
        key = jax.random.PRNGKey(2)

        # Single device (mesh of 1): plain jit.
        step = make_train_step(sched, tx)
        state1 = TrainState.create(params, tx)
        state1, loss1 = step(state1, batch, key)

        # 8-device DP. Params re-initialized with the same key: the first
        # train step donated (and thus deleted) state1's buffers.
        mesh = make_mesh()
        step8 = make_train_step(sched, tx)
        params8 = init_unet(jax.random.PRNGKey(0))
        state8 = replicate_tree(mesh, TrainState.create(params8, tx))
        sharded = shard_batch(mesh, batch)
        state8, loss8 = step8(state8, sharded, key)

        np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
        l1 = jax.tree_util.tree_leaves(jax.device_get(state1.params))
        l8 = jax.tree_util.tree_leaves(jax.device_get(state8.params))
        for a, b in zip(l1, l8):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

    def test_dp_multi_step_stable(self, eight_devices):
        sched = make_schedule(100)
        tx = adamw(1e-3)
        mesh = make_mesh()
        state = replicate_tree(
            mesh, TrainState.create(init_unet(jax.random.PRNGKey(0)), tx)
        )
        step = make_train_step(sched, tx)
        batch = shard_batch(
            mesh, jax.random.normal(jax.random.PRNGKey(1), (32, 28, 28, 1))
        )
        for i in range(3):
            state, loss = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(loss))


class TestTensorParallel:
    def test_tp_sharded_forward_matches_replicated(self, eight_devices):
        """Transformer forward with Megatron-sharded params over the 'model'
        axis must match the replicated forward (GSPMD inserts the
        all-reduce)."""
        mesh = make_mesh({"data": 4, "model": 2})
        cfg = TransformerConfig(dim=64, n_heads=4, depth=2, dropout=0.0,
                                ffn_dim=128)
        params = init_tiny_transformer(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 64))
        t = jnp.arange(8)

        ref = tiny_transformer_apply(params, x, t, cfg)

        tp_params = apply_rules(mesh, params, transformer_tp_rules("model"))
        x_sharded = shard_batch(mesh, x)
        t_sharded = shard_batch(mesh, t)
        out = jax.jit(
            lambda p, xx, tt: tiny_transformer_apply(p, xx, tt, cfg)
        )(tp_params, x_sharded, t_sharded)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
        )

    def test_tp_param_layout(self, eight_devices):
        mesh = make_mesh({"data": 4, "model": 2})
        params = init_tiny_transformer(
            jax.random.PRNGKey(0),
            TransformerConfig(dim=64, depth=1, ffn_dim=128),
        )
        tp = apply_rules(mesh, params, transformer_tp_rules("model"))
        in_proj = tp["layers"][0]["self_attn"]["in_proj"]["w"]
        assert in_proj.sharding.spec == P(None, "model")
        out_proj = tp["layers"][0]["self_attn"]["out_proj"]["w"]
        assert out_proj.sharding.spec == P("model", None)
