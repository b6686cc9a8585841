"""Tests for FLOPs accounting / MFU (perf.py) and bf16 mixed precision."""

import jax
import jax.numpy as jnp
import pytest

from tinydiffusionmodels_tpu import perf
from tinydiffusionmodels_tpu.train.precision import (
    cast_floating,
    resolve_compute_dtype,
)


class TestPeaks:
    def test_known_kinds(self):
        class D:
            def __init__(self, kind):
                self.device_kind = kind

        assert perf.device_peak_flops(D("TPU v5 lite")) == 197e12
        assert perf.device_peak_flops(D("TPU v4")) == 275e12
        assert perf.device_peak_flops(D("TPU v6 lite")) == 918e12
        assert perf.device_peak_flops(D("TPU v5p")) == 459e12
        # f32 (HIGHEST precision) is half the bf16 MXU rate
        assert perf.device_peak_flops(D("TPU v4"), dtype="f32") == 275e12 / 2

    def test_unknown_kind_is_none(self):
        class D:
            device_kind = "Colossus Mk7"

        assert perf.device_peak_flops(D()) is None
        assert perf.device_hbm_bandwidth(D()) is None

    def test_cpu_backend_has_no_peak(self):
        # The suite runs on the forced-CPU backend (conftest).
        assert perf.device_peak_flops() is None


class TestCompiledFlops:
    def test_matmul_flops_exact(self):
        n = 128
        a = jnp.zeros((n, n), jnp.float32)
        flops = perf.compiled_flops(lambda x: x @ x, a)
        assert flops == pytest.approx(2 * n**3, rel=0.01)

    def test_scan_body_counted_once(self):
        # Documents WHY bench.py measures the unscanned step: XLA cost
        # analysis counts a scan body once regardless of trip count.
        n = 64
        a = jnp.eye(n)

        def scanned(x):
            return jax.lax.scan(lambda c, _: (c @ a, None), x, None,
                                length=10)[0]

        flops = perf.compiled_flops(scanned, a)
        assert flops is not None
        assert flops < 3 * 2 * n**3  # ~1 matmul, not 10

    def test_mfu_math(self):
        class D:
            device_kind = "TPU v5 lite"

        # 197e12 flops/unit at 0.5 units/s = half the peak
        assert perf.mfu(197e12, 0.5, device=D()) == pytest.approx(0.5)
        assert perf.mfu(None, 100.0, device=D()) is None


class TestPrecision:
    def test_cast_floating_leaves_ints(self):
        tree = {"w": jnp.zeros((2,), jnp.float32),
                "i": jnp.zeros((2,), jnp.int32)}
        out = cast_floating(tree, jnp.bfloat16)
        assert out["w"].dtype == jnp.bfloat16
        assert out["i"].dtype == jnp.int32
        assert cast_floating(tree, None) is tree

    def test_resolve_names(self):
        assert resolve_compute_dtype(None) is None
        assert resolve_compute_dtype("f32") is None
        assert resolve_compute_dtype("bf16") == jnp.bfloat16
        with pytest.raises(ValueError):
            resolve_compute_dtype("fp8")

    def test_mnist_bf16_step_keeps_f32_master(self):
        from tinydiffusionmodels_tpu.core import make_schedule
        from tinydiffusionmodels_tpu.models import init_unet
        from tinydiffusionmodels_tpu.train.mnist_train import make_train_step
        from tinydiffusionmodels_tpu.train.optim import adamw
        from tinydiffusionmodels_tpu.train.state import TrainState

        sched = make_schedule(10)
        tx = adamw(1e-3)
        state = TrainState.create(init_unet(jax.random.PRNGKey(0)), tx)
        step = make_train_step(sched, tx, compute_dtype=jnp.bfloat16)
        batch = jax.random.normal(jax.random.PRNGKey(1), (4, 28, 28, 1))
        state, loss = step(state, batch, jax.random.PRNGKey(2))
        assert jnp.isfinite(loss)
        assert loss.dtype == jnp.float32
        # master params and optimizer state stay f32
        leaves = jax.tree_util.tree_leaves(state.params)
        assert all(l.dtype == jnp.float32 for l in leaves)

    def test_text_bf16_step_close_to_f32(self):
        from tinydiffusionmodels_tpu.core import make_schedule
        from tinydiffusionmodels_tpu.models import (
            init_learned_embedding,
            init_learned_rounding,
            init_tiny_transformer,
        )
        from tinydiffusionmodels_tpu.models.transformer import (
            TransformerConfig,
        )
        from tinydiffusionmodels_tpu.train.optim import adamw
        from tinydiffusionmodels_tpu.train.state import TrainState
        from tinydiffusionmodels_tpu.train.text_train import (
            make_text_train_step,
        )

        sched = make_schedule(10)
        cfg = TransformerConfig(dim=32, n_heads=4, depth=2, dropout=0.0,
                                ffn_dim=64, timesteps=10)
        key = jax.random.PRNGKey(0)
        joint = {
            "diffusion_model": init_tiny_transformer(key, cfg),
            "rounding_fn": init_learned_rounding(
                jax.random.fold_in(key, 1), 32, 50
            ),
            "embedding_fn": init_learned_embedding(
                jax.random.fold_in(key, 2), 50, 32
            ),
        }
        tx = adamw(1e-4)
        tokens = jax.random.randint(jax.random.PRNGKey(3), (4, 8), 0, 50)
        w = jnp.asarray(1.0)
        k = jax.random.PRNGKey(4)

        losses = {}
        for name, dt in [("f32", None), ("bf16", jnp.bfloat16)]:
            # deep-copy: the jitted step donates its state buffers
            state = TrainState.create(
                jax.tree_util.tree_map(jnp.copy, joint), tx
            )
            step = make_text_train_step(
                sched, cfg, tx, use_learned_embeddings=True,
                compute_dtype=dt,
            )
            _, (_, _, total) = step(state, tokens, w, k)
            losses[name] = float(total)
        # bf16 forward must agree with f32 to bf16 resolution (~1%)
        assert losses["bf16"] == pytest.approx(losses["f32"], rel=0.05)
