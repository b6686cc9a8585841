"""EMA weight tracking in the MNIST trainer (framework extension; the
reference has no EMA — standard DDPM practice, Ho et al. 2020)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinydiffusionmodels_tpu.core import make_schedule
from tinydiffusionmodels_tpu.models import init_unet
from tinydiffusionmodels_tpu.train.mnist_train import (
    ema_update,
    make_train_step_multi,
    make_train_step_multi_ema,
)
from tinydiffusionmodels_tpu.train.optim import adamw
from tinydiffusionmodels_tpu.train.state import TrainState


class TestEmaUpdate:
    def test_closed_form(self):
        """n steps of ema_update match d^n * e0 + (1-d) * sum d^k p."""
        d = 0.9
        e = {"w": jnp.asarray(1.0)}
        seq = [2.0, 3.0, 5.0]
        for p in seq:
            e = ema_update(e, {"w": jnp.asarray(p)}, d)
        expected = 1.0
        for p in seq:
            expected = expected * d + p * (1 - d)
        np.testing.assert_allclose(float(e["w"]), expected, rtol=1e-6)

    def test_decay_one_freezes(self):
        e = {"w": jnp.asarray(4.0)}
        out = ema_update(e, {"w": jnp.asarray(100.0)}, 1.0)
        assert float(out["w"]) == 4.0

    def test_decay_zero_tracks(self):
        e = {"w": jnp.asarray(4.0)}
        out = ema_update(e, {"w": jnp.asarray(100.0)}, 0.0)
        assert float(out["w"]) == 100.0


class TestEmaTrainStep:
    def _setup(self):
        sched = make_schedule(10)
        tx = adamw(1e-3)
        params = init_unet(jax.random.PRNGKey(0))
        batches = jax.random.normal(jax.random.PRNGKey(1), (3, 4, 28, 28, 1))
        return sched, tx, params, batches

    def test_decay_zero_ema_equals_params(self):
        sched, tx, params, batches = self._setup()
        state = TrainState.create(params, tx)
        ema = jax.tree_util.tree_map(jnp.copy, params)
        step = make_train_step_multi_ema(sched, tx, ema_decay=0.0)
        state, ema, _ = step(state, ema, batches, jax.random.PRNGKey(2))
        for a, b in zip(
            jax.tree_util.tree_leaves(ema),
            jax.tree_util.tree_leaves(state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_param_trajectory_matches_plain_step(self):
        """The EMA variant's parameter/optimizer updates are identical to
        the plain multi step (EMA rides along without touching them)."""
        sched, tx, params, batches = self._setup()
        key = jax.random.PRNGKey(3)

        s_plain = TrainState.create(jax.tree_util.tree_map(jnp.copy, params), tx)
        s_plain, loss_plain = make_train_step_multi(sched, tx)(
            s_plain, batches, key
        )

        s_ema = TrainState.create(jax.tree_util.tree_map(jnp.copy, params), tx)
        ema = jax.tree_util.tree_map(jnp.copy, params)
        s_ema, ema, loss_ema = make_train_step_multi_ema(
            sched, tx, ema_decay=0.999
        )(s_ema, ema, batches, key)

        np.testing.assert_allclose(
            float(loss_ema), float(loss_plain), rtol=1e-6
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(s_ema.params),
            jax.tree_util.tree_leaves(s_plain.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_high_decay_ema_lags_params(self):
        sched, tx, params, batches = self._setup()
        # Copies into the donating step — `params` must stay alive for the
        # distance comparison below.
        state = TrainState.create(jax.tree_util.tree_map(jnp.copy, params), tx)
        ema0 = jax.tree_util.tree_map(jnp.copy, params)
        step = make_train_step_multi_ema(sched, tx, ema_decay=0.99)
        state, ema, _ = step(state, ema0, batches, jax.random.PRNGKey(2))
        # EMA moved from init, but far less than the raw params did.
        d_params = sum(
            float(jnp.sum(jnp.abs(a - b)))
            for a, b in zip(
                jax.tree_util.tree_leaves(state.params),
                jax.tree_util.tree_leaves(params),
            )
        )
        d_ema = sum(
            float(jnp.sum(jnp.abs(a - b)))
            for a, b in zip(
                jax.tree_util.tree_leaves(ema),
                jax.tree_util.tree_leaves(params),
            )
        )
        assert 0 < d_ema < 0.1 * d_params


class TestEmaTrainLoop:
    def test_train_with_ema_checkpoint_roundtrip(self, tmp_path, monkeypatch,
                                                 eight_devices):
        """End-to-end: EMA training writes a loadable reference-format
        checkpoint of the EMA weights, and resume state carries the EMA."""
        from tinydiffusionmodels_tpu.io import load_checkpoint
        from tinydiffusionmodels_tpu.train import mnist_train

        monkeypatch.setenv("TDM_DATA_LIMIT", "64")
        monkeypatch.setenv("TDM_SCAN_CHUNK", "2")
        ckpt = tmp_path / "ema.pth"
        params = mnist_train.train(
            epochs=1, batch_size=16, ckpt_path=str(ckpt),
            sample_every_epoch=False, ema_decay=0.9,
            resume=True, data_root=str(tmp_path), log_fn=lambda *_: None,
        )
        assert ckpt.exists()
        sd = load_checkpoint(str(ckpt))
        assert "rb1.conv1.weight" in sd
        # The saved checkpoint is the EMA, not the raw last-step params.
        leaf = np.asarray(jax.tree_util.tree_leaves(params)[0])
        assert np.isfinite(leaf).all()
        saved_state = load_checkpoint(str(tmp_path / "ema_state.pth"))
        assert "ema" in saved_state


class TestTextEma:
    def test_text_train_with_ema(self, tmp_path, monkeypatch, eight_devices):
        """Joint text training with EMA: best/final checkpoints hold the EMA
        weights and the resume state carries an 'ema' dict."""
        import numpy as np

        from tinydiffusionmodels_tpu.io import load_checkpoint
        from tinydiffusionmodels_tpu.models import (
            init_learned_embedding,
            init_learned_rounding,
            init_tiny_transformer,
        )
        from tinydiffusionmodels_tpu.models.transformer import TransformerConfig
        from tinydiffusionmodels_tpu.train import text_train

        monkeypatch.setenv("TDM_SCAN_CHUNK", "2")
        sched = make_schedule(10)
        cfg = TransformerConfig(dim=16, n_heads=2, depth=1, ffn_dim=32,
                                timesteps=sched.timesteps)
        key = jax.random.PRNGKey(0)
        joint = {
            "diffusion_model": init_tiny_transformer(key, cfg),
            "rounding_fn": init_learned_rounding(
                jax.random.fold_in(key, 1), 16, 11
            ),
            "embedding_fn": init_learned_embedding(
                jax.random.fold_in(key, 2), 11, 16
            ),
        }
        rng = np.random.default_rng(0)
        chunks = rng.integers(0, 11, size=(40, 8)).astype(np.int64)
        ckpt = tmp_path / "t.pth"
        text_train.train(
            joint, chunks[:32], chunks[32:],
            cfg=cfg, sched=sched, ckpt_path=str(ckpt),
            epochs=2, batch_size=8, ema_decay=0.9, resume=True,
            use_lr_scheduling=False, log_fn=lambda *_: None,
        )
        assert ckpt.exists()
        final = load_checkpoint(str(ckpt))
        assert "diffusion_model" in final
        saved_state = load_checkpoint(str(tmp_path / "t_state.pth"))
        assert "ema" in saved_state
        assert "diffusion_model" in saved_state["ema"]

        # Restart: the restored run must pick up the saved EMA and finish.
        # train() donates its params (scan-of-steps buffer donation), so the
        # restart needs fresh arrays.
        joint2 = {
            "diffusion_model": init_tiny_transformer(key, cfg),
            "rounding_fn": init_learned_rounding(
                jax.random.fold_in(key, 1), 16, 11
            ),
            "embedding_fn": init_learned_embedding(
                jax.random.fold_in(key, 2), 11, 16
            ),
        }
        logs: list[str] = []
        text_train.train(
            joint2, chunks[:32], chunks[32:],
            cfg=cfg, sched=sched, ckpt_path=str(ckpt),
            epochs=3, batch_size=8, ema_decay=0.9, resume=True,
            use_lr_scheduling=False, log_fn=logs.append,
        )
        assert any("restored epoch 2" in m for m in logs), logs[:5]
