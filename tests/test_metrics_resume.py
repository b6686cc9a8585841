"""Metrics JSONL logging + text-train resume tests."""

import json

import numpy as np
import pytest

from tinydiffusionmodels_tpu.train.metrics import MetricsLogger


class TestMetricsLogger:
    def test_disabled_by_default(self, tmp_path, monkeypatch):
        monkeypatch.delenv("TDM_METRICS_PATH", raising=False)
        m = MetricsLogger()
        assert not m.enabled
        m.log({"a": 1})  # no-op, no crash
        m.close()

    def test_writes_jsonl(self, tmp_path):
        p = tmp_path / "m.jsonl"
        m = MetricsLogger(p)
        m.log({"epoch": 1, "loss": 0.5})
        m.log({"epoch": 2, "loss": 0.25})
        m.close()
        lines = p.read_text().strip().splitlines()
        assert len(lines) == 2
        rec = json.loads(lines[0])
        assert rec["epoch"] == 1 and rec["loss"] == 0.5 and "t" in rec

    def test_env_var(self, tmp_path, monkeypatch):
        p = tmp_path / "env.jsonl"
        monkeypatch.setenv("TDM_METRICS_PATH", str(p))
        m = MetricsLogger()
        assert m.enabled
        m.log({"x": 1})
        assert p.exists()


class TestMnistMetrics:
    def test_train_emits_epoch_records(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        monkeypatch.setenv("TDM_DATA_LIMIT", "128")
        monkeypatch.delenv("AIP_MODEL_DIR", raising=False)
        from tinydiffusionmodels_tpu.train import mnist_train

        mnist_train.train(
            epochs=2, batch_size=64, ckpt_path="c.pth",
            sample_every_epoch=False,
            metrics_path=str(tmp_path / "metrics.jsonl"),
            log_fn=lambda *a: None,
        )
        lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
        assert len(lines) == 2
        rec = json.loads(lines[-1])
        assert rec["workload"] == "mnist"
        assert rec["epoch"] == 2
        assert rec["it_per_s"] > 0


class TestTextResume:
    def test_resume_restores_epoch_and_counters(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        monkeypatch.delenv("AIP_MODEL_DIR", raising=False)
        import jax

        from tinydiffusionmodels_tpu.core import make_schedule
        from tinydiffusionmodels_tpu.models import (
            init_learned_embedding,
            init_learned_rounding,
            init_tiny_transformer,
        )
        from tinydiffusionmodels_tpu.models.transformer import TransformerConfig
        from tinydiffusionmodels_tpu.train import text_train

        sched = make_schedule(50)
        cfg = TransformerConfig(dim=32, depth=1, ffn_dim=64,
                                timesteps=sched.timesteps)
        key = jax.random.PRNGKey(0)

        def fresh_params():
            return {
                "diffusion_model": init_tiny_transformer(key, cfg),
                "rounding_fn": init_learned_rounding(
                    jax.random.fold_in(key, 1), 32, 30
                ),
                "embedding_fn": init_learned_embedding(
                    jax.random.fold_in(key, 2), 30, 32
                ),
            }

        rng = np.random.default_rng(0)
        train_chunks = rng.integers(0, 30, size=(32, 16)).astype(np.int64)
        val_chunks = rng.integers(0, 30, size=(8, 16)).astype(np.int64)

        common = dict(
            cfg=cfg, sched=sched, ckpt_path="t.pth", batch_size=8,
            warmup_steps=2, resume=True, log_fn=lambda *a: None,
        )
        text_train.train(
            fresh_params(), train_chunks, val_chunks, epochs=1, **common
        )
        assert (tmp_path / "t_state.pth").exists()

        logs = []
        text_train.train(
            fresh_params(), train_chunks, val_chunks, epochs=2,
            **{**common, "log_fn": lambda *a: logs.append(" ".join(map(str, a)))},
        )
        assert any("[resume] restored epoch 1" in l for l in logs)
        # Only epoch 2 ran in the second call.
        assert sum("Epoch " in l and "it/s" in l for l in logs) == 1


class TestEmptyValSet:
    def test_no_early_stop_without_val_signal(self, tmp_path, monkeypatch):
        """--val_split 0 regression: with no val batches there is no signal,
        so patience must never count and training must run all epochs.
        (The reference would ZeroDivisionError, src/shakespeare.py:281.)"""
        monkeypatch.chdir(tmp_path)
        monkeypatch.delenv("AIP_MODEL_DIR", raising=False)
        import jax

        from tinydiffusionmodels_tpu.core import make_schedule
        from tinydiffusionmodels_tpu.models import (
            init_learned_embedding,
            init_learned_rounding,
            init_tiny_transformer,
        )
        from tinydiffusionmodels_tpu.models.transformer import TransformerConfig
        from tinydiffusionmodels_tpu.train import text_train

        sched = make_schedule(50)
        cfg = TransformerConfig(dim=32, depth=1, ffn_dim=64,
                                timesteps=sched.timesteps)
        key = jax.random.PRNGKey(0)
        params = {
            "diffusion_model": init_tiny_transformer(key, cfg),
            "rounding_fn": init_learned_rounding(
                jax.random.fold_in(key, 1), 32, 30
            ),
            "embedding_fn": init_learned_embedding(
                jax.random.fold_in(key, 2), 30, 32
            ),
        }
        rng = np.random.default_rng(0)
        train_chunks = rng.integers(0, 30, size=(16, 16)).astype(np.int64)
        val_chunks = np.zeros((0, 16), dtype=np.int64)

        logs = []
        text_train.train(
            params, train_chunks, val_chunks,
            cfg=cfg, sched=sched, ckpt_path="t.pth", batch_size=8,
            warmup_steps=2, epochs=4, patience=2,
            log_fn=lambda *a: logs.append(" ".join(map(str, a))),
        )
        assert not any("Early stopping" in l for l in logs)
        assert sum("Epoch " in l and "it/s" in l for l in logs) == 4
