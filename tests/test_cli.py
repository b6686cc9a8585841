"""End-to-end CLI smoke tests: the reference's public surface
(--train/--sample/--guided_sample) runs tiny workloads to completion,
writing real checkpoints and sample artifacts.

TDM_DATA_LIMIT caps dataset size and short schedules keep these fast on the
CPU test backend; the flows exercised are the full production code paths.
"""

import os

import numpy as np
import pytest

from tinydiffusionmodels_tpu import mnist as mnist_cli
from tinydiffusionmodels_tpu import shakespeare as shakespeare_cli


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("TDM_DATA_LIMIT", "256")
    monkeypatch.delenv("AIP_MODEL_DIR", raising=False)
    return tmp_path


class TestMnistCli:
    def test_nothing_to_do(self, capsys, workdir):
        mnist_cli.main([])
        assert "Nothing to do" in capsys.readouterr().out

    def test_train_then_sample(self, workdir):
        mnist_cli.main(
            [
                "--train", "--epochs", "1", "--batch_size", "64",
                "--ckpt", "ckpt.pth", "--no_epoch_samples",
            ]
        )
        assert (workdir / "ckpt.pth").exists()

        # Checkpoint must be torch-loadable (the .pth contract).
        torch = pytest.importorskip("torch")
        sd = torch.load(workdir / "ckpt.pth", map_location="cpu",
                        weights_only=True)
        assert "rb1.conv1.weight" in sd
        assert tuple(sd["rb1.conv1.weight"].shape) == (32, 1, 3, 3)

        mnist_cli.main(
            ["--sample", "--ckpt", "ckpt.pth", "--sampler", "ddim",
             "--steps", "5"]
        )
        png = workdir / "samples" / "samples.png"
        assert png.exists()
        assert png.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"


class TestShakespeareCli:
    def test_nothing_to_do(self, capsys, workdir):
        shakespeare_cli.main([])
        assert "Nothing to do" in capsys.readouterr().out

    def test_train_sample_guided(self, workdir):
        common = [
            "--model_id", "char",  # force hermetic char-tokenizer path
            "--seq_len", "16",
            "--embed_dim", "32",
            "--batch_size", "8",
            "--n", "2",
        ]
        shakespeare_cli.main(
            ["--train", "--epochs", "1", "--use_learned_embeddings",
             "--warmup_steps", "2", *common]
        )
        assert (workdir / "text_ckpt.pth").exists()

        torch = pytest.importorskip("torch")
        ckpt = torch.load(workdir / "text_ckpt.pth", map_location="cpu",
                          weights_only=True)
        assert "diffusion_model" in ckpt and "rounding_fn" in ckpt
        assert "embedding_fn" in ckpt
        assert "encoder.layers.0.self_attn.in_proj_weight" in ckpt[
            "diffusion_model"
        ]

        shakespeare_cli.main(
            ["--sample", "--use_learned_embeddings", "--sampler", "ddim",
             "--steps", "4", *common]
        )
        assert (workdir / "samples" / "sample_0.txt").exists()

        shakespeare_cli.main(
            ["--guided_sample", "--use_learned_embeddings",
             "--base_lm", "tinygpt", "--lm_epochs", "1",
             "--sampler", "ddim", "--steps", "4", "--alpha", "0.3", *common]
        )
        assert (workdir / "samples" / "guided_sample_0.txt").exists()
        assert (workdir / "lm_ckpt.pth").exists()

    def test_train_seq_parallel(self, workdir, eight_devices):
        """--seq_parallel trains with the sequence dim sharded over the
        8-device mesh (ring attention) end-to-end through the real CLI."""
        common = ["--use_learned_embeddings", "--seq_parallel",
                  "--model_id", "char", "--seq_len", "16",
                  "--embed_dim", "32", "--ckpt", "sp_ckpt.pth"]
        shakespeare_cli.main(
            ["--train", "--epochs", "1", "--warmup_steps", "2",
             "--batch_size", "8", *common]
        )
        assert (workdir / "sp_ckpt.pth").exists()

        # Sampling a seq-parallel checkpoint WITHOUT --train in the same
        # process must work: the CLI registers the sequence mesh itself
        # (regression: it used to be registered only inside train()).
        from tinydiffusionmodels_tpu.ops import registry

        registry._SEQ_MESHES.clear()
        shakespeare_cli.main(
            ["--sample", "--sampler", "ddim", "--steps", "4", "--n", "2",
             *common]
        )
        assert (workdir / "samples" / "sample_0.txt").exists()

    def test_train_dp_x_sp(self, workdir, eight_devices):
        """--seq_parallel 2 builds the combined {'data': 4, 'seq': 2} mesh:
        batch sharded AND ring attention active (VERDICT r3 item 5)."""
        shakespeare_cli.main(
            ["--train", "--epochs", "1", "--warmup_steps", "2",
             "--batch_size", "8", "--use_learned_embeddings",
             "--seq_parallel", "2", "--model_id", "char",
             "--seq_len", "16", "--embed_dim", "32",
             "--ckpt", "dpsp_ckpt.pth"]
        )
        assert (workdir / "dpsp_ckpt.pth").exists()

    def test_seq_parallel_batch_divisibility(self, workdir, eight_devices):
        with pytest.raises(SystemExit, match="not divisible"):
            shakespeare_cli.main(
                ["--train", "--epochs", "1", "--batch_size", "3",
                 "--use_learned_embeddings", "--seq_parallel", "2",
                 "--model_id", "char", "--seq_len", "16",
                 "--embed_dim", "32"]
            )

    def test_guided_sample_stale_lm_ckpt_retrains(self, workdir, capsys):
        """A cached base-LM trained under a different tokenizer (char-54 LM
        vs a bpe-96 diffusion checkpoint) must be rejected and retrained,
        not crash in the jitted guided mix (regression, round 4)."""
        common = ["--seq_len", "16", "--embed_dim", "32",
                  "--batch_size", "8", "--n", "2"]
        # Char run first: leaves a char-vocab lm_ckpt.pth behind.
        shakespeare_cli.main(
            ["--train", "--epochs", "1", "--use_learned_embeddings",
             "--warmup_steps", "2", "--model_id", "char",
             "--ckpt", "char_ckpt.pth", *common]
        )
        shakespeare_cli.main(
            ["--guided_sample", "--use_learned_embeddings",
             "--base_lm", "tinygpt", "--lm_epochs", "1",
             "--sampler", "ddim", "--steps", "4",
             "--model_id", "char", "--ckpt", "char_ckpt.pth", *common]
        )
        assert (workdir / "lm_ckpt.pth").exists()
        # BPE run against the SAME lm_ckpt.pth: vocab mismatch -> retrain.
        shakespeare_cli.main(
            ["--train", "--epochs", "1", "--use_learned_embeddings",
             "--warmup_steps", "2", "--model_id", "bpe:96",
             "--ckpt", "bpe_ckpt.pth", *common]
        )
        capsys.readouterr()
        # Sample with --model_id char (the hermetic default fallback): the
        # CLI starts from the char-54 tokenizer, must re-sync vocab_size to
        # the checkpoint's BPE-96 tokenizer, and must reject the cached
        # char-vocab base LM instead of crashing in the guided mix.
        shakespeare_cli.main(
            ["--guided_sample", "--use_learned_embeddings",
             "--base_lm", "tinygpt", "--lm_epochs", "1",
             "--sampler", "ddim", "--steps", "4",
             "--model_id", "char", "--ckpt", "bpe_ckpt.pth", *common]
        )
        out = capsys.readouterr().out
        assert "vocab_size=96" in out        # ckpt tokenizer re-synced
        assert "could not load" in out       # stale LM rejected
        assert (workdir / "samples" / "guided_sample_0.txt").exists()

    def test_legacy_bare_checkpoint(self, workdir, capsys):
        """Old single-model checkpoint format: load must warn and fall back
        to cosine decoding (reference src/shakespeare.py:556-562)."""
        import jax

        from tinydiffusionmodels_tpu.io import save_checkpoint
        from tinydiffusionmodels_tpu.io.checkpoint import (
            transformer_to_state_dict,
        )
        from tinydiffusionmodels_tpu.models import init_tiny_transformer
        from tinydiffusionmodels_tpu.models.transformer import (
            TransformerConfig,
        )

        cfg = TransformerConfig(dim=32, n_heads=4, depth=3)
        sd = transformer_to_state_dict(
            init_tiny_transformer(jax.random.PRNGKey(0), cfg)
        )
        save_checkpoint(sd, "legacy.pth")  # bare state_dict, no wrapper dict

        shakespeare_cli.main(
            ["--sample", "--model_id", "char", "--seq_len", "8",
             "--embed_dim", "32", "--n", "1",
             "--ckpt", "legacy.pth", "--sampler", "ddim", "--steps", "3"]
        )
        out = capsys.readouterr().out
        assert "old checkpoint format" in out.lower()
        assert (workdir / "samples" / "sample_0.txt").exists()

    def test_cosine_fallback_path(self, workdir):
        common = [
            "--model_id", "char", "--seq_len", "16", "--embed_dim", "32",
            "--batch_size", "8", "--n", "2",
        ]
        shakespeare_cli.main(
            ["--train", "--epochs", "1", "--use_learned_embeddings",
             "--warmup_steps", "2", *common]
        )
        shakespeare_cli.main(
            ["--sample", "--use_learned_embeddings", "--use_cosine_fallback",
             "--sampler", "ddim", "--steps", "4", *common]
        )
        assert (workdir / "samples" / "sample_0.txt").exists()


class TestCheckpointSelfConfiguration:
    """Sampling must not require repeating training-time flags: dim, pos
    mode, embed_norm, parameterization, schedule all come from the ckpt."""

    def test_sample_infers_embed_dim_and_modes(self, workdir, capsys):
        common = ["--model_id", "char", "--seq_len", "16", "--n", "1"]
        shakespeare_cli.main(
            ["--train", "--epochs", "1", "--use_learned_embeddings",
             "--embed_dim", "48", "--batch_size", "8", "--warmup_steps", "2",
             "--parameterization", "x0", "--embed_norm", "zscore",
             "--freeze_embeddings", "--pos_emb", "rope", *common]
        )
        capsys.readouterr()
        # No --embed_dim / --pos_emb / --embed_norm on the sample call: the
        # checkpoint self-configures (the reference crashes on the dim
        # mismatch instead).
        shakespeare_cli.main(
            ["--sample", "--use_learned_embeddings", "--sampler", "ddim",
             "--steps", "4", "--clamp", *common]
        )
        out = capsys.readouterr().out
        assert "[ckpt] embed_dim=48 (from checkpoint)" in out
        assert "[ckpt] pos_emb=rope (from checkpoint)" in out
        assert (workdir / "samples" / "sample_0.txt").exists()
