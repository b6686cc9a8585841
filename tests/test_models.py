"""Shape/dtype tests for all models + torch semantic parity for the
transformer encoder layer and UNet (oracle = same weights loaded into the
reference's torch modules)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _hw_tol():
    """TPU matmul/conv accumulation differs from CPU torch (bf16-passes,
    ordering); CPU-vs-CPU comparisons are much tighter."""
    if jax.default_backend() == "tpu":
        return dict(rtol=5e-3, atol=5e-3)
    return dict(rtol=1e-4, atol=1e-5)

from tinydiffusionmodels_tpu.models import (
    init_unet,
    unet_apply,
    init_tiny_transformer,
    tiny_transformer_apply,
    init_learned_embedding,
    embedding_apply,
    init_learned_rounding,
    rounding_apply,
    init_tiny_gpt,
    tiny_gpt_apply,
    tiny_gpt_init_cache,
    tiny_gpt_decode_step,
)
from tinydiffusionmodels_tpu.models.transformer import TransformerConfig
from tinydiffusionmodels_tpu.models.ar_lm import TinyGPTConfig
from tinydiffusionmodels_tpu.models.embedding import cosine_logits


class TestUNet:
    def test_shapes(self):
        params = init_unet(jax.random.PRNGKey(0))
        x = jnp.zeros((2, 28, 28, 1))
        t = jnp.array([0, 999])
        out = unet_apply(params, x, t)
        assert out.shape == (2, 28, 28, 1)
        assert out.dtype == jnp.float32

    def test_jittable(self):
        params = init_unet(jax.random.PRNGKey(0))
        fn = jax.jit(lambda p, x, t: unet_apply(p, x, t))
        out = fn(params, jnp.zeros((1, 28, 28, 1)), jnp.array([5]))
        assert out.shape == (1, 28, 28, 1)

    def test_time_conditioning_matters(self):
        params = init_unet(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 28, 28, 1))
        a = unet_apply(params, x, jnp.array([0]))
        b = unet_apply(params, x, jnp.array([999]))
        assert np.abs(np.asarray(a - b)).max() > 1e-6

    def test_torch_parity(self):
        """Load identical weights into the reference architecture in torch
        and compare outputs (reference src/mnist.py:45-87)."""
        torch = pytest.importorskip("torch")
        import torch.nn as nn
        import torch.nn.functional as F

        class RefResBlock(nn.Module):
            def __init__(self, in_ch, out_ch):
                super().__init__()
                self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
                self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
                self.time_emb = nn.Linear(1, out_ch)
                self.skip = (
                    nn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else nn.Identity()
                )

            def forward(self, x, t):
                h = F.relu(self.conv1(x))
                h = h + self.time_emb(t).view(t.shape[0], -1, 1, 1)
                h = F.relu(self.conv2(h))
                return h + self.skip(x)

        class RefUNet(nn.Module):
            def __init__(self):
                super().__init__()
                self.rb1 = RefResBlock(1, 32)
                self.rb2 = RefResBlock(32, 64)
                self.rb3 = RefResBlock(64, 64)
                self.rb4 = RefResBlock(96, 32)
                self.out = nn.Conv2d(32, 1, 1)

            def forward(self, x, t):
                t = (t.float() / 1000).view(-1, 1, 1, 1)
                h1 = self.rb1(x, t)
                h2 = self.rb2(F.avg_pool2d(h1, 2), t)
                h3 = self.rb3(h2, t)
                h4 = F.interpolate(h3, scale_factor=2, mode="nearest")
                h4 = torch.cat([h4, h1], dim=1)
                h4 = self.rb4(h4, t)
                return self.out(h4)

        params = init_unet(jax.random.PRNGKey(0))
        ref = RefUNet()
        with torch.no_grad():
            for name, mod in [
                ("rb1", ref.rb1), ("rb2", ref.rb2),
                ("rb3", ref.rb3), ("rb4", ref.rb4),
            ]:
                p = params[name]
                # HWIO -> OIHW
                mod.conv1.weight.copy_(
                    torch.from_numpy(np.asarray(p["conv1"]["w"]).transpose(3, 2, 0, 1))
                )
                mod.conv1.bias.copy_(torch.from_numpy(np.asarray(p["conv1"]["b"])))
                mod.conv2.weight.copy_(
                    torch.from_numpy(np.asarray(p["conv2"]["w"]).transpose(3, 2, 0, 1))
                )
                mod.conv2.bias.copy_(torch.from_numpy(np.asarray(p["conv2"]["b"])))
                mod.time_emb.weight.copy_(
                    torch.from_numpy(np.asarray(p["time_emb"]["w"]).T)
                )
                mod.time_emb.bias.copy_(
                    torch.from_numpy(np.asarray(p["time_emb"]["b"]))
                )
                if p["skip"] is not None:
                    mod.skip.weight.copy_(
                        torch.from_numpy(
                            np.asarray(p["skip"]["w"]).transpose(3, 2, 0, 1)
                        )
                    )
                    mod.skip.bias.copy_(torch.from_numpy(np.asarray(p["skip"]["b"])))
            ref.out.weight.copy_(
                torch.from_numpy(np.asarray(params["out"]["w"]).transpose(3, 2, 0, 1))
            )
            ref.out.bias.copy_(torch.from_numpy(np.asarray(params["out"]["b"])))

        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 1, 28, 28)).astype(np.float32)
        t = np.array([100, 900])
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()
        ours = unet_apply(
            init_unet(jax.random.PRNGKey(0)),
            jnp.asarray(np.moveaxis(x, 1, -1)),
            jnp.asarray(t),
        )
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(ours), -1, 1), ref_out, **_hw_tol()
        )


class TestTinyTransformer:
    cfg = TransformerConfig(dim=64, n_heads=4, depth=2, dropout=0.1)

    def test_shapes(self):
        params = init_tiny_transformer(jax.random.PRNGKey(0), self.cfg)
        x = jnp.zeros((2, 16, 64))
        out = tiny_transformer_apply(params, x, jnp.array([1, 2]), self.cfg)
        assert out.shape == (2, 16, 64)

    def test_dropout_needs_key(self):
        params = init_tiny_transformer(jax.random.PRNGKey(0), self.cfg)
        with pytest.raises(ValueError):
            tiny_transformer_apply(
                params, jnp.zeros((1, 4, 64)), jnp.array([0]), self.cfg,
                deterministic=False,
            )

    def test_train_mode_stochastic(self):
        params = init_tiny_transformer(jax.random.PRNGKey(0), self.cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 64))
        t = jnp.array([10])
        a = tiny_transformer_apply(
            params, x, t, self.cfg, deterministic=False, key=jax.random.PRNGKey(2)
        )
        b = tiny_transformer_apply(
            params, x, t, self.cfg, deterministic=False, key=jax.random.PRNGKey(3)
        )
        assert np.abs(np.asarray(a - b)).max() > 1e-6

    def test_torch_parity(self):
        """Same weights in torch nn.TransformerEncoder (post-LN, relu,
        ffn=2048) + reference time bias (src/shakespeare.py:105-120)."""
        torch = pytest.importorskip("torch")
        import torch.nn as nn

        cfg = TransformerConfig(dim=32, n_heads=4, depth=2, dropout=0.0, ffn_dim=64)
        params = init_tiny_transformer(jax.random.PRNGKey(0), cfg)

        enc_layer = nn.TransformerEncoderLayer(
            d_model=32, nhead=4, dim_feedforward=64, batch_first=True, dropout=0.0
        )
        encoder = nn.TransformerEncoder(enc_layer, num_layers=2)
        time_emb = nn.Linear(1, 32)
        with torch.no_grad():
            time_emb.weight.copy_(
                torch.from_numpy(np.asarray(params["time_emb"]["w"]).T)
            )
            time_emb.bias.copy_(torch.from_numpy(np.asarray(params["time_emb"]["b"])))
            for i, layer in enumerate(encoder.layers):
                p = params["layers"][i]
                layer.self_attn.in_proj_weight.copy_(
                    torch.from_numpy(np.asarray(p["self_attn"]["in_proj"]["w"]).T)
                )
                layer.self_attn.in_proj_bias.copy_(
                    torch.from_numpy(np.asarray(p["self_attn"]["in_proj"]["b"]))
                )
                layer.self_attn.out_proj.weight.copy_(
                    torch.from_numpy(np.asarray(p["self_attn"]["out_proj"]["w"]).T)
                )
                layer.self_attn.out_proj.bias.copy_(
                    torch.from_numpy(np.asarray(p["self_attn"]["out_proj"]["b"]))
                )
                layer.linear1.weight.copy_(
                    torch.from_numpy(np.asarray(p["linear1"]["w"]).T)
                )
                layer.linear1.bias.copy_(
                    torch.from_numpy(np.asarray(p["linear1"]["b"]))
                )
                layer.linear2.weight.copy_(
                    torch.from_numpy(np.asarray(p["linear2"]["w"]).T)
                )
                layer.linear2.bias.copy_(
                    torch.from_numpy(np.asarray(p["linear2"]["b"]))
                )
                layer.norm1.weight.copy_(
                    torch.from_numpy(np.asarray(p["norm1"]["scale"]))
                )
                layer.norm1.bias.copy_(torch.from_numpy(np.asarray(p["norm1"]["bias"])))
                layer.norm2.weight.copy_(
                    torch.from_numpy(np.asarray(p["norm2"]["scale"]))
                )
                layer.norm2.bias.copy_(torch.from_numpy(np.asarray(p["norm2"]["bias"])))

        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 8, 32)).astype(np.float32)
        t = np.array([100, 500])
        encoder.eval()
        with torch.no_grad():
            t_scaled = (torch.from_numpy(t).float() / 1000).unsqueeze(-1)
            bias = time_emb(t_scaled).unsqueeze(1)
            ref_out = encoder(torch.from_numpy(x) + bias).numpy()

        ours = tiny_transformer_apply(
            params, jnp.asarray(x), jnp.asarray(t), cfg, deterministic=True
        )
        np.testing.assert_allclose(np.asarray(ours), ref_out, **_hw_tol())


class TestEmbeddingAndRounding:
    def test_embedding_roundtrip(self):
        params = init_learned_embedding(jax.random.PRNGKey(0), 100, 16)
        ids = jnp.array([[1, 2], [3, 4]])
        emb = embedding_apply(params, ids)
        assert emb.shape == (2, 2, 16)
        np.testing.assert_array_equal(
            np.asarray(emb[0, 0]), np.asarray(params["weight"][1])
        )

    def test_pretrained_same_dim(self):
        pre = np.arange(32, dtype=np.float32).reshape(8, 4)
        params = init_learned_embedding(jax.random.PRNGKey(0), 8, 4, pretrained=pre)
        np.testing.assert_array_equal(np.asarray(params["weight"]), pre)

    def test_pretrained_projection(self):
        pre = np.random.default_rng(0).standard_normal((8, 6)).astype(np.float32)
        params = init_learned_embedding(jax.random.PRNGKey(0), 8, 4, pretrained=pre)
        assert params["weight"].shape == (8, 4)

    def test_rounding_shapes(self):
        params = init_learned_rounding(jax.random.PRNGKey(0), 16, 100)
        logits = rounding_apply(params, jnp.zeros((2, 5, 16)))
        assert logits.shape == (2, 5, 100)

    def test_cosine_logits_identity(self):
        emb = jnp.eye(4)
        x = jnp.asarray([[0.0, 2.0, 0.0, 0.0]])
        sims = cosine_logits(emb, x)
        assert int(jnp.argmax(sims[0])) == 1


class TestTinyGPT:
    cfg = TinyGPTConfig(vocab_size=50, dim=32, n_heads=4, depth=2, max_len=16)

    def test_full_forward(self):
        params = init_tiny_gpt(jax.random.PRNGKey(0), self.cfg)
        logits = tiny_gpt_apply(params, jnp.zeros((2, 8), dtype=jnp.int32), self.cfg)
        assert logits.shape == (2, 8, 50)

    def test_causality(self):
        """Changing a future token must not affect earlier logits."""
        params = init_tiny_gpt(jax.random.PRNGKey(0), self.cfg)
        ids_a = jnp.array([[1, 2, 3, 4]])
        ids_b = jnp.array([[1, 2, 3, 9]])
        la = tiny_gpt_apply(params, ids_a, self.cfg)
        lb = tiny_gpt_apply(params, ids_b, self.cfg)
        np.testing.assert_allclose(
            np.asarray(la[:, :3]), np.asarray(lb[:, :3]), rtol=1e-6
        )
        assert np.abs(np.asarray(la[:, 3] - lb[:, 3])).max() > 1e-6

    def test_kv_cache_matches_full_forward(self):
        """Cached decode must agree step-for-step with the full forward."""
        params = init_tiny_gpt(jax.random.PRNGKey(0), self.cfg)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 50)
        full = tiny_gpt_apply(params, ids, self.cfg)

        cache = tiny_gpt_init_cache(self.cfg, 2)
        step_logits = []
        for pos in range(8):
            logits, cache = tiny_gpt_decode_step(params, cache, ids[:, pos], self.cfg)
            step_logits.append(logits)
        stepped = jnp.stack(step_logits, axis=1)
        # TPU: cached decode attends over the padded max_len cache while the
        # full forward attends over L — different matmul tilings/accumulation
        # order cost up to ~1e-2 absolute on raw logits.
        tol = (dict(rtol=5e-3, atol=2e-2)
               if jax.default_backend() == "tpu" else dict(rtol=2e-4, atol=2e-5))
        np.testing.assert_allclose(
            np.asarray(stepped), np.asarray(full), **tol
        )
