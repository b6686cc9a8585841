"""JAX Gemma vs HF torch GemmaForCausalLM: logits and cached-decode parity.

The HF *code* is local even when weights aren't, so a randomly-initialized
tiny Gemma serves as the oracle — this validates the architecture port
(RMSNorm (1+w), embedding scaling, RoPE, GQA, gated gelu MLP, tied head)
end to end, offline.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from tinydiffusionmodels_tpu.models.gemma import (  # noqa: E402
    GemmaConfig,
    gemma_apply,
    gemma_decode_step,
    gemma_from_hf_state_dict,
    gemma_init_cache,
)


@pytest.fixture(scope="module")
def tiny_gemma():
    from transformers import GemmaConfig as HFGemmaConfig
    from transformers import GemmaForCausalLM

    hf_cfg = HFGemmaConfig(
        vocab_size=97,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,   # exercise GQA
        head_dim=16,
        max_position_embeddings=64,
    )
    torch.manual_seed(0)
    model = GemmaForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = GemmaConfig.from_hf(hf_cfg, max_len=32)
    params = gemma_from_hf_state_dict(sd, cfg)
    return model, params, cfg


class TestGemmaParity:
    def test_full_forward_logits(self, tiny_gemma):
        model, params, cfg = tiny_gemma
        ids = np.array([[3, 17, 42, 8, 0, 96], [1, 2, 3, 4, 5, 6]])
        with torch.no_grad():
            ref = model(torch.from_numpy(ids)).logits.numpy()
        ours = np.asarray(gemma_apply(params, jnp.asarray(ids), cfg))
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)

    def test_causality(self, tiny_gemma):
        _, params, cfg = tiny_gemma
        a = gemma_apply(params, jnp.asarray([[1, 2, 3, 4]]), cfg)
        b = gemma_apply(params, jnp.asarray([[1, 2, 3, 9]]), cfg)
        np.testing.assert_allclose(
            np.asarray(a[:, :3]), np.asarray(b[:, :3]), rtol=1e-5, atol=1e-6
        )

    def test_cached_decode_matches_full(self, tiny_gemma):
        _, params, cfg = tiny_gemma
        ids = jax.random.randint(jax.random.PRNGKey(0), (2, 10), 0, 97)
        full = gemma_apply(params, ids, cfg)
        cache = gemma_init_cache(cfg, 2)
        stepped = []
        for pos in range(10):
            logits, cache = gemma_decode_step(params, cache, ids[:, pos], cfg)
            stepped.append(logits)
        stepped = jnp.stack(stepped, axis=1)
        np.testing.assert_allclose(
            np.asarray(stepped), np.asarray(full), rtol=5e-4, atol=5e-4
        )

    def test_torch_loop_guided_path(self, tiny_gemma):
        """The CLI's torch-LM fallback decode loop (reference parity path)
        runs against a real torch CausalLM and matches the JAX scan decode
        given the same weights (greedy decoding is deterministic)."""
        import numpy as np

        from tinydiffusionmodels_tpu.sample.guided import guided_generate_scan
        from tinydiffusionmodels_tpu.shakespeare import _guided_with_torch_lm

        model, params, cfg = tiny_gemma

        class Tok:
            bos_token_id = 2
            eos_token_id = 1

            def batch_decode(self, ids, skip_special_tokens=True):
                return [" ".join(map(str, row)) for row in np.asarray(ids)]

        diff_logits = np.asarray(
            jax.random.normal(jax.random.PRNGKey(3), (2, 5, 97))
        )
        torch_texts = _guided_with_torch_lm(
            model, Tok(), diff_logits, alpha=0.3
        )

        decode = lambda cache, tok: gemma_decode_step(params, cache, tok, cfg)
        jax_tokens = guided_generate_scan(
            decode, gemma_init_cache(cfg, 2), jnp.asarray(diff_logits), 2,
            alpha=0.3,
        )
        jax_texts = Tok().batch_decode(np.asarray(jax_tokens))
        assert torch_texts == jax_texts

    def test_guided_scan_integration(self, tiny_gemma):
        """Gemma decode step drops into the guided scan decoder."""
        from tinydiffusionmodels_tpu.sample.guided import guided_generate_scan

        _, params, cfg = tiny_gemma
        diff_logits = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 97))
        decode = lambda cache, tok: gemma_decode_step(params, cache, tok, cfg)
        tokens = guided_generate_scan(
            decode, gemma_init_cache(cfg, 2), diff_logits, 2, alpha=0.3
        )
        assert tokens.shape == (2, 6)
        assert int(tokens.max()) < 97


class TestRealGemmaWeights:
    """True-checkpoint verification of the conversion path
    (models/gemma.py:61-..., reference src/shakespeare.py:509-510).

    Runs only when the real google/gemma-2b-it weights are obtainable:
    either already in the local HF cache, or TDM_ALLOW_DOWNLOADS=1 with
    network + HF_TOKEN access. Hermetic CI skips."""

    def test_real_gemma_2b_logits(self):
        import os

        model_id = os.environ.get("TDM_GEMMA_ID", "google/gemma-2b-it")
        local_only = os.environ.get("TDM_ALLOW_DOWNLOADS") != "1"
        from transformers import AutoModelForCausalLM, AutoTokenizer

        try:
            tok = AutoTokenizer.from_pretrained(
                model_id, local_files_only=local_only
            )
            model = AutoModelForCausalLM.from_pretrained(
                model_id, local_files_only=local_only,
                torch_dtype=torch.float32,
            ).eval()
        except Exception as e:
            pytest.skip(f"real {model_id} weights unavailable: {e}")

        prompt = "To be, or not to be, that is the"
        ids = tok(prompt, return_tensors="pt").input_ids
        with torch.no_grad():
            ref_logits = model(ids).logits[0, -1].numpy()

        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        cfg = GemmaConfig.from_hf(model.config, max_len=ids.shape[1] + 1)
        params = gemma_from_hf_state_dict(sd, cfg)
        ours = np.asarray(
            gemma_apply(params, jnp.asarray(ids.numpy()), cfg)[0, -1]
        )

        # bf16-free f32 forward on both sides: logits should agree closely;
        # also the actual next-token prediction must match.
        np.testing.assert_allclose(ours, ref_logits, rtol=5e-3, atol=5e-2)
        assert int(ours.argmax()) == int(ref_logits.argmax())
