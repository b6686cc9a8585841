"""Fused persistent guided-decode kernel (ops/decode_kernel.py).

The whole guided decode runs as ONE Pallas call with VMEM-resident
weights (the bs<=10 guided decode is latency-bound at ~120 us/token on
the scan path, BENCH_r02); guided_generate_verified wraps the bf16 draft
with an exact f32 verification pass for bit parity with the scan decoder
(and therefore the reference loop, src/shakespeare.py:445-470).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinydiffusionmodels_tpu.models import (
    init_tiny_gpt,
    tiny_gpt_decode_step,
    tiny_gpt_init_cache,
)
from tinydiffusionmodels_tpu.models.ar_lm import TinyGPTConfig
from tinydiffusionmodels_tpu.ops.decode_kernel import (
    fits_vmem,
    fused_guided_decode,
)
from tinydiffusionmodels_tpu.sample.guided import (
    guided_generate_scan,
    guided_generate_verified,
)

CFG = TinyGPTConfig(vocab_size=97, dim=64, n_heads=4, depth=2, max_len=24)
B, L = 4, 16


@pytest.fixture(scope="module")
def params():
    return init_tiny_gpt(jax.random.PRNGKey(0), CFG)


def _scan_ref(params, diff, **kw):
    return guided_generate_scan(
        lambda c, t: tiny_gpt_decode_step(params, c, t, CFG),
        tiny_gpt_init_cache(CFG, diff.shape[0]), diff, 1, **kw,
    )


class TestFusedDraft:
    @pytest.mark.parametrize("normalize", [False, True])
    def test_draft_near_parity(self, params, normalize):
        """bf16 draft: the vast majority of tokens match the f32 scan; any
        divergence is a downstream consequence of one flipped near-tie."""
        diff = jax.random.normal(jax.random.PRNGKey(1), (B, L, CFG.vocab_size))
        ref = np.asarray(_scan_ref(params, diff, alpha=0.3,
                                   normalize=normalize))
        out = np.asarray(fused_guided_decode(params, CFG, diff, 1, alpha=0.3,
                                             normalize=normalize))
        assert out.shape == (B, L)
        # Rows agree until their first (rare) bf16 tie-flip.
        firsts = [
            np.argmin(np.append(r == o, False)) for r, o in zip(ref, out)
        ]
        assert np.mean(firsts) > L // 2

    def test_deterministic(self, params):
        diff = jax.random.normal(jax.random.PRNGKey(2), (B, L, CFG.vocab_size))
        a = fused_guided_decode(params, CFG, diff, 1, alpha=0.3)
        b = fused_guided_decode(params, CFG, diff, 1, alpha=0.3)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize("big_b", [16, 12])
    def test_chunked_matches_unchunked(self, params, monkeypatch, big_b):
        """Batches beyond one chunk's VMEM run as (chunks, L) grid sweeps;
        each chunk must decode exactly what it would alone (incl. the
        non-multiple batch, which pads to a whole chunk and slices)."""
        import tinydiffusionmodels_tpu.ops.decode_kernel as dk

        diff = jax.random.normal(jax.random.PRNGKey(5),
                                 (big_b, L, CFG.vocab_size))
        whole = np.asarray(
            fused_guided_decode(params, CFG, diff, 1, alpha=0.3)
        )
        monkeypatch.setattr(dk, "fits_vmem", lambda cfg, b, v: b <= 8)
        chunked = np.asarray(
            fused_guided_decode(params, CFG, diff, 1, alpha=0.3)
        )
        np.testing.assert_array_equal(chunked, whole)

    def test_fits_vmem_budget(self):
        assert fits_vmem(TinyGPTConfig(vocab_size=97, dim=256, depth=4,
                                       max_len=65), 8, 97)
        assert fits_vmem(TinyGPTConfig(vocab_size=4096, dim=256, depth=4,
                                       max_len=65), 8, 4096)
        assert not fits_vmem(TinyGPTConfig(vocab_size=256000, dim=2048,
                                           depth=18, max_len=65), 8, 256000)


def _assert_verified_contract(params, diff, out, ref, **kw):
    """The verified decoder's contract: its output is the greedy FIXPOINT
    of the f32 full-context forward — token p = argmax(mix(logits of the
    committed prefix)) for every p. That full-context graph is the same
    computation the reference loop runs per token (src/shakespeare.py:
    445-470, no KV cache), so this is reference-faithful numerics. On CPU
    it is also bit-identical to the KV-cached scan decoder; compiled TPU
    matmuls differ between the two graph shapes (bf16-pass accumulation
    order), so near-tie argmaxes can flip on a few positions there."""
    from tinydiffusionmodels_tpu.models.ar_lm import tiny_gpt_apply
    from tinydiffusionmodels_tpu.sample.guided import mix_logits

    out_np, ref_np = np.asarray(out), np.asarray(ref)
    ids_in = jnp.concatenate(
        [jnp.full((out_np.shape[0], 1), 1, jnp.int32), out[:, :-1]], axis=1
    )
    mixed = mix_logits(tiny_gpt_apply(params, ids_in, CFG), diff,
                       kw.get("alpha", 0.5), 1.0,
                       normalize=kw.get("normalize", False))
    fix = np.asarray(jnp.argmax(mixed, axis=-1).astype(jnp.int32))
    np.testing.assert_array_equal(out_np, fix)
    if jax.default_backend() == "tpu":
        assert (out_np == ref_np).mean() > 0.9
    else:
        np.testing.assert_array_equal(out_np, ref_np)


class TestVerifiedExactParity:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_greedy_fixpoint_and_scan_parity(self, params, seed):
        diff = jax.random.normal(jax.random.PRNGKey(seed),
                                 (B, L, CFG.vocab_size))
        ref = _scan_ref(params, diff, alpha=0.3)
        out = guided_generate_verified(params, CFG, diff, 1, alpha=0.3)
        _assert_verified_contract(params, diff, out, ref, alpha=0.3)

    @pytest.mark.parametrize("seed", [0, 1])
    def test_scan_bf16_draft_fixpoint(self, params, seed):
        """The large-batch draft (bf16 scan + f32 verify) satisfies the
        same exact-greedy-fixpoint contract as the fused-kernel draft."""
        diff = jax.random.normal(jax.random.PRNGKey(seed),
                                 (B, L, CFG.vocab_size))
        ref = _scan_ref(params, diff, alpha=0.3)
        out = guided_generate_verified(params, CFG, diff, 1, alpha=0.3,
                                       draft="scan_bf16")
        _assert_verified_contract(params, diff, out, ref, alpha=0.3)

    def test_fixpoint_normalized_mix(self, params):
        diff = jax.random.normal(jax.random.PRNGKey(9),
                                 (B, L, CFG.vocab_size))
        ref = _scan_ref(params, diff, alpha=0.3, normalize=True)
        out = guided_generate_verified(params, CFG, diff, 1, alpha=0.3,
                                       normalize=True)
        _assert_verified_contract(params, diff, out, ref, alpha=0.3,
                                  normalize=True)

    def test_jittable(self, params):
        diff = jax.random.normal(jax.random.PRNGKey(4),
                                 (B, L, CFG.vocab_size))
        fn = jax.jit(
            lambda d: guided_generate_verified(params, CFG, d, 1, alpha=0.3)
        )
        np.testing.assert_array_equal(
            np.asarray(fn(diff)), np.asarray(_scan_ref(params, diff, alpha=0.3))
        )


class TestVerifiedRouting:
    """VERDICT r4 item 3: the verified entry point routes to the plain f32
    scan at large batch (where BENCH_r04 measured it dominating every
    draft+verify pipeline ~4x) instead of always paying the speculative
    machinery."""

    def test_plain_draft_is_the_scan(self, params):
        from tinydiffusionmodels_tpu.sample.guided import default_seg

        diff = jax.random.normal(jax.random.PRNGKey(7),
                                 (B, L, CFG.vocab_size))
        ref = guided_generate_scan(
            lambda c, t, a=None: tiny_gpt_decode_step(params, c, t, CFG, a),
            tiny_gpt_init_cache(CFG, B), diff, 1, alpha=0.3,
            seg=default_seg(B),
        )
        out = guided_generate_verified(params, CFG, diff, 1, alpha=0.3,
                                       draft="plain")
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_auto_routes_to_plain_when_vmem_overflows(self, params,
                                                      monkeypatch):
        import tinydiffusionmodels_tpu.ops.decode_kernel as dk

        monkeypatch.setattr(dk, "fits_vmem", lambda cfg, b, v: False)

        def boom(*a, **k):  # the fused draft must not be touched
            raise AssertionError("fused draft called on the plain route")

        monkeypatch.setattr(dk, "fused_guided_decode", boom)
        diff = jax.random.normal(jax.random.PRNGKey(8),
                                 (B, L, CFG.vocab_size))
        out = guided_generate_verified(params, CFG, diff, 1, alpha=0.3)
        np.testing.assert_array_equal(
            np.asarray(out),
            np.asarray(guided_generate_verified(params, CFG, diff, 1,
                                                alpha=0.3, draft="plain")),
        )

    def test_auto_routes_to_fused_when_it_fits(self, params, monkeypatch):
        import tinydiffusionmodels_tpu.ops.decode_kernel as dk

        called = {}
        real = dk.fused_guided_decode

        def spy(*a, **k):
            called["yes"] = True
            return real(*a, **k)

        monkeypatch.setattr(dk, "fused_guided_decode", spy)
        diff = jax.random.normal(jax.random.PRNGKey(8),
                                 (B, L, CFG.vocab_size))
        guided_generate_verified(params, CFG, diff, 1, alpha=0.3)
        assert called.get("yes")
