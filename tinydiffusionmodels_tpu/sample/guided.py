"""Guided AR + diffusion text generation.

Rebuild of reference src/shakespeare.py:429-470: at each position, mix the
base LM's next-token logits with diffusion-derived logits
(``mixed = (1-alpha)*ar + alpha*diff``) and take the greedy argmax.

TPU-native restructuring: the reference re-runs the full LM forward on the
whole growing prefix every token with no KV cache (src/shakespeare.py:448 —
O(L^2) full forwards). Here the loop is one ``lax.scan`` over positions with
a KV-cached single-token decode step; greedy decoding makes this exactly
behavior-preserving while removing the quadratic LM cost and all Python
dispatch.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

# (cache, token (B,)) -> (logits (B, V), cache)
CachedDecodeFn = Callable[[dict, jax.Array], tuple[jax.Array, dict]]


def mix_logits(
    ar_logits: jax.Array,
    diff_logits: jax.Array,
    alpha: float,
    temperature: float = 1.0,
    *,
    normalize: bool = False,
) -> jax.Array:
    """Reference mixing rule (src/shakespeare.py:449,454,466).

    ``normalize=False`` (default) is exact reference behavior: raw logits
    are mixed, so alpha's meaning depends entirely on logit magnitudes.
    Measured on a trained checkpoint (tools/text_fidelity.py): unbounded
    learned-rounding logits hijack the mix at any alpha (judge-LM ppl ~35k
    for alpha in [0.1, 0.7]) while bounded cosine logits never influence it
    (ppl 1.1 = the base LM alone) — there is no usable alpha knee.

    ``normalize=True`` mixes in probability space instead (linear opinion
    pool): softmax both heads, blend (1-alpha)*p_ar + alpha*p_diff, return
    its log. This bounds either head's influence by its mixture weight
    regardless of logit scale or over-confidence — the diffusion head can
    only flip a token the base LM assigns < alpha/(1-alpha) relative mass.
    (A log-space interpolation would NOT have this property: an
    over-confident head dominates a log-opinion pool at any alpha.)
    """
    a = ar_logits / temperature
    d = diff_logits / temperature
    if normalize:
        mix = (1.0 - alpha) * jax.nn.softmax(a, axis=-1) + alpha * (
            jax.nn.softmax(d, axis=-1)
        )
        return jnp.log(mix + 1e-20)
    return (1.0 - alpha) * a + alpha * d


def guided_generate_scan(
    decode_step: CachedDecodeFn,
    init_cache: dict,
    diff_logits_all: jax.Array,
    bos_token: int,
    *,
    alpha: float = 0.5,
    temperature: float = 1.0,
    normalize: bool = False,
) -> jax.Array:
    """Generate (B, L) token ids guided by per-position diffusion logits.

    diff_logits_all: (B, L, V) — precomputed from the reverse-diffused
    embeddings z via learned rounding or cosine similarity (the reference
    computes these one position at a time inside the decode loop,
    src/shakespeare.py:451-464; they are position-independent, so hoisting
    them out is exact).
    """
    b, seq_len, _ = diff_logits_all.shape
    start = jnp.full((b,), bos_token, dtype=jnp.int32)

    def step(carry, pos):
        cache, token = carry
        ar_logits, cache = decode_step(cache, token)
        mixed = mix_logits(ar_logits, diff_logits_all[:, pos, :], alpha,
                           temperature, normalize=normalize)
        next_id = jnp.argmax(mixed, axis=-1).astype(jnp.int32)
        return (cache, next_id), next_id

    # unroll=2: semantics-preserving, measured +21% decode throughput on
    # v5e (35.6k -> 43.2k tok/s at bs=8/L=64) — two decode iterations per
    # scan body give XLA a longer chain to software-pipeline; 4/8 gain
    # nothing more.
    (_, _), tokens = jax.lax.scan(
        step, (init_cache, start), jnp.arange(seq_len), unroll=2
    )
    return tokens.T  # (L, B) -> (B, L)


def guided_generate_verified(
    params: dict,
    cfg,
    diff_logits_all: jax.Array,
    bos_token: int,
    *,
    alpha: float = 0.5,
    temperature: float = 1.0,
    normalize: bool = False,
) -> jax.Array:
    """Exact greedy guided decode at fused-kernel speed (TinyGPT base LM).

    Speculative-style pipeline over ops/decode_kernel.fused_guided_decode:

    1. DRAFT: the persistent bf16 Pallas kernel decodes all L tokens in one
       call (weights stay VMEM-resident across positions — no per-token HBM
       weight streaming).
    2. VERIFY: ONE teacher-forced f32 forward over the whole draft
       (tiny_gpt_apply — parallel over positions, compute-bound, cheap)
       recomputes every position's mixed-greedy token exactly as the scan
       path (and the reference loop, src/shakespeare.py:445-470) would.
    3. COMMIT & RE-DRAFT: tokens up to and including the first mismatch are
       exact (a first mismatch at position p was computed from an
       already-verified prefix, so the *verifier's* token at p is the exact
       one); re-draft from p+1 with the exact prefix teacher-forced.

    Each round commits >= 1 token, so the loop terminates in <= L rounds;
    in practice the bf16 draft almost always survives verification whole
    (1 round).

    Parity contract: the output is the greedy FIXPOINT of the f32
    full-context forward — token p = argmax(mix(logits(prefix_p))) for
    every p. The reference loop computes exactly this graph (full-prefix
    forward per token, no KV cache — src/shakespeare.py:445-470). On CPU
    it is additionally bit-identical to guided_generate_scan; on TPU the
    scan's KV-cached incremental graph compiles to different bf16-pass
    accumulation orders, so the two f32 paths can flip an occasional
    near-tie argmax relative to each other (measured >95% token agreement
    on random weights; trained peaked logits agree more).
    """
    from tinydiffusionmodels_tpu.models.ar_lm import tiny_gpt_apply
    from tinydiffusionmodels_tpu.ops.decode_kernel import (
        _fused_guided_decode_impl,
    )

    b, seq_len, _ = diff_logits_all.shape

    def verify(tokens):
        """Exact per-position greedy tokens given the draft as prefix."""
        ids_in = jnp.concatenate(
            [jnp.full((b, 1), bos_token, jnp.int32), tokens[:, :-1]], axis=1
        )
        ar_all = tiny_gpt_apply(params, ids_in, cfg)  # (B, L, V)
        mixed = mix_logits(ar_all, diff_logits_all, alpha, temperature,
                           normalize=normalize)
        return jnp.argmax(mixed, axis=-1).astype(jnp.int32)

    def draft(start, committed):
        return _fused_guided_decode_impl(
            params, cfg, diff_logits_all, bos_token, start, committed,
            alpha=alpha, temperature=temperature, normalize=normalize,
        )

    def cond(carry):
        start, _ = carry
        return start < seq_len

    def body(carry):
        start, committed = carry
        tokens = draft(start, committed)
        exact = verify(tokens)
        ok = tokens == exact
        # First mismatch per row (seq_len if clean); commit through the
        # global minimum + 1 (the verifier's token at the first mismatch is
        # already exact).
        first_bad = jnp.min(
            jnp.where(ok.all(axis=1), seq_len, jnp.argmin(ok, axis=1))
        )
        new_start = jnp.minimum(first_bad + 1, seq_len)
        committed = jnp.where(
            jnp.arange(seq_len)[None, :] < new_start, exact, tokens
        )
        return new_start, committed

    start0 = jnp.zeros((), jnp.int32)
    committed0 = jnp.zeros((b, seq_len), jnp.int32)
    _, tokens = jax.lax.while_loop(cond, body, (start0, committed0))
    return tokens
