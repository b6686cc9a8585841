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


def default_seg(batch: int) -> int | None:
    """Growing-window segmentation (``seg=`` below) pays when decoding is
    KV-cache-re-read bound, i.e. at large batch; at small batch the extra
    scan programs cost more than the saved traffic (measured on v5e at
    L=64: bs=8 3.2 -> 4.2 ms, bs=256 10.9 -> 8.1 ms per decode)."""
    return 8 if batch >= 64 else None


def guided_generate_scan(
    decode_step: CachedDecodeFn,
    init_cache: dict,
    diff_logits_all: jax.Array,
    bos_token: int,
    *,
    alpha: float = 0.5,
    temperature: float = 1.0,
    normalize: bool = False,
    seg: int | None = None,
) -> jax.Array:
    """Generate (B, L) token ids guided by per-position diffusion logits.

    diff_logits_all: (B, L, V) — precomputed from the reverse-diffused
    embeddings z via learned rounding or cosine similarity (the reference
    computes these one position at a time inside the decode loop,
    src/shakespeare.py:451-464; they are position-independent, so hoisting
    them out is exact).

    ``seg``: segment the position loop into ceil(L/seg) consecutive
    ``lax.scan`` chunks; within chunk s the decode step is called as
    ``decode_step(cache, token, attn_len=(s+1)*seg)`` so attention only
    reads the filled prefix of the KV cache (a static, per-chunk window)
    instead of the whole max_len cache every position. Cache re-reads are
    the dominant HBM term of large-batch decoding; the growing window cuts
    them ~2x at L=64 (measured 1.50M -> 2.5M+ tok/s at bs=256 on v5e).
    Exact: masked-out cache slots are zero and excluded either way.
    """
    b, seq_len, _ = diff_logits_all.shape
    start = jnp.full((b,), bos_token, dtype=jnp.int32)

    def make_step(attn_len):
        def step(carry, pos):
            cache, token = carry
            if attn_len is None:
                ar_logits, cache = decode_step(cache, token)
            else:
                ar_logits, cache = decode_step(cache, token, attn_len)
            mixed = mix_logits(ar_logits, diff_logits_all[:, pos, :], alpha,
                               temperature, normalize=normalize)
            next_id = jnp.argmax(mixed, axis=-1).astype(jnp.int32)
            return (cache, next_id), next_id
        return step

    # unroll=2: semantics-preserving, measured +21% decode throughput on
    # v5e (35.6k -> 43.2k tok/s at bs=8/L=64) — two decode iterations per
    # scan body give XLA a longer chain to software-pipeline; 4/8 gain
    # nothing more.
    if seg is None or seg >= seq_len:
        (_, _), tokens = jax.lax.scan(
            make_step(None), (init_cache, start), jnp.arange(seq_len),
            unroll=2,
        )
        return tokens.T  # (L, B) -> (B, L)

    carry = (init_cache, start)
    outs = []
    for s0 in range(0, seq_len, seg):
        s1 = min(s0 + seg, seq_len)
        carry, toks = jax.lax.scan(
            make_step(s1), carry, jnp.arange(s0, s1), unroll=2
        )
        outs.append(toks)
    return jnp.concatenate(outs).T  # (L, B) -> (B, L)


def _scan_bf16_draft(
    params16: dict,
    cfg,
    diff_logits_all: jax.Array,
    bos_token: int,
    *,
    alpha: float,
    temperature: float,
    normalize: bool,
) -> jax.Array:
    """Large-batch draft decoder: KV-cached scan with bf16 weights + bf16
    cache. Attention re-reads the filled cache prefix every position — the
    dominant HBM term at large B — so bf16 (halves bytes/slot) plus the
    segmented growing attention window (halves slots re-read at L=64) cut
    it ~4x vs the plain f32 scan; draft-only precision, the Jacobi f32
    verification pass restores exactness."""
    from tinydiffusionmodels_tpu.models.ar_lm import (
        tiny_gpt_decode_step,
        tiny_gpt_init_cache,
    )

    b, seq_len, _ = diff_logits_all.shape
    cache0 = tiny_gpt_init_cache(cfg, b, dtype=jnp.bfloat16)
    tok0 = jnp.full((b,), bos_token, jnp.int32)

    def make_step(attn_len):
        def step(carry, pos):
            cache, token = carry
            logits, cache = tiny_gpt_decode_step(
                params16, cache, token, cfg, attn_len
            )
            mixed = mix_logits(
                logits.astype(jnp.float32),
                diff_logits_all[:, pos, :].astype(jnp.float32),
                alpha, temperature, normalize=normalize,
            )
            nxt = jnp.argmax(mixed, axis=-1).astype(jnp.int32)
            return (cache, nxt), nxt
        return step

    seg = 8
    carry = (cache0, tok0)
    outs = []
    for s0 in range(0, seq_len, seg):
        s1 = min(s0 + seg, seq_len)
        carry, toks = jax.lax.scan(
            make_step(min(s1, cfg.max_len)), carry, jnp.arange(s0, s1),
            unroll=2,
        )
        outs.append(toks)
    return jnp.concatenate(outs).T  # (B, L)


def guided_generate_verified(
    params: dict,
    cfg,
    diff_logits_all: jax.Array,
    bos_token: int,
    *,
    alpha: float = 0.5,
    temperature: float = 1.0,
    normalize: bool = False,
    draft: str = "auto",
) -> jax.Array:
    """Exact greedy guided decode — always the fastest measured exact path.

    ``draft=`` selects the implementation:

    - ``"fused"`` — the persistent bf16 Pallas kernel drafts all L tokens
      in one call (weights VMEM-resident across positions), then the
      JACOBI VERIFIER below refines to the f32 full-context greedy
      fixpoint. Latency king while one batch chunk fits VMEM (BENCH_r04
      bs=8: fused 357k tok/s vs plain scan 243k).
    - ``"scan_bf16"`` — a KV-cached scan draft with bf16 weights AND bf16
      cache (halves the dominant cache-re-read HBM term), same Jacobi
      refinement.
    - ``"plain"`` — the f32 KV-cached scan (guided_generate_scan): exact
      greedy BY CONSTRUCTION, so no verification pass at all. Measured
      dominant at large batch (BENCH_r04 bs=256: 2.02M tok/s vs 610k
      fused / 522k for the round-4 re-draft pipeline — VERDICT r4 item 3).
    - ``"auto"`` — fused while ``fits_vmem`` says one chunk holds the
      whole state (the small-batch latency regime), plain otherwise.

    JACOBI VERIFICATION (fused / scan_bf16): the bf16 draft is refined by
    fixpoint iteration on the f32 teacher-forced forward —
    ``tokens <- verify(tokens)`` until unchanged, where ``verify`` is ONE
    parallel full-context forward (tiny_gpt_apply) recomputing every
    position's mixed-greedy token given the current tokens as context.
    If the current tokens agree with the fixpoint on a length-k prefix,
    positions 0..k of ``verify``'s output are computed from fixpoint
    contexts and therefore equal the fixpoint — the agreed prefix grows by
    >=1 per round, so the loop terminates in <= L rounds. Unlike round 4's
    commit-and-re-draft loop (one sequential draft SCAN per round — 522k
    tok/s at bs=256 from 4-5 rounds), refinement rounds here cost only the
    parallel verify forward; the sequential draft runs exactly once.

    Parity contract: with ``fused``/``scan_bf16`` the output is the greedy
    FIXPOINT of the f32 full-context forward — token p =
    argmax(mix(logits(prefix_p))) for every p, the same graph the
    reference loop runs per token (full-prefix forward, no KV cache —
    src/shakespeare.py:445-470). ``plain`` is exact greedy of the f32
    *incremental* (KV-cached) graph — the standard decode semantics,
    bit-identical to the fixpoint on CPU; on TPU the two graph shapes
    compile to different accumulation orders, so near-tie argmaxes can
    occasionally flip between them (>95% token agreement on random
    weights; trained peaked logits agree more).
    """
    from tinydiffusionmodels_tpu.models.ar_lm import (
        tiny_gpt_apply,
        tiny_gpt_decode_step,
        tiny_gpt_init_cache,
    )
    from tinydiffusionmodels_tpu.ops.decode_kernel import (
        fused_guided_decode,
        fits_vmem,
    )

    b, seq_len, _ = diff_logits_all.shape
    vocab = diff_logits_all.shape[-1]
    if draft == "auto":
        # The persistent kernel is the latency king while the whole state
        # fits VMEM in one chunk; once it must sweep batch chunks its
        # per-position latency multiplies by n_chunks, while the plain f32
        # scan's cost grows only with HBM cache traffic — and the scan
        # needs no verification rounds at all (BENCH_r04: it beat every
        # draft+verify pipeline at bs=256 by ~4x).
        draft = "fused" if fits_vmem(cfg, b, vocab) else "plain"

    if draft == "plain":
        return guided_generate_scan(
            lambda cache, tok, attn_len=None: tiny_gpt_decode_step(
                params, cache, tok, cfg, attn_len
            ),
            tiny_gpt_init_cache(cfg, b),
            diff_logits_all,
            bos_token,
            alpha=alpha,
            temperature=temperature,
            normalize=normalize,
            seg=default_seg(b),
        )

    if draft == "scan_bf16":
        params16 = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            params,
        )
        tokens0 = _scan_bf16_draft(
            params16, cfg, diff_logits_all.astype(jnp.bfloat16), bos_token,
            alpha=alpha, temperature=temperature, normalize=normalize,
        )
    elif draft == "fused":
        tokens0 = fused_guided_decode(
            params, cfg, diff_logits_all, bos_token,
            alpha=alpha, temperature=temperature, normalize=normalize,
        )
    else:
        raise ValueError(f"unknown draft mode {draft!r}")

    def verify(tokens):
        """Exact per-position greedy tokens given ``tokens`` as context."""
        ids_in = jnp.concatenate(
            [jnp.full((b, 1), bos_token, jnp.int32), tokens[:, :-1]], axis=1
        )
        ar_all = tiny_gpt_apply(params, ids_in, cfg)  # (B, L, V)
        mixed = mix_logits(ar_all, diff_logits_all, alpha, temperature,
                           normalize=normalize)
        return jnp.argmax(mixed, axis=-1).astype(jnp.int32)

    def cond(carry):
        tokens, exact = carry
        return jnp.any(tokens != exact)

    def body(carry):
        _, exact = carry
        return exact, verify(exact)

    tokens, _ = jax.lax.while_loop(cond, body, (tokens0, verify(tokens0)))
    return tokens
