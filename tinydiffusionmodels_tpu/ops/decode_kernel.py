"""Fused persistent guided-decode kernel: the whole AR+diffusion decode as
ONE Pallas call.

Why: guided decoding is a serial chain — token t+1 needs argmax of token
t's logits — so at the reference's n<=10 batch it is pure latency
(BENCH_r02: 0.31% MFU, ~120 us per token-step). The scan path already
removed Python dispatch; what remains is the per-step XLA op chain, which
re-streams every weight from HBM on every token (~13 MB f32 for the
TinyGPT fallback LM = a ~16 us/token hard floor before op overheads).

This kernel inverts that: ``grid=(L,)`` walks positions *inside* one
pallas_call, so every weight block (constant index_map) is fetched to VMEM
once and stays resident for all L tokens; the KV cache and the carried
token live in VMEM scratch, which persists across sequential grid steps on
TPU. Per-position work drops to the actual compute (a few MXU dots on a
256-wide model) plus one small DMA for that position's diffusion-logit
row. Logit mix (sample/guided.mix_logits semantics) and the greedy argmax
run in-kernel, so the only outputs are the (B, L) token ids.

Weights are cast to bf16 for VMEM residency (f32 LN/softmax/accumulation);
``fused_guided_decode`` is therefore a *draft*-exact path: near-identical
to the f32 scan decoder but not bit-guaranteed. ``guided_generate_verified``
(sample/guided.py) refines it by Jacobi fixpoint iteration on the exact
f32 teacher-forced forward, so the end-to-end result is the exact greedy
fixpoint of the f32 full-context forward: the same graph the reference's
per-token full-prefix loop computes (src/shakespeare.py:445-470), at
fused speed.

Capacity: TinyGPT(dim=256, depth=4) bf16 weights ~6.3 MB + f32 KV cache +
embeddings fits the ~16 MB VMEM for vocab sizes up to a few thousand;
``fits_vmem`` guards the routing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinydiffusionmodels_tpu.ops.pallas_kernels import _interpret


def _layernorm(x, scale, bias):
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return ((x - mu) * jax.lax.rsqrt(var + 1e-5)
            * scale.astype(jnp.float32) + bias.astype(jnp.float32))


def _matmul(x, w_ref, b_ref=None):
    """(B, in) f32 x bf16 weight ref -> (B, out) f32."""
    out = jax.lax.dot_general(
        x.astype(w_ref.dtype), w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if b_ref is not None:
        out = out + b_ref[:].astype(jnp.float32)
    return out


def _decode_kernel(
    bos_ref,            # SMEM (1,) int32: [bos]
    tok_emb_ref,        # (V, D) bf16
    pos_emb_ref,        # (1, 1, D) bf16 — this position's row (streamed)
    lnf_w_ref, lnf_b_ref,
    head_ref,           # (D, V) bf16
    diff_ref,           # (1, 1, B, V) bf16 — this (chunk, position)'s
                        # diffusion logits (draft-only precision;
                        # verification reruns the mix in f32)
    *layer_refs,        # per layer: ln1w ln1b qkvw qkvb projw projb
                        #            ln2w ln2b fcw fcb mlpw mlpb
                        # then outputs/scratch: tokens_ref, cur_tok, kc, vc
    depth: int, n_heads: int, alpha: float, temperature: float,
    normalize: bool,
):
    per = 12
    weights = layer_refs[: depth * per]
    tokens_ref, cur_tok, kc, vc = layer_refs[depth * per:]
    # grid = (batch chunks, positions), positions fastest: each chunk runs
    # its full position sweep with the SAME VMEM-resident weights (constant
    # index_map ⇒ fetched once for the whole grid), and the pos==0 reset
    # below reinitializes the carried token + KV scratch per chunk.
    pos = pl.program_id(1)
    b = cur_tok.shape[1]
    v = tok_emb_ref.shape[0]
    d = tok_emb_ref.shape[1]
    dh = d // n_heads

    @pl.when(pos == 0)
    def _():
        cur_tok[:] = jnp.full((1, b), bos_ref[0], jnp.int32)
        # Zero the KV scratch: softmax weights are exactly 0 beyond pos,
        # but 0 * uninitialized(NaN) = NaN in the p @ v reduction.
        kc[:] = jnp.zeros_like(kc)
        vc[:] = jnp.zeros_like(vc)

    tok = cur_tok[:].reshape(b, 1)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (b, v), 1) == tok
    ).astype(tok_emb_ref.dtype)
    x = jax.lax.dot_general(
        onehot, tok_emb_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    x = x + pos_emb_ref[0].astype(jnp.float32)  # (B, D) via (1, D) bcast

    # Cache layout (T, depth, H, B, Dh): the dynamic per-position write
    # indexes the LEADING (untiled) dim — Mosaic's sublane-alignment prover
    # rejects dynamic indices in the tiled last-two dims (and bf16 tiles
    # are 16 rows, so even the f32-legal layout dies at bf16). The (B, Dh)
    # trailing tile is also perfectly aligned (8 sublanes x 64 lanes).
    t_max = kc.shape[0]
    for i in range(depth):
        (ln1w, ln1b, qkvw, qkvb, projw, projb,
         ln2w, ln2b, fcw, fcb, mlpw, mlpb) = weights[i * per:(i + 1) * per]
        h = _layernorm(x, ln1w[:], ln1b[:])
        qkv = _matmul(h, qkvw, qkvb)          # (B, 3D)
        outs = []
        for hd in range(n_heads):
            q = qkv[:, hd * dh:(hd + 1) * dh]
            k = qkv[:, d + hd * dh:d + (hd + 1) * dh]
            vv = qkv[:, 2 * d + hd * dh:2 * d + (hd + 1) * dh]
            kc[pl.ds(pos, 1), i, hd, :, :] = k[None, :, :].astype(kc.dtype)
            vc[pl.ds(pos, 1), i, hd, :, :] = vv[None, :, :].astype(vc.dtype)
            k_slab = kc[:, i, hd, :, :].astype(jnp.float32)  # (T, B, Dh)
            v_slab = vc[:, i, hd, :, :].astype(jnp.float32)
            s = jnp.sum(
                q[None, :, :] * k_slab, axis=-1
            ) / np.sqrt(dh)                    # (T, B) — VPU reduce
            tpos = jax.lax.broadcasted_iota(jnp.int32, (t_max, b), 0)
            s = jnp.where(tpos <= pos, s, -jnp.inf)
            m = jnp.max(s, axis=0, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=0, keepdims=True)
            outs.append(jnp.sum(p[:, :, None] * v_slab, axis=0))  # (B, Dh)
        attn = jnp.concatenate(outs, axis=-1)  # (B, D)
        x = x + _matmul(attn, projw, projb)
        h = _layernorm(x, ln2w[:], ln2b[:])
        h = jax.nn.gelu(_matmul(h, fcw, fcb))
        x = x + _matmul(h, mlpw, mlpb)

    x = _layernorm(x, lnf_w_ref[:], lnf_b_ref[:])

    # Head matmul + mix_logits semantics (sample/guided.py:26-58) + greedy
    # argmax, CHUNKED over the vocab: live buffers stay (B, <=1024) no
    # matter how wide V is (the V=4096 config blew the VMEM stack by 18.5K
    # with full-width (B, V) f32 intermediates), and the argmax is a
    # where/iota/min formulation because jnp.argmax's lowering dies in
    # Mosaic on an f32->i32 vector materialization at some widths.
    # Tie semantics match jnp.argmax exactly: within a chunk min-index on
    # the max positions, across chunks strict > so the earlier chunk wins.
    chunk = min(1024, v)
    inv_t = jnp.float32(1.0 / temperature)

    def head_chunk(c):
        a_c = jax.lax.dot_general(
            x.astype(head_ref.dtype), head_ref[:, c:c + chunk],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_t
        d_c = diff_ref[0, 0][:, c:c + chunk].astype(jnp.float32) * inv_t
        return a_c, d_c

    if normalize:
        # Pass 1: logsumexp of both heads (chunked online merge).
        ma = jnp.full((b, 1), -jnp.inf)
        md = jnp.full((b, 1), -jnp.inf)
        za = jnp.zeros((b, 1))
        zd = jnp.zeros((b, 1))
        for c in range(0, v, chunk):
            a_c, d_c = head_chunk(c)
            ma_n = jnp.maximum(ma, jnp.max(a_c, axis=-1, keepdims=True))
            za = za * jnp.exp(ma - ma_n) + jnp.sum(
                jnp.exp(a_c - ma_n), axis=-1, keepdims=True
            )
            ma = ma_n
            md_n = jnp.maximum(md, jnp.max(d_c, axis=-1, keepdims=True))
            zd = zd * jnp.exp(md - md_n) + jnp.sum(
                jnp.exp(d_c - md_n), axis=-1, keepdims=True
            )
            md = md_n

    best_val = jnp.full((b,), -jnp.inf)
    best_idx = jnp.zeros((b,), jnp.int32)
    for c in range(0, v, chunk):
        a_c, d_c = head_chunk(c)
        if normalize:
            # argmax of log((1-a)pa + a*pd) == argmax of the mixture
            # probability itself (log is monotone).
            m_c = (1.0 - alpha) * jnp.exp(a_c - ma) / za + alpha * jnp.exp(
                d_c - md
            ) / zd
        else:
            m_c = (1.0 - alpha) * a_c + alpha * d_c
        cmax = jnp.max(m_c, axis=-1)  # (B,)
        idx = c + jax.lax.broadcasted_iota(jnp.int32, m_c.shape, 1)
        cidx = jnp.min(
            jnp.where(m_c >= cmax[:, None], idx, jnp.int32(2**30)), axis=-1
        )
        take = cmax > best_val
        best_idx = jnp.where(take, cidx, best_idx)
        best_val = jnp.maximum(best_val, cmax)
    nxt = best_idx[None, :]  # (1, B)
    cur_tok[:] = nxt
    tokens_ref[0, 0] = nxt


def _cast_weights(params, depth):
    """TinyGPT params -> flat bf16 operand list (layer-major). 1-D vectors
    become (1, n): Mosaic wants >=2-D VMEM operands. Everything is bf16 —
    the V=4096 config sits 18.5 KB from the VMEM stack limit with f32
    vectors; compute still accumulates in f32."""
    bf = lambda a: jnp.asarray(a, jnp.bfloat16)
    vec = lambda a: jnp.asarray(a, jnp.bfloat16).reshape(1, -1)
    flat = []
    for i in range(depth):
        blk = params["blocks"][i]
        flat += [
            vec(blk["ln1"]["scale"]), vec(blk["ln1"]["bias"]),
            bf(blk["attn"]["qkv"]["w"]), vec(blk["attn"]["qkv"]["b"]),
            bf(blk["attn"]["proj"]["w"]), vec(blk["attn"]["proj"]["b"]),
            vec(blk["ln2"]["scale"]), vec(blk["ln2"]["bias"]),
            bf(blk["mlp"]["fc"]["w"]), vec(blk["mlp"]["fc"]["b"]),
            bf(blk["mlp"]["proj"]["w"]), vec(blk["mlp"]["proj"]["b"]),
        ]
    return flat


def fits_vmem(cfg, batch: int, vocab: int) -> bool:
    """Conservative VMEM budget check for the persistent kernel.

    bf16 weights + bf16 KV cache + embeddings + streamed diff row + live
    vectors against a 14 MB budget (measured: the V=4096 bench config's
    compile-reported stack peaks ~17 MB with f32 caches = 3.3 MB over the
    16 MB VMEM; bf16 caches bring it under)."""
    d = cfg.dim
    core = cfg.depth * (3 * d * d + d * d + 2 * cfg.ffn_mult * d * d) * 2
    emb = 2 * vocab * d * 2 + cfg.max_len * d * 2
    cache = 2 * cfg.depth * batch * cfg.max_len * d * 2
    diff = batch * vocab * 4
    work = 6 * batch * max(vocab, 3 * d) * 4
    return core + emb + cache + diff + work < 14 * 1024 * 1024


def _pick_chunk(cfg, b: int, vocab: int) -> int:
    """Largest batch chunk the persistent kernel can hold in VMEM.

    Whole-batch if it fits; otherwise the largest multiple of 8 that does
    (8 = the sublane count — the KV scratch's (B, Dh) trailing tile and the
    per-head (T, B) score tiles stay aligned)."""
    if fits_vmem(cfg, b, vocab):
        return b
    for cand in range((b - 1) // 8 * 8, 8, -8):
        if fits_vmem(cfg, cand, vocab):
            return cand
    return 8


def fused_guided_decode(
    params: dict,
    cfg,
    diff_logits_all: jax.Array,
    bos_token,
    *,
    alpha: float = 0.5,
    temperature: float = 1.0,
    normalize: bool = False,
) -> jax.Array:
    """Whole guided decode (B, L, V) diffusion logits -> (B, L) tokens in
    one persistent Pallas call (see module docstring). bf16 weights; use
    sample.guided.guided_generate_verified for bit-exact greedy parity
    with the f32 scan path. Batches beyond one chunk's VMEM capacity run
    as sequential chunk sweeps inside the same kernel (grid=(chunks, L))
    so the weights are still fetched exactly once."""
    b, seq_len, vocab = diff_logits_all.shape
    d = cfg.dim
    dh = d // cfg.n_heads
    t_pad = -(-cfg.max_len // 8) * 8
    c_sz = _pick_chunk(cfg, b, vocab)
    n_chunks = -(-b // c_sz)
    b_pad = n_chunks * c_sz

    diff_op = jnp.asarray(diff_logits_all, jnp.bfloat16)
    if b_pad != b:
        diff_op = jnp.pad(diff_op, ((0, b_pad - b), (0, 0), (0, 0)))
    # (B, L, V) -> (C, L, c, V): chunk-major so each streamed block's last
    # two dims are the FULL (c, V) — Mosaic's block-tiling rule forbids a
    # partial row in the last two positions.
    diff_op = diff_op.reshape(n_chunks, c_sz, seq_len, vocab).transpose(
        0, 2, 1, 3
    )

    const = lambda ref_shape: pl.BlockSpec(
        ref_shape, lambda c, i: tuple(0 for _ in ref_shape),
        memory_space=pltpu.VMEM,
    )
    weights = _cast_weights(params, cfg.depth)
    head = jnp.asarray(params["lm_head"]["w"], jnp.bfloat16)
    operands = [
        jnp.asarray(params["tok_emb"], jnp.bfloat16),
        jnp.asarray(params["pos_emb"], jnp.bfloat16)[:, None, :],
        jnp.asarray(params["ln_f"]["scale"], jnp.bfloat16).reshape(1, -1),
        jnp.asarray(params["ln_f"]["bias"], jnp.bfloat16).reshape(1, -1),
        head,
    ]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]      # bos
    in_specs += [const(operands[0].shape)]                  # tok_emb
    in_specs += [
        # pos_emb: one row per grid step — Mosaic cannot prove an
        # in-kernel dynamic sublane index aligned, so stream via index_map
        # ((Lmax, 1, D) layout: a (1, 1, D) block satisfies the last-two-
        # dims tiling rule because dim 1 IS size 1).
        pl.BlockSpec((1, 1, d), lambda c, i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    in_specs += [const(o.shape) for o in operands[2:]]
    in_specs += [
        pl.BlockSpec((1, 1, c_sz, vocab), lambda c, i: (c, i, 0, 0),
                     memory_space=pltpu.VMEM),              # diff row
    ]
    in_specs += [const(w.shape) for w in weights]

    kernel = functools.partial(
        _decode_kernel,
        depth=cfg.depth, n_heads=cfg.n_heads, alpha=float(alpha),
        temperature=float(temperature), normalize=bool(normalize),
    )
    tokens = pl.pallas_call(
        kernel,
        grid=(n_chunks, seq_len),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 1, c_sz), lambda c, i: (c, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_chunks, seq_len, 1, c_sz),
                                       jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((1, c_sz), jnp.int32),                       # cur_tok
            # bf16 cache halves the largest scratch block (VMEM budget);
            # the f32 verification pass absorbs the draft-precision loss.
            # T-leading layout: see the kernel's cache comment. T is padded
            # to a sublane multiple (8): the per-head (T, B) score/softmax
            # intermediates then tile cleanly instead of relayouting a
            # (65, B) block every position; the causal mask (tpos <= pos)
            # already excludes the zeroed pad rows.
            pltpu.VMEM((t_pad, cfg.depth, cfg.n_heads, c_sz, dh),
                       jnp.bfloat16),                               # k cache
            pltpu.VMEM((t_pad, cfg.depth, cfg.n_heads, c_sz, dh),
                       jnp.bfloat16),                               # v cache
        ],
        # Mosaic's default scoped-vmem cap is 16 MiB; the resident
        # weights + KV scratch legitimately sit just above it at
        # vocab=4096/c=8 (measured 16.35 MiB). v5e has 128 MiB of
        # physical VMEM — raise the cap, keep fits_vmem's 14 MiB model
        # as the chunk-size planner.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(
        jnp.asarray(bos_token, jnp.int32).reshape(1),
        *operands,
        diff_op,
        *weights,
    )
    # (C, L, 1, c) -> (B, L)
    return tokens[:, :, 0, :].transpose(0, 2, 1).reshape(b_pad, seq_len)[:b]
