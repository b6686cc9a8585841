"""Ring attention: sequence-parallel attention over the device mesh.

For sequences too long for one chip's HBM/VMEM, shard the sequence dimension
across devices and rotate KV blocks around the ICI ring with
``jax.lax.ppermute`` — each device holds its query shard permanently and
online-merges softmax partials (running max m, normalizer l, accumulator)
as every KV shard passes through. After axis_size steps each query has
attended to the full sequence without any device ever materializing it.

This is the distributed upgrade path SURVEY §5.7 reserved behind the
attention op interface (single-chip flash kernel: ops/pallas_kernels.py),
covering the reference's full O(L²) ``nn.TransformerEncoder`` attention
(/root/reference/src/shakespeare.py:108-111) at sequence lengths one chip
cannot hold.

Two entry points:

- ``ring_attention_shard``: the per-shard SPMD function, callable inside an
  existing ``shard_map`` (this is what ``ops.attention`` routes to when a
  sequence mesh is registered — see ops/registry.py).
- ``ring_attention``: a convenience ``shard_map`` wrapper. It is a pure
  function of its operands — callable under ``jit`` on already-sharded
  arrays; it never places data itself.

Supports causal masking (each query attends to global positions <= its own,
block provenance tracked via ``lax.axis_index``), attention-weight dropout
(per (q-block, kv-block) PRNG folding; the normalizer uses the undropped
weights, matching torch's dropout-after-softmax semantics), and
``kv_chunk``: blockwise sub-chunking of each incoming KV shard, so the
materialized score block is (B, H, L_shard, kv_chunk) instead of
(B, H, L_shard, L_shard) — the flash-attention memory property expressed at
the XLA level, orthogonal to the ring itself.

Numerics are asserted against single-device full attention in
tests/test_ring_attention.py + tests/test_seq_parallel.py on the 8-device
virtual mesh.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _block_attend(q, k_blk, v_blk, scale, m, l, acc, *, mask=None,
                  dropout_rate=0.0, dropout_key=None):
    """Online-softmax merge of one KV block into (m, l, acc).

    ``mask``: optional (Lq, Lk) boolean, True = keep. Handles fully-masked
    blocks: m may stay -inf, in which case the block contributes nothing.
    """
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k_blk, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        s = jnp.where(mask, s, -jnp.inf)
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    # Guard rows with no unmasked key yet: exp(-inf - (-inf)) would be NaN.
    safe_m = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    p = jnp.exp(s - safe_m)
    corr = jnp.exp(m - safe_m)
    l_new = corr * l + jnp.sum(p, axis=-1, keepdims=True)
    if dropout_rate > 0.0:
        # Normalizer l uses undropped p (torch drops *after* softmax);
        # only the value accumulation sees the dropped/rescaled weights.
        keep = jax.random.bernoulli(dropout_key, 1.0 - dropout_rate, p.shape)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    acc_new = corr * acc + jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v_blk.dtype), v_blk,
        preferred_element_type=jnp.float32,
    )
    return m_new, l_new, acc_new


def ring_attention_shard(
    q_loc: jax.Array,
    k_loc: jax.Array,
    v_loc: jax.Array,
    *,
    axis: str,
    causal: bool = False,
    bidirectional: bool = False,
    dropout_rate: float = 0.0,
    dropout_key: jax.Array | None = None,
    kv_chunk: int | None = None,
    block_impl: str = "einsum",
) -> jax.Array:
    """Per-shard ring attention; call inside shard_map/pmap over ``axis``.

    q_loc, k_loc, v_loc: (B, H, L_shard, Dh) — this device's sequence shard.
    Rotates KV around the ring; returns this device's (B, H, L_shard, Dh)
    output. ``causal=True`` masks by *global* position (shard offset from
    ``lax.axis_index``). ``bidirectional=True`` rotates the two KV halves in
    opposite directions so both ICI link directions carry traffic.
    ``kv_chunk``: process each incoming KV shard in sub-chunks of this many
    keys (must divide the shard), bounding the score buffer to
    (B, H, L_shard, kv_chunk).

    ``block_impl``: per-ring-step block compute. "einsum" (default) is the
    XLA online-softmax merge below; "flash" routes each block through the
    lse-carrying Pallas flash kernel (ops/pallas_kernels.
    flash_attention_with_lse) and merges partials via the saved logsumexp —
    the compute path for real multi-chip hardware (VERDICT r2 item 4),
    behind a flag because only numerics (not perf) can be validated on the
    CPU test mesh. Dropout masks differ between the two impls (jax.random
    bernoulli vs the kernel's coordinate hash) — same semantics, different
    stream.
    """
    if dropout_rate > 0.0 and dropout_key is None:
        raise ValueError("dropout_rate > 0 requires dropout_key")
    if block_impl not in ("einsum", "flash"):
        raise ValueError(f"unknown block_impl: {block_impl!r}")
    n = jax.lax.psum(1, axis)
    r = jax.lax.axis_index(axis)
    l_shard = k_loc.shape[2]
    scale = 1.0 / math.sqrt(q_loc.shape[-1])  # static (shape), jit-safe
    perm_fwd = [(i, (i + 1) % n) for i in range(n)]
    perm_bwd = [(i, (i - 1) % n) for i in range(n)]

    q_pos = r * l_shard + jnp.arange(q_loc.shape[2])  # global query rows

    def attend(carry, k_blk, v_blk, global_offset, stream):
        """Merge one KV block into carry, optionally in kv_chunk pieces.

        ``global_offset``: traced global position of the block's first key
        (for causal masking). ``stream``: static int distinguishing the
        forward/backward ring halves for dropout PRNG folding.
        """
        width = k_blk.shape[2]
        chunk = width if kv_chunk is None else kv_chunk
        if width % chunk:
            raise ValueError(f"kv_chunk {chunk} must divide shard {width}")

        def key_for(c):
            if dropout_rate <= 0.0:
                return None
            # Distinct stream per (q-block, kv global offset, sub-chunk):
            # global_offset already encodes (src, half).
            sub = jax.random.fold_in(dropout_key, r)
            sub = jax.random.fold_in(sub, global_offset + c * chunk)
            return jax.random.fold_in(sub, stream)

        def one(c, carry):
            m, l_acc, acc = carry
            ks = jax.lax.dynamic_slice_in_dim(k_blk, c * chunk, chunk, 2)
            vs = jax.lax.dynamic_slice_in_dim(v_blk, c * chunk, chunk, 2)
            if causal:
                kv_pos = global_offset + c * chunk + jnp.arange(chunk)
                mask = q_pos[:, None] >= kv_pos[None, :]
            else:
                mask = None
            return _block_attend(
                q_loc, ks, vs, scale, m, l_acc, acc, mask=mask,
                dropout_rate=dropout_rate, dropout_key=key_for(c),
            )

        n_chunks = width // chunk
        if n_chunks == 1:
            return one(0, carry)
        return jax.lax.fori_loop(0, n_chunks, one, carry)

    def attend_flash(carry, k_blk, v_blk, global_offset):
        """Flash-kernel block compute: (out, lse) for q_loc vs this KV
        shard, merged into the running (m, l, acc) via the logsumexp.
        Fully-masked blocks (entire shard in the causal future) carry
        lse ~= finfo.min and so merge with weight exp(lse - m) = 0."""
        from tinydiffusionmodels_tpu.ops.pallas_kernels import (
            flash_attention_with_lse,
        )

        m, l_acc, acc = carry
        out_b, lse_b = flash_attention_with_lse(
            q_loc, k_blk, v_blk, causal=causal,
            q_offset=r * l_shard, k_offset=global_offset,
            dropout_rate=dropout_rate, dropout_key=dropout_key,
        )
        lse_b = lse_b[..., None]                      # (B, H, L, 1)
        m_new = jnp.maximum(m, lse_b)
        corr = jnp.exp(m - m_new)
        w_b = jnp.exp(lse_b - m_new)
        l_new = corr * l_acc + w_b
        acc_new = corr * acc + w_b * out_b.astype(jnp.float32)
        return m_new, l_new, acc_new

    if block_impl == "flash":
        # The kernel's own block_k tiling subsumes kv_chunk; the carry
        # starts at finfo.min (finite) because the lse merge needs
        # exp(m - m_new) to be well-defined before the first block.
        def attend(carry, k_blk, v_blk, global_offset, stream):
            del stream  # offsets alone position the dropout hash
            return attend_flash(carry, k_blk, v_blk, global_offset)

    m_init = jnp.finfo(jnp.float32).min if block_impl == "flash" else -jnp.inf
    m = jnp.full((*q_loc.shape[:-1], 1), m_init, jnp.float32)
    l_acc = jnp.zeros((*q_loc.shape[:-1], 1), jnp.float32)
    acc = jnp.zeros(q_loc.shape, jnp.float32)

    if bidirectional:
        if l_shard % 2:
            raise ValueError("bidirectional ring needs an even per-device shard")
        half = l_shard // 2
        ka, kb = k_loc[:, :, :half], k_loc[:, :, half:]
        va, vb = v_loc[:, :, :half], v_loc[:, :, half:]

        def step(i, carry):
            m, l_acc, acc, ka, va, kb, vb = carry
            src_a = (r - i) % n       # forward ring: block from r-i
            src_b = (r + i) % n       # backward ring: block from r+i
            # First half of src_a's shard; second half of src_b's shard
            # (global offset src_b*l_shard + half).
            m, l_acc, acc = attend(
                (m, l_acc, acc), ka, va, src_a * l_shard, 0
            )
            m, l_acc, acc = attend(
                (m, l_acc, acc), kb, vb, src_b * l_shard + half, 1
            )
            ka = jax.lax.ppermute(ka, axis, perm_fwd)
            va = jax.lax.ppermute(va, axis, perm_fwd)
            kb = jax.lax.ppermute(kb, axis, perm_bwd)
            vb = jax.lax.ppermute(vb, axis, perm_bwd)
            return m, l_acc, acc, ka, va, kb, vb

        m, l_acc, acc, *_ = jax.lax.fori_loop(
            0, n, step, (m, l_acc, acc, ka, va, kb, vb)
        )
        return (acc / l_acc).astype(q_loc.dtype)

    def step(i, carry):
        m, l_acc, acc, k_blk, v_blk = carry
        src = (r - i) % n  # forward rotation: at step i we hold block r-i
        m, l_acc, acc = attend((m, l_acc, acc), k_blk, v_blk,
                               src * l_shard, 0)
        # Rotate KV to the next device over ICI; the last rotation's
        # result is unused but keeps the loop shape static.
        k_blk = jax.lax.ppermute(k_blk, axis, perm_fwd)
        v_blk = jax.lax.ppermute(v_blk, axis, perm_fwd)
        return m, l_acc, acc, k_blk, v_blk

    m, l_acc, acc, _, _ = jax.lax.fori_loop(
        0, n, step, (m, l_acc, acc, k_loc, v_loc)
    )
    return (acc / l_acc).astype(q_loc.dtype)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "data",
    causal: bool = False,
    bidirectional: bool = False,
    dropout_rate: float = 0.0,
    dropout_key: jax.Array | None = None,
    kv_chunk: int | None = None,
    block_impl: str = "einsum",
    batch_axis: str | None = "auto",
) -> jax.Array:
    """Attention with q/k/v sequence-sharded on mesh ``axis``.

    q, k, v: (B, H, L, Dh) global arrays; L must divide by the axis size.
    Pure function of its operands — composes under ``jit``; callers place
    data (P(batch_axis, None, axis, None) sharding). Returns the
    (B, H, L, Dh) result with the same sharding.

    ``batch_axis``: mesh axis the batch dim is sharded on, for combined
    data x sequence meshes (e.g. {'data': 4, 'seq': 2}): each (data, seq)
    submesh then runs an independent ring on its batch shard. "auto" uses
    'data' when the mesh has one (and it is not the ring axis); None
    replicates the batch — on a dp x sp mesh that would silently
    all-gather the batch into every ring and discard the dp split.
    """
    l = q.shape[2]
    n = mesh.shape[axis]
    if l % n:
        raise ValueError(f"sequence {l} not divisible by ring size {n}")
    if dropout_rate > 0.0 and dropout_key is None:
        # Raise here, not just in ring_attention_shard: the shard_map wrapper
        # substitutes a dummy key below, which would otherwise silently apply
        # the SAME deterministic dropout mask on every call.
        raise ValueError("dropout_rate > 0 requires dropout_key")
    if batch_axis == "auto":
        batch_axis = "data" if ("data" in mesh.shape and axis != "data") else None
    b = q.shape[0]
    if batch_axis is not None and b % mesh.shape[batch_axis]:
        raise ValueError(
            f"batch {b} not divisible by {batch_axis!r} axis size "
            f"{mesh.shape[batch_axis]}"
        )

    def local(q_loc, k_loc, v_loc, key_loc):
        if batch_axis is not None and dropout_rate > 0.0:
            # Distinct masks per batch shard: the shard fn only folds in the
            # ring position, so without this every data-shard would draw the
            # SAME mask for its local batch block.
            key_loc = jax.random.fold_in(
                key_loc, jax.lax.axis_index(batch_axis)
            )
        return ring_attention_shard(
            q_loc, k_loc, v_loc, axis=axis, causal=causal,
            bidirectional=bidirectional, dropout_rate=dropout_rate,
            dropout_key=key_loc, kv_chunk=kv_chunk, block_impl=block_impl,
        )

    spec = P(batch_axis, None, axis, None)
    key_in = dropout_key
    if key_in is None:
        # shard_map needs a concrete operand; pass a dummy key (unused).
        key_in = jax.random.PRNGKey(0)
    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec, P()),
        out_specs=spec,
        check_vma=False,
    )
    return sharded(q, k, v, key_in)
