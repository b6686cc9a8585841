"""Ring attention: sequence-parallel attention over the device mesh.

For sequences too long for one chip's HBM/VMEM, shard the sequence dimension
across devices and rotate KV blocks around the ICI ring with
``jax.lax.ppermute`` — each device holds its query shard permanently and
online-merges softmax partials (running max m, normalizer l, accumulator)
as every KV shard passes through. After axis_size steps each query has
attended to the full sequence without any device ever materializing it.

This is the distributed upgrade path SURVEY §5.7 reserved behind the
attention op interface (single-chip flash kernel: ops/pallas_kernels.py).
Bidirectional (the denoiser's attention is unmasked); per-block compute uses
XLA einsums so the same code runs on the CPU test mesh, and the inner block
computation can later swap to the Pallas flash kernel unchanged.

Numerics are asserted against single-device full attention in
tests/test_ring_attention.py on the 8-device virtual mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _block_attend(q, k_blk, v_blk, scale, m, l, acc):
    """Online-softmax merge of one KV block into (m, l, acc)."""
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k_blk, preferred_element_type=jnp.float32
    ) * scale
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m - m_new)
    l_new = corr * l + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = corr * acc + jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v_blk.dtype), v_blk,
        preferred_element_type=jnp.float32,
    )
    return m_new, l_new, acc_new


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "data",
    bidirectional: bool = False,
) -> jax.Array:
    """Full (unmasked) attention with q/k/v sequence-sharded on ``axis``.

    q, k, v: (B, H, L, Dh) global arrays; L must divide by the axis size.
    Returns the (B, H, L, Dh) result with the same sharding.

    ``bidirectional=True`` splits each device's KV shard in half and rotates
    the halves in opposite directions simultaneously — same step count, half
    the bytes per direction per step, so both ICI link directions carry
    traffic instead of one idling (the bi-directional ring pattern from the
    Pallas guide, expressed at the XLA-collective level).
    """
    b, h, l, dh = q.shape
    n = mesh.shape[axis]
    if l % n:
        raise ValueError(f"sequence {l} not divisible by ring size {n}")
    if bidirectional and (l // n) % 2:
        raise ValueError("bidirectional ring needs an even per-device shard")
    import math

    scale = 1.0 / math.sqrt(dh)  # dh is static (shape), jit-safe
    perm_fwd = [(i, (i + 1) % n) for i in range(n)]
    perm_bwd = [(i, (i - 1) % n) for i in range(n)]

    def local(q_loc, k_loc, v_loc):
        m = jnp.full((*q_loc.shape[:-1], 1), jnp.finfo(jnp.float32).min)
        l_acc = jnp.zeros((*q_loc.shape[:-1], 1), jnp.float32)
        acc = jnp.zeros(q_loc.shape, jnp.float32)

        if bidirectional:
            half = k_loc.shape[2] // 2
            ka, kb = k_loc[:, :, :half], k_loc[:, :, half:]
            va, vb = v_loc[:, :, :half], v_loc[:, :, half:]

            def step(i, carry):
                m, l_acc, acc, ka, va, kb, vb = carry
                m, l_acc, acc = _block_attend(q_loc, ka, va, scale,
                                              m, l_acc, acc)
                m, l_acc, acc = _block_attend(q_loc, kb, vb, scale,
                                              m, l_acc, acc)
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
            m, l_acc, acc = _block_attend(q_loc, k_blk, v_blk, scale,
                                          m, l_acc, acc)
            # Rotate KV to the next device over ICI; the last rotation's
            # result is unused but keeps the loop shape static.
            k_blk = jax.lax.ppermute(k_blk, axis, perm_fwd)
            v_blk = jax.lax.ppermute(v_blk, axis, perm_fwd)
            return m, l_acc, acc, k_blk, v_blk

        m, l_acc, acc, _, _ = jax.lax.fori_loop(
            0, n, step, (m, l_acc, acc, k_loc, v_loc)
        )
        return (acc / l_acc).astype(q_loc.dtype)

    spec = P(None, None, axis, None)
    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    shard = NamedSharding(mesh, spec)
    return sharded(
        jax.device_put(q, shard), jax.device_put(k, shard),
        jax.device_put(v, shard),
    )
