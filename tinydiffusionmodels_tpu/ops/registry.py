"""Backend dispatch for hot ops: 'xla' reference vs 'pallas' TPU kernels.

Selection order:
1. explicit ``set_backend(...)`` call,
2. ``TDM_KERNELS`` env var ('xla' | 'pallas' | 'auto'),
3. 'auto': pallas on TPU backends, xla elsewhere.

Pallas kernels register lazily (import cost + TPU-only); any op a backend
doesn't provide falls through to the XLA reference, so partial Pallas
coverage is fine.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp

from tinydiffusionmodels_tpu.ops import xla_ref

_override: str | None = None

# Per-op winners under 'auto' on TPU, decided by measurement (v5e-1,
# tools/kernel_bench.py — scan-length-delta timing with per-call input
# variation; naive timings are dominated by ~25 ms fixed remote-dispatch
# cost and defeated by the terminal's result memoization):
# - attention -> 'pallas', whose own dispatch is itself measured
#   (pallas_kernels.attention): XLA's fused attention wins while the
#   (L, L) score buffers stay on-chip (L=64 ~1us, B8/L512 24us vs flash
#   87us) and is used below a 96 MB score-footprint threshold; above it
#   (B8/L1024: XLA 571us vs flash ~190us) the Pallas flash kernel runs,
#   and it is the only O(L)-memory path for long sequences. Training
#   (dropout>0) routes on FOOTPRINT too, with a 2x-later 192 MB
#   threshold: isolated-kernel timings said flash from ~8 MB of scores,
#   but end-to-end the custom-call operand materialization costs more
#   than the kernel win at every on-chip shape — bs=512/L=64 bf16 train
#   scan 53.9 it/s (XLA) vs 42.1 (flash), and the round-5 mid-L sweep
#   (bs=8/L=512 +14% XLA, bs=2/L=1024 +7%, bs=4/L=1024 +5%, bs=8/L=1024
#   flash +6%; docs/docs/assets/r5/layout_ab_midL_bf16.txt), measured
#   v5e-1 2026-08-19 (see pallas_kernels.attention). Models pass
#   layout='blhd' single-chip
#   so the head split is a free reshape, not a copy.
# - fused_resblock: xla WINS at every production shape — e.g. 64->64@14x14
#   B128: xla 19.9us = 186 TFLOP/s = 94% of v5e bf16 peak, vs pallas
#   123.8us. XLA's conv emitter is at the MXU/HBM roofline for these tiny
#   convs (docs: mfu-roofline post); the Pallas kernel is kept as the
#   reference fused formulation -> xla.
_AUTO_TPU = {"attention": "pallas", "fused_resblock": "xla", "conv2d": "xla"}


def set_backend(name: str | None) -> None:
    """Force an op backend ('xla', 'pallas') or None to restore auto."""
    global _override
    if name not in (None, "xla", "pallas"):
        raise ValueError(f"unknown ops backend: {name!r}")
    _override = name


def get_backend() -> str:
    if _override is not None:
        return _override
    env = os.environ.get("TDM_KERNELS", "auto")
    if env in ("xla", "pallas"):
        return env
    return "auto"


def _resolve(op_name: str) -> str:
    backend = get_backend()
    if backend != "auto":
        return backend
    try:
        platform = jax.default_backend()
    except Exception:  # pragma: no cover
        platform = "cpu"
    if platform == "tpu":
        return _AUTO_TPU.get(op_name, "xla")
    return "xla"


def _pallas_module():
    from tinydiffusionmodels_tpu.ops import pallas_kernels

    return pallas_kernels


def _dispatch(op_name: str) -> Any:
    if _resolve(op_name) == "pallas":
        mod = _pallas_module()
        fn = getattr(mod, op_name, None)
        if fn is not None:
            return fn
    return getattr(xla_ref, op_name)


def conv2d(x, w, b=None, *, stride: int = 1, padding: str = "SAME"):
    return _dispatch("conv2d")(x, w, b, stride=stride, padding=padding)


def fused_resblock(x, p, time_bias):
    return _dispatch("fused_resblock")(x, p, time_bias)


def fused_resblock_split(x_a, x_b, p, time_bias):
    # XLA-only (no Pallas variant): the win is avoiding data movement, not
    # manual scheduling — see ops/xla_ref.fused_resblock_split.
    return xla_ref.fused_resblock_split(x_a, x_b, p, time_bias)


# Sequence-parallel routing: when a model is configured with a sequence
# axis (TransformerConfig.seq_axis), ops.attention dispatches to ring
# attention over the mesh registered for that axis (SURVEY §5.7: ring is a
# kernel swap behind the op interface, not a model change). Registration is
# persistent module state so jit retraces resolve identically.
_SEQ_MESHES: dict[str, Any] = {}


def register_sequence_mesh(mesh, axis: str = "seq") -> None:
    """Register ``mesh`` as the ring for sequence axis ``axis``.

    The registered mesh is bound at *trace* time: a function already jitted
    and traced with one mesh keeps using it from its compile cache even if
    this is later called with a different mesh for the same axis. When
    re-registering an axis with a different mesh, cached traces are cleared
    so subsequent calls retrace against the new mesh.
    """
    prev = _SEQ_MESHES.get(axis)
    _SEQ_MESHES[axis] = mesh
    if prev is not None and prev is not mesh:
        # Stale-mesh hazard: drop compile caches so old traces can't keep
        # routing collectives over the previous mesh.
        jax.clear_caches()


def attention(q, k, v, *, mask=None, dropout_rate: float = 0.0,
              dropout_key=None, seq_axis: str | None = None,
              causal: bool = False, layout: str = "bhld"):
    if seq_axis is not None:
        if layout != "bhld":
            raise NotImplementedError(
                "ring attention shards the L axis of (B, H, L, Dh) tensors; "
                "pass layout='bhld' when seq_axis is set"
            )
        mesh = _SEQ_MESHES.get(seq_axis)
        if mesh is None:
            raise ValueError(
                f"seq_axis={seq_axis!r} routed to ring attention but no mesh "
                "is registered; call ops.register_sequence_mesh(mesh, axis)"
            )
        if mask is not None:
            raise NotImplementedError(
                "ring attention supports causal=True or unmasked; arbitrary "
                "masks stay on the single-chip path"
            )
        from tinydiffusionmodels_tpu.parallel.ring_attention import (
            ring_attention,
        )

        # TDM_RING_KV_CHUNK bounds the per-ring-step score buffer to
        # (B, H, L_shard, chunk) for very long per-device shards.
        # TDM_RING_BLOCK=flash routes each ring step's block compute
        # through the lse-carrying Pallas flash kernel (ring x flash
        # composition; einsum default pending real multi-chip measurement).
        kv_chunk = os.environ.get("TDM_RING_KV_CHUNK")
        return ring_attention(
            q, k, v, mesh, axis=seq_axis, causal=causal,
            dropout_rate=dropout_rate, dropout_key=dropout_key,
            kv_chunk=int(kv_chunk) if kv_chunk else None,
            block_impl=os.environ.get("TDM_RING_BLOCK", "einsum"),
        )
    if causal and mask is None:
        l = q.shape[1] if layout == "blhd" else q.shape[-2]
        mask = jnp.tril(jnp.ones((l, l), dtype=bool))
    return _dispatch("attention")(
        q, k, v, mask=mask, dropout_rate=dropout_rate,
        dropout_key=dropout_key, layout=layout,
    )
