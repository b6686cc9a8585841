"""Tensor-parallel sharding rules (Megatron-style) for the transformer.

The reference has no TP (models are tiny), but the mesh abstraction exposes a
'model' axis so scaling the denoiser is a sharding-spec change (SURVEY.md
§2.2 table). Rules follow the standard column/row split: the fused qkv and
ffn-in weights shard their *output* features; out_proj and ffn-out shard
their *input* features, so each block needs exactly one all-reduce (inserted
automatically by GSPMD).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def transformer_tp_rules(axis: str = "model") -> dict:
    """PartitionSpec pytree matching the TinyTransformer param structure.

    Layer specs are shared across depth (applied per layer by apply_rules).
    """
    layer = {
        "self_attn": {
            "in_proj": {"w": P(None, axis), "b": P(axis)},      # column
            "out_proj": {"w": P(axis, None), "b": P()},          # row
        },
        "linear1": {"w": P(None, axis), "b": P(axis)},           # column
        "linear2": {"w": P(axis, None), "b": P()},               # row
        "norm1": {"scale": P(), "bias": P()},
        "norm2": {"scale": P(), "bias": P()},
    }
    return {"time_emb": {"w": P(), "b": P()}, "layers": layer}


def apply_rules(mesh: Mesh, params: dict, rules: dict):
    """device_put ``params`` according to ``rules``.

    ``rules['layers']`` is a single per-layer spec tree reused for each
    element of the params 'layers' tuple; everything else matches 1:1.
    Leaves absent from rules are replicated.
    """

    def put(p, spec):
        return jax.device_put(p, NamedSharding(mesh, spec))

    def walk(p, r):
        if isinstance(p, dict):
            return {
                k: walk(v, r.get(k, P()) if isinstance(r, dict) else P())
                for k, v in p.items()
            }
        if isinstance(p, tuple):
            return tuple(walk(v, r) for v in p)
        if p is None:
            return None
        spec = r if isinstance(r, P) else P()
        return put(p, spec)

    return walk(params, rules)
