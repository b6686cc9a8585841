"""Mesh construction and sharding policy.

Parallelism is a deployment concern, orthogonal to model code: models are
pure functions of pytrees, and this module decides how those pytrees and the
batch dimension are laid out over a jax.sharding.Mesh. XLA GSPMD then inserts
the collectives (gradient psum over ICI for DP; all-gather/reduce-scatter for
TP) — no NCCL-style plumbing in user code (SURVEY.md §2.2).
"""

from tinydiffusionmodels_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicated,
    shard_batch,
    shard_stacked_batch,
    replicate_tree,
)
from tinydiffusionmodels_tpu.parallel.tp import transformer_tp_rules, apply_rules
from tinydiffusionmodels_tpu.parallel.ring_attention import (
    ring_attention,
    ring_attention_shard,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "shard_stacked_batch",
    "replicate_tree",
    "transformer_tp_rules",
    "apply_rules",
    "ring_attention",
    "ring_attention_shard",
]
