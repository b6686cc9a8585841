"""Hot compute ops behind a swappable backend registry.

Models call ``ops.conv2d`` / ``ops.attention`` / ``ops.fused_resblock``;
the registry dispatches to a pure-XLA reference implementation or a
hand-written Pallas TPU kernel. Every Pallas kernel is correctness-diffed
against the XLA reference in tests (SURVEY.md §7 layering: kernels live
behind an op interface so a blockwise/ring variant is a kernel swap, not a
redesign).
"""

from tinydiffusionmodels_tpu.ops.registry import (
    attention,
    conv2d,
    fused_resblock,
    fused_resblock_split,
    get_backend,
    register_sequence_mesh,
    set_backend,
)

__all__ = [
    "attention",
    "conv2d",
    "fused_resblock",
    "fused_resblock_split",
    "get_backend",
    "register_sequence_mesh",
    "set_backend",
]
