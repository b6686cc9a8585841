"""Pallas TPU kernels for the hot ops.

Placeholder module: kernels land behind the same signatures as ops/xla_ref.py
and are diffed against it in tests/test_ops.py. An op missing here silently
falls back to the XLA reference via the registry.
"""

from __future__ import annotations

# Kernels are added incrementally; see ops/xla_ref.py for the semantics
# contract of each op.
