"""FLOPs accounting and MFU (model FLOPs utilization) reporting.

The reference reports throughput only as tqdm it/s (see BASELINE.md); that
says nothing about how much of the chip is used. This module measures each
compiled program's FLOPs via XLA's own cost analysis and divides achieved
FLOP/s by the chip's peak, so bench.py can report MFU per metric.

Design notes:
- ``compiled_flops`` must be called on the SINGLE-step program: XLA cost
  analysis counts a while/scan body once regardless of trip count, so the
  scan-of-steps programs would undercount by the chunk factor. bench.py
  measures FLOPs on the unscanned step and rate on the scanned path.
- Peaks are per-chip dense MXU peaks. On TPU, f32 matmuls at default
  precision are computed with bf16 MXU passes (f32 accumulate), so the bf16
  peak is the honest denominator for both dtypes; we still expose the f32
  row (≈1/2 bf16: two passes) for HIGHEST-precision comparisons.
"""

from __future__ import annotations

import jax

# Dense per-chip peak FLOP/s by device_kind prefix.
# Sources: public TPU spec sheets / jax-ml scaling book tables.
#   v5e ("TPU v5 lite"): 197 TFLOP/s bf16
#   v5p ("TPU v5"):      459 TFLOP/s bf16
#   v4:                  275 TFLOP/s bf16
#   v6e ("TPU v6 lite" / Trillium): 918 TFLOP/s bf16
#   v3 / v2: 123 / 45 TFLOP/s bf16
_PEAKS_BF16 = (
    ("TPU v6 lite", 918e12),
    ("TPU v6", 918e12),
    ("TPU v5 lite", 197e12),
    ("TPU v5p", 459e12),
    ("TPU v5", 459e12),
    ("TPU v4", 275e12),
    ("TPU v3", 123e12),
    ("TPU v2", 45e12),
)

# HBM bandwidth (bytes/s) per chip, for roofline ridge-point context.
_HBM_BW = (
    ("TPU v6 lite", 1640e9),
    ("TPU v6", 1640e9),
    ("TPU v5 lite", 819e9),
    ("TPU v5p", 2765e9),
    ("TPU v5", 2765e9),
    ("TPU v4", 1228e9),
    ("TPU v3", 900e9),
    ("TPU v2", 700e9),
)


def _lookup(table, kind: str) -> float | None:
    for prefix, val in table:
        if kind.startswith(prefix):
            return val
    return None


def device_peak_flops(device=None, dtype: str = "bf16") -> float | None:
    """Peak dense FLOP/s for ``device`` (default: jax.devices()[0]).

    Returns None off-TPU (there is no meaningful single peak for host CPUs).
    ``dtype``: 'bf16' (MXU native) or 'f32' (HIGHEST precision ≈ half rate).
    """
    if device is None:
        try:
            device = jax.devices()[0]
        except Exception:  # pragma: no cover
            return None
    kind = getattr(device, "device_kind", "")
    peak = _lookup(_PEAKS_BF16, kind)
    if peak is None:
        return None
    return peak / 2.0 if dtype == "f32" else peak


def device_hbm_bandwidth(device=None) -> float | None:
    """Peak HBM bytes/s for ``device``; None off-TPU."""
    if device is None:
        try:
            device = jax.devices()[0]
        except Exception:  # pragma: no cover
            return None
    return _lookup(_HBM_BW, getattr(device, "device_kind", ""))


def cost_analysis(fn, *args, **kwargs) -> dict | None:
    """XLA cost analysis of jit(fn) at these args; None if unavailable.

    Keys of interest: 'flops', 'bytes accessed', 'optimal_seconds'.
    """
    try:
        compiled = jax.jit(fn).lower(*args, **kwargs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else None
        return dict(ca) if ca else None
    except Exception:  # pragma: no cover - backend without cost analysis
        return None


def compiled_flops(fn, *args, **kwargs) -> float | None:
    """Total FLOPs of one call of jit(fn)(*args) per XLA's cost model.

    Call this on the UNSCANNED single step: scan bodies are counted once.
    """
    ca = cost_analysis(fn, *args, **kwargs)
    if not ca:
        return None
    flops = ca.get("flops")
    return float(flops) if flops and flops > 0 else None


def mfu(flops_per_unit: float | None, units_per_sec: float,
        device=None, dtype: str = "bf16") -> float | None:
    """Achieved FLOP/s over peak FLOP/s; None when either side is unknown."""
    peak = device_peak_flops(device, dtype=dtype)
    if peak is None or flops_per_unit is None:
        return None
    return flops_per_unit * units_per_sec / peak
