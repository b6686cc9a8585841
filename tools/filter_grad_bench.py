#!/usr/bin/env python3
"""Bound or beat the MNIST backward-filter convs (VERDICT r4 item 5).

The round-4 xprof attribution put 33% of the bs=512 bf16 MNIST train step
in conv backward-filter ops ("f32 accumulation by design" — round-4
program post). That half-satisfied the "optimize or prove irreducible"
clause: it named the cost but never bounded it. This tool measures, per
UNet conv shape (reference src/mnist.py:64-87), at the headline batch,
five formulations of the same filter-grad contraction plus its HBM floor:

  fwd        the forward conv (context),
  bwd_filter XLA's backward-filter op in isolation (grad wrt the kernel),
  matmul_eq  the materialized-im2col dot at the same M/N/K:
             dW[9Ci, Co] = patches[BHW, 9Ci]^T @ dy[BHW, Co],
  shifts     9 shifted-slice einsums 'bhwc,bhwo->co' (per-tap dots, f32
             accumulate) — the contraction sequence a hand-written Pallas
             filter-grad would issue to the MXU,
  shiftsT    the transposed-output arrangement 'bhwo,bhwc->oc',
  ksplit     batch split into 8 groups of partial dWs, reduced at the end
             (tests the small-output-footprint hypothesis),
  hbm_bound  bytes(x) + bytes(dy) + bytes(dW) at peak HBM bandwidth.

Timing is the in-graph scan-length delta (tools/kernel_bench.py
discipline) — a host-chained loop is enqueue-bound at these ~100 us op
sizes over the remote tunnel and misreports every row ~50x (first run of
this tool did exactly that).

Measured verdict (docs/docs/assets/r5/filter_grad_bench_bs512_bf16.txt,
journal post 2026-08-19-filter-grad-bound): XLA's stock bwd_filter WINS
against all four alternative formulations on every shape; the two 32->32
shapes stall at ~42 TF (dW 288x32 — MXU small-output streaming rate) and
everything else runs at 79-84 TF. 0.30 step MFU is structural; see post
for the bound arithmetic. Isolated timings serve as CEILINGS/bounds, not
as production routing decisions.

Usage: python tools/filter_grad_bench.py [--batch 512] [--dtype bf16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tinydiffusionmodels_tpu.runtime import enable_compile_cache

enable_compile_cache()

# (name, H, W, Cin, Cout, kernel) — SimpleUNet conv shapes at their
# TRAINING spatial dims (models/unet.py; reference src/mnist.py:64-87).
CONVS = [
    ("rb1.conv1 28x28 1->32", 28, 28, 1, 32, 3),
    ("rb1.conv2 28x28 32->32", 28, 28, 32, 32, 3),
    ("rb2.conv1 14x14 32->64", 14, 14, 32, 64, 3),
    ("rb2.conv2 14x14 64->64", 14, 14, 64, 64, 3),
    ("rb3.conv 14x14 64->64", 14, 14, 64, 64, 3),
    ("rb4.conv1 28x28 96->32", 28, 28, 96, 32, 3),
    ("rb4.conv2 28x28 32->32", 28, 28, 32, 32, 3),
]


_SEED = [0]


def scan_time(fn, a0, b0, L1: int = 20, L2: int = 1020, reps: int = 5):
    """Median per-call seconds via the scan-length delta (the
    tools/kernel_bench.py discipline: in-graph lax.scan so the ~ms
    remote dispatch cost is paid once per RUN, not per call; a
    non-foldable 1e-20 mix-in of the output into BOTH operands so XLA
    can neither hoist the op nor any per-operand precompute out of the
    loop; host-read sync, since block_until_ready can return early on
    this backend)."""

    def make(L):
        @jax.jit
        def run(a, b, s):
            def body(c, _):
                ca, cb = c
                m = jnp.float32(fn(ca, cb).mean())
                return (ca + (m * 1e-20).astype(ca.dtype),
                        cb + (m * 1e-20).astype(cb.dtype)), m

            _, ms = jax.lax.scan(
                body, (a + (s * 1e-12).astype(a.dtype), b), None, length=L)
            return ms.sum()

        return run

    f1, f2 = make(L1), make(L2)

    def run_once(f):
        _SEED[0] += 1
        return float(f(a0, b0, jnp.float32(_SEED[0])))

    run_once(f1)
    run_once(f2)
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        run_once(f1)
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run_once(f2)
        t2s.append(time.perf_counter() - t0)
    t1 = sorted(t1s)[reps // 2]
    t2 = sorted(t2s)[reps // 2]
    return (t2 - t1) / (L2 - L1)


def filter_grad_shifts(x, dy, kk: int):
    """dW via kk*kk shifted-slice matmuls, f32 accumulation.

    dW[kh,kw,ci,co] = sum_{b,h,w} xpad[b,h+kh,w+kw,ci] * dy[b,h,w,co]
    (SAME padding, stride 1). Each tap is a (Ci x BHW) @ (BHW x Co) dot —
    the exact contraction a Pallas filter-grad kernel would issue to the
    MXU, so its measured rate is what hand-writing one could achieve.
    """
    b, h, w, ci = x.shape
    pad = kk // 2
    xpad = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    taps = []
    for kh in range(kk):
        for kw in range(kk):
            sl = jax.lax.dynamic_slice(
                xpad, (0, kh, kw, 0), (b, h, w, ci)
            )
            taps.append(
                jnp.einsum("bhwc,bhwo->co", sl, dy,
                           preferred_element_type=jnp.float32)
            )
    return jnp.stack(taps).reshape(kk, kk, ci, dy.shape[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    b = args.batch

    from tinydiffusionmodels_tpu import perf

    peak = perf.device_peak_flops() or float("nan")
    bw = perf.device_hbm_bandwidth() or float("nan")
    print(f"# device={jax.devices()[0].device_kind} peak_bf16={peak/1e12:.0f}"
          f"TF hbm={bw/1e9:.0f}GB/s batch={b} dtype={args.dtype}")

    results = {}
    for name, h, w, cin, cout, kk in CONVS:
        key = jax.random.PRNGKey(0)
        kx, kw_, kdy = jax.random.split(key, 3)
        x = jax.random.normal(kx, (b, h, w, cin), dt)
        wgt = jax.random.normal(kw_, (kk, kk, cin, cout), dt)
        dy = jax.random.normal(kdy, (b, h, w, cout), dt)
        flops = 2 * b * h * w * cin * cout * kk * kk

        def conv(x, wgt):
            return jax.lax.conv_general_dilated(
                x, wgt, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        # XLA backward-filter in isolation: pullback wrt the kernel only.
        def bwd_filter(dy_, x_):
            _, vjp = jax.vjp(lambda w_: conv(x_, w_), wgt)
            return vjp(dy_.astype(dt))[0]

        # Correctness gate for the shifts formulation (f32, loose tol for
        # bf16 operand rounding).
        ref = np.asarray(jax.jit(bwd_filter)(dy, x), np.float32)
        alt = np.asarray(filter_grad_shifts(x, dy, kk), np.float32)
        np.testing.assert_allclose(alt, ref, rtol=0.1, atol=0.5)

        fwd_s = scan_time(conv, x, wgt)
        bwdf_s = scan_time(bwd_filter, dy, x)
        shifts_s = scan_time(
            lambda x_, dy_: filter_grad_shifts(x_, dy_, kk), x, dy
        )

        # Transposed-output variant: per-tap 'bhwc,bhwo->oc' puts co on
        # sublanes and ci on lanes — the arrangement rb4.conv1 (ci=96)
        # appears to get from XLA while the ci=32 shapes don't.
        def filter_grad_shifts_T(x_, dy_):
            bb, hh, ww, ci_ = x_.shape
            pad = kk // 2
            xpad = jnp.pad(x_, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
            taps = []
            for kh in range(kk):
                for kw_i in range(kk):
                    sl = jax.lax.dynamic_slice(
                        xpad, (0, kh, kw_i, 0), (bb, hh, ww, ci_))
                    taps.append(jnp.einsum(
                        "bhwo,bhwc->oc", dy_, sl,
                        preferred_element_type=jnp.float32))
            return jnp.stack(taps)

        shifts_t_s = scan_time(filter_grad_shifts_T, x, dy)

        # K-split variant: shard the batch into S groups, compute S
        # partial dWs per tap (output footprint x S), reduce at the end.
        # Tests whether the 32->32 stall is small-output-footprint bound.
        def filter_grad_ksplit(x_, dy_, S=8):
            bb, hh, ww, ci_ = x_.shape
            pad = kk // 2
            xpad = jnp.pad(x_, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
            co_ = dy_.shape[-1]
            dys = dy_.reshape(S, bb // S, hh, ww, co_)
            taps = []
            for kh in range(kk):
                for kw_i in range(kk):
                    sl = jax.lax.dynamic_slice(
                        xpad, (0, kh, kw_i, 0), (bb, hh, ww, ci_)
                    ).reshape(S, bb // S, hh, ww, ci_)
                    taps.append(jnp.einsum(
                        "sbhwc,sbhwo->sco", sl, dys,
                        preferred_element_type=jnp.float32))
            return jnp.stack(taps).sum(axis=1)

        ksplit_s = scan_time(filter_grad_ksplit, x, dy)

        # matmul-equivalent MXU ceiling: same M/N/K as the filter-grad dot.
        m, n, k = kk * kk * cin, cout, b * h * w
        a_mat = jax.random.normal(kx, (k, m), dt)
        b_mat = jax.random.normal(kdy, (k, n), dt)
        mm_s = scan_time(
            lambda a, b_: jnp.einsum(
                "km,kn->mn", a, b_, preferred_element_type=jnp.float32),
            a_mat, b_mat,
        )

        bytes_moved = (x.size + dy.size) * x.dtype.itemsize + m * n * 4
        hbm_s = bytes_moved / bw

        row = {
            "fwd_us": round(fwd_s * 1e6, 1),
            "bwd_filter_us": round(bwdf_s * 1e6, 1),
            "bwd_filter_tf": round(flops / bwdf_s / 1e12, 1),
            "matmul_eq_us": round(mm_s * 1e6, 1),
            "matmul_eq_tf": round(flops / mm_s / 1e12, 1),
            "shifts_us": round(shifts_s * 1e6, 1),
            "shifts_tf": round(flops / shifts_s / 1e12, 1),
            "shifts_t_us": round(shifts_t_s * 1e6, 1),
            "shifts_t_tf": round(flops / shifts_t_s / 1e12, 1),
            "ksplit_us": round(ksplit_s * 1e6, 1),
            "ksplit_tf": round(flops / ksplit_s / 1e12, 1),
            "hbm_bound_us": round(hbm_s * 1e6, 1),
            "flops_g": round(flops / 1e9, 2),
        }
        results[name] = row
        gap = bwdf_s / max(mm_s, hbm_s)
        print(f"{name:26} bwd_filter {row['bwd_filter_us']:>7.1f}us "
              f"({row['bwd_filter_tf']:>5.1f}TF)  "
              f"matmul_eq {row['matmul_eq_us']:>7.1f}us "
              f"({row['matmul_eq_tf']:>5.1f}TF)  "
              f"shifts {row['shifts_us']:>7.1f}us  "
              f"shiftsT {row['shifts_t_us']:>7.1f}us "
              f"({row['shifts_t_tf']:>5.1f}TF)  "
              f"ksplit {row['ksplit_us']:>7.1f}us "
              f"({row['ksplit_tf']:>5.1f}TF)  "
              f"hbm {row['hbm_bound_us']:>5.1f}us  "
              f"gap_vs_ceiling {gap:4.2f}x")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
