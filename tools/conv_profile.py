#!/usr/bin/env python3
"""Localize the bs=2048 bf16 conv regression (VERDICT r2 item 6).

The roofline post measured mnist_train bs=2048 ~20% below bs=512 in both
dtypes and hypothesized conv tiling/layout. This measures each UNet conv
shape in isolation across batch sizes (chained-delta timing, so tunnel
dispatch is excluded) and prints achieved TFLOP/s per conv — turning the
"suspected" into "measured".

Measured caveat: at these op sizes the chained-delta has ~2x run-to-run
variance on the tunnel (two identical-shape convs disagreed 2x in one
run), so treat per-op deltas as indicative only — tools/xprof_ops.py's
device-plane totals are the trustworthy per-op comparison.

Usage: python tools/conv_profile.py [--dtype bf16]
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

from tinydiffusionmodels_tpu.runtime import enable_compile_cache

enable_compile_cache()

# (name, H, W, Cin, Cout, kernel) — SimpleUNet's conv shapes
# (models/unet.py; reference src/mnist.py:64-87).
CONVS = [
    ("rb1.conv1 28x28 1->32", 28, 28, 1, 32, 3),
    ("rb1.conv2 28x28 32->32", 28, 28, 32, 32, 3),
    ("rb2.conv1 14x14 32->64", 14, 14, 32, 64, 3),
    ("rb2.conv2 14x14 64->64", 14, 14, 64, 64, 3),
    ("rb3.conv 14x14 64->64", 14, 14, 64, 64, 3),
    ("rb4.conv1 28x28 96->32", 28, 28, 96, 32, 3),
    ("rb4.conv2 28x28 32->32", 28, 28, 32, 32, 3),
    ("out 1x1 32->1", 28, 28, 32, 1, 1),
]


def chain_time(fn, x, k1=4, k2=24, reps=3):
    def run(k):
        y = x
        out = None
        for _ in range(k):
            out = fn(y)
            y = (x + 1e-6 * jnp.float32(jnp.ravel(out)[0])).astype(x.dtype)
        return out

    float(jnp.ravel(run(2))[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.ravel(run(k1))[0])
        t1 = time.perf_counter()
        float(jnp.ravel(run(k2))[0])
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (k2 - k1))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--batches", default="512,1024,2048")
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    batches = [int(b) for b in args.batches.split(",")]

    results = {}
    for name, h, w, cin, cout, kk in CONVS:
        kernel = jnp.ones((kk, kk, cin, cout), dt)

        @jax.jit
        def conv(x, kernel=kernel):
            return jax.lax.conv_general_dilated(
                x, kernel, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        row = {}
        for b in batches:
            x = jnp.ones((b, h, w, cin), dt)
            s = chain_time(conv, x)
            flops = 2 * b * h * w * cin * cout * kk * kk
            row[b] = {
                "us": round(s * 1e6, 1),
                "tflops": round(flops / s / 1e12, 2),
                "us_per_example": round(s * 1e6 / b, 4),
            }
        results[name] = row
        per = [row[b]["us_per_example"] for b in batches]
        flag = " <-- regresses" if per[-1] > 1.15 * min(per) else ""
        print(f"{name:28} " + "  ".join(
            f"bs{b}: {row[b]['us']:>8.1f}us {row[b]['tflops']:>6.2f}TF"
            for b in batches) + flag)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
