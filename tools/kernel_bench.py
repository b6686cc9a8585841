"""Honest in-scan kernel timing: Pallas vs XLA reference at production shapes.

Methodology (the hard-won part — see docs mfu-roofline post):
- Time the DELTA between scan lengths L2 and L1 over the same I/O. The axon
  remote stack adds a large fixed per-dispatch cost (~25 ms observed:
  dispatch + staging), which a naive total/L division attributes to the op.
  The delta cancels everything except the per-iteration op cost.
- Vary an input every execution. The remote terminal memoizes pure
  executions with identical arguments; repeated same-arg calls return
  cached results in ~20 us and time nothing.
- Carry a data dependency through the scan so iterations serialize and XLA
  cannot hoist the op (the `* 1e-20` mix-in is not foldable: 0*inf rules).
- Synchronize with a HOST READ of the scalar result (float(out)), not
  block_until_ready: on this backend block_until_ready can return before
  the computation has actually run (observed: 220-iteration grad scans
  "completing" in 0.1 ms, then 160 ms with a forced host read).

Usage: python tools/kernel_bench.py [resblock|attention] ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tinydiffusionmodels_tpu.runtime import enable_compile_cache

enable_compile_cache()

_SEED = [0]


def scan_delta_us(make, x, L1: int = 20, L2: int = 220, reps: int = 7):
    """Median per-call microseconds via the L2-L1 scan-length delta."""
    f1, f2 = make(L1), make(L2)

    def run_once(f):
        _SEED[0] += 1
        return float(f(x, jnp.float32(_SEED[0])))  # host read = real sync

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
    return (t2 - t1) / (L2 - L1) * 1e6


def _scanned(fn, *closure):
    def make(L):
        @jax.jit
        def run(x, s):
            def body(c, _):
                y = fn(c, *closure)
                m = y.mean()
                return c + m * 1e-20, m

            _, ys = jax.lax.scan(body, x + s * 1e-12, None, length=L)
            return ys.sum()

        return run

    return make


def bench_resblock():
    from tinydiffusionmodels_tpu.models.unet import _init_resblock
    from tinydiffusionmodels_tpu.ops import pallas_kernels, xla_ref

    key = jax.random.PRNGKey(0)
    # The four UNet blocks at bench batch size (models/unet.py _BLOCKS).
    shapes = [
        (128, 28, 28, 1, 32),
        (128, 14, 14, 32, 64),
        (128, 14, 14, 64, 64),
        (128, 28, 28, 96, 32),
    ]
    for B, H, W, cin, cout in shapes:
        p = _init_resblock(key, cin, cout)
        x = jax.random.normal(jax.random.fold_in(key, 1), (B, H, W, cin))
        tb = jax.random.normal(jax.random.fold_in(key, 2), (B, 1, 1, cout))
        gflop = (
            2 * B * H * W * 9 * (cin * cout + cout * cout)
            + (2 * B * H * W * cin * cout if cin != cout else 0)
        ) / 1e9
        for name, fn in [
            ("xla", xla_ref.fused_resblock),
            ("pallas", pallas_kernels.fused_resblock),
        ]:
            us = scan_delta_us(_scanned(fn, p, tb), x)
            print(
                f"resblock B{B} {H}x{W} {cin:3d}->{cout:3d} {name:6s}: "
                f"{us:8.1f} us ({gflop / us * 1e3:6.1f} TFLOP/s)"
            )


def bench_attention():
    from tinydiffusionmodels_tpu.ops import pallas_kernels, xla_ref

    key = jax.random.PRNGKey(0)
    # (B, H, L, Dh): sampler config (text denoiser) and a long-seq case.
    shapes = [(8, 4, 64, 64), (8, 4, 512, 64), (2, 4, 2048, 64)]
    for b, h, l, dh in shapes:
        q = jax.random.normal(jax.random.fold_in(key, 1), (b, h, l, dh))
        gflop = 4 * b * h * l * l * dh / 1e9
        impls = [("xla", lambda c: xla_ref.attention(c, c, c))]
        if l <= 128:
            impls.append(
                ("pallas", lambda c: pallas_kernels._attention_diffable(c, c, c))
            )
        impls.append(
            ("flash", lambda c: pallas_kernels.flash_attention(c, c, c))
        )
        for name, fn in impls:
            us = scan_delta_us(_scanned(fn), q)
            print(
                f"attention B{b} H{h} L{l:5d} Dh{dh} {name:6s}: "
                f"{us:8.1f} us ({gflop / us * 1e3:6.1f} TFLOP/s)"
            )


def bench_attention_grad():
    """Forward+backward (sum-of-output loss) — exercises the Pallas
    recompute backward kernels vs XLA autodiff."""
    from tinydiffusionmodels_tpu.ops import pallas_kernels, xla_ref

    key = jax.random.PRNGKey(0)
    shapes = [(8, 4, 64, 64), (8, 4, 512, 64), (2, 4, 2048, 64)]
    for b, h, l, dh in shapes:
        q = jax.random.normal(jax.random.fold_in(key, 1), (b, h, l, dh))
        gflop = 3 * 4 * b * h * l * l * dh / 1e9  # bwd ~ 2x fwd
        impls = [
            ("xla", lambda c: jax.grad(
                lambda x: jnp.sum(xla_ref.attention(x, x, x)))(c)),
            ("flash", lambda c: jax.grad(
                lambda x: jnp.sum(pallas_kernels.flash_attention(x, x, x))
            )(c)),
        ]
        for name, fn in impls:
            us = scan_delta_us(_scanned(fn), q)
            print(
                f"attn-grad B{b} H{h} L{l:5d} Dh{dh} {name:6s}: "
                f"{us:8.1f} us ({gflop / us * 1e3:6.1f} TFLOP/s)"
            )


def bench_attention_bf16():
    """XLA vs flash crossover with bf16 activations, eval AND training mode
    (attention-weight dropout + grad) — VERDICT r3 item 8: the routing
    threshold was measured f32/eval-only; scores are f32 inside both paths
    (preferred_element_type), but XLA's fused buffers may differ in bf16."""
    from tinydiffusionmodels_tpu.ops import pallas_kernels, xla_ref

    key = jax.random.PRNGKey(0)
    dk = jax.random.PRNGKey(7)
    shapes = [(8, 4, 512, 64), (4, 4, 1024, 64), (8, 4, 1024, 64),
              (2, 4, 2048, 64)]
    for b, h, l, dh in shapes:
        q = jax.random.normal(
            jax.random.fold_in(key, 1), (b, h, l, dh)
        ).astype(jnp.bfloat16)
        gflop = 4 * b * h * l * l * dh / 1e9
        mb = b * h * l * l * 4 / 2**20
        # eval forward
        for name, fn in [
            ("xla", lambda c: xla_ref.attention(c, c, c)),
            ("flash", lambda c: pallas_kernels.flash_attention(c, c, c)),
        ]:
            us = scan_delta_us(_scanned(fn), q)
            print(f"attn-bf16 B{b} H{h} L{l:5d} ({mb:5.0f}MB f32-scores) "
                  f"{name:6s} fwd : {us:8.1f} us "
                  f"({gflop / us * 1e3:6.1f} TFLOP/s)")
        # training mode: dropout + grad (sum loss), bf16 activations
        for name, fn in [
            ("xla", lambda c: jax.grad(lambda x: jnp.sum(
                xla_ref.attention(
                    x, x, x, dropout_rate=0.1, dropout_key=dk
                ).astype(jnp.float32)))(c)),
            ("flash", lambda c: jax.grad(lambda x: jnp.sum(
                pallas_kernels.flash_attention(
                    x, x, x, dropout_rate=0.1, dropout_key=dk
                ).astype(jnp.float32)))(c)),
        ]:
            us = scan_delta_us(_scanned(fn), q)
            print(f"attn-bf16 B{b} H{h} L{l:5d} ({mb:5.0f}MB f32-scores) "
                  f"{name:6s} grad: {us:8.1f} us "
                  f"({3 * gflop / us * 1e3:6.1f} TFLOP/s)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("resblock", "all"):
        bench_resblock()
    if which in ("attention", "all"):
        bench_attention()
    if which in ("grad", "all"):
        bench_attention_grad()
    if which in ("bf16", "all"):
        bench_attention_bf16()
