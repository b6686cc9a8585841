"""Measure the bs=512 bf16 text train step: blhd (copy-free) vs bhld layouts.

Usage: python tools/layout_bench.py [blhd|bhld]   (run solo on the TPU)

Uses bench.py's own bench_text_train harness (scan-of-steps, chained
timing) on the real TPU. The layout is selected inside models/transformer
by cfg.seq_axis is None -> blhd; to get the OLD behavior for comparison we
monkeypatch _mha back to the BHLD head-split/merge transposes. This is the
end-to-end A/B behind the mode-dependent attention routing decision
(docs/.../2026-08-19-attention-layout-routing.md); measured lines are
committed at docs/docs/assets/r5/layout_ab_bf16.txt (VERDICT r4 item 6).
"""
import statistics
import sys
from pathlib import Path

import jax  # noqa: F401  (forces backend selection before bench import)
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from tinydiffusionmodels_tpu import runtime

runtime.enable_compile_cache()

import bench

mode = sys.argv[1] if len(sys.argv) > 1 else "blhd"
if mode == "bhld":
    # Force the old layout by pretending every config wants BHLD.
    import tinydiffusionmodels_tpu.models.transformer as tr

    orig = tr._mha

    def _mha_bhld(p, x, cfg, *, deterministic, key):
        b, l, d = x.shape
        dh = d // cfg.n_heads
        from tinydiffusionmodels_tpu import ops
        from tinydiffusionmodels_tpu.core.rng import substream
        from tinydiffusionmodels_tpu.models.torch_init import linear_apply

        qkv = linear_apply(p["in_proj"], x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(a):
            return a.reshape(b, l, cfg.n_heads, dh).transpose(0, 2, 1, 3)

        qh, kh = heads(q), heads(k)
        if cfg.pos_kind == "rope":
            qh, kh = tr._rope(qh), tr._rope(kh)
        out = ops.attention(
            qh, kh, heads(v),
            dropout_rate=0.0 if deterministic else cfg.dropout,
            dropout_key=None if deterministic else substream(key, "attn_weights"),
            seq_axis=cfg.seq_axis,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
        return linear_apply(p["out_proj"], out)

    tr._mha = _mha_bhld

rates, flops = bench.bench_text_train(
    batch_size=512, seq_len=64, dim=256, chunk=50,
    compute_dtype=jnp.bfloat16,
)
med = statistics.median(rates)
print(f"LAYOUT={mode} it/s median={med:.1f} envelope={[round(r,1) for r in rates]} flops/step={flops}")
