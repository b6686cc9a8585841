"""Measure the bf16 text train step: layouts and attention-route A/Bs.

Usage: python tools/layout_bench.py [blhd|bhld] [--batch N] [--seq_len N]
           [--dim N] [--chunk N] [--route auto|xla|flash]
           [--attn_rng counter|stock]
       (run solo on the TPU)

Uses bench.py's own bench_text_train harness (scan-of-steps, chained
timing) on the real TPU. The layout is selected inside models/transformer
by cfg.seq_axis is None -> blhd; to get the OLD behavior for comparison we
monkeypatch _mha back to the BHLD head-split/merge transposes. This is the
end-to-end A/B behind the mode-dependent attention routing decision
(docs/.../2026-08-19-attention-layout-routing.md); measured lines are
committed at docs/docs/assets/r5/layout_ab_bf16.txt (VERDICT r4 item 6).

``--route`` forces the training attention route by overriding the
ops.pallas_kernels thresholds, for validating the routing thresholds at
mid-L shapes IN the production step (ADVICE r4: the round-4 L>=1024 rule
was set from one end-to-end point at L=64 plus isolated grad timings).
The round-5 sweep (bs=8/L=512, bs=2/4/8 x L=1024; raw lines at
docs/docs/assets/r5/layout_ab_midL_bf16.txt) showed XLA wins every
on-chip shape including long L, flash only wins once the f32 scores
spill (268 MB yes, 134 MB no) — which set TRAIN_SPILL_BYTES=192 MB and
deleted the L-based rule.
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

args = sys.argv[1:]
mode = args.pop(0) if args and not args[0].startswith("--") else "blhd"
opts = {"batch": 512, "seq_len": 64, "dim": 256, "chunk": 50,
        "route": "auto", "attn_rng": "counter"}
while args:
    flag = args.pop(0).lstrip("-")
    opts[flag] = (args.pop(0) if flag in ("route", "attn_rng")
                  else int(args.pop(0)))

if opts["route"] != "auto":
    import tinydiffusionmodels_tpu.ops.pallas_kernels as pk

    if opts["route"] == "flash":
        pk.TRAIN_SPILL_BYTES = 0
        pk.EVAL_SPILL_BYTES = 0
    else:  # xla
        pk.TRAIN_SPILL_BYTES = 1 << 60
        pk.EVAL_SPILL_BYTES = 1 << 60

if opts["attn_rng"] == "stock":
    # A/B arm isolating the attention-weight dropout draw (VERDICT r4
    # item 7): everything else stays on the counter path (TDM_FAST_NOISE
    # untouched); only xla_ref's attention mask reverts to the stock
    # bernoulli whose rng bits materialize to HBM. Same (key, keep_prob,
    # shape) call signature.
    import tinydiffusionmodels_tpu.ops.xla_ref as xr

    xr.draw_keep = jax.random.bernoulli

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
    batch_size=opts["batch"], seq_len=opts["seq_len"], dim=opts["dim"],
    chunk=opts["chunk"], compute_dtype=jnp.bfloat16,
)
med = statistics.median(rates)
shape = f"bs={opts['batch']} L={opts['seq_len']} dim={opts['dim']}"
print(f"LAYOUT={mode} ROUTE={opts['route']} ATTN_RNG={opts['attn_rng']} "
      f"{shape} it/s median={med:.1f} "
      f"envelope={[round(r, 1) for r in rates]} flops/step={flops}")
