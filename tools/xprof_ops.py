#!/usr/bin/env python3
"""Device-op breakdown for the MNIST bf16 train step via jax.profiler.

Parses the raw xplane protobuf directly (`/device:TPU:0` plane — works on
the remote axon backend; the tensorboard_plugin_profile converters in this
image are version-mismatched, the proto itself is not). Used to turn the
bs=2048-conv-regression hypothesis (roofline post) into a measured per-op
comparison (VERDICT r2 item 6).

Usage: python tools/xprof_ops.py [--batches 512,2048] [--top 12]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import tempfile

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tinydiffusionmodels_tpu.runtime import (
    configure_fast_rng,
    enable_compile_cache,
)

enable_compile_cache()
configure_fast_rng()  # match bench.py / the CLIs


def _category(op_name: str, batch: int = 0) -> str:
    """HLO event name -> stable cross-program category.

    Names carry per-program ids (%fusion.123), so cross-batch comparison
    must bucket by operation kind + operand shape signature instead."""
    import re

    name = op_name
    if " = " in name:
        # '%fusion.3 = f32[...] fusion(...)' -> kind from the RHS
        lhs, rhs = name.split(" = ", 1)
        kind = None
        shape = rhs.split(" ")[0]
        for k in ("convolution", "fusion", "copy", "all-reduce", "reduce",
                  "custom-call", "dot", "rng", "select-and-scatter",
                  "scatter", "dynamic-slice", "dynamic-update-slice",
                  "slice", "transpose", "convert", "broadcast", "while"):
            if k + "(" in rhs or rhs.startswith(k) or f" {k}(" in rhs:
                kind = k
                break
        base = lhs.strip().lstrip("%").split(".")[0]
        # strip layout/space annotations from the shape for stability
        shape = re.sub(r"\{[^}]*\}", "", shape)
        if batch:
            # batch-dim-independent signature so bs512/bs2048 rows match
            shape = re.sub(rf"\[{batch},", "[B,", shape)
            shape = re.sub(rf"\[{batch}\]", "[B]", shape)
        return f"{kind or base}:{shape}"
    return name.split(".")[0]


def device_op_totals(trace_dir: str, batch: int = 0) -> dict[str, tuple[float, int]]:
    """{op category: (total_us, count)} from the TPU plane (deepest line
    only, to avoid double-counting nested module/while events)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    files = sorted(
        glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb"))
    )
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(files[-1], "rb").read())
    totals: dict[str, list] = collections.defaultdict(lambda: [0.0, 0])
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        names = {i: m.name for i, m in plane.event_metadata.items()}
        lines = [l for l in plane.lines if l.events]
        if not lines:
            continue
        # The XLA op line is the one with the most events (module/step
        # lines have a handful of giant enclosing events).
        opline = max(lines, key=lambda l: len(l.events))
        for ev in opline.events:
            cat = _category(names.get(ev.metadata_id, "?"), batch)
            if cat.startswith(("while:", "jit_")):
                continue  # enclosing events double-count their children
            t = totals[cat]
            t[0] += ev.duration_ps / 1e6  # ps -> us
            t[1] += 1
    return {k: (v[0], v[1]) for k, v in totals.items()}


def profile_step(batch: int, steps: int = 20) -> dict:
    from tinydiffusionmodels_tpu.core import make_schedule
    from tinydiffusionmodels_tpu.models.unet import init_unet
    from tinydiffusionmodels_tpu.parallel import (
        make_mesh,
        replicate_tree,
        shard_stacked_batch,
    )
    from tinydiffusionmodels_tpu.train.mnist_train import make_train_step_multi
    from tinydiffusionmodels_tpu.train.optim import adamw
    from tinydiffusionmodels_tpu.train.state import TrainState

    sched = make_schedule()
    tx = adamw(1e-3)
    mesh = make_mesh()
    key = jax.random.PRNGKey(0)
    params = init_unet(key)
    state = replicate_tree(mesh, TrainState.create(params, tx))
    step = make_train_step_multi(sched, tx, compute_dtype=jnp.bfloat16)
    batches = shard_stacked_batch(
        mesh,
        jax.random.normal(key, (steps, batch, 28, 28, 1), jnp.float32),
    )
    state, loss = step(state, batches, key)  # compile outside the trace
    float(loss)
    tdir = tempfile.mkdtemp(prefix=f"xprof_bs{batch}_")
    with jax.profiler.trace(tdir):
        state, loss = step(state, batches, jax.random.fold_in(key, 1))
        float(loss)
    return device_op_totals(tdir, batch)


def profile_text_step(batch: int, steps: int = 20) -> dict:
    """Text joint train step, bf16, scan-of-steps (the other bs512 roofline
    point of VERDICT r3 item 4)."""
    from tinydiffusionmodels_tpu.core import make_schedule
    from tinydiffusionmodels_tpu.models import (
        init_learned_embedding,
        init_learned_rounding,
        init_tiny_transformer,
    )
    from tinydiffusionmodels_tpu.models.transformer import TransformerConfig
    from tinydiffusionmodels_tpu.train.optim import adamw
    from tinydiffusionmodels_tpu.train.state import TrainState
    from tinydiffusionmodels_tpu.train.text_train import (
        make_text_train_step_multi,
    )

    vocab, dim, seq = 4096, 256, 64  # bench_text_train's config
    sched = make_schedule()
    cfg = TransformerConfig(dim=dim, n_heads=4, depth=3, dropout=0.1,
                            timesteps=sched.timesteps)
    key = jax.random.PRNGKey(0)
    joint = {
        "diffusion_model": init_tiny_transformer(key, cfg),
        "rounding_fn": init_learned_rounding(
            jax.random.fold_in(key, 1), dim, vocab
        ),
        "embedding_fn": init_learned_embedding(
            jax.random.fold_in(key, 2), vocab, dim
        ),
    }
    tx = adamw(1e-4)
    state = TrainState.create(joint, tx)
    step = make_text_train_step_multi(
        sched, cfg, tx, use_learned_embeddings=True,
        compute_dtype=jnp.bfloat16,
    )
    tokens = jax.random.randint(
        jax.random.PRNGKey(3), (steps, batch, seq), 0, vocab
    )
    w = jnp.asarray(1.0)
    state, losses = step(state, tokens, w, key)
    float(losses[0])
    tdir = tempfile.mkdtemp(prefix=f"xprof_text_bs{batch}_")
    with jax.profiler.trace(tdir):
        state, losses = step(state, tokens, w, jax.random.fold_in(key, 1))
        float(losses[0])
    return device_op_totals(tdir, batch)


def profile_guided(batch: int, steps: int = 20, seq_len: int = 64) -> dict:
    """The batched guided decode scan (VERDICT r3 item 2: where do the
    379 us/position at bs=256 go?). ``steps`` is unused (the decode is one
    scan over seq_len positions); kept for the shared program signature."""
    del steps
    from tinydiffusionmodels_tpu.models import (
        init_tiny_gpt,
        tiny_gpt_decode_step,
        tiny_gpt_init_cache,
    )
    from tinydiffusionmodels_tpu.models.ar_lm import TinyGPTConfig
    from tinydiffusionmodels_tpu.sample.guided import guided_generate_scan

    cfg = TinyGPTConfig(vocab_size=4096, dim=256, n_heads=4, depth=4,
                        max_len=seq_len + 1)
    params = init_tiny_gpt(jax.random.PRNGKey(0), cfg)
    decode = lambda cache, tok, attn_len=None: tiny_gpt_decode_step(
        params, cache, tok, cfg, attn_len
    )
    diff = jax.random.normal(
        jax.random.PRNGKey(1), (batch, seq_len, cfg.vocab_size)
    )
    gen = jax.jit(
        lambda d: guided_generate_scan(
            decode, tiny_gpt_init_cache(cfg, batch), d, 0, alpha=0.3, seg=8
        )
    )
    out = gen(diff)
    int(out[0, 0])
    tdir = tempfile.mkdtemp(prefix=f"xprof_guided_bs{batch}_")
    with jax.profiler.trace(tdir):
        out = gen(diff + 1e-3)
        int(out[0, 0])
    return device_op_totals(tdir, batch)


_PROGRAMS = {
    "mnist_train": profile_step,
    "text_train": profile_text_step,
    "guided": profile_guided,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="512,2048")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("--program", default="mnist_train",
                    choices=sorted(_PROGRAMS))
    ap.add_argument("--attn_rng", default="counter",
                    choices=["counter", "stock"],
                    help="stock: revert ONLY the attention-weight dropout "
                         "draw to jax.random.bernoulli (A/B arm for the "
                         "counter-based attention mask, VERDICT r4 item 7)")
    args = ap.parse_args()
    if args.attn_rng == "stock":
        import tinydiffusionmodels_tpu.ops.xla_ref as xr

        xr.draw_keep = jax.random.bernoulli
    batches = [int(b) for b in args.batches.split(",")]
    prog = _PROGRAMS[args.program]

    results = {b: prog(b, args.steps) for b in batches}
    base = batches[0]
    ops = sorted(
        results[batches[-1]], key=lambda k: -results[batches[-1]][k][0]
    )[: args.top]
    scale = batches[-1] / base
    print(f"{'op':52} " + " ".join(f"bs{b}(us)".rjust(12) for b in batches)
          + "  x-vs-linear")
    for op in ops:
        row = [results[b].get(op, (0.0, 0))[0] for b in batches]
        ratio = (row[-1] / row[0] / scale) if row[0] else float("nan")
        flag = "  <-- superlinear" if ratio > 1.2 else ""
        print(f"{op[:52]:52} "
              + " ".join(f"{v:12.1f}" for v in row)
              + f"  {ratio:5.2f}{flag}")
    tot = [sum(v[0] for v in results[b].values()) for b in batches]
    print(f"{'TOTAL device time':52} "
          + " ".join(f"{v:12.1f}" for v in tot)
          + f"  {tot[-1] / tot[0] / scale:5.2f}")


if __name__ == "__main__":
    main()
