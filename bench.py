"""Benchmark suite. Prints ONE JSON line with the headline metric.

Headline: Shakespeare joint train step throughput at the reference's
published configuration (bs=8, seq=64, dim=256 — the only config with a
hard published number: 25 it/s on a Tesla T4, BASELINE.md). vs_baseline is
ours / 25.

The "extra" field carries the rest of the suite with their own baselines:
- mnist_train_it_s             (bs=128 UNet step; no published baseline)
- mnist_sample_samples_s       (1000-step ancestral, batched; north-star metric)
- shakespeare_sample_steps_s   (reverse-diffusion steps/sec; T4: 387-601)

Usage: python bench.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from tinydiffusionmodels_tpu.runtime import configure_fast_rng, enable_compile_cache

enable_compile_cache()
configure_fast_rng()


def _timeit(fn, *args, warmup: int = 2, iters: int = 10) -> float:
    """Median-of-3 trimmed timing of fn(*args); returns seconds per call."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)[1]


def bench_mnist_train(batch_size: int = 128, chunk: int = 200) -> float:
    """Optimizer steps/sec via the production scan-of-steps path."""
    from tinydiffusionmodels_tpu.core import make_schedule
    from tinydiffusionmodels_tpu.models import init_unet
    from tinydiffusionmodels_tpu.train.mnist_train import make_train_step_multi
    from tinydiffusionmodels_tpu.train.optim import adamw
    from tinydiffusionmodels_tpu.train.state import TrainState

    sched = make_schedule()
    tx = adamw(1e-3)
    state = TrainState.create(init_unet(jax.random.PRNGKey(0)), tx)
    step = make_train_step_multi(sched, tx, chunk)
    batches = jax.random.normal(
        jax.random.PRNGKey(1), (chunk, batch_size, 28, 28, 1)
    )
    key = jax.random.PRNGKey(2)

    state, _ = step(state, batches, key)  # compile
    state, _ = step(state, batches, key)  # warm
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(2):
            state, loss = step(state, batches, key)
        jax.block_until_ready(loss)
        rates.append(2 * chunk / (time.perf_counter() - t0))
    return sorted(rates)[1]


def bench_mnist_sample(n_samples: int = 256, quick: bool = False,
                       method: str = "ancestral",
                       num_steps: int | None = None) -> float:
    from tinydiffusionmodels_tpu.core import make_schedule
    from tinydiffusionmodels_tpu.models import init_unet, unet_apply
    from tinydiffusionmodels_tpu.sample.ancestral import sample_loop

    sched = make_schedule()
    params = init_unet(jax.random.PRNGKey(0))
    denoise = lambda x, t: unet_apply(params, x, t, timesteps=sched.timesteps)
    fn = jax.jit(
        lambda k: sample_loop(
            denoise, sched, (n_samples, 28, 28, 1), k,
            method=method, num_steps=num_steps,
        )
    )
    sec = _timeit(fn, jax.random.PRNGKey(1), warmup=1, iters=1 if quick else 3)
    return n_samples / sec


def bench_text_train(batch_size: int = 8, seq_len: int = 64,
                     dim: int = 256, chunk: int = 200) -> float:
    """Joint 3-model optimizer steps/sec via the scan-of-steps path
    (reference config bs=8/seq=64/dim=256; T4 baseline 25 it/s)."""
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

    vocab = 4096  # stand-in vocab; throughput is vocab-insensitive at this size
    sched = make_schedule()
    cfg = TransformerConfig(dim=dim, n_heads=4, depth=3, dropout=0.1,
                            timesteps=sched.timesteps)
    key = jax.random.PRNGKey(0)
    joint = {
        "diffusion_model": init_tiny_transformer(key, cfg),
        "rounding_fn": init_learned_rounding(jax.random.fold_in(key, 1), dim, vocab),
        "embedding_fn": init_learned_embedding(jax.random.fold_in(key, 2), vocab, dim),
    }
    tx = adamw(1e-4)
    state = TrainState.create(joint, tx)
    step = make_text_train_step_multi(
        sched, cfg, tx, use_learned_embeddings=True
    )
    tokens = jax.random.randint(
        jax.random.PRNGKey(3), (chunk, batch_size, seq_len), 0, vocab
    )
    w = jnp.asarray(1.0)
    k = jax.random.PRNGKey(4)

    state, _ = step(state, tokens, w, k)  # compile
    state, _ = step(state, tokens, w, k)  # warm
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(2):
            state, losses = step(state, tokens, w, k)
        jax.block_until_ready(losses)
        rates.append(2 * chunk / (time.perf_counter() - t0))
    return sorted(rates)[1]


def bench_text_sample(n: int = 8, seq_len: int = 64, dim: int = 256,
                      quick: bool = False) -> float:
    """Reverse-diffusion steps/sec (the reference's tqdm it/s unit)."""
    from tinydiffusionmodels_tpu.core import make_schedule
    from tinydiffusionmodels_tpu.models import init_tiny_transformer
    from tinydiffusionmodels_tpu.models.transformer import (
        TransformerConfig,
        tiny_transformer_apply,
    )
    from tinydiffusionmodels_tpu.sample.ancestral import sample_loop

    sched = make_schedule()
    cfg = TransformerConfig(dim=dim, n_heads=4, depth=3,
                            timesteps=sched.timesteps)
    params = init_tiny_transformer(jax.random.PRNGKey(0), cfg)
    denoise = lambda x, t: tiny_transformer_apply(params, x, t, cfg)
    fn = jax.jit(lambda k: sample_loop(denoise, sched, (n, seq_len, dim), k))
    sec = _timeit(fn, jax.random.PRNGKey(1), warmup=1, iters=1 if quick else 3)
    return sched.timesteps / sec


def bench_guided(n: int = 8, seq_len: int = 64) -> float:
    """Guided decode throughput (tokens/sec) with the KV-cached scan.

    The reference's loop re-runs the full base-LM forward on the whole
    prefix per token (src/shakespeare.py:448) — O(L^2) LM compute plus a
    Python dispatch per token; this path is one compiled scan.
    """
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
    diff_logits = jax.random.normal(
        jax.random.PRNGKey(1), (n, seq_len, cfg.vocab_size)
    )
    decode = lambda cache, tok: tiny_gpt_decode_step(params, cache, tok, cfg)
    fn = jax.jit(
        lambda dl: guided_generate_scan(
            decode, tiny_gpt_init_cache(cfg, n), dl, 0, alpha=0.3
        )
    )
    sec = _timeit(fn, diff_logits, warmup=1, iters=3)
    return n * seq_len / sec


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    args = parser.parse_args()

    backend = jax.default_backend()
    results = {}
    results["shakespeare_train_it_s"] = bench_text_train()
    results["shakespeare_sample_steps_s"] = bench_text_sample(quick=args.quick)
    results["mnist_train_it_s"] = bench_mnist_train()
    results["mnist_sample_samples_s"] = bench_mnist_sample(quick=args.quick)
    results["mnist_sample_dpmpp20_s"] = bench_mnist_sample(
        quick=args.quick, method="dpm++", num_steps=20
    )
    results["guided_tokens_s"] = bench_guided()

    headline = results["shakespeare_train_it_s"]
    print(
        json.dumps(
            {
                "metric": "shakespeare_train_steps_per_sec_bs8_seq64_dim256",
                "value": round(headline, 2),
                "unit": "it/s",
                "vs_baseline": round(headline / 25.0, 2),  # T4: 25 it/s
                "extra": {
                    "backend": backend,
                    "mnist_train_it_s_bs128": round(
                        results["mnist_train_it_s"], 2
                    ),
                    "mnist_sample_samples_s_1000step_bs256": round(
                        results["mnist_sample_samples_s"], 2
                    ),
                    "shakespeare_sample_steps_s_bs8": round(
                        results["shakespeare_sample_steps_s"], 2
                    ),
                    "shakespeare_sample_vs_t4_601": round(
                        results["shakespeare_sample_steps_s"] / 601.0, 2
                    ),
                    "guided_decode_tokens_s_bs8": round(
                        results["guided_tokens_s"], 2
                    ),
                    # DPM-Solver++(2M) 20 steps matches ancestral-1000
                    # fidelity (IS 6.20 vs 6.43, tools/fidelity.py) — the
                    # quality-matched sampling throughput.
                    "mnist_sample_dpmpp20_samples_s_bs256": round(
                        results["mnist_sample_dpmpp20_s"], 2
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
