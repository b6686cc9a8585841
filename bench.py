"""Benchmark suite. Prints ONE JSON line with the headline metric.

Headline: Shakespeare joint train step throughput at the reference's
published configuration (bs=8, seq=64, dim=256 — the only config with a
hard published number: 25 it/s on a Tesla T4, BASELINE.md). vs_baseline is
ours / 25.

The "extra" field carries the rest of the suite with their own baselines:
- mnist_train_it_s             (bs=128 UNet step; ref baseline measured by
                                tools/ref_baseline.py on this machine)
- mnist_sample_samples_s       (1000-step ancestral, batched; north-star metric)
- shakespeare_sample_steps_s   (reverse-diffusion steps/sec; T4: 387-601)
- mfu                          (model FLOPs utilization per metric: XLA
                                cost-analysis FLOPs of the single step x
                                achieved rate / chip peak — perf.py)
- roofline points: large-batch bf16 train MFU, showing how far the
  reference's tiny configs sit from the chip's compute roof.

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

from tinydiffusionmodels_tpu import perf
from tinydiffusionmodels_tpu.runtime import configure_fast_rng, enable_compile_cache

enable_compile_cache()
configure_fast_rng()

# MNIST reference anchor (BASELINE.md "Measured MNIST anchor"): the actual
# reference stack measured on torch CPU by tools/ref_anchor.py, scaled to a
# T4 estimate by the published-T4/measured-CPU factor of the Shakespeare
# workload (conservative: high end of the 8.4-11.2x range).
MNIST_REF_T4_TRAIN_IT_S = 8.8       # est. reference T4 train it/s, bs=128
MNIST_REF_T4_SAMPLES_S = 2.56       # est. reference T4 1000-step samples/s


def _sync(out) -> None:
    """Force completion via a host read of one element.

    block_until_ready is NOT a reliable sync on the remote TPU backend (it
    can return before execution; see tools/kernel_bench.py), and repeated
    identical executions are memoized by the terminal — so timed calls must
    also vary their inputs.
    """
    first = jax.tree_util.tree_leaves(out)[0]
    float(jnp.ravel(first)[0])


def _timeit(fn, key, warmup: int = 2, iters: int = 10,
            windows: int = 5) -> list[float]:
    """Per-window timings of fn(fold_in(key, i)); list of seconds/call.

    ``fn`` must take a PRNG key; every call gets a fresh fold so no two
    executions share arguments (defeats result memoization). Five windows
    (vs 3) because the remote-tunnel TPU shows ~5% run-to-run drift.
    Callers take the median; the min/max envelope goes into the report so
    cross-round comparisons can see intra-run spread (BENCH_rN drift was
    previously unattributable — VERDICT r2 item 5).
    """
    n = [0]

    def call():
        n[0] += 1
        return fn(jax.random.fold_in(key, n[0]))

    for _ in range(warmup):
        _sync(call())
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = call()
        _sync(out)
        times.append((time.perf_counter() - t0) / iters)
    return times


def _median(xs: list[float]) -> float:
    return sorted(xs)[len(xs) // 2]


def _chain_timeit(fn, x0, k1: int = 4, k2: int | None = None,
                  windows: int = 5, min_window_s: float = 0.6) -> list[float]:
    """True serial DEVICE time per fn call, tunnel-dispatch excluded.

    A single dispatch+readback over the remote axon tunnel costs ~25-30 ms
    and pipelined dispatches still bottom out near ~7 ms/call — both
    swamp a ~2.6 ms decode, which is how round 2 misreported the guided
    decoder 4x slow (docs/…/2026-08-17-guided-decode-latency.md). Here
    call i+1's input depends on call i's output, so the device must run
    the K calls back-to-back while dispatches pipeline ahead; the slope
    (t(k2) - t(k1)) / (k2 - k1) is pure device time. Returns one slope
    per window (seconds/call).

    ``k2=None`` (default) sizes the chain adaptively: after compiling, a
    probe run estimates the per-call time and k2 is chosen so the slope
    window (k2-k1 extra calls) covers >= ``min_window_s`` of device time.
    The slope is a DIFFERENCE of two jittery wall-clock spans, so its
    noise is the sync jitter (~25 ms tunnel tail) over the window length:
    the old fixed 16-call window put a ~4 ms fused decode at ~64 ms of
    signal against that jitter — >15% envelope spread and occasional
    NEGATIVE slopes (BENCH r4 quick run: attempt min/median -0.08). 0.6 s
    windows bound the jitter term at ~4%.
    """
    def run(k):
        x = x0
        out = None
        for _ in range(k):
            out = fn(x)
            # Data dependency: fold a scalar of the output back into the
            # next input (also defeats terminal memoization).
            x = x0 + 1e-6 * jnp.float32(
                jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0]
            )
        return out

    _sync(run(2))  # compile both branches
    if k2 is None:
        t0 = time.perf_counter()
        _sync(run(8))
        per_call = (time.perf_counter() - t0) / 8
        # Floor keeps slow fns honest; the cap bounds chain length but
        # scales with the requested window (4096 at the 0.6 s default) so
        # it only ever binds where the capped chain ALREADY fills
        # min_window_s (~0.15 ms/call) — a fixed cap silently handed the
        # new 2.5 s latency-bound callers 0.8 s windows for any fn faster
        # than ~0.6 ms/call. (A 512 cap left ~0.4 ms calls — guided
        # decode bs=8 — at 0.2 s windows and >15% envelope spread.)
        cap = max(4096, int(4096 * min_window_s / 0.6))
        extra = max(16, min(cap, int(min_window_s / max(per_call, 1e-5))))
        k2 = k1 + extra
    slopes = []
    for _ in range(windows):
        t0 = time.perf_counter()
        _sync(run(k1))
        t1 = time.perf_counter()
        _sync(run(k2))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
    return slopes


def _mnist_setup():
    from tinydiffusionmodels_tpu.core import make_schedule
    from tinydiffusionmodels_tpu.models import init_unet
    from tinydiffusionmodels_tpu.train.mnist_train import (
        make_train_step,
        make_train_step_multi,
    )
    from tinydiffusionmodels_tpu.train.optim import adamw
    from tinydiffusionmodels_tpu.train.state import TrainState

    sched = make_schedule()
    tx = adamw(1e-3)
    state = TrainState.create(init_unet(jax.random.PRNGKey(0)), tx)
    return sched, tx, state, make_train_step, make_train_step_multi


def bench_mnist_train(batch_size: int = 128, chunk: int = 200,
                      compute_dtype=None) -> tuple[float, float | None]:
    """(optimizer steps/sec via the scan-of-steps path, FLOPs per step)."""
    sched, tx, state, make_step, make_multi = _mnist_setup()
    step = make_multi(sched, tx, chunk, compute_dtype=compute_dtype)
    batches = jax.random.normal(
        jax.random.PRNGKey(1), (chunk, batch_size, 28, 28, 1)
    )
    key = jax.random.PRNGKey(2)

    # FLOPs from the UNSCANNED single step (scan bodies are counted once
    # by XLA cost analysis — perf.py).
    single = make_step(sched, tx, compute_dtype=compute_dtype)
    flops = perf.compiled_flops(
        single, state, batches[0], key
    )

    state, _ = step(state, batches, key)  # compile
    state, loss = step(state, batches, jax.random.fold_in(key, 1))  # warm
    # Drain the async queue before the first timed window: without this
    # sync, window 1 starts its clock while the device is still executing
    # the compile+warm calls and absorbs them (the systematic 3-5x-slow
    # first window behind every loose BENCH_rN envelope min).
    _sync(loss)
    rates = []
    for r in range(5):
        t0 = time.perf_counter()
        for i in range(2):
            state, loss = step(state, batches, jax.random.fold_in(key, 2 + 2 * r + i))
        _sync(loss)
        rates.append(2 * chunk / (time.perf_counter() - t0))
    return rates, flops


def bench_mnist_sample(n_samples: int = 256, quick: bool = False,
                       method: str = "ancestral",
                       num_steps: int | None = None,
                       compute_dtype=None) -> tuple[float, float | None]:
    """(samples/sec, FLOPs per sample)."""
    from tinydiffusionmodels_tpu.core import make_schedule, p_sample
    from tinydiffusionmodels_tpu.models import init_unet, unet_apply
    from tinydiffusionmodels_tpu.sample.ancestral import sample_loop

    sched = make_schedule()
    params = init_unet(jax.random.PRNGKey(0))
    if compute_dtype is not None:
        from tinydiffusionmodels_tpu.train.precision import cast_floating

        params_c = cast_floating(params, compute_dtype)
        denoise = lambda x, t: unet_apply(
            params_c, x.astype(compute_dtype), t, timesteps=sched.timesteps
        ).astype(jnp.float32)
    else:
        denoise = lambda x, t: unet_apply(
            params, x, t, timesteps=sched.timesteps
        )
    fn = jax.jit(
        lambda k: sample_loop(
            denoise, sched, (n_samples, 28, 28, 1), k,
            method=method, num_steps=num_steps,
        )
    )

    # FLOPs of one reverse step (denoise + p_sample update) x step count.
    def one_step(x, t, key):
        return p_sample(sched, x, t, denoise(x, t), key)

    x = jnp.zeros((n_samples, 28, 28, 1), jnp.float32)
    t = jnp.zeros((n_samples,), jnp.int32)
    step_flops = perf.compiled_flops(one_step, x, t, jax.random.PRNGKey(0))
    nsteps = sched.timesteps if method == "ancestral" else (num_steps or 20)
    flops_per_sample = (
        step_flops * nsteps / n_samples if step_flops else None
    )

    secs = _timeit(fn, jax.random.PRNGKey(1), warmup=1, iters=1 if quick else 3)
    return [n_samples / s for s in secs], flops_per_sample


def _text_setup(batch_size, seq_len, dim, compute_dtype=None):
    from tinydiffusionmodels_tpu.core import make_schedule
    from tinydiffusionmodels_tpu.models import (
        init_learned_embedding,
        init_learned_rounding,
        init_tiny_transformer,
    )
    from tinydiffusionmodels_tpu.models.transformer import TransformerConfig
    from tinydiffusionmodels_tpu.train.optim import adamw
    from tinydiffusionmodels_tpu.train.state import TrainState

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
    return sched, cfg, tx, state, vocab


def bench_text_train(batch_size: int = 8, seq_len: int = 64,
                     dim: int = 256, chunk: int = 200,
                     compute_dtype=None) -> tuple[float, float | None]:
    """(joint 3-model optimizer steps/sec via scan-of-steps, FLOPs per step).
    Reference config bs=8/seq=64/dim=256; T4 baseline 25 it/s."""
    from tinydiffusionmodels_tpu.train.text_train import (
        make_text_train_step,
        make_text_train_step_multi,
    )

    sched, cfg, tx, state, vocab = _text_setup(batch_size, seq_len, dim)
    step = make_text_train_step_multi(
        sched, cfg, tx, use_learned_embeddings=True,
        compute_dtype=compute_dtype,
    )
    tokens = jax.random.randint(
        jax.random.PRNGKey(3), (chunk, batch_size, seq_len), 0, vocab
    )
    w = jnp.asarray(1.0)
    k = jax.random.PRNGKey(4)

    single = make_text_train_step(
        sched, cfg, tx, use_learned_embeddings=True,
        compute_dtype=compute_dtype,
    )
    flops = perf.compiled_flops(single, state, tokens[0], w, k)

    state, _ = step(state, tokens, w, k)  # compile
    state, losses = step(state, tokens, w, jax.random.fold_in(k, 1))  # warm
    _sync(losses)  # drain compile+warm before timing (see bench_mnist_train)
    rates = []
    for r in range(5):
        t0 = time.perf_counter()
        for i in range(2):
            state, losses = step(state, tokens, w, jax.random.fold_in(k, 2 + 2 * r + i))
        _sync(losses)
        rates.append(2 * chunk / (time.perf_counter() - t0))
    return rates, flops


def bench_text_sample(n: int = 8, seq_len: int = 64, dim: int = 256,
                      quick: bool = False) -> tuple[float, float | None]:
    """(reverse-diffusion steps/sec — the reference's tqdm it/s unit,
    FLOPs per reverse step)."""
    from tinydiffusionmodels_tpu.core import make_schedule, p_sample
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

    def one_step(x, t, key):
        return p_sample(sched, x, t, denoise(x, t), key)

    x = jnp.zeros((n, seq_len, dim), jnp.float32)
    t = jnp.zeros((n,), jnp.int32)
    step_flops = perf.compiled_flops(one_step, x, t, jax.random.PRNGKey(0))

    secs = _timeit(fn, jax.random.PRNGKey(1), warmup=1, iters=1 if quick else 3)
    return [sched.timesteps / s for s in secs], step_flops


def bench_guided(n: int = 8, seq_len: int = 64) -> tuple[float, float | None]:
    """(guided decode tokens/sec with the KV-cached scan, FLOPs per token).

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
    from tinydiffusionmodels_tpu.sample.guided import (
        default_seg,
        guided_generate_scan,
    )

    cfg = TinyGPTConfig(vocab_size=4096, dim=256, n_heads=4, depth=4,
                        max_len=seq_len + 1)
    params = init_tiny_gpt(jax.random.PRNGKey(0), cfg)
    decode = lambda cache, tok, attn_len=None: tiny_gpt_decode_step(
        params, cache, tok, cfg, attn_len
    )
    cache0 = tiny_gpt_init_cache(cfg, n)
    tok0 = jnp.zeros((n,), jnp.int32)
    step_flops = perf.compiled_flops(decode, cache0, tok0)
    flops_per_token = step_flops / n if step_flops else None

    # Chained-delta: the decode call is ~2.6 ms on-device at n=8, far
    # below the tunnel's per-dispatch cost — _timeit would (and in r2 did)
    # measure the tunnel, not the chip.
    diff0 = jax.random.normal(jax.random.PRNGKey(1), (n, seq_len,
                                                      cfg.vocab_size))
    gen = jax.jit(
        lambda d: guided_generate_scan(
            decode, tiny_gpt_init_cache(cfg, n), d, 0, alpha=0.3,
            seg=default_seg(n),
        )
    )
    # Latency-bound at n<=8 (~0.4 ms/decode-step): BENCH_r04's best
    # envelope after retries was min/median 0.798 at 0.6 s windows — the
    # slope jitter needs longer windows to average out (VERDICT r4 item 4).
    secs = _chain_timeit(gen, diff0,
                         min_window_s=2.5 if n <= 8 else 0.6)
    return [n * seq_len / s for s in secs], flops_per_token


def bench_guided_fused(n: int = 8, seq_len: int = 64) -> tuple[list, None]:
    """The persistent Pallas decode kernel (ops/decode_kernel.py): whole
    guided decode as ONE kernel, weights VMEM-resident across positions.
    Same chained-delta timing as bench_guided for a like-for-like number.
    Batches beyond the kernel's VMEM capacity run as chunked sweeps
    (chunk sweeps are built into fused_guided_decode)."""
    from tinydiffusionmodels_tpu.models import init_tiny_gpt
    from tinydiffusionmodels_tpu.models.ar_lm import TinyGPTConfig
    from tinydiffusionmodels_tpu.ops.decode_kernel import (
        fused_guided_decode,
    )

    cfg = TinyGPTConfig(vocab_size=4096, dim=256, n_heads=4, depth=4,
                        max_len=seq_len + 1)
    params = init_tiny_gpt(jax.random.PRNGKey(0), cfg)
    diff0 = jax.random.normal(jax.random.PRNGKey(1), (n, seq_len,
                                                      cfg.vocab_size))
    fn = jax.jit(
        lambda d: fused_guided_decode(params, cfg, d, 0, alpha=0.3)
    )
    secs = _chain_timeit(fn, diff0,
                         min_window_s=2.5 if n <= 8 else 0.6)
    return [n * seq_len / s for s in secs], None


def bench_guided_verified(n: int = 256, seq_len: int = 64,
                          draft: str = "auto") -> tuple[list, None]:
    """Exact-greedy guided decode entry point (guided_generate_verified,
    sample/guided.py). ``draft="auto"`` measures the routed entry point
    (fused kernel + Jacobi verify at small batch, plain f32 scan at large
    batch — VERDICT r4 item 3); ``draft="scan_bf16"`` forces the
    speculative bf16-draft pipeline for comparison."""
    from tinydiffusionmodels_tpu.models import init_tiny_gpt
    from tinydiffusionmodels_tpu.models.ar_lm import TinyGPTConfig
    from tinydiffusionmodels_tpu.sample.guided import guided_generate_verified

    cfg = TinyGPTConfig(vocab_size=4096, dim=256, n_heads=4, depth=4,
                        max_len=seq_len + 1)
    params = init_tiny_gpt(jax.random.PRNGKey(0), cfg)
    diff0 = jax.random.normal(jax.random.PRNGKey(1), (n, seq_len,
                                                      cfg.vocab_size))
    fn = jax.jit(
        lambda d: guided_generate_verified(params, cfg, d, 0, alpha=0.3,
                                           draft=draft)
    )
    secs = _chain_timeit(fn, diff0,
                         min_window_s=2.5 if n <= 8 else 0.6)
    return [n * seq_len / s for s in secs], None


def _load_threshold() -> float:
    """1-min load above this = something besides the bench is running.

    The axon tunnel is host-fed: a concurrent full pytest run craters the
    headline ~15x (BENCH_r03 post-mortem). The bench itself keeps ~1 thread
    busy feeding the tunnel, so the plain 0.5*ncpu rule can never pass on a
    1-CPU host (measured: 'idle' bench load ~0.5-1.2 there) — allow one
    busy core on top. On small hosts the load signal stays weak; envelope
    tightness is the primary validity check."""
    return 0.5 * (os.cpu_count() or 1) + 1.0


def _quiet_host() -> bool:
    return os.getloadavg()[0] < _load_threshold()


def _wait_for_quiet(max_wait_s: float) -> bool:
    """Poll until the host is quiet or the budget runs out; True if quiet."""
    deadline = time.monotonic() + max_wait_s
    while not _quiet_host():
        if time.monotonic() >= deadline:
            return False
        time.sleep(min(15.0, max(1.0, deadline - time.monotonic())))
    return True


# A window whose min is this far below its median was contended, not noisy:
# quiet-host spread on every metric is well inside 15% (VERDICT r3 item 3).
_TIGHT = 0.85


def _spread_ok(rates: list[float]) -> bool:
    return min(rates) >= _TIGHT * _median(rates)


def _measure_with_retry(name: str, thunk, retry_log: dict,
                        max_retries: int | None = None):
    """Run one metric; if its window envelope shows contention (min more
    than 15% below median), wait for a quiet host and re-measure, keeping
    the tightest attempt. bench must defend its numbers, not report a
    contaminated median (VERDICT r3 item 3).

    TDM_BENCH_RETRIES (default 2) bounds retries per metric;
    TDM_BENCH_QUIET_WAIT (default 120 s) bounds each wait-for-quiet."""
    if max_retries is None:
        max_retries = int(os.environ.get("TDM_BENCH_RETRIES", "2"))
    quiet_wait = float(os.environ.get("TDM_BENCH_QUIET_WAIT", "120"))
    attempts = []
    rates, flops = thunk()
    attempts.append(rates)
    tries = 0
    while not _spread_ok(rates) and tries < max_retries:
        tries += 1
        _wait_for_quiet(quiet_wait)
        rates, _ = thunk()
        attempts.append(rates)
    if tries:
        # Keep the tightest attempt (highest min/median): the quietest
        # window is the best estimate of the chip; contaminated windows
        # measure the neighbor's job. All attempts go to provenance.
        rates = max(attempts, key=lambda r: min(r) / _median(r))
        # One entry per --repeat iteration (appended, not overwritten), so
        # provenance keeps every repeat's retry evidence.
        entry = {
            "retries": tries,
            "attempt_min_over_median": [
                round(min(r) / _median(r), 3) for r in attempts
            ],
        }
        retry_log.setdefault(name, []).append(entry)
        if not _spread_ok(rates):
            # Last-resort policy for latency-bound metrics whose raw
            # windows never tighten (VERDICT r4 item 4): each attempt's
            # MEDIAN is robust to a contended window, so if the attempt
            # medians agree within the tightness bar the value is
            # reproducible and reported as median-of-attempt-medians.
            med_rates = [_median(a) for a in attempts]
            if len(med_rates) >= 2 and _spread_ok(med_rates):
                rates = med_rates
                entry["policy"] = "median_of_attempt_medians"
    return rates, flops


HEADLINE_METRIC = "shakespeare_train_it_s"


def _run_validity(env: dict, solo_run: bool,
                  headline: str = HEADLINE_METRIC):
    """Run-level validity policy (VERDICT r4 item 4): each metric carries
    its own valid flag (envelope tight after retries); the RUN is valid
    iff it was solo and the HEADLINE metric is tight. A loose secondary
    metric is individually flagged instead of poisoning the whole line
    (BENCH_r04 was valid:false on the strength of one loose
    guided_tokens_s envelope). Returns (metric_valid, loose, reasons) —
    this is the single source of truth main() emits from, so the policy
    test exercises the same code path as the JSON line."""
    metric_valid = {n: _spread_ok(v) for n, v in env.items()}
    loose = sorted(n for n, ok in metric_valid.items() if not ok)
    reasons = []
    if not solo_run:
        reasons.append("host not solo (load average >= 50% of cores)")
    if not metric_valid.get(headline, True):
        reasons.append("headline envelope min >15% below median "
                       "after retries")
    return metric_valid, loose, reasons


def _provenance(load_start) -> dict:
    """Environment/contention record for cross-round comparability.

    The axon tunnel is host-fed: a concurrent host-heavy job craters every
    metric (measured 15x under a full pytest run — .claude verify notes), and
    whole-run drift of 5-10% tracks machine load. Recording load average +
    a solo-run check makes BENCH_rN-to-BENCH_rN+1 deltas attributable.
    """
    ncpu = os.cpu_count() or 1
    load_end = os.getloadavg()
    return {
        "time_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "cpus": ncpu,
        "load_avg_start": [round(x, 2) for x in load_start],
        "load_avg_end": [round(x, 2) for x in load_end],
        # 1-min load under the allowance (0.5*cores + 1 for the bench's own
        # tunnel-feeding thread — _load_threshold) at both ends ~= nothing
        # host-heavy ran alongside the bench.
        "solo_run": bool(
            load_start[0] < _load_threshold()
            and load_end[0] < _load_threshold()
        ),
        "scan_chunk": os.environ.get("TDM_SCAN_CHUNK", "default"),
        "kernels": os.environ.get("TDM_KERNELS", "auto"),
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--repeat", type=int, default=1,
                        help="repeat the whole suite N times; envelopes "
                             "merge all windows across repeats")
    args = parser.parse_args()

    # Don't start into a contended host: wait (bounded) for quiet first.
    if not _quiet_host():
        waited = _wait_for_quiet(
            float(os.environ.get("TDM_BENCH_QUIET_WAIT", "120"))
        )
        print(f"[bench] host busy at start; waited, quiet={waited}",
              file=sys.stderr)
    load_start = os.getloadavg()
    backend = jax.default_backend()
    device_kind = getattr(jax.devices()[0], "device_kind", backend)
    peak = perf.device_peak_flops()

    r = {}
    env = {}
    mfu = {}
    retry_log = {}

    def record(name, rates, flops):
        env.setdefault(name, []).extend(rates)
        r[name] = _median(env[name])
        m = perf.mfu(flops, r[name])
        if m is not None:
            mfu[name] = round(m, 4)

    for _rep in range(max(1, args.repeat)):
        _run_suite(args, record, retry_log)

    envelope = {
        name: [round(min(v), 2), round(_median(v), 2), round(max(v), 2)]
        for name, v in env.items()
    }
    prov = _provenance(load_start)
    metric_valid, loose, reasons = _run_validity(env, prov["solo_run"])
    prov["retries"] = retry_log
    _emit(args, r, mfu, envelope, backend, device_kind, peak, prov,
          valid=not reasons, invalid_reasons=reasons,
          metric_valid=metric_valid, loose_metrics=loose)


def _run_suite(args, record, retry_log) -> None:
    bf16 = jnp.bfloat16
    chunk = 20 if args.quick else 50
    suite = [
        ("shakespeare_train_it_s", lambda: bench_text_train()),
        ("shakespeare_sample_steps_s",
         lambda: bench_text_sample(quick=args.quick)),
        ("mnist_train_it_s", lambda: bench_mnist_train()),
        ("mnist_sample_samples_s",
         lambda: bench_mnist_sample(quick=args.quick)),
        ("mnist_sample_dpmpp20_s",
         lambda: bench_mnist_sample(quick=args.quick, method="dpm++",
                                    num_steps=20)),
        ("guided_tokens_s", lambda: bench_guided()),
        # Throughput-oriented guided decode: the scan decoder is
        # latency-bound at the reference's n=8; batching amortizes it.
        ("guided_tokens_s_bs256", lambda: bench_guided(n=256)),
        ("guided_fused_tokens_s", lambda: bench_guided_fused()),
        ("guided_fused_tokens_s_bs256", lambda: bench_guided_fused(n=256)),
        # EXACT guided decode entry point (sample/guided.py
        # guided_generate_verified, draft="auto"): fused-kernel draft +
        # Jacobi f32 verification at small batch, routed to the plain f32
        # scan at large batch where it dominates (VERDICT r4 item 3 —
        # r4's re-draft pipeline was 4x slower than the scan it wrapped).
        ("guided_verified_tokens_s_bs8",
         lambda: bench_guided_verified(n=8)),
        # The round-4 speculative pipeline, re-measured with Jacobi
        # verification (draft scan runs ONCE; refinement rounds are
        # parallel verify forwards instead of sequential re-draft scans).
        ("guided_spec_tokens_s_bs256",
         lambda: bench_guided_verified(n=256, draft="scan_bf16")),
        # Roofline points: large-batch bf16 training, where the MXU should
        # be busy. Shows how far the reference's tiny configs sit from the
        # roof (docs/…/mfu-roofline journal post). bs=512 is the measured
        # images/s sweet spot (bs=2048 degrades ~20% in both dtypes).
        ("mnist_train_bs512_bf16_it_s",
         lambda: bench_mnist_train(batch_size=512, chunk=chunk,
                                   compute_dtype=bf16)),
        ("shakespeare_train_bs512_bf16_it_s",
         lambda: bench_text_train(batch_size=512, chunk=chunk,
                                  compute_dtype=bf16)),
    ]
    for name, thunk in suite:
        rate, flops = _measure_with_retry(name, thunk, retry_log)
        record(name, rate, flops)
        if name == "guided_tokens_s_bs256":
            # guided_generate_verified(draft="auto") routes bs=256 to the
            # plain f32 scan whenever the fused kernel's VMEM check fails
            # — the IDENTICAL computation just timed. Alias those windows
            # instead of paying a second 5-window measurement of the same
            # graph (and so guided_exact_best isn't a max over two noisy
            # medians of one quantity). If the routing ever flips (bigger
            # VMEM / smaller model), measure the fused entry for real.
            from tinydiffusionmodels_tpu.models.ar_lm import TinyGPTConfig
            from tinydiffusionmodels_tpu.ops.decode_kernel import fits_vmem

            cfg = TinyGPTConfig(vocab_size=4096, dim=256, n_heads=4,
                                depth=4, max_len=65)
            if fits_vmem(cfg, 256, cfg.vocab_size):
                rate, flops = _measure_with_retry(
                    "guided_verified_tokens_s_bs256",
                    lambda: bench_guided_verified(n=256), retry_log)
            record("guided_verified_tokens_s_bs256", rate, flops)


def _emit(args, r, mfu, envelope, backend, device_kind, peak,
          provenance, valid=True, invalid_reasons=(),
          metric_valid=None, loose_metrics=()) -> None:
    headline = r["shakespeare_train_it_s"]
    print(
        json.dumps(
            {
                "metric": "shakespeare_train_steps_per_sec_bs8_seq64_dim256",
                "value": round(headline, 2),
                "unit": "it/s",
                "vs_baseline": round(headline / 25.0, 2),  # T4: 25 it/s
                "valid": bool(valid),
                **({"invalid_reasons": list(invalid_reasons)}
                   if invalid_reasons else {}),
                **({"loose_metrics": list(loose_metrics)}
                   if loose_metrics else {}),
                "extra": {
                    "backend": backend,
                    "device_kind": device_kind,
                    "peak_flops_bf16": peak,
                    "mnist_train_it_s_bs128": round(r["mnist_train_it_s"], 2),
                    "mnist_sample_samples_s_1000step_bs256": round(
                        r["mnist_sample_samples_s"], 2
                    ),
                    # vs the measured-anchor T4 estimates (BASELINE.md):
                    "mnist_train_vs_ref_t4_est": round(
                        r["mnist_train_it_s"] / MNIST_REF_T4_TRAIN_IT_S, 1
                    ),
                    "mnist_sample_vs_ref_t4_est": round(
                        r["mnist_sample_samples_s"] / MNIST_REF_T4_SAMPLES_S, 1
                    ),
                    "shakespeare_sample_steps_s_bs8": round(
                        r["shakespeare_sample_steps_s"], 2
                    ),
                    "shakespeare_sample_vs_t4_601": round(
                        r["shakespeare_sample_steps_s"] / 601.0, 2
                    ),
                    "guided_decode_tokens_s_bs8": round(
                        r["guided_tokens_s"], 2
                    ),
                    "guided_decode_tokens_s_bs256": round(
                        r["guided_tokens_s_bs256"], 2
                    ),
                    # Persistent Pallas decode kernel (VMEM-resident
                    # weights; ops/decode_kernel.py). Guided metrics are
                    # chained-delta device time from r3 on — r2's numbers
                    # measured the tunnel dispatch, not the chip.
                    "guided_fused_tokens_s_bs8": round(
                        r["guided_fused_tokens_s"], 2
                    ),
                    "guided_fused_tokens_s_bs256": round(
                        r["guided_fused_tokens_s_bs256"], 2
                    ),
                    # Exact-greedy guided decode entry point (auto-routed:
                    # fused+Jacobi at bs=8, plain f32 scan at bs=256) —
                    # the parity-preserving throughput numbers.
                    "guided_verified_tokens_s_bs8": round(
                        r["guided_verified_tokens_s_bs8"], 2
                    ),
                    "guided_verified_tokens_s_bs256": round(
                        r["guided_verified_tokens_s_bs256"], 2
                    ),
                    # Speculative pipeline with Jacobi verification
                    # (draft scan once + parallel verify rounds), for
                    # comparison against the routed entry point.
                    "guided_spec_tokens_s_bs256": round(
                        r["guided_spec_tokens_s_bs256"], 2
                    ),
                    # Best exact-greedy throughput at bs=256 (VERDICT r4
                    # item 3's reporting ask).
                    "guided_exact_best_tokens_s_bs256": round(
                        max(r["guided_verified_tokens_s_bs256"],
                            r["guided_tokens_s_bs256"],
                            r["guided_spec_tokens_s_bs256"]), 2
                    ),
                    # DPM-Solver++(2M) 20 steps matches ancestral-1000
                    # fidelity (IS 6.20 vs 6.43, tools/fidelity.py) — the
                    # quality-matched sampling throughput.
                    "mnist_sample_dpmpp20_samples_s_bs256": round(
                        r["mnist_sample_dpmpp20_s"], 2
                    ),
                    "mnist_train_bs512_bf16_it_s": round(
                        r["mnist_train_bs512_bf16_it_s"], 2
                    ),
                    "shakespeare_train_bs512_bf16_it_s": round(
                        r["shakespeare_train_bs512_bf16_it_s"], 2
                    ),
                    "mfu": mfu,
                    # Per-metric [min, median, max] across all timing
                    # windows (x --repeat), it/s-space.
                    "envelope": envelope,
                    # Per-metric envelope-tightness verdicts (VERDICT r4
                    # item 4): False = that one number is contended even
                    # after retries; the rest of the line stands.
                    **({"metric_valid": metric_valid}
                       if metric_valid is not None else {}),
                    "provenance": provenance,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
