"""Measure the ACTUAL reference stack on this machine (BASELINE.md:24-25,
VERDICT round-1 item 6: anchor the MNIST >=10x claim).

Imports the reference implementation from /root/reference (never copies it)
and times its exact training/sampling loop bodies (src/mnist.py:150-160,
191-193; src/shakespeare.py:208-263) on torch CPU, next to this framework
running on its CPU backend — a like-for-like same-hardware comparison — and
a loss-parity check on identical synthetic data.

The T4 anchor chain: the reference publishes Shakespeare T4 numbers
(25 it/s train, 387-601 it/s sample — SURVEY §6) but no MNIST throughput.
This tool measures ref-torch-CPU for BOTH workloads on one machine, so

    mnist_T4_estimate = mnist_torch_cpu * (shakespeare_T4 / shakespeare_torch_cpu)

i.e. the published T4/CPU speedup for the text workload transfers the MNIST
CPU anchor onto T4. The estimate + provenance live in BASELINE.md; bench.py
reports `mnist_train_vs_ref_t4_est` against it.

Usage:  python tools/ref_anchor.py [--steps 60] [--json]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
import types

import numpy as np

REPO = "/root/repo"
REFERENCE = "/root/reference"


def _stub_module(name: str, **attrs) -> None:
    import importlib.machinery

    mod = types.ModuleType(name)
    # Well-formed __spec__ so importlib.util.find_spec on the stub works
    # (HF datasets probes torchvision availability that way).
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


def _import_reference():
    """Import /root/reference/src with its unused heavy deps stubbed.

    dotenv and torchvision are not installed here; the anchor only uses the
    model/math/loop code paths, which don't touch them (torchvision is PNG
    grids + dataset download only, src/mnist.py:17,110,139)."""
    if "dotenv" not in sys.modules:
        try:
            import dotenv  # noqa: F401
        except ImportError:
            _stub_module("dotenv", load_dotenv=lambda *a, **k: None)
    try:
        import torchvision  # noqa: F401
    except ImportError:
        for name in ("torchvision", "torchvision.datasets",
                     "torchvision.transforms", "torchvision.utils"):
            _stub_module(name)
        sys.modules["torchvision"].datasets = sys.modules["torchvision.datasets"]
        sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
        sys.modules["torchvision"].utils = sys.modules["torchvision.utils"]
    sys.path.insert(0, REFERENCE)
    import src.mnist as ref_mnist
    import src.shakespeare as ref_shakespeare

    return ref_mnist, ref_shakespeare


def _synthetic_mnist(n: int) -> np.ndarray:
    """(N, 28, 28) float32 in [-1, 1] — the reference's Normalize(0.5, 0.5)
    output range (src/mnist.py:141-143)."""
    sys.path.insert(0, REPO)
    from tinydiffusionmodels_tpu.data.mnist import load_mnist

    images, _, _ = load_mnist(train=True, synthetic_size=n)
    images = images[:n]
    return images.astype(np.float32) / 255.0 * 2.0 - 1.0


def bench_ref_mnist_train(ref, x_all: np.ndarray, steps: int,
                          batch_size: int = 128, seed: int = 0):
    """Time the reference per-step body (src/mnist.py:150-160) on torch CPU."""
    import torch

    torch.manual_seed(seed)
    model = ref.SimpleUNet()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3)
    data = torch.from_numpy(x_all[:, None])  # NCHW (B, 1, 28, 28)
    n = data.shape[0]
    losses = []

    def step(i: int) -> float:
        lo = (i * batch_size) % max(1, n - batch_size)
        x = data[lo:lo + batch_size]
        t = torch.randint(0, ref.timesteps, (x.shape[0],))
        noise = torch.randn_like(x)
        x_noisy = ref.q_sample(x, t, noise)
        pred = model(x_noisy, t)
        loss = torch.nn.functional.mse_loss(pred, noise)
        opt.zero_grad()
        loss.backward()
        opt.step()
        return loss.item()  # per-step sync, as the reference does

    for i in range(5):
        step(i)
    t0 = time.perf_counter()
    for i in range(steps):
        losses.append(step(5 + i))
    dt = time.perf_counter() - t0
    return steps / dt, losses


def bench_ref_mnist_sample(ref, rev_steps: int = 100, n_samples: int = 25):
    """Time the reference reverse loop (src/mnist.py:191-193) on torch CPU."""
    import torch

    torch.manual_seed(0)
    model = ref.SimpleUNet().eval()
    x = torch.randn(n_samples, 1, 28, 28)
    with torch.no_grad():
        for i in reversed(range(3)):  # warmup
            t = torch.full((n_samples,), i, dtype=torch.long)
            x = ref.p_sample(model, x, t)
        t0 = time.perf_counter()
        for i in reversed(range(rev_steps)):
            t = torch.full((n_samples,), i, dtype=torch.long)
            x = ref.p_sample(model, x, t)
        dt = time.perf_counter() - t0
    return rev_steps / dt


def bench_ref_shakespeare_train(ref, steps: int, batch_size: int = 8,
                                seq_len: int = 64, dim: int = 256,
                                vocab: int = 97, seed: int = 0):
    """Time the reference joint text step (src/shakespeare.py:208-263,
    learned embeddings) at the published-benchmark config bs=8/seq=64/dim=256
    (docs 2025-07-21 post)."""
    import torch

    torch.manual_seed(seed)
    embedding_fn = ref.LearnedEmbedding(vocab, dim)
    model = ref.TinyTransformer(dim)
    rounding_fn = ref.LearnedRounding(dim, vocab)
    params = (list(model.parameters()) + list(rounding_fn.parameters())
              + list(embedding_fn.parameters()))
    opt = torch.optim.AdamW(params, lr=1e-4, weight_decay=1e-4)
    tokens = torch.randint(0, vocab, (steps + 5, batch_size, seq_len))

    def step(i: int) -> float:
        batch = tokens[i]
        x0 = embedding_fn(batch)
        t = torch.randint(0, ref.T, (batch.shape[0],))  # shakespeare.py:25
        noise = torch.randn_like(x0)
        x_noisy = ref.q_sample(x0, t, noise)
        pred = model(x_noisy, t)
        diff_loss = torch.nn.functional.mse_loss(pred, noise)
        logits = rounding_fn(x0)
        rounding_loss = torch.nn.functional.cross_entropy(
            logits.view(-1, vocab), batch.view(-1)
        )
        loss = diff_loss + rounding_loss
        opt.zero_grad()
        loss.backward()
        opt.step()
        return loss.item()

    for i in range(5):
        step(i)
    t0 = time.perf_counter()
    for i in range(steps):
        step(5 + i)
    dt = time.perf_counter() - t0
    return steps / dt


def bench_our_mnist_cpu(x_all: np.ndarray, steps: int, batch_size: int = 128,
                        seed: int = 0):
    """Same workload through this framework on the CPU backend."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tinydiffusionmodels_tpu.core import make_schedule
    from tinydiffusionmodels_tpu.models import init_unet
    from tinydiffusionmodels_tpu.train.mnist_train import make_train_step
    from tinydiffusionmodels_tpu.train.optim import adamw
    from tinydiffusionmodels_tpu.train.state import TrainState

    sched = make_schedule(1000)
    tx = adamw(1e-3)
    state = TrainState.create(init_unet(jax.random.PRNGKey(seed)), tx)
    step_fn = make_train_step(sched, tx)
    data = jnp.asarray(x_all[..., None])  # NHWC (B, 28, 28, 1)
    n = data.shape[0]
    key = jax.random.PRNGKey(seed)
    losses = []

    def step(state, i):
        lo = (i * batch_size) % max(1, n - batch_size)
        x = jax.lax.dynamic_slice_in_dim(data, lo, batch_size, 0)
        return step_fn(state, x, jax.random.fold_in(key, i))

    for i in range(5):
        state, loss = step(state, i)
    loss.block_until_ready()
    t0 = time.perf_counter()
    for i in range(steps):
        state, loss = step(state, 5 + i)
        losses.append(float(loss))  # match the reference's per-step sync
    dt = time.perf_counter() - t0
    return steps / dt, losses


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--sample_steps", type=int, default=100)
    ap.add_argument("--json", action="store_true", help="JSON only")
    args = ap.parse_args()

    ref_mnist, ref_shk = _import_reference()
    x_all = _synthetic_mnist(2048)

    ref_train_its, ref_losses = bench_ref_mnist_train(
        ref_mnist, x_all, args.steps
    )
    ref_sample_its = bench_ref_mnist_sample(
        ref_mnist, rev_steps=args.sample_steps
    )
    ref_text_its = bench_ref_shakespeare_train(ref_shk, args.steps)
    our_train_its, our_losses = bench_our_mnist_cpu(x_all, args.steps)

    # Published reference T4 shakespeare training: 25 it/s (SURVEY §6).
    t4_scale = 25.0 / ref_text_its
    result = {
        "machine": "same-host torch-CPU vs jax-CPU",
        "ref_mnist_train_it_s_cpu": round(ref_train_its, 2),
        "ref_mnist_sample_it_s_cpu_bs25": round(ref_sample_its, 2),
        "ref_shakespeare_train_it_s_cpu": round(ref_text_its, 2),
        "our_mnist_train_it_s_cpu": round(our_train_its, 2),
        "same_hw_mnist_train_ratio": round(our_train_its / ref_train_its, 2),
        "t4_over_cpu_scale_from_shakespeare": round(t4_scale, 2),
        "est_ref_mnist_train_it_s_t4": round(ref_train_its * t4_scale, 2),
        "est_ref_mnist_sample_it_s_t4_bs25": round(ref_sample_its * t4_scale, 2),
        "loss_parity": {
            "ref_final_loss_mean_last20": round(
                float(np.mean(ref_losses[-20:])), 4
            ),
            "ours_final_loss_mean_last20": round(
                float(np.mean(our_losses[-20:])), 4
            ),
        },
        "steps": args.steps,
    }
    if not args.json:
        for k, v in result.items():
            print(f"{k}: {v}")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
