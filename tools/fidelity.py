#!/usr/bin/env python3
"""Quantitative sample-fidelity evaluation for MNIST diffusion checkpoints.

Trains a small CNN classifier on the training distribution, generates N
samples from a diffusion checkpoint, and reports:
- ``classifier_accuracy_on_data``: sanity ceiling (held-out data),
- ``mean_max_prob``: average classifier confidence on generated samples
  (higher = samples look like digits),
- ``inception_score``: exp(E_x[KL(p(y|x) || p(y))]) over generated samples
  (higher = confident AND diverse).

The reference judges samples only by eye (SURVEY.md §4); this makes
"sample-fidelity parity" (BASELINE.json) measurable and regression-testable.

Usage: python tools/fidelity.py --ckpt ckpt.pth [--n 256] [--steps ddim:50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def train_classifier(images: np.ndarray, labels: np.ndarray, *, epochs: int = 2,
                     batch_size: int = 256, seed: int = 0):
    import jax
    import jax.numpy as jnp
    import optax

    from tinydiffusionmodels_tpu.data.mnist import normalize_mnist
    from tinydiffusionmodels_tpu.models.classifier import (
        classifier_apply,
        init_classifier,
    )

    x = normalize_mnist(images)
    y = labels.astype(np.int64)
    n_val = max(256, len(x) // 10)
    x_train, y_train = x[:-n_val], y[:-n_val]
    x_val, y_val = x[-n_val:], y[-n_val:]

    params = init_classifier(jax.random.PRNGKey(seed))
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            logits = classifier_apply(p, xb)
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(logp, yb[:, None], axis=1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    for epoch in range(epochs):
        idx = rng.permutation(len(x_train))
        for s in range(0, len(x_train) - batch_size + 1, batch_size):
            b = idx[s : s + batch_size]
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(x_train[b]), jnp.asarray(y_train[b])
            )

    @jax.jit
    def predict(params, xb):
        return jax.nn.softmax(classifier_apply(params, xb), axis=-1)

    probs = np.asarray(predict(params, jnp.asarray(x_val)))
    acc = float((probs.argmax(-1) == y_val).mean())
    return params, predict, acc


def inception_score(probs: np.ndarray) -> float:
    """exp(E_x[KL(p(y|x) || p(y))]), the standard IS formula."""
    p_y = probs.mean(axis=0, keepdims=True)
    kl = (probs * (np.log(probs + 1e-12) - np.log(p_y + 1e-12))).sum(axis=1)
    return float(np.exp(kl.mean()))


def evaluate_checkpoint(ckpt_path: str, *, n: int = 256, method: str = "ancestral",
                        num_steps: int | None = None, seed: int = 0,
                        data_root: str = "./data", compute_dtype=None) -> dict:
    import jax
    import jax.numpy as jnp

    from tinydiffusionmodels_tpu.core import make_schedule
    from tinydiffusionmodels_tpu.data.mnist import load_mnist
    from tinydiffusionmodels_tpu.io import load_checkpoint
    from tinydiffusionmodels_tpu.io.checkpoint import unet_from_state_dict
    from tinydiffusionmodels_tpu.models import unet_apply
    from tinydiffusionmodels_tpu.sample.ancestral import sample_loop

    images, labels, source = load_mnist(data_root)
    limit = int(os.environ.get("TDM_DATA_LIMIT", "0"))
    if limit:
        images, labels = images[:limit], labels[:limit]
    clf_params, predict, acc = train_classifier(images, labels)

    params = unet_from_state_dict(load_checkpoint(ckpt_path))
    sched = make_schedule()
    if compute_dtype is not None:
        # bf16 denoiser forward, f32 sampler update math (matches bench.py's
        # bench_mnist_sample bf16 path).
        from tinydiffusionmodels_tpu.train.precision import cast_floating

        params_c = cast_floating(params, compute_dtype)
        denoise = lambda x, t: unet_apply(
            params_c, x.astype(compute_dtype), t, timesteps=sched.timesteps
        ).astype(jnp.float32)
    else:
        denoise = lambda x, t: unet_apply(params, x, t, timesteps=sched.timesteps)
    samples = jax.jit(
        lambda k: sample_loop(
            denoise, sched, (n, 28, 28, 1), k, method=method,
            num_steps=num_steps,
        )
    )(jax.random.PRNGKey(seed))
    samples = jnp.clip(samples, -1.0, 1.0)

    probs = np.asarray(predict(clf_params, samples))
    return {
        "data_source": source,
        "classifier_accuracy_on_data": round(acc, 4),
        "n_samples": n,
        "mean_max_prob": round(float(probs.max(axis=1).mean()), 4),
        "inception_score": round(inception_score(probs), 4),
        "class_histogram": np.bincount(
            probs.argmax(axis=1), minlength=10
        ).tolist(),
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, default="ckpt.pth")
    parser.add_argument("--n", type=int, default=256)
    parser.add_argument("--sampler", type=str, default="ancestral",
                        choices=["ancestral", "ddim", "dpm++"])
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--data_root", type=str, default="./data")
    parser.add_argument("--dtype", choices=["f32", "bf16"], default="f32")
    args = parser.parse_args()
    compute_dtype = None
    if args.dtype == "bf16":
        import jax.numpy as jnp

        compute_dtype = jnp.bfloat16
    result = evaluate_checkpoint(
        args.ckpt, n=args.n, method=args.sampler, num_steps=args.steps,
        seed=args.seed, data_root=args.data_root, compute_dtype=compute_dtype,
    )
    result["dtype"] = args.dtype
    print(json.dumps(result))


if __name__ == "__main__":
    main()
