"""Base-LM (TinyGPT) training for guided sampling.

The reference assumes a pretrained HF CausalLM (google/gemma-2b-it) for its
guided sampler (src/shakespeare.py:509). In hermetic environments the
framework instead trains its own small causal LM on the same corpus; this
module is that trainer (standard next-token cross-entropy, jitted donated
step). Not part of the reference surface — an enabling addition.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tinydiffusionmodels_tpu.core.rng import substream
from tinydiffusionmodels_tpu.data.loader import batch_iterator
from tinydiffusionmodels_tpu.models import init_tiny_gpt, tiny_gpt_apply
from tinydiffusionmodels_tpu.models.ar_lm import TinyGPTConfig
from tinydiffusionmodels_tpu.train.optim import adamw
from tinydiffusionmodels_tpu.train.state import TrainState


def make_lm_train_step(cfg: TinyGPTConfig, tx):
    def loss_fn(params, tokens):
        logits = tiny_gpt_apply(params, tokens[:, :-1], cfg)
        targets = tokens[:, 1:]
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, targets[..., None], axis=-1))

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, tokens)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return step


def train_lm(
    chunks: np.ndarray,
    cfg: TinyGPTConfig,
    *,
    epochs: int = 3,
    batch_size: int = 64,
    lr: float = 3e-4,
    seed: int = 0,
    log_fn=print,
) -> dict:
    """Train TinyGPT on (N, seq_len) token chunks; returns params."""
    if chunks.shape[0] == 0:
        raise ValueError("empty corpus: no chunks to train the base LM on")
    batch_size = max(1, min(batch_size, chunks.shape[0]))
    key = jax.random.PRNGKey(seed)
    params = init_tiny_gpt(substream(key, "lm_init"), cfg)
    tx = adamw(lr, weight_decay=0.01)
    state = TrainState.create(params, tx)
    step = make_lm_train_step(cfg, tx)
    for epoch in range(epochs):
        t0 = time.perf_counter()
        n = 0
        loss = jnp.zeros(())
        for tokens in batch_iterator(chunks, batch_size, seed=seed, epoch=epoch):
            state, loss = step(state, jnp.asarray(tokens))
            n += 1
        log_fn(
            f"[lm] epoch {epoch + 1}/{epochs}: {n} steps, "
            f"{n / (time.perf_counter() - t0):.1f} it/s, loss={float(loss):.4f}"
        )
    return jax.device_get(state.params)
