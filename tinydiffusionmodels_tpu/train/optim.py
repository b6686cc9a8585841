"""Optimizers and schedules (optax), matching the reference's choices.

- AdamW with torch-default betas/eps (reference src/mnist.py:148,
  src/shakespeare.py:197).
- Cosine anneal with linear warmup, exactly the reference's LambdaLR formula
  (src/shakespeare.py:159-167).
- Dynamic rounding-loss weight decay (src/shakespeare.py:169-172).
"""

from __future__ import annotations

import math

import optax


def cosine_schedule_with_warmup(
    base_lr: float,
    num_warmup_steps: int,
    num_training_steps: int,
    eta_min: float = 0.0,
) -> optax.Schedule:
    """lr(step) = base_lr * lambda(step), lambda per reference
    src/shakespeare.py:161-165."""

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, dtype=jnp.float32)
        warmup = step / jnp.maximum(1.0, float(num_warmup_steps))
        progress = (step - num_warmup_steps) / max(
            1.0, float(num_training_steps - num_warmup_steps)
        )
        cosine = jnp.maximum(
            float(eta_min), 0.5 * (1.0 + jnp.cos(math.pi * progress))
        )
        return base_lr * jnp.where(step < num_warmup_steps, warmup, cosine)

    return schedule


def adamw(
    lr,
    weight_decay: float = 1e-4,
) -> optax.GradientTransformation:
    """AdamW with torch defaults (betas=(0.9, 0.999), eps=1e-8).

    Note: optax applies weight decay as decoupled decay scaled by lr, same as
    torch.optim.AdamW.
    """
    return optax.adamw(
        learning_rate=lr,
        b1=0.9,
        b2=0.999,
        eps=1e-8,
        weight_decay=weight_decay,
    )


def freeze_subtree(
    tx: optax.GradientTransformation, name: str
) -> optax.GradientTransformation:
    """Zero every update to the top-level param subtree ``name``.

    Used for --freeze_embeddings: stop_gradient alone leaves AdamW's
    *decoupled* weight decay active (zero-grad params still shrink by
    lr*wd each step), so the "frozen" table would drift. Zeroing the
    final update — rather than optax.masked — keeps the optimizer-state
    pytree structure identical, so resume from pre-fix checkpoints works.
    """

    def update(grads, state, params=None):
        updates, new_state = tx.update(grads, state, params)
        if isinstance(updates, dict) and name in updates:
            import jax
            import jax.numpy as jnp

            updates = dict(updates)
            updates[name] = jax.tree.map(jnp.zeros_like, updates[name])
        return updates, new_state

    return optax.GradientTransformation(tx.init, update)


def dynamic_rounding_weight_schedule(
    epoch: int,
    total_epochs: int,
    initial_weight: float = 1.0,
    final_weight: float = 0.1,
) -> float:
    """Linear decay of the rounding-loss weight across epochs
    (reference src/shakespeare.py:169-172)."""
    progress = epoch / total_epochs
    return initial_weight * (1 - progress) + final_weight * progress
