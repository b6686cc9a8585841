"""Training: optimizers/schedules, train states, jitted step functions, loops.

Every hot step (train, eval) is one jitted function with donated state, so a
whole optimizer step is a single XLA program — no per-step host sync (the
reference syncs with .item() every step: src/mnist.py:160,
src/shakespeare.py:253-255; here losses accumulate on device and are fetched
per epoch).
"""

from tinydiffusionmodels_tpu.train.optim import (
    adamw,
    cosine_schedule_with_warmup,
    dynamic_rounding_weight_schedule,
)
from tinydiffusionmodels_tpu.train.state import TrainState

__all__ = [
    "adamw",
    "cosine_schedule_with_warmup",
    "dynamic_rounding_weight_schedule",
    "TrainState",
]
