"""Core diffusion math: schedules, forward noising, reverse steps, losses.

This module is the single source of truth for DDPM math that the reference
duplicates per workload (reference src/mnist.py:23-42,167-180 and
src/shakespeare.py:25-44,343-352).
"""

from tinydiffusionmodels_tpu.core.schedule import (
    DiffusionSchedule,
    linear_beta_schedule,
    cosine_beta_schedule,
    make_schedule,
)
from tinydiffusionmodels_tpu.core.diffusion import (
    q_sample,
    p_sample_mean,
    p_sample,
    ddim_step,
    ddpm_loss,
)

__all__ = [
    "DiffusionSchedule",
    "linear_beta_schedule",
    "cosine_beta_schedule",
    "make_schedule",
    "q_sample",
    "p_sample_mean",
    "p_sample",
    "ddim_step",
    "ddpm_loss",
]
