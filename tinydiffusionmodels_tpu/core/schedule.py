"""Diffusion noise schedules as immutable pytrees.

The reference keeps schedule tables as module-level torch globals that are
mutated onto the device in ``__main__`` (reference src/mnist.py:27-33,226-231;
src/shakespeare.py:25-35,502-506). Here a schedule is a frozen dataclass of
jnp arrays — a pytree that can be closed over or passed into jitted functions,
donated, sharded, or swapped (linear vs cosine) without global state.

Numerical definition: all tables are computed in float64 closed form and cast
to float32 once at the end. This is *more* accurate than the reference, which
chains float32 ops (torch.linspace -> cumprod -> sqrt). Agreement with torch's
float32 pipeline is within 1-2 ulp per entry (asserted in
tests/test_schedule.py against a torch golden when torch is available).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_TIMESTEPS = 1000  # reference src/mnist.py:27, src/shakespeare.py:25
DEFAULT_BETA_START = 1e-4  # reference src/mnist.py:23
DEFAULT_BETA_END = 2e-2


def linear_beta_schedule(
    timesteps: int,
    start: float = DEFAULT_BETA_START,
    end: float = DEFAULT_BETA_END,
) -> np.ndarray:
    """Linear beta schedule from Ho et al. 2020 (reference src/mnist.py:23-25).

    Computed in float64; callers cast. Returns a numpy array so schedule
    construction never touches a device.
    """
    return np.linspace(start, end, timesteps, dtype=np.float64)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Cosine schedule from Nichol & Dhariwal 2021 (Improved DDPM, eq. 17).

    Not present in the reference; provided as a drop-in alternative since the
    schedule here is data, not code.
    """
    steps = np.arange(timesteps + 1, dtype=np.float64)
    f = np.cos(((steps / timesteps) + s) / (1 + s) * np.pi / 2) ** 2
    alphas_cumprod = f / f[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0.0, 0.999)


def sqrt_beta_schedule(timesteps: int, s: float = 1e-4) -> np.ndarray:
    """Sqrt schedule from Diffusion-LM (Li et al. 2022, §4.1 — PAPERS.md):
    alpha_bar(t) = 1 - sqrt(t/T + s).

    Designed specifically for *text embeddings*: it injects noise much
    faster at small t than the image-tuned linear schedule (the reference
    uses linear for text, src/shakespeare.py:25-35), because nearly
    noise-free embedding inputs make the denoising task trivial and waste
    model capacity. Not in the reference — the text-quality lever flag
    ``--noise_schedule sqrt``.
    """
    steps = np.arange(timesteps + 1, dtype=np.float64)
    alphas_cumprod = 1.0 - np.sqrt(steps / timesteps + s)
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0.0, 0.999)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All precomputed DDPM tables, shape (T,), float32.

    Field names mirror the reference globals (reference src/mnist.py:28-33)
    plus the derived quantities its reverse step recomputes inline
    (reference src/mnist.py:167-180).
    """

    betas: jax.Array
    alphas: jax.Array
    alphas_cumprod: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas: jax.Array
    sqrt_betas: jax.Array
    timesteps: int = dataclasses.field(metadata=dict(static=True))

    def astype(self, dtype) -> "DiffusionSchedule":
        """Cast all tables (e.g. to bfloat16 for a low-precision sampler)."""
        arrays = {
            f.name: getattr(self, f.name).astype(dtype)
            for f in dataclasses.fields(self)
            if f.name != "timesteps"
        }
        return DiffusionSchedule(timesteps=self.timesteps, **arrays)


def make_schedule(
    timesteps: int = DEFAULT_TIMESTEPS,
    *,
    kind: str = "linear",
    start: float = DEFAULT_BETA_START,
    end: float = DEFAULT_BETA_END,
    dtype=jnp.float32,
) -> DiffusionSchedule:
    """Build a DiffusionSchedule; float64 closed form, cast once at the end."""
    if kind == "linear":
        betas = linear_beta_schedule(timesteps, start, end)
    elif kind == "cosine":
        betas = cosine_beta_schedule(timesteps)
    elif kind == "sqrt":
        betas = sqrt_beta_schedule(timesteps)
    else:
        raise ValueError(f"Unknown schedule kind: {kind!r}")

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    tables = dict(
        betas=betas,
        alphas=alphas,
        alphas_cumprod=alphas_cumprod,
        sqrt_alphas_cumprod=np.sqrt(alphas_cumprod),
        sqrt_one_minus_alphas_cumprod=np.sqrt(1.0 - alphas_cumprod),
        sqrt_recip_alphas=1.0 / np.sqrt(alphas),
        sqrt_betas=np.sqrt(betas),
    )
    return DiffusionSchedule(
        timesteps=timesteps,
        **{k: jnp.asarray(v, dtype=dtype) for k, v in tables.items()},
    )
