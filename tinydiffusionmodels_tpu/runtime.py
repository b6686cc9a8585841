"""Runtime configuration helpers (compile cache, profiling hooks).

Remote-attached TPUs pay tens of seconds to minutes per XLA compile; the
persistent compilation cache makes every program compile once per machine.
Enabled by the CLIs and bench; opt out with TDM_COMPILE_CACHE=0.
"""

from __future__ import annotations

import contextlib
import os
import time


def configure_platform() -> None:
    """Honor TDM_PLATFORM (e.g. 'cpu') before JAX backend init.

    The JAX_PLATFORMS env var alone does not beat an auto-registering TPU
    plugin on this machine (CLAUDE.md environment notes); the in-process
    config update does. Lets CLI subprocesses (tests, smoke runs) run on CPU
    on a TPU-attached host. No-op once a backend is initialized.
    """
    platform = os.environ.get("TDM_PLATFORM")
    if not platform:
        return
    import jax

    try:
        jax.config.update("jax_platforms", platform)
    except Exception:  # pragma: no cover - backend already initialized
        pass


def enable_compile_cache(path: str | None = None) -> None:
    if os.environ.get("TDM_COMPILE_CACHE", "1") == "0":
        return
    import jax

    cache_dir = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/tdm_jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax
        pass


def configure_fast_rng() -> None:
    """Use the hardware RBG PRNG on TPU (TDM_PRNG=threefry opts out).

    Threefry key derivation runs on the VPU and dominates small train steps
    (every step draws timesteps + noise + dropout masks). Measured on v5e:
    the bs=8 text train step went 1346 -> 2175 it/s and the MNIST sampler
    648 -> 692 samples/s just from this switch. RBG is partitionable and
    deterministic per (key, backend); cross-framework parity was already
    distributional (SURVEY.md §7), so nothing is lost.
    """
    import jax

    pref = os.environ.get("TDM_PRNG", "auto")
    if pref == "threefry":
        return
    try:
        if pref == "rbg" or jax.default_backend() == "tpu":
            jax.config.update("jax_default_prng_impl", "rbg")
    except Exception:  # pragma: no cover
        pass


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """jax.profiler trace context; no-op when logdir is None.

    The reference has no profiling at all (SURVEY.md §5.1); pass
    --profile_dir on the CLIs (or call this directly) to capture a trace
    viewable in TensorBoard/XProf.
    """
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Cheap wall-clock step timer for throughput logs."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.steps = 0

    def tick(self, n: int = 1) -> None:
        self.steps += n

    def rate(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.steps / dt if dt > 0 else float("inf")
