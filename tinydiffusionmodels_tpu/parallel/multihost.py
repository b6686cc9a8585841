"""Multi-host (multi-slice / DCN) support.

A single v5e-8 slice satisfies the deployment target (BASELINE.json config
#5), but the framework is host-count-agnostic by construction: the same
NamedSharding train steps run unchanged under multiple processes, with ICI
collectives inside a slice and DCN between slices — all inserted by GSPMD.
This module holds the only multi-host-specific pieces:

- ``initialize()``: ``jax.distributed`` bring-up from standard env vars
  (Cloud TPU autodetects; explicit coordinator supported),
- ``process_batch_slice()``: which rows of the global batch this host feeds,
- ``make_global_batch()``: assemble a globally-sharded jax.Array from each
  host's local rows.

Single-process behavior is the identity, so everything here is exercised by
the regular CPU test suite.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed when running multi-process.

    On Cloud TPU pods, ``jax.distributed.initialize()`` autodetects
    everything; elsewhere pass coordinator/num_processes/process_id or set
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID. No-op for
    single-process runs with no configuration present.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if coordinator_address is None and env_np is None:
        return  # single process, nothing to do
    # `is None` checks, not `or`: process_id 0 is a valid (falsy) id.
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_batch_slice(global_batch_size: int) -> slice:
    """Rows of the global batch this process is responsible for loading.

    Contiguous block partitioning by process index; requires the global
    batch to divide evenly (static shapes).
    """
    n = jax.process_count()
    i = jax.process_index()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n} processes"
        )
    per = global_batch_size // n
    return slice(i * per, (i + 1) * per)


def make_global_batch(mesh: Mesh, local_rows: np.ndarray,
                      axis: str = "data") -> jax.Array:
    """Assemble the global, 'data'-sharded array from this host's rows.

    Each process passes only its own slice (see process_batch_slice); JAX
    stitches the global array across hosts without gathering it anywhere.
    """
    spec = P(axis, *([None] * (local_rows.ndim - 1)))
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), local_rows
    )
