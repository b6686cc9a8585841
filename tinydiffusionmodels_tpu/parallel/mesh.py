"""Device mesh + sharding helpers.

The canonical deployment is a 1-D ('data',) mesh over a v5e-8 slice
(BASELINE.json config #5); a trailing 'model' axis is available so tensor
parallelism is a sharding-spec change, not a code change (SURVEY.md §2.2).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: dict[str, int] | None = None,
    *,
    devices=None,
) -> Mesh:
    """Build a Mesh. Default: every visible device on the 'data' axis.

    ``axes`` maps axis name -> size, e.g. {'data': 4, 'model': 2}. A size of
    -1 means "whatever is left" (at most one axis).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axes is None:
        axes = {"data": n}
    names = tuple(axes.keys())
    sizes = list(axes.values())
    if sizes.count(-1) > 1:
        raise ValueError("at most one axis may be -1")
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        if n % known:
            raise ValueError(f"{n} devices not divisible by {known}")
        sizes[sizes.index(-1)] = n // known
    total = int(np.prod(sizes))
    if total != n:
        raise ValueError(f"mesh {dict(zip(names, sizes))} != {n} devices")
    dev_array = np.array(devices[:total]).reshape(sizes)
    return Mesh(dev_array, names)


def data_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim on ``axis``, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Device-put array(s) with the batch dim sharded on ``axis``."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x), axis)), batch
    )


def shard_stacked_batch(
    mesh: Mesh, batch, axis: str = "data", seq_axis: str | None = None
):
    """Device-put arrays shaped (K, B, ...) with dim 1 (batch) sharded —
    the layout consumed by the scan-of-steps train functions.

    ``seq_axis``: additionally shard dim 2 (the sequence dim of (K, B, L)
    token stacks) on that mesh axis — the layout for ring-attention
    sequence-parallel training. Axes absent from the mesh are skipped, so
    the same call works on a pure ('seq',) mesh (batch replicated).
    """
    def put(x):
        names = [None] * np.ndim(x)
        if axis in mesh.shape:
            names[1] = axis
        if seq_axis is not None and seq_axis in mesh.shape and np.ndim(x) >= 3:
            names[2] = seq_axis
        return jax.device_put(x, NamedSharding(mesh, P(*names)))

    return jax.tree_util.tree_map(put, batch)


def replicate_tree(mesh: Mesh, tree):
    """Device-put a pytree fully replicated over the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
