"""Child process for the two-process jax.distributed test.

Each of the 2 processes exposes 2 virtual CPU devices (global mesh = 4),
initializes jax.distributed against a localhost coordinator, feeds its
process_batch_slice of a known global batch through make_global_batch, and
runs a jitted global-mean computation whose result must equal the
single-process numpy value on every process.

Run: python tests/_multihost_child.py PORT PROCESS_ID
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tinydiffusionmodels_tpu.parallel import make_mesh, multihost  # noqa: E402


def main() -> None:
    port, pid = sys.argv[1], int(sys.argv[2])
    multihost.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid
    assert len(jax.devices()) == 4, jax.devices()

    global_bs = 8
    data = np.arange(global_bs * 3, dtype=np.float32).reshape(global_bs, 3)
    sl = multihost.process_batch_slice(global_bs)
    assert sl == slice(pid * 4, (pid + 1) * 4), sl

    mesh = make_mesh()  # 4 global devices on ('data',)
    gx = multihost.make_global_batch(mesh, data[sl])
    assert gx.shape == (global_bs, 3), gx.shape

    # This process's addressable shards hold exactly the rows it fed.
    for shard in gx.addressable_shards:
        lo = shard.index[0].start or 0
        np.testing.assert_array_equal(
            np.asarray(shard.data), data[lo:lo + shard.data.shape[0]]
        )

    # A jitted global reduction (DP loss shape): requires a cross-process
    # collective; every process must see the single-process value.
    loss = float(jax.jit(lambda x: jnp.mean(x * x))(gx))
    expected = float(np.mean(data * data))
    assert abs(loss - expected) < 1e-4, (loss, expected)

    # A REAL data-parallel train step across the two processes: same mesh,
    # replicated params, globally-assembled image batch; the loss and the
    # updated parameters must equal the single-process run bit-for-bit
    # (same PRNG key, GSPMD psum over Gloo is deterministic here).
    from tinydiffusionmodels_tpu.core import make_schedule
    from tinydiffusionmodels_tpu.models import init_unet
    from tinydiffusionmodels_tpu.parallel import replicate_tree
    from tinydiffusionmodels_tpu.train.mnist_train import make_train_step
    from tinydiffusionmodels_tpu.train.optim import adamw
    from tinydiffusionmodels_tpu.train.state import TrainState

    sched = make_schedule(10)
    tx = adamw(1e-3)
    params = init_unet(jax.random.PRNGKey(0))
    step = make_train_step(sched, tx)

    rng = np.random.default_rng(7)
    images = rng.standard_normal((8, 28, 28, 1)).astype(np.float32)

    # Single-process oracle on this host's devices (replicated math).
    state1 = TrainState.create(jax.tree_util.tree_map(jnp.copy, params), tx)
    state1, loss1 = step(state1, jnp.asarray(images), jax.random.PRNGKey(1))

    state2 = replicate_tree(
        mesh, TrainState.create(jax.tree_util.tree_map(jnp.copy, params), tx)
    )
    sl2 = multihost.process_batch_slice(8)
    gbatch = multihost.make_global_batch(mesh, images[sl2])
    state2, loss2 = step(state2, gbatch, jax.random.PRNGKey(1))

    np.testing.assert_allclose(
        float(loss2), float(loss1), rtol=1e-5, atol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state2.params)),
        jax.tree_util.tree_leaves(jax.device_get(state1.params)),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    print(f"OK {pid} loss={loss:.6f} dp_loss={float(loss2):.6f}", flush=True)


if __name__ == "__main__":
    main()
