"""MNIST DDPM training: jitted donated train step + epoch loop.

Rebuild of reference src/mnist.py:128-165. Differences by design:
- the whole optimizer step (noise draw, q_sample, UNet fwd/bwd, AdamW update)
  is ONE jitted XLA program with donated state — no per-step host sync
  (the reference calls loss.item() every step, src/mnist.py:160);
- data parallelism comes from sharding the batch over the mesh 'data' axis;
  GSPMD inserts the gradient psum over ICI;
- per-epoch sample grids run through the scanned sampler (sample/ancestral).
"""

from __future__ import annotations

import math
import os
import time
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tinydiffusionmodels_tpu.core import DiffusionSchedule, make_schedule, q_sample
from tinydiffusionmodels_tpu.core.rng import draw_noise, substream
from tinydiffusionmodels_tpu.data.loader import batch_iterator
from tinydiffusionmodels_tpu.data.mnist import load_mnist, normalize_mnist
from tinydiffusionmodels_tpu.io import (
    get_samples_dir,
    get_vertex_checkpoint_path,
    is_gcs_path,
    save_checkpoint,
    save_samples,
)
from tinydiffusionmodels_tpu.io.checkpoint import unet_to_state_dict
from tinydiffusionmodels_tpu.io.images import grid_png
from tinydiffusionmodels_tpu.models import init_unet, unet_apply
from tinydiffusionmodels_tpu.parallel import (
    make_mesh,
    replicate_tree,
    shard_stacked_batch,
)
from tinydiffusionmodels_tpu.sample.ancestral import sample_loop
from tinydiffusionmodels_tpu.train.optim import adamw
from tinydiffusionmodels_tpu.train.precision import cast_floating
from tinydiffusionmodels_tpu.train.state import TrainState


def make_train_step(
    sched: DiffusionSchedule, tx, *, compute_dtype=None
) -> Callable[[TrainState, jax.Array, jax.Array], tuple[TrainState, jax.Array]]:
    """Build the jitted train step: (state, batch NHWC, key) -> (state, loss).

    ``compute_dtype=jnp.bfloat16`` runs the UNet forward/backward in bf16
    (master params, grads and AdamW state stay f32; loss reduced in f32)."""

    def loss_fn(params, batch, key):
        b = batch.shape[0]
        t = jax.random.randint(
            substream(key, "timesteps"), (b,), 0, sched.timesteps
        )
        noise = draw_noise(substream(key, "noise"), batch.shape)
        x_noisy = q_sample(sched, batch, t, noise)
        params_c = cast_floating(params, compute_dtype)
        if compute_dtype is not None:
            x_noisy = x_noisy.astype(compute_dtype)
        eps_pred = unet_apply(params_c, x_noisy, t, timesteps=sched.timesteps)
        return jnp.mean(jnp.square(eps_pred.astype(jnp.float32) - noise))

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def make_train_step_multi(sched: DiffusionSchedule, tx, n_inner: int = 0,
                          *, compute_dtype=None, dataset=None):
    """Scan K optimizer steps inside ONE jitted dispatch (K = leading dim of
    the stacked batch; ``n_inner`` is advisory/documentation only).

    (state, batches (K, B, H, W, C), key) -> (state, mean_loss). Per-step
    PRNG keys are folded from ``key`` and the running step counter, so the
    noise stream is identical to calling the single step K times.

    Why: each device dispatch costs fixed host/runtime latency (severe when
    the TPU is remote); at these model sizes that latency, not compute,
    bounds steps/sec. Scanning K steps amortizes one dispatch over K updates
    — same math, same donation, ~Kx fewer host round trips.
    """

    def loss_fn(params, batch, key):
        if dataset is not None:
            # Device-resident data path: ``batch`` is (B,) int32 indices
            # into the HBM-resident dataset; the gather runs on device.
            # Bit-identical to the host path because the same
            # batch_iterator produces the index stream.
            batch = jnp.take(dataset, batch, axis=0)
        b = batch.shape[0]
        t = jax.random.randint(
            substream(key, "timesteps"), (b,), 0, sched.timesteps
        )
        noise = draw_noise(substream(key, "noise"), batch.shape)
        x_noisy = q_sample(sched, batch, t, noise)
        params_c = cast_floating(params, compute_dtype)
        if compute_dtype is not None:
            x_noisy = x_noisy.astype(compute_dtype)
        eps_pred = unet_apply(params_c, x_noisy, t, timesteps=sched.timesteps)
        return jnp.mean(jnp.square(eps_pred.astype(jnp.float32) - noise))

    @partial(jax.jit, donate_argnums=(0,))
    def train_step_multi(state: TrainState, batches, key):
        def body(state, batch):
            step_key = jax.random.fold_in(key, state.step)
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, batch, step_key
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), loss

        # unroll=2 pipelines step k's optimizer update against step k+1's
        # forward (see text_train.make_text_train_step_multi).
        state, losses = jax.lax.scan(body, state, batches, unroll=2)
        return state, jnp.mean(losses)

    return train_step_multi


def ema_update(ema: dict, params: dict, decay: float) -> dict:
    """One EMA step: ema <- decay * ema + (1 - decay) * params."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1.0 - decay), ema, params
    )


def make_train_step_multi_ema(sched: DiffusionSchedule, tx, *,
                              ema_decay: float, compute_dtype=None,
                              dataset=None):
    """Scan-of-steps variant that maintains an exponential moving average of
    the parameters in the same dispatch (Ho et al. 2020 sample with EMA
    weights; the reference has no EMA — framework extension):

    (state, ema_params, batches (K, B, H, W, C), key)
        -> (state, ema_params, mean_loss)

    The EMA update is elementwise over ~0.3M params per step — it rides the
    existing scan body, costing no extra dispatches.
    """
    def loss_fn(params, batch, key):
        if dataset is not None:
            # (B,) int32 indices into the HBM-resident dataset (see
            # make_train_step_multi).
            batch = jnp.take(dataset, batch, axis=0)
        b = batch.shape[0]
        t = jax.random.randint(
            substream(key, "timesteps"), (b,), 0, sched.timesteps
        )
        noise = draw_noise(substream(key, "noise"), batch.shape)
        x_noisy = q_sample(sched, batch, t, noise)
        params_c = cast_floating(params, compute_dtype)
        if compute_dtype is not None:
            x_noisy = x_noisy.astype(compute_dtype)
        eps_pred = unet_apply(params_c, x_noisy, t, timesteps=sched.timesteps)
        return jnp.mean(jnp.square(eps_pred.astype(jnp.float32) - noise))

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step_multi(state: TrainState, ema, batches, key):
        def body(carry, batch):
            state, ema = carry
            step_key = jax.random.fold_in(key, state.step)
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, batch, step_key
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema_new = ema_update(ema, params, ema_decay)
            return (TrainState(params, opt_state, state.step + 1), ema_new), loss

        (state, ema), losses = jax.lax.scan(
            body, (state, ema), batches, unroll=2
        )
        return state, ema, jnp.mean(losses)

    return train_step_multi


@partial(jax.jit, static_argnames=("n_samples", "method", "num_steps",
                                   "timesteps"))
def _sample_batch(params, key, *, n_samples, method, num_steps, timesteps):
    sched = make_schedule(timesteps)
    denoise = lambda x, t: unet_apply(params, x, t, timesteps=timesteps)
    return sample_loop(
        denoise, sched, (n_samples, 28, 28, 1), key,
        method=method, num_steps=num_steps,
    )


def sample_grid_png(
    params,
    sched: DiffusionSchedule,
    key: jax.Array,
    *,
    n_samples: int = 25,
    method: str = "ancestral",
    num_steps: int | None = None,
) -> bytes:
    """Draw n_samples digits via the scanned sampler and encode the PNG grid
    (reference src/mnist.py:99-126 without the torchvision/tempfile detour).

    The sampler is a module-level jit keyed on static config, so per-epoch
    sampling during training reuses one compiled program instead of
    retracing every epoch."""
    x = _sample_batch(
        params, key, n_samples=n_samples, method=method,
        num_steps=num_steps, timesteps=sched.timesteps,
    )
    imgs = (np.asarray(x)[..., 0].clip(-1, 1) + 1) / 2  # [-1,1] -> [0,1]
    return grid_png(imgs, nrow=int(math.sqrt(n_samples)))


def train(
    *,
    epochs: int = 5,
    batch_size: int = 128,
    lr: float = 1e-3,
    ckpt_path: str = "ckpt.pth",
    sample_every_epoch: bool = True,
    samples_per_epoch: int = 25,
    seed: int = 0,
    data_root: str = "./data",
    mesh=None,
    resume: bool = False,
    resume_path: str | None = None,
    resume_every: int = 1,
    metrics_path: str | None = None,
    compute_dtype=None,
    ema_decay: float | None = None,
    log_fn=print,
) -> dict:
    """Full training run (reference src/mnist.py:128-165 surface).

    ``ema_decay`` (e.g. 0.999) maintains an exponential moving average of
    the weights in the train scan; per-epoch grids and the final checkpoint
    then use the EMA weights (standard DDPM practice the reference lacks).

    Returns the final params pytree. Saves a torch-format bare state_dict
    checkpoint, exactly the reference's format (src/mnist.py:165).

    Beyond the reference (which has no mid-training resume — SURVEY.md §5.4):
    with ``resume=True`` a full train state (params + optimizer state +
    step + epoch) is checkpointed to ``resume_path`` every epoch and picked
    up on restart — preemption-safe training on TPU spot capacity.
    """
    ckpt_path = (
        get_vertex_checkpoint_path("image-model.pth")
        if "AIP_MODEL_DIR" in os.environ
        else ckpt_path
    )
    from tinydiffusionmodels_tpu.train.metrics import MetricsLogger

    metrics = MetricsLogger(metrics_path)
    images, _, source = load_mnist(data_root, train=True)
    if source == "synthetic":
        log_fn("[data] MNIST unavailable -> deterministic synthetic digits")
    limit = int(os.environ.get("TDM_DATA_LIMIT", "0"))
    if limit:
        images = images[:limit]
    data = normalize_mnist(images)

    sched = make_schedule()
    tx = adamw(lr, weight_decay=0.01)  # torch AdamW default wd, src/mnist.py:148
    key = jax.random.PRNGKey(seed)
    params = init_unet(substream(key, "init"))

    if mesh is None:
        mesh = make_mesh()
    state = TrainState.create(params, tx)

    start_epoch = 0
    saved_ema_sd = None
    resume_path = resume_path or str(ckpt_path).replace(".pth", "_state.pth")
    if resume and not is_gcs_path(resume_path) and os.path.exists(resume_path):
        from tinydiffusionmodels_tpu.io import load_checkpoint
        from tinydiffusionmodels_tpu.io.checkpoint import unet_from_state_dict

        try:
            saved = load_checkpoint(resume_path)
        except Exception as e:
            # A corrupt/truncated resume file (e.g. interrupted GCS staging)
            # must not kill the job — warn and train from scratch.
            log_fn(f"[resume] could not read {resume_path} ({e}); "
                   "starting fresh")
            saved = None
        if saved is not None:
            saved_ema_sd = saved.get("ema")
            # Optimizer state is stored as flat leaves; the treedef (optax
            # namedtuple nesting) is rebuilt from a fresh-init template.
            treedef = jax.tree_util.tree_structure(state.opt_state)
            opt_state = jax.tree_util.tree_unflatten(
                treedef, [jnp.asarray(x) for x in saved["opt_state_leaves"]]
            )
            state = TrainState(
                params=unet_from_state_dict(saved["model"]),
                opt_state=opt_state,
                step=jnp.asarray(saved["step"], dtype=jnp.int32),
            )
            start_epoch = int(saved["epoch"])
            log_fn(f"[resume] restored epoch {start_epoch}, step "
                   f"{saved['step']} from {resume_path}")

    state = replicate_tree(mesh, state)
    ema = None
    if ema_decay is not None:
        if saved_ema_sd is not None:
            from tinydiffusionmodels_tpu.io.checkpoint import (
                unet_from_state_dict,
            )

            ema_init = unet_from_state_dict(saved_ema_sd)
        else:
            ema_init = jax.tree_util.tree_map(jnp.copy, state.params)
        ema = replicate_tree(mesh, ema_init)

    # Scan-of-steps chunking: each dispatch runs `chunk` optimizer steps
    # (see make_train_step_multi). The remainder chunk compiles once more.
    chunk = max(1, int(os.environ.get("TDM_SCAN_CHUNK", "25")))
    # Device-resident data (TDM_DEVICE_DATA=1/0/auto): put the whole
    # dataset in HBM once and ship only (chunk, B) int32 index batches per
    # dispatch. Measured motivation: on the remote-tunnel TPU, shipping
    # image batches host->device capped MNIST training at ~36 it/s (188
    # MB/epoch over the tunnel) vs ~1,100 it/s for the step itself; MNIST
    # f32 is 188 MB — HBM-trivial. Batch order is bit-identical to the
    # host path because the same batch_iterator produces the index stream.
    dev_mode = os.environ.get("TDM_DEVICE_DATA", "auto")
    use_device_data = dev_mode == "1" or (
        dev_mode == "auto" and data.nbytes <= (1 << 30)
    )
    dataset_dev = None
    iter_source: np.ndarray
    if use_device_data:
        dataset_dev = replicate_tree(mesh, jnp.asarray(data))
        iter_source = np.arange(data.shape[0], dtype=np.int32)
    else:
        iter_source = data
    if ema_decay is None:
        train_multi = make_train_step_multi(sched, tx, chunk,
                                            compute_dtype=compute_dtype,
                                            dataset=dataset_dev)
    else:
        train_multi_ema = make_train_step_multi_ema(
            sched, tx, ema_decay=ema_decay, compute_dtype=compute_dtype,
            dataset=dataset_dev,
        )
    train_key = substream(key, "train")
    # Per-chunk progress (the reference shows live tqdm it/s,
    # src/mnist.py:151; with scan-of-steps the finest grain is one chunk).
    progress_every = int(os.environ.get("TDM_PROGRESS_EVERY", "10"))
    epoch_steps = (data.shape[0] // batch_size) or 1

    global_bs = batch_size
    for epoch in range(start_epoch, epochs):
        t0 = time.perf_counter()
        nsteps = 0
        nflush = 0
        pending: list[np.ndarray] = []
        loss = jnp.zeros(())

        def flush(state, ema, pending):
            stacked = np.stack(pending)
            batches = shard_stacked_batch(mesh, jnp.asarray(stacked))
            if ema_decay is None:
                state, loss = train_multi(state, batches, train_key)
                return state, ema, loss
            return train_multi_ema(state, ema, batches, train_key)

        def progress(nsteps, loss, t0):
            dt = time.perf_counter() - t0
            log_fn(
                f"[epoch {epoch + 1}] step {nsteps}/{epoch_steps} "
                f"({nsteps / dt:.1f} it/s), loss~{float(loss):.4f}"
            )

        for batch in batch_iterator(
            iter_source, global_bs, seed=seed, epoch=epoch
        ):
            pending.append(batch)
            if len(pending) == chunk:
                state, ema, loss = flush(state, ema, pending)
                nsteps += chunk
                nflush += 1
                pending = []
                if progress_every and nflush % progress_every == 0:
                    progress(nsteps, loss, t0)
        if pending:
            state, ema, loss = flush(state, ema, pending)
            nsteps += len(pending)
        dt = time.perf_counter() - t0
        log_fn(
            f"Epoch {epoch + 1}/{epochs}: {nsteps} steps in {dt:.1f}s "
            f"({nsteps / dt:.1f} it/s), loss~{float(loss):.4f}"
        )
        metrics.log(
            {
                "workload": "mnist",
                "epoch": epoch + 1,
                "steps": nsteps,
                "it_per_s": round(nsteps / dt, 2),
                "loss": float(loss),
            }
        )
        if sample_every_epoch:
            png = sample_grid_png(
                ema if ema_decay is not None else state.params,
                sched, substream(jax.random.fold_in(key, epoch), "sample"),
                n_samples=samples_per_epoch,
            )
            samples_dir = get_samples_dir("samples")
            if isinstance(samples_dir, str):
                sample_path = f"{samples_dir}/epoch_{epoch + 1:03d}.png"
            else:
                sample_path = samples_dir / f"epoch_{epoch + 1:03d}.png"
            save_samples(png, sample_path, mode="wb")
            log_fn(f"[epoch {epoch + 1}] saved samples to {sample_path}")

        if resume and (epoch + 1) % max(1, resume_every) == 0:
            resume_ckpt = {
                "model": unet_to_state_dict(jax.device_get(state.params)),
                "opt_state_leaves": [
                    np.asarray(x)
                    for x in jax.tree_util.tree_leaves(state.opt_state)
                ],
                "step": int(state.step),
                "epoch": epoch + 1,
            }
            if ema_decay is not None:
                resume_ckpt["ema"] = unet_to_state_dict(jax.device_get(ema))
            save_checkpoint(resume_ckpt, resume_path)

    final_params = ema if ema_decay is not None else state.params
    save_checkpoint(unet_to_state_dict(jax.device_get(final_params)), ckpt_path)
    metrics.close()
    return jax.device_get(final_params)


def sample(
    *,
    n_samples: int = 25,
    ckpt_path: str = "ckpt.pth",
    outdir: str = "samples",
    seed: int = 0,
    method: str = "ancestral",
    num_steps: int | None = None,
    log_fn=print,
) -> None:
    """Standalone sampling from a checkpoint (reference src/mnist.py:183-212)."""
    from tinydiffusionmodels_tpu.io import load_checkpoint
    from tinydiffusionmodels_tpu.io.checkpoint import unet_from_state_dict

    params = unet_from_state_dict(load_checkpoint(ckpt_path))
    sched = make_schedule()
    png = sample_grid_png(
        params, sched, jax.random.PRNGKey(seed),
        n_samples=n_samples, method=method, num_steps=num_steps,
    )
    samples_dir = get_samples_dir(outdir)
    if isinstance(samples_dir, str):
        sample_path = f"{samples_dir}/samples.png"
    else:
        sample_path = samples_dir / "samples.png"
    save_samples(png, sample_path, mode="wb")
    log_fn(f"Saved samples to {sample_path}")
