"""Shakespeare embedding-space diffusion training.

Rebuild of reference src/shakespeare.py:174-341: joint AdamW over the
transformer denoiser + learned rounding head (+ learned embeddings), loss =
eps-MSE + weight(epoch) * rounding-CE, cosine-warmup LR schedule, per-epoch
validation, early stopping on val total loss, best + final multi-model
checkpoints in the reference's dict format.

TPU-native: one jitted donated train step for the joint model; the dynamic
rounding weight enters as a traced scalar (no recompile per epoch); val pass
is a second jitted function; losses accumulate on device.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tinydiffusionmodels_tpu.core import DiffusionSchedule, q_sample
from tinydiffusionmodels_tpu.core.rng import draw_noise, substream
from tinydiffusionmodels_tpu.data.loader import batch_iterator, num_batches
from tinydiffusionmodels_tpu.io import (
    get_vertex_checkpoint_path,
    save_checkpoint,
)
from tinydiffusionmodels_tpu.io.checkpoint import (
    embedding_to_state_dict,
    rounding_to_state_dict,
    transformer_to_state_dict,
)
from tinydiffusionmodels_tpu.models import (
    embedding_apply,
    rounding_apply,
    tiny_transformer_apply,
)
from tinydiffusionmodels_tpu.models.embedding import _apply_norm
from tinydiffusionmodels_tpu.models.transformer import TransformerConfig
from tinydiffusionmodels_tpu.parallel import (
    make_mesh,
    replicate_tree,
    shard_stacked_batch,
)
from tinydiffusionmodels_tpu.train.optim import (
    adamw,
    cosine_schedule_with_warmup,
    dynamic_rounding_weight_schedule,
    freeze_subtree,
)
from tinydiffusionmodels_tpu.train.precision import cast_floating
from tinydiffusionmodels_tpu.train.state import TrainState


def _clamp_to_embedding(x0_hat, rounding_params, emb_table):
    """Snap an x0 estimate to its nearest embedding via the rounding head
    (the same clamp the sampler applies, sample/text.make_clamped_denoiser)."""
    logits = rounding_apply(rounding_params, x0_hat)
    tokens = jnp.argmax(logits, axis=-1)
    return jnp.take(emb_table, tokens, axis=0)


def _losses(
    joint_params: dict,
    token_ids: jax.Array,
    t: jax.Array,
    noise: jax.Array,
    rounding_weight: jax.Array,
    *,
    cfg: TransformerConfig,
    sched: DiffusionSchedule,
    use_learned_embeddings: bool,
    pretrained_matrix: jax.Array | None,
    deterministic: bool,
    key: jax.Array | None,
    compute_dtype=None,
    parameterization: str = "eps",
    clamp_train: bool = False,
    embed_norm: str = "none",
    freeze_embeddings: bool = False,
    anchor_ce: float = 0.0,
):
    """Joint diffusion + rounding loss (reference src/shakespeare.py:224-243).

    ``compute_dtype=jnp.bfloat16`` runs the transformer/rounding forward in
    bf16 (grads and losses stay f32).

    ``parameterization``: "eps" (reference, predict the noise) or "x0"
    (original Diffusion-LM: predict the clean embeddings; samplers convert
    to eps via core.diffusion.eps_from_x0).

    ``cfg.self_cond``: with probability 1/2 per batch, run a gradient-free
    first pass to get an x0 estimate and feed it back through the model's
    self-conditioning channel (Analog Bits-style training); the other half
    trains the no-estimate (zeros) channel the sampler uses at its first
    step. ``lax.cond`` keeps the average cost at 1.5 forwards.

    ``clamp_train``: x0-parameterization only — add a loss term against the
    *clamped* prediction the sampler actually uses (straight-through
    estimator through the nearest-embedding snap). The clamped term is
    denoiser-only: both the snap lookup and the target are stop-gradiented
    so it cannot collapse the embedding table (emb[pred] being pulled onto
    emb[true] is exactly the rounding CE's job, in logit space where it
    belongs).

    ``anchor_ce``: weight of Diffusion-LM's anchor term (Li et al. 2022,
    the L_round-on-model-output piece of their end-to-end objective): the
    rounding head's CE evaluated on the PREDICTED x0 instead of the true
    one, with gradient flowing into the denoiser. The plain rounding CE
    only teaches the head to decode clean embeddings; the anchor makes the
    denoiser's outputs *decodable*, pulling predictions toward regions the
    head maps to the right token. Designed for --parameterization x0
    (under eps the x0 reconstruction at high t divides by a small
    sqrt(alpha_cumprod) and the term gets noisy)."""
    if use_learned_embeddings:
        emb_w = joint_params["embedding_fn"]["weight"]
    else:
        emb_w = pretrained_matrix
    if freeze_embeddings:
        # Fixed-encoding regime (Analog Bits/CDCD style): random Gaussian
        # rows at dim>=256 are near-orthogonal, so combined with
        # embed_norm=zscore the geometry is ideal AND immune to the
        # collapse cheats a learned table keeps finding (radial shrink ->
        # angular cone -> outlier-balanced cone, all measured in round 3).
        emb_w = jax.lax.stop_gradient(emb_w)
    # Normalize the TABLE, then look up (zscore needs vocab-axis stats).
    norm_table = _apply_norm(emb_w, embed_norm)
    x0 = jnp.take(norm_table, token_ids, axis=0)
    x_noisy = q_sample(sched, x0, t, noise)
    params_c = cast_floating(joint_params, compute_dtype)
    x0_c = x0
    if compute_dtype is not None:
        x_noisy = x_noisy.astype(compute_dtype)
        x0_c = x0.astype(compute_dtype)

    emb_table = norm_table

    x0_prev = None
    if cfg.self_cond:
        from tinydiffusionmodels_tpu.core.diffusion import _bcast

        def estimate(_):
            # Gradient-free estimate pass with the zeros channel (eval-mode
            # dropout: this mirrors how the sampler produces the estimate).
            pred1 = tiny_transformer_apply(
                params_c["diffusion_model"], x_noisy, t, cfg,
                deterministic=True, x0_prev=jnp.zeros_like(x_noisy),
            ).astype(jnp.float32)
            if parameterization == "x0":
                est = pred1
            else:
                sqrt_acp = _bcast(sched.sqrt_alphas_cumprod, t, pred1.ndim)
                sqrt_om = _bcast(
                    sched.sqrt_one_minus_alphas_cumprod, t, pred1.ndim
                )
                est = (
                    x_noisy.astype(jnp.float32) - sqrt_om * pred1
                ) / sqrt_acp
            if clamp_train:
                est = _clamp_to_embedding(
                    est, joint_params["rounding_fn"], emb_table
                )
            return jax.lax.stop_gradient(est)

        if deterministic:
            # Validation measures the estimate-fed channel: after step one,
            # that is the channel every sampler step runs.
            x0_prev = estimate(None)
        else:
            coin = jax.random.bernoulli(substream(key, "selfcond_coin"))
            x0_prev = jax.lax.cond(
                coin,
                estimate,
                lambda _: jnp.zeros(x_noisy.shape, jnp.float32),
                operand=None,
            )

    pred = tiny_transformer_apply(
        params_c["diffusion_model"], x_noisy, t, cfg,
        deterministic=deterministic, key=key, x0_prev=x0_prev,
    )
    target = x0 if parameterization == "x0" else noise
    pred_f32 = pred.astype(jnp.float32)
    if clamp_train:
        x0_snap = jax.lax.stop_gradient(
            _clamp_to_embedding(pred_f32, joint_params["rounding_fn"],
                                emb_table)
        )
        pred_ste = pred_f32 + (x0_snap - jax.lax.stop_gradient(pred_f32))
        diffusion_loss = 0.5 * (
            jnp.mean(jnp.square(pred_f32 - target))
            + jnp.mean(
                jnp.square(pred_ste - jax.lax.stop_gradient(target))
            )
        )
    else:
        diffusion_loss = jnp.mean(jnp.square(pred_f32 - target))

    logits = rounding_apply(params_c["rounding_fn"], x0_c)  # (B, L, V)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    rounding_loss = -jnp.mean(
        jnp.take_along_axis(logp, token_ids[..., None], axis=-1)
    )
    total = diffusion_loss + rounding_weight * rounding_loss
    if anchor_ce:
        if parameterization == "x0":
            x0_pred = pred_f32
        else:
            from tinydiffusionmodels_tpu.core.diffusion import _bcast

            sqrt_acp = _bcast(sched.sqrt_alphas_cumprod, t, pred_f32.ndim)
            sqrt_om = _bcast(
                sched.sqrt_one_minus_alphas_cumprod, t, pred_f32.ndim
            )
            x0_pred = (
                x_noisy.astype(jnp.float32) - sqrt_om * pred_f32
            ) / sqrt_acp
        x0_pred_c = x0_pred
        if compute_dtype is not None:
            x0_pred_c = x0_pred.astype(compute_dtype)
        logits_pred = rounding_apply(params_c["rounding_fn"], x0_pred_c)
        logp_pred = jax.nn.log_softmax(
            logits_pred.astype(jnp.float32), axis=-1
        )
        anchor_loss = -jnp.mean(
            jnp.take_along_axis(logp_pred, token_ids[..., None], axis=-1)
        )
        total = total + anchor_ce * anchor_loss
    return total, (diffusion_loss, rounding_loss)


def make_text_train_step(sched, cfg, tx, *, use_learned_embeddings,
                         pretrained_matrix=None, compute_dtype=None,
                         parameterization="eps", clamp_train=False,
                         embed_norm="none", freeze_embeddings=False,
                         anchor_ce=0.0):
    """(state, tokens (B,L), weight, key) -> (state, (diff, round, total))."""

    def loss_fn(params, token_ids, rounding_weight, key):
        b = token_ids.shape[0]
        t = jax.random.randint(
            substream(key, "timesteps"), (b,), 0, sched.timesteps
        )
        if use_learned_embeddings:
            dim = params["embedding_fn"]["weight"].shape[1]
        else:
            dim = pretrained_matrix.shape[1]
        noise = draw_noise(
            substream(key, "noise"), (b, token_ids.shape[1], dim)
        )
        return _losses(
            params, token_ids, t, noise, rounding_weight,
            cfg=cfg, sched=sched,
            use_learned_embeddings=use_learned_embeddings,
            pretrained_matrix=pretrained_matrix,
            deterministic=False, key=substream(key, "dropout"),
            compute_dtype=compute_dtype, parameterization=parameterization,
            clamp_train=clamp_train, embed_norm=embed_norm,
            freeze_embeddings=freeze_embeddings, anchor_ce=anchor_ce,
        )

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, token_ids, rounding_weight, key):
        (total, (diff, round_)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, token_ids, rounding_weight, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1)
        return new_state, (diff, round_, total)

    return train_step


def make_text_train_step_multi(sched, cfg, tx, *, use_learned_embeddings,
                               pretrained_matrix=None, compute_dtype=None,
                               parameterization="eps", clamp_train=False,
                         embed_norm="none", freeze_embeddings=False,
                         anchor_ce=0.0):
    """Scan K optimizer steps in one dispatch (see mnist_train.
    make_train_step_multi for why): (state, tokens (K, B, L), weight, key)
    -> (state, summed (diff, round, total))."""

    def loss_fn(params, token_ids, rounding_weight, key):
        b = token_ids.shape[0]
        t = jax.random.randint(
            substream(key, "timesteps"), (b,), 0, sched.timesteps
        )
        if use_learned_embeddings:
            dim = params["embedding_fn"]["weight"].shape[1]
        else:
            dim = pretrained_matrix.shape[1]
        noise = draw_noise(
            substream(key, "noise"), (b, token_ids.shape[1], dim)
        )
        return _losses(
            params, token_ids, t, noise, rounding_weight,
            cfg=cfg, sched=sched,
            use_learned_embeddings=use_learned_embeddings,
            pretrained_matrix=pretrained_matrix,
            deterministic=False, key=substream(key, "dropout"),
            compute_dtype=compute_dtype, parameterization=parameterization,
            clamp_train=clamp_train, embed_norm=embed_norm,
            freeze_embeddings=freeze_embeddings, anchor_ce=anchor_ce,
        )

    @partial(jax.jit, donate_argnums=(0,))
    def train_step_multi(state: TrainState, token_batches, rounding_weight, key):
        def body(state, token_ids):
            step_key = jax.random.fold_in(key, state.step)
            (total, (diff, round_)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, token_ids, rounding_weight, step_key)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                TrainState(params, opt_state, state.step + 1),
                jnp.stack([diff, round_, total]),
            )

        # unroll=2: two optimizer steps per scan body lets XLA software-
        # pipeline step k's optimizer update with step k+1's forward;
        # measured +11% on v5e at the reference config (2067 -> 2302 it/s).
        state, losses = jax.lax.scan(body, state, token_batches, unroll=2)
        return state, jnp.sum(losses, axis=0)

    return train_step_multi


def make_text_train_step_multi_ema(sched, cfg, tx, *, ema_decay,
                                   use_learned_embeddings,
                                   pretrained_matrix=None, compute_dtype=None,
                                   parameterization="eps", clamp_train=False,
                         embed_norm="none", freeze_embeddings=False,
                         anchor_ce=0.0):
    """Scan-of-steps with an EMA of the joint params maintained in the same
    dispatch (see mnist_train.make_train_step_multi_ema):
    (state, ema, tokens (K, B, L), weight, key) -> (state, ema, sums)."""

    def loss_fn(params, token_ids, rounding_weight, key):
        b = token_ids.shape[0]
        t = jax.random.randint(
            substream(key, "timesteps"), (b,), 0, sched.timesteps
        )
        if use_learned_embeddings:
            dim = params["embedding_fn"]["weight"].shape[1]
        else:
            dim = pretrained_matrix.shape[1]
        noise = draw_noise(
            substream(key, "noise"), (b, token_ids.shape[1], dim)
        )
        return _losses(
            params, token_ids, t, noise, rounding_weight,
            cfg=cfg, sched=sched,
            use_learned_embeddings=use_learned_embeddings,
            pretrained_matrix=pretrained_matrix,
            deterministic=False, key=substream(key, "dropout"),
            compute_dtype=compute_dtype, parameterization=parameterization,
            clamp_train=clamp_train, embed_norm=embed_norm,
            freeze_embeddings=freeze_embeddings, anchor_ce=anchor_ce,
        )

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step_multi(state: TrainState, ema, token_batches,
                         rounding_weight, key):
        def body(carry, token_ids):
            state, ema = carry
            step_key = jax.random.fold_in(key, state.step)
            (total, (diff, round_)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, token_ids, rounding_weight, step_key)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema_new = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay), ema, params
            )
            return (
                (TrainState(params, opt_state, state.step + 1), ema_new),
                jnp.stack([diff, round_, total]),
            )

        (state, ema), losses = jax.lax.scan(
            body, (state, ema), token_batches, unroll=2
        )
        return state, ema, jnp.sum(losses, axis=0)

    return train_step_multi


def make_text_eval_step(sched, cfg, *, use_learned_embeddings,
                        pretrained_matrix=None, compute_dtype=None,
                        parameterization="eps", clamp_train=False,
                         embed_norm="none", freeze_embeddings=False,
                         anchor_ce=0.0):
    @jax.jit
    def eval_step(params, token_ids, rounding_weight, key):
        b = token_ids.shape[0]
        t = jax.random.randint(
            substream(key, "timesteps"), (b,), 0, sched.timesteps
        )
        if use_learned_embeddings:
            dim = params["embedding_fn"]["weight"].shape[1]
        else:
            dim = pretrained_matrix.shape[1]
        noise = draw_noise(
            substream(key, "noise"), (b, token_ids.shape[1], dim)
        )
        total, (diff, round_) = _losses(
            params, token_ids, t, noise, rounding_weight,
            cfg=cfg, sched=sched,
            use_learned_embeddings=use_learned_embeddings,
            pretrained_matrix=pretrained_matrix,
            deterministic=True, key=None,
            compute_dtype=compute_dtype, parameterization=parameterization,
            clamp_train=clamp_train, embed_norm=embed_norm,
            freeze_embeddings=freeze_embeddings, anchor_ce=anchor_ce,
        )
        return diff, round_, total

    return eval_step


def make_text_eval_multi(sched, cfg, *, use_learned_embeddings,
                         pretrained_matrix=None, compute_dtype=None,
                         parameterization="eps", clamp_train=False,
                         embed_norm="none", freeze_embeddings=False,
                         anchor_ce=0.0):
    """Scanned validation pass: (params, tokens (K, B, L), weight, key) ->
    summed (diff, round, total) over K batches in one dispatch."""
    eval_one = make_text_eval_step(
        sched, cfg, use_learned_embeddings=use_learned_embeddings,
        pretrained_matrix=pretrained_matrix, compute_dtype=compute_dtype,
        parameterization=parameterization, clamp_train=clamp_train, embed_norm=embed_norm,
            freeze_embeddings=freeze_embeddings, anchor_ce=anchor_ce,
    )

    @jax.jit
    def eval_multi(params, token_batches, rounding_weight, key):
        def body(i, sums):
            d, r, t = eval_one(
                params, token_batches[i], rounding_weight,
                jax.random.fold_in(key, i),
            )
            return sums + jnp.stack([d, r, t])

        return jax.lax.fori_loop(
            0, token_batches.shape[0], body, jnp.zeros((3,))
        )

    return eval_multi


def _checkpoint_dict(params: dict, *, epoch: int, use_learned_embeddings: bool,
                     extra: dict | None = None, tokenizer_state: dict | None = None,
                     parameterization: str = "eps",
                     self_cond: bool = False,
                     noise_schedule: str = "linear",
                     embed_norm: str = "none",
                     pos_emb: str = "none",
                     anchor_ce: float = 0.0) -> dict:
    ckpt: dict[str, Any] = {
        "diffusion_model": transformer_to_state_dict(
            jax.device_get(params["diffusion_model"])
        ),
        "rounding_fn": rounding_to_state_dict(
            jax.device_get(params["rounding_fn"])
        ),
        "epoch": epoch,
        # Extra keys on top of the reference dict format: which output the
        # denoiser was trained to predict + whether it has a
        # self-conditioning channel, so samplers self-configure.
        "parameterization": parameterization,
        "self_cond": self_cond,
        "noise_schedule": noise_schedule,
        "embed_norm": embed_norm,
        # 'rope' has no weights, so samplers need the mode recorded here;
        # 'abs' is additionally self-detecting via pos_emb.weight.
        "pos_emb": pos_emb,
    }
    if anchor_ce:
        # Train-only provenance (samplers don't read it): the Diffusion-LM
        # anchor weight this checkpoint was trained with. Key omitted when
        # zero so pre-anchor checkpoints' key set is unchanged.
        ckpt["anchor_ce"] = anchor_ce
    if use_learned_embeddings and "embedding_fn" in params:
        ckpt["embedding_fn"] = embedding_to_state_dict(
            jax.device_get(params["embedding_fn"])
        )
    if tokenizer_state:
        ckpt["tokenizer"] = tokenizer_state
    if extra:
        ckpt.update(extra)
    return ckpt


def train(
    joint_params: dict,
    train_chunks: np.ndarray,
    val_chunks: np.ndarray,
    *,
    cfg: TransformerConfig,
    sched: DiffusionSchedule,
    ckpt_path: str = "text_ckpt.pth",
    epochs: int = 1,
    batch_size: int = 32,
    lr: float = 1e-4,
    weight_decay: float = 1e-4,
    rounding_weight: float = 1.0,
    use_learned_embeddings: bool = True,
    pretrained_matrix=None,
    patience: int = 5,
    use_lr_scheduling: bool = True,
    warmup_steps: int = 100,
    seed: int = 0,
    mesh=None,
    tokenizer_state: dict | None = None,
    resume: bool = False,
    resume_path: str | None = None,
    resume_every: int = 1,
    metrics_path: str | None = None,
    compute_dtype=None,
    ema_decay: float | None = None,
    parameterization: str = "eps",
    clamp_train: bool = False,
    noise_schedule: str = "linear",
    embed_norm: str = "none",
    freeze_embeddings: bool = False,
    anchor_ce: float = 0.0,
    log_fn=print,
) -> dict:
    """Epoch loop with validation + early stopping
    (reference src/shakespeare.py:174-341). Returns final params.

    ``resume=True`` adds the mid-training resume the reference lacks
    (SURVEY.md §5.4): full train state (joint params, optimizer state, step,
    epoch, early-stopping counters) checkpointed every epoch.

    ``ema_decay`` maintains an EMA of the joint params in the train scan;
    validation, best-checkpoint selection, and the final checkpoint then use
    the EMA weights."""
    if clamp_train and parameterization != "x0":
        raise ValueError(
            "clamp_train requires --parameterization x0 (the clamp operates "
            "on the predicted clean embeddings)"
        )
    steps_per_epoch = num_batches(train_chunks.shape[0], batch_size)
    total_steps = steps_per_epoch * epochs
    lr_sched = (
        cosine_schedule_with_warmup(lr, warmup_steps, total_steps)
        if use_lr_scheduling
        else lr
    )
    tx = adamw(lr_sched, weight_decay=weight_decay)
    if freeze_embeddings and use_learned_embeddings:
        # stop_gradient zeroes the grad, but AdamW's decoupled weight decay
        # would still shrink the table each step; hard-zero its updates.
        tx = freeze_subtree(tx, "embedding_fn")

    if mesh is None:
        mesh = make_mesh()
    if cfg.seq_axis is not None:
        # Sequence-parallel (ring attention): register the mesh for the
        # config's sequence axis and shard the token sequence dim on it.
        from tinydiffusionmodels_tpu import ops

        if cfg.seq_axis not in mesh.shape:
            raise ValueError(
                f"cfg.seq_axis={cfg.seq_axis!r} is not an axis of the "
                f"training mesh {dict(mesh.shape)}; build the mesh with "
                f"that axis (e.g. make_mesh({{{cfg.seq_axis!r}: -1}}))"
            )
        ops.register_sequence_mesh(mesh, cfg.seq_axis)
    if pretrained_matrix is not None:
        pretrained_matrix = jnp.asarray(pretrained_matrix)
    state = replicate_tree(mesh, TrainState.create(joint_params, tx))
    chunk = max(1, int(os.environ.get("TDM_SCAN_CHUNK", "25")))
    if ema_decay is None:
        train_multi = make_text_train_step_multi(
            sched, cfg, tx,
            use_learned_embeddings=use_learned_embeddings,
            pretrained_matrix=pretrained_matrix, compute_dtype=compute_dtype,
            parameterization=parameterization, clamp_train=clamp_train, embed_norm=embed_norm,
            freeze_embeddings=freeze_embeddings, anchor_ce=anchor_ce,
        )
    else:
        train_multi_ema = make_text_train_step_multi_ema(
            sched, cfg, tx, ema_decay=ema_decay,
            use_learned_embeddings=use_learned_embeddings,
            pretrained_matrix=pretrained_matrix, compute_dtype=compute_dtype,
            parameterization=parameterization, clamp_train=clamp_train, embed_norm=embed_norm,
            freeze_embeddings=freeze_embeddings, anchor_ce=anchor_ce,
        )
    eval_multi = make_text_eval_multi(
        sched, cfg,
        use_learned_embeddings=use_learned_embeddings,
        pretrained_matrix=pretrained_matrix, compute_dtype=compute_dtype,
        parameterization=parameterization, clamp_train=clamp_train, embed_norm=embed_norm,
            freeze_embeddings=freeze_embeddings, anchor_ce=anchor_ce,
    )

    from tinydiffusionmodels_tpu.train.metrics import MetricsLogger

    metrics = MetricsLogger(metrics_path)
    key = jax.random.PRNGKey(seed)
    best_val_loss = float("inf")
    patience_counter = 0
    start_epoch = 0
    ema = None

    resume_path = resume_path or str(ckpt_path).replace(".pth", "_state.pth")
    if resume and os.path.exists(resume_path):
        from tinydiffusionmodels_tpu.io import load_checkpoint
        from tinydiffusionmodels_tpu.io.checkpoint import (
            embedding_from_state_dict,
            rounding_from_state_dict,
            transformer_from_state_dict,
        )

        try:
            saved = load_checkpoint(resume_path)
        except Exception as e:
            # Corrupt/truncated resume file must not kill the job.
            log_fn(f"[resume] could not read {resume_path} ({e}); "
                   "starting fresh")
            saved = None
        if saved is None:
            params = None
        else:
            params = {
                "diffusion_model": transformer_from_state_dict(
                    saved["diffusion_model"]
                ),
                "rounding_fn": rounding_from_state_dict(saved["rounding_fn"]),
            }
            if "embedding_fn" in saved:
                params["embedding_fn"] = embedding_from_state_dict(
                    saved["embedding_fn"]
                )
            treedef = jax.tree_util.tree_structure(state.opt_state)
            opt_state = jax.tree_util.tree_unflatten(
                treedef, [jnp.asarray(x) for x in saved["opt_state_leaves"]]
            )
            state = replicate_tree(
                mesh,
                TrainState(
                    params, opt_state, jnp.asarray(saved["step"], jnp.int32)
                ),
            )
            start_epoch = int(saved["epoch"])
            best_val_loss = float(saved.get("best_val_loss", float("inf")))
            patience_counter = int(saved.get("patience_counter", 0))
            if ema_decay is not None and "ema" in saved:
                ema_params = {
                    "diffusion_model": transformer_from_state_dict(
                        saved["ema"]["diffusion_model"]
                    ),
                    "rounding_fn": rounding_from_state_dict(
                        saved["ema"]["rounding_fn"]
                    ),
                }
                if "embedding_fn" in saved["ema"]:
                    ema_params["embedding_fn"] = embedding_from_state_dict(
                        saved["ema"]["embedding_fn"]
                    )
                ema = replicate_tree(mesh, ema_params)
            log_fn(f"[resume] restored epoch {start_epoch} from {resume_path}")

    # EMA starts from the (possibly restored) params; after resume, from the
    # restored EMA above.
    if ema_decay is not None and ema is None:
        ema = replicate_tree(
            mesh, jax.tree_util.tree_map(jnp.copy, state.params)
        )

    for epoch in range(start_epoch, epochs):
        w = dynamic_rounding_weight_schedule(epoch, epochs, rounding_weight)
        w_arr = jnp.asarray(w, dtype=jnp.float32)

        t0 = time.perf_counter()
        sums = jnp.zeros((3,))
        n = 0
        nflush = 0
        # Per-chunk progress (reference shows tqdm it/s + loss postfix,
        # src/shakespeare.py:219,257-263; finest grain here is one chunk).
        progress_every = int(os.environ.get("TDM_PROGRESS_EVERY", "10"))
        train_key = substream(key, "train")
        pending: list[np.ndarray] = []

        def flush(state, ema, sums, pending):
            stacked = shard_stacked_batch(
                mesh, jnp.asarray(np.stack(pending)), seq_axis=cfg.seq_axis
            )
            if ema_decay is None:
                state, batch_sums = train_multi(
                    state, stacked, w_arr, train_key
                )
            else:
                state, ema, batch_sums = train_multi_ema(
                    state, ema, stacked, w_arr, train_key
                )
            return state, ema, sums + batch_sums

        for tokens in batch_iterator(
            train_chunks, batch_size, seed=seed, epoch=epoch
        ):
            pending.append(tokens)
            if len(pending) == chunk:
                state, ema, sums = flush(state, ema, sums, pending)
                n += chunk
                nflush += 1
                pending = []
                if progress_every and nflush % progress_every == 0:
                    dt = time.perf_counter() - t0
                    log_fn(
                        f"[epoch {epoch + 1}] step {n}/{steps_per_epoch} "
                        f"({n / dt:.1f} it/s), "
                        f"loss~{float(sums[2]) / max(n, 1):.4f}"
                    )
        if pending:
            state, ema, sums = flush(state, ema, sums, pending)
            n += len(pending)
        train_losses = np.asarray(sums) / max(n, 1)
        dt = time.perf_counter() - t0

        val_batches = list(batch_iterator(val_chunks, batch_size, shuffle=False))
        vn = len(val_batches)
        if vn:
            stacked = shard_stacked_batch(
                mesh, jnp.asarray(np.stack(val_batches)), seq_axis=cfg.seq_axis
            )
            vkey = jax.random.fold_in(substream(key, "val"), epoch)
            eval_params = ema if ema_decay is not None else state.params
            vsums = eval_multi(eval_params, stacked, w_arr, vkey)
            val_losses = np.asarray(vsums) / vn
        else:
            val_losses = np.zeros((3,))

        metrics.log(
            {
                "workload": "shakespeare",
                "epoch": epoch + 1,
                "steps": n,
                "it_per_s": round(n / dt, 2),
                "train_diff": float(train_losses[0]),
                "train_round": float(train_losses[1]),
                "train_total": float(train_losses[2]),
                "val_diff": float(val_losses[0]),
                "val_round": float(val_losses[1]),
                "val_total": float(val_losses[2]),
                "rounding_weight": w,
            }
        )
        log_fn(f"Epoch {epoch + 1}/{epochs} ({n} steps, {n / dt:.1f} it/s):")
        log_fn(
            f"  Train: diff={train_losses[0]:.4f}, round={train_losses[1]:.4f}, "
            f"total={train_losses[2]:.4f}"
        )
        log_fn(
            f"  Val:   diff={val_losses[0]:.4f}, round={val_losses[1]:.4f}, "
            f"total={val_losses[2]:.4f}"
        )
        log_fn(f"  Rounding weight: {w:.3f}")

        if vn and val_losses[2] < best_val_loss:
            best_val_loss = float(val_losses[2])
            patience_counter = 0
            best_ckpt_path = str(ckpt_path).replace(".pth", "_best.pth")
            save_checkpoint(
                _checkpoint_dict(
                    ema if ema_decay is not None else state.params,
                    epoch=epoch,
                    use_learned_embeddings=use_learned_embeddings,
                    extra={"val_loss": best_val_loss},
                    tokenizer_state=tokenizer_state,
                    parameterization=parameterization,
                    self_cond=cfg.self_cond,
                    noise_schedule=noise_schedule,
                    embed_norm=embed_norm,
                    pos_emb=cfg.pos_kind,
                    anchor_ce=anchor_ce,
                ),
                best_ckpt_path,
            )
            log_fn(f"  New best validation loss! Saved to {best_ckpt_path}")
        elif vn:
            # Only count patience when a val measurement exists: with an
            # empty val set (--val_split 0) there is no signal, so early
            # stopping must never fire. (The reference would ZeroDivisionError
            # here, src/shakespeare.py:281; neither stopping nor crashing is
            # right.)
            patience_counter += 1
            if patience_counter >= patience:
                log_fn(
                    f"  Early stopping triggered after {patience} epochs "
                    "without improvement"
                )
                break

        if resume and (epoch + 1) % max(1, resume_every) == 0:
            resume_ckpt = _checkpoint_dict(
                state.params, epoch=epoch + 1,
                use_learned_embeddings=use_learned_embeddings,
                extra={
                    "opt_state_leaves": [
                        np.asarray(x)
                        for x in jax.tree_util.tree_leaves(state.opt_state)
                    ],
                    "step": int(state.step),
                    "best_val_loss": best_val_loss,
                    "patience_counter": patience_counter,
                },
                tokenizer_state=tokenizer_state,
            )
            if ema_decay is not None:
                resume_ckpt["ema"] = _checkpoint_dict(
                    ema, epoch=epoch + 1,
                    use_learned_embeddings=use_learned_embeddings,
                )
            save_checkpoint(resume_ckpt, resume_path)

    final_ckpt_path = (
        get_vertex_checkpoint_path("text-model.pth")
        if "AIP_MODEL_DIR" in os.environ
        else ckpt_path
    )
    log_fn(f"✔ Saving final checkpoint to {final_ckpt_path}...")
    save_checkpoint(
        _checkpoint_dict(
            ema if ema_decay is not None else state.params,
            epoch=epochs,
            use_learned_embeddings=use_learned_embeddings,
            extra={"final_training": True},
            tokenizer_state=tokenizer_state,
            parameterization=parameterization,
            self_cond=cfg.self_cond,
            noise_schedule=noise_schedule,
            embed_norm=embed_norm,
            pos_emb=cfg.pos_kind,
            anchor_ce=anchor_ce,
        ),
        final_ckpt_path,
    )
    metrics.close()
    return jax.device_get(ema if ema_decay is not None else state.params)
