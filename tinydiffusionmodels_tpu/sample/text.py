"""Text sampling: pure diffusion sampling + decoding, and the guided
AR+diffusion pipeline wiring.

Rebuild of reference src/shakespeare.py:355-470. The reverse loop is the
shared scanned sampler; decoding is learned-rounding argmax or the cosine
fallback (src/shakespeare.py:387-401); guided generation precomputes the
per-position diffusion logits and runs the KV-cached scan decoder
(sample/guided.py).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from tinydiffusionmodels_tpu.core.schedule import DiffusionSchedule
from tinydiffusionmodels_tpu.io import get_samples_dir, save_samples
from tinydiffusionmodels_tpu.models import (
    rounding_apply,
    tiny_transformer_apply,
)
from tinydiffusionmodels_tpu.models.embedding import cosine_logits
from tinydiffusionmodels_tpu.models.transformer import TransformerConfig
from tinydiffusionmodels_tpu.sample.ancestral import sample_loop
from tinydiffusionmodels_tpu.sample.guided import guided_generate_scan


def make_denoiser(
    diff_params: dict,
    cfg: TransformerConfig,
    sched: DiffusionSchedule,
    *,
    parameterization: str = "eps",
):
    """(x, t) -> eps regardless of the model's output parameterization.

    "eps" is the reference's choice (src/shakespeare.py:232-236); "x0" is
    the original Diffusion-LM parameterization (model predicts the clean
    embeddings; converted to eps so every sampler works unchanged).

    When ``cfg.self_cond``, the returned function is (x, t, x0_prev) ->
    (eps, x0_est) for sample_loop's self-conditioning carry."""
    from tinydiffusionmodels_tpu.core.diffusion import _bcast, eps_from_x0

    def denoise(x, t, x0_prev=None):
        pred = tiny_transformer_apply(diff_params, x, t, cfg, x0_prev=x0_prev)
        if parameterization == "x0":
            eps = eps_from_x0(sched, x, t, pred)
            x0_est = pred
        else:
            eps = pred
            sqrt_acp = _bcast(sched.sqrt_alphas_cumprod, t, x.ndim)
            sqrt_om = _bcast(sched.sqrt_one_minus_alphas_cumprod, t, x.ndim)
            x0_est = (x - sqrt_om * pred) / sqrt_acp
        if cfg.self_cond:
            return eps, x0_est
        return eps

    return denoise


def make_clamped_denoiser(
    diff_params: dict,
    cfg: TransformerConfig,
    sched: DiffusionSchedule,
    *,
    rounding_params: dict | None,
    embedding_table: jax.Array,
    use_learned_rounding: bool = True,
    parameterization: str = "eps",
):
    """Denoiser wrapper implementing the Diffusion-LM "clamping trick"
    (Li et al. 2022, §4): at every reverse step, snap the implied x0
    estimate to its nearest embedding (via the rounding head or cosine
    similarity) and re-derive eps from the clamped x0. Keeps the trajectory
    on the embedding manifold, sharply reducing decode-time garbage.

    Not present in the reference implementation (its sampler runs raw
    ancestral steps, src/shakespeare.py:343-352) — an addition from the
    Diffusion-LM paper the reference is based on. Returns a (x, t) -> eps
    function usable by any sampler in sample/ancestral.py; with
    ``cfg.self_cond`` it is (x, t, x0_prev) -> (eps, x0_clamped) so the
    *clamped* estimate (the one the sampler uses) feeds the next step.
    """
    from tinydiffusionmodels_tpu.core.diffusion import _bcast

    def denoise(x, t, x0_prev=None):
        pred = tiny_transformer_apply(diff_params, x, t, cfg, x0_prev=x0_prev)
        sqrt_acp = _bcast(sched.sqrt_alphas_cumprod, t, x.ndim)
        sqrt_om = _bcast(sched.sqrt_one_minus_alphas_cumprod, t, x.ndim)
        if parameterization == "x0":
            x0 = pred
        else:
            x0 = (x - sqrt_om * pred) / sqrt_acp
        if use_learned_rounding:
            logits = rounding_apply(rounding_params, x0)
        else:
            logits = cosine_logits(embedding_table, x0)
        tokens = jnp.argmax(logits, axis=-1)
        x0_clamped = jnp.take(embedding_table, tokens, axis=0)
        eps = (x - sqrt_acp * x0_clamped) / sqrt_om
        if cfg.self_cond:
            return eps, x0_clamped
        return eps

    return denoise


def sample_diffusion_embeddings(
    diff_params: dict,
    cfg: TransformerConfig,
    sched: DiffusionSchedule,
    key: jax.Array,
    *,
    n: int,
    seq_len: int,
    embed_dim: int,
    method: str = "ancestral",
    num_steps: int | None = None,
    parameterization: str = "eps",
    temperature: float = 1.0,
) -> jax.Array:
    """Reverse-diffuse pure embeddings z (reference src/shakespeare.py:418-426).

    ``temperature`` scales the ancestral path's injected noise
    (sample_loop; 1.0 = reference semantics)."""
    denoise = make_denoiser(
        diff_params, cfg, sched, parameterization=parameterization
    )
    return jax.jit(
        lambda k: sample_loop(
            denoise, sched, (n, seq_len, embed_dim), k,
            method=method, num_steps=num_steps, self_cond=cfg.self_cond,
            temperature=temperature,
        )
    )(key)


def decode_embeddings(
    x: jax.Array,
    *,
    rounding_params: dict | None,
    embed_matrix: jax.Array | None,
    use_learned_rounding: bool,
) -> jax.Array:
    """Embeddings -> token ids via learned rounding or cosine similarity
    (reference src/shakespeare.py:387-401)."""
    if use_learned_rounding:
        logits = rounding_apply(rounding_params, x)
    else:
        logits = cosine_logits(embed_matrix, x)
    return jnp.argmax(logits, axis=-1)


def sample_text(
    diff_params: dict,
    cfg: TransformerConfig,
    sched: DiffusionSchedule,
    tokenizer,
    key: jax.Array,
    *,
    rounding_params: dict | None = None,
    embed_matrix: jax.Array | None = None,
    n_samples: int = 4,
    seq_len: int = 128,
    embed_dim: int,
    use_learned_rounding: bool = True,
    outdir: str = "samples",
    save: bool = True,
    method: str = "ancestral",
    num_steps: int | None = None,
    clamp: bool = False,
    parameterization: str = "eps",
    temperature: float = 1.0,
    log_fn=print,
) -> list[str]:
    """Pure diffusion text sampling (reference src/shakespeare.py:355-415).

    ``clamp=True`` enables the Diffusion-LM clamping trick (see
    make_clamped_denoiser); requires an embedding table."""
    if clamp:
        if embed_matrix is None:
            raise ValueError("clamp=True requires an embedding table")
        denoise = make_clamped_denoiser(
            diff_params, cfg, sched,
            rounding_params=rounding_params,
            embedding_table=embed_matrix,
            use_learned_rounding=use_learned_rounding,
            parameterization=parameterization,
        )
        x = jax.jit(
            lambda k: sample_loop(
                denoise, sched, (n_samples, seq_len, embed_dim), k,
                method=method, num_steps=num_steps, self_cond=cfg.self_cond,
                temperature=temperature,
            )
        )(key)
    else:
        x = sample_diffusion_embeddings(
            diff_params, cfg, sched, key,
            n=n_samples, seq_len=seq_len, embed_dim=embed_dim,
            method=method, num_steps=num_steps,
            parameterization=parameterization, temperature=temperature,
        )
    tokens = decode_embeddings(
        x,
        rounding_params=rounding_params,
        embed_matrix=embed_matrix,
        use_learned_rounding=use_learned_rounding,
    )
    texts = tokenizer.batch_decode(np.asarray(tokens), skip_special_tokens=True)

    if save:
        samples_dir = get_samples_dir(outdir)
        for i, text in enumerate(texts):
            log_fn(text)
            if isinstance(samples_dir, str) and samples_dir.startswith("gs://"):
                sample_path = f"{samples_dir}/sample_{i}.txt"
            else:
                sample_path = Path(samples_dir) / f"sample_{i}.txt"
            save_samples(text, sample_path)
            log_fn(f"✔ Wrote {sample_path}")
    return texts


def diffusion_position_logits(
    z: jax.Array,
    *,
    rounding_params: dict | None,
    embed_matrix: jax.Array | None,
    use_learned_rounding: bool,
) -> jax.Array:
    """(B, L, dim) z -> (B, L, V) per-position diffusion logits for guided
    mixing (the hoisted form of reference src/shakespeare.py:451-464)."""
    if use_learned_rounding:
        return rounding_apply(rounding_params, z)
    return cosine_logits(embed_matrix, z)


def guided_sample_text(
    decode_step: Callable,
    init_cache: dict,
    z: jax.Array,
    tokenizer,
    *,
    rounding_params: dict | None = None,
    embed_matrix: jax.Array | None = None,
    use_learned_rounding: bool = True,
    alpha: float = 0.3,
    temperature: float = 1.0,
    normalize: bool = False,
    seg: int | None = None,
    outdir: str = "samples",
    save: bool = True,
    log_fn=print,
) -> list[str]:
    """Guided generation end-to-end (reference src/shakespeare.py:429-470,
    590-603): diffusion logits from z, KV-cached greedy scan, decode, save.

    ``normalize=True`` mixes log-probabilities instead of raw logits (see
    sample.guided.mix_logits) — a framework extension; default is exact
    reference behavior. ``seg`` enables the segmented growing-attention-
    window scan (see sample.guided.guided_generate_scan); the decode_step
    must then accept a third ``attn_len`` argument."""
    diff_logits = diffusion_position_logits(
        z,
        rounding_params=rounding_params,
        embed_matrix=embed_matrix,
        use_learned_rounding=use_learned_rounding,
    )
    bos = tokenizer.bos_token_id or tokenizer.eos_token_id or 0
    tokens = guided_generate_scan(
        decode_step, init_cache, diff_logits, bos,
        alpha=alpha, temperature=temperature, normalize=normalize, seg=seg,
    )
    texts = tokenizer.batch_decode(np.asarray(tokens), skip_special_tokens=True)

    if save:
        samples_dir = get_samples_dir(outdir)
        for i, text in enumerate(texts):
            if isinstance(samples_dir, str) and samples_dir.startswith("gs://"):
                sample_path = f"{samples_dir}/guided_sample_{i}.txt"
            else:
                sample_path = Path(samples_dir) / f"guided_sample_{i}.txt"
            save_samples(text, sample_path)
            log_fn(f"✔ Wrote {sample_path}")
    return texts
