"""SimpleUNet: the 4-block epsilon-prediction UNet for MNIST DDPM.

Functional rebuild of reference src/mnist.py:45-87 with the same topology —
channel plan 1->32 -> pool/2 -> 32->64 -> 64->64 -> nearest-up x2 ->
concat skip (96ch) -> 96->32 -> 1x1 conv -> 1 — but TPU-native choices:

- NHWC activations / HWIO kernels (channel on the 128-lane axis) instead of
  the reference's NCHW.
- Residual blocks go through ops.fused_resblock so a Pallas fused kernel can
  replace the XLA reference per-op.
- Time conditioning identical to the reference: t/T through a Linear(1, C)
  per block, added as a per-channel bias (src/mnist.py:50,58-59,77).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from tinydiffusionmodels_tpu import ops
from tinydiffusionmodels_tpu.models.torch_init import conv_params, linear_params

# (in_ch, out_ch) per residual block, reference src/mnist.py:68-74.
_BLOCKS = {"rb1": (1, 32), "rb2": (32, 64), "rb3": (64, 64), "rb4": (96, 32)}


def _init_resblock(key, in_ch: int, out_ch: int) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "conv1": conv_params(k1, 3, 3, in_ch, out_ch),
        "conv2": conv_params(k2, 3, 3, out_ch, out_ch),
        "time_emb": linear_params(k3, 1, out_ch),
        "skip": conv_params(k4, 1, 1, in_ch, out_ch) if in_ch != out_ch else None,
    }
    return p


def init_unet(key: jax.Array) -> dict:
    keys = jax.random.split(key, len(_BLOCKS) + 1)
    params = {
        name: _init_resblock(k, *chans)
        for k, (name, chans) in zip(keys, _BLOCKS.items())
    }
    params["out"] = conv_params(keys[-1], 1, 1, 32, 1)
    return params


def _resblock(p: dict, x: jax.Array, t_scaled: jax.Array) -> jax.Array:
    """t_scaled: (B, 1) normalized timestep; bias shape (B, 1, 1, C_out)."""
    time_bias = (t_scaled @ p["time_emb"]["w"] + p["time_emb"]["b"])[:, None, None, :]
    return ops.fused_resblock(x, p, time_bias)


def _resblock_split(p: dict, x_a, x_b, t_scaled: jax.Array) -> jax.Array:
    """Concat-free resblock on two channel sources (ops.fused_resblock_split)."""
    time_bias = (t_scaled @ p["time_emb"]["w"] + p["time_emb"]["b"])[:, None, None, :]
    return ops.fused_resblock_split(x_a, x_b, p, time_bias)


def _split_decoder(batch: int) -> bool:
    """TDM_SPLIT_DECODER=1/0/auto — route rb4 through the concat-free
    resblock (same math, kernels sliced along input channels).

    Measured on v5e (tools/xprof_ops.py, 20-step scan device time): the
    split removes the concat-materialization chain that makes bs=2048
    superlinear (1.30x -> 1.18x vs linear, -1.3% total) but costs +9% at
    bs=512 where the extra conv calls outweigh the saved data movement.
    So "auto" (default) splits only for batch >= 1024 — the batch is a
    trace-time shape, so routing is static per compile.
    """
    mode = os.environ.get("TDM_SPLIT_DECODER", "auto")
    if mode == "1":
        return True
    if mode == "0":
        return False
    return batch >= 1024


def _avg_pool2(x: jax.Array) -> jax.Array:
    """2x2/2 average pool via reshape-mean (cheaper for XLA than reduce_window
    on these tiny maps). Requires even H, W (28x28 -> 14x14)."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def _upsample_nearest2(x: jax.Array) -> jax.Array:
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def unet_apply(
    params: dict,
    x: jax.Array,
    t: jax.Array,
    *,
    timesteps: int = 1000,
) -> jax.Array:
    """Forward pass. x: (B, H, W, 1) NHWC; t: (B,) int. Returns eps_hat.

    Mirrors reference src/mnist.py:76-87 step for step.
    """
    t_scaled = (t.astype(x.dtype) / timesteps)[:, None]  # (B, 1)

    h1 = _resblock(params["rb1"], x, t_scaled)                      # (B,H,W,32)
    h2 = _resblock(params["rb2"], _avg_pool2(h1), t_scaled)         # (B,H/2,W/2,64)
    h3 = _resblock(params["rb3"], h2, t_scaled)                     # (B,H/2,W/2,64)
    h4 = _upsample_nearest2(h3)                                     # (B,H,W,64)
    if _split_decoder(x.shape[0]):
        h4 = _resblock_split(params["rb4"], h4, h1, t_scaled)       # (B,H,W,32)
    else:
        h4 = jnp.concatenate([h4, h1], axis=-1)                     # (B,H,W,96)
        h4 = _resblock(params["rb4"], h4, t_scaled)                 # (B,H,W,32)
    return ops.conv2d(h4, params["out"]["w"], params["out"]["b"])   # (B,H,W,1)
