"""Pure-XLA reference implementations of the framework's hot ops.

These are the semantics contract for the Pallas kernels (ops/pallas/*) and
the default backend off-TPU. XLA already fuses elementwise chains into the
convs/matmuls here; the Pallas versions exist to beat XLA where manual
scheduling wins (attention softmax fusion, conv+bias+time-bias+relu chains
on the tiny UNet shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tinydiffusionmodels_tpu.core.rng import draw_keep


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: int = 1,
    padding: str = "SAME",
) -> jax.Array:
    """2-D convolution, NHWC activations, HWIO kernel.

    TPU-native layout choice: channels-last keeps the channel dim on the
    128-lane axis (the torch reference uses NCHW — src/mnist.py:48-49).
    """
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        out = out + b
    return out


def fused_resblock(
    x: jax.Array,
    p: dict,
    time_bias: jax.Array,
) -> jax.Array:
    """Residual block: relu(conv1(x)) + t_bias -> relu(conv2(.)) + skip(x).

    Matches reference src/mnist.py:56-61. ``time_bias`` is (B, 1, 1, C_out).
    ``p`` holds conv1/conv2 (+ optional skip) params in HWIO layout.
    """
    h = jax.nn.relu(conv2d(x, p["conv1"]["w"], p["conv1"]["b"]))
    h = h + time_bias
    h = jax.nn.relu(conv2d(h, p["conv2"]["w"], p["conv2"]["b"]))
    if p.get("skip") is not None:
        x = conv2d(x, p["skip"]["w"], p["skip"]["b"])
    return h + x


def fused_resblock_split(
    x_a: jax.Array,
    x_b: jax.Array,
    p: dict,
    time_bias: jax.Array,
) -> jax.Array:
    """fused_resblock on the channel-concatenation of two sources, WITHOUT
    materializing the concat: conv(cat(a, b)) == conv_a(a) + conv_b(b) with
    the kernel split along input channels (exact, not approximate).

    Why: the UNet decoder consumes cat(upsample(h3), h1) (96 ch,
    models/unet.py; reference src/mnist.py:82-84). A device-op profile
    (tools/xprof_ops.py, roofline post round-3 update) showed the bs=2048
    regression lives in exactly this data-movement chain — the concat
    input fusion (1.44x vs linear), its feeding slice (2.0x) and the
    upsample broadcast (6.4x) — while every conv scales linearly. Feeding
    the sources separately removes the concat materialization and lets
    XLA fuse the upsample broadcast into the first conv's operand.
    """
    ca = x_a.shape[-1]
    w1 = p["conv1"]["w"]
    h = jax.nn.relu(
        conv2d(x_a, w1[:, :, :ca], None)
        + conv2d(x_b, w1[:, :, ca:], p["conv1"]["b"])
    )
    h = h + time_bias
    h = jax.nn.relu(conv2d(h, p["conv2"]["w"], p["conv2"]["b"]))
    if p.get("skip") is not None:
        ws = p["skip"]["w"]
        x = (
            conv2d(x_a, ws[:, :, :ca], None)
            + conv2d(x_b, ws[:, :, ca:], p["skip"]["b"])
        )
    else:
        x = jnp.concatenate([x_a, x_b], axis=-1)
    return h + x


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mask: jax.Array | None = None,
    dropout_rate: float = 0.0,
    dropout_key: jax.Array | None = None,
    layout: str = "bhld",
) -> jax.Array:
    """Scaled dot-product attention over (B, H, L, Dh) tensors.

    Bidirectional by default (the reference's denoiser uses no causal mask —
    src/shakespeare.py:108-111); pass ``mask`` (broadcastable to (B,H,L,L),
    True = keep) for causal LM use. Attention-weight dropout matches torch's
    nn.MultiheadAttention training behavior.

    ``layout='blhd'`` takes q/k/v as (B, L, H, Dh) — the natural layout
    right after a fused-QKV projection — and returns (B, L, H, Dh). The
    head axis is carried as an einsum batch dim instead of an explicit
    transpose, so XLA folds the layout change into the matmuls: measured
    on v5e-1 this removes the materialized (B,L,H,Dh)<->(B,H,L,Dh) copies
    that cost 82 ms of the 372 ms bs=512 bf16 text train scan (device-op
    table docs/docs/assets/r5/xprof_text_train_fast.txt). Dropout masks
    are drawn in
    (B, H, Lq, Lk) in BOTH layouts, so results are bit-identical for the
    same key.
    """
    if layout not in ("bhld", "blhd"):
        raise ValueError(f"unknown attention layout: {layout!r}")
    dh = q.shape[-1]
    score_eq = "bqhd,bkhd->bhqk" if layout == "blhd" else "bhqd,bhkd->bhqk"
    scores = jnp.einsum(
        score_eq, q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(dh, dtype=jnp.float32))
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(scores.dtype).min)
    weights = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0:
        if dropout_key is None:
            raise ValueError("dropout_rate > 0 requires dropout_key")
        # draw_keep: counter-based mask on TPU (TDM_FAST_NOISE) — this is
        # the one RNG draw whose footprint scales with L^2, and the stock
        # bernoulli materializes its rng bits to HBM (same tax measured at
        # 268 MB/step for feature dropout, core/rng._fast_noise). Drawn in
        # (B, H, Lq, Lk) in BOTH layouts -> bit-identical across layouts
        # for the same key under either backend.
        keep = draw_keep(dropout_key, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    weights = weights.astype(v.dtype)
    out_eq = "bhqk,bkhd->bqhd" if layout == "blhd" else "bhqk,bhkd->bhqd"
    return jnp.einsum(out_eq, weights, v)
