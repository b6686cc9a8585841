"""Small CNN digit classifier — the measurement instrument for sample
fidelity.

The reference validates samples only by eye (SURVEY.md §4 item 4). This
classifier, trained in-framework on the same data distribution the diffusion
model was trained on, turns sample grids into numbers: classifier confidence
and an inception-score-style diversity/quality metric (tools/fidelity.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tinydiffusionmodels_tpu import ops
from tinydiffusionmodels_tpu.models.torch_init import conv_params, linear_params


def init_classifier(key: jax.Array, n_classes: int = 10) -> dict:
    k = jax.random.split(key, 4)
    return {
        "conv1": conv_params(k[0], 3, 3, 1, 16),
        "conv2": conv_params(k[1], 3, 3, 16, 32),
        "fc1": linear_params(k[2], 7 * 7 * 32, 128),
        "fc2": linear_params(k[3], 128, n_classes),
    }


def classifier_features(params: dict, x: jax.Array) -> jax.Array:
    """x: (B, 28, 28, 1) in [-1, 1] -> penultimate features (B, 128).

    The embedding space for FID (tools/fidelity.py) — the MNIST-scale
    stand-in for Inception pool3 features."""

    def pool2(a):
        b, h, w, c = a.shape
        return a.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))

    h = jax.nn.relu(ops.conv2d(x, params["conv1"]["w"], params["conv1"]["b"]))
    h = pool2(h)                                   # (B, 14, 14, 16)
    h = jax.nn.relu(ops.conv2d(h, params["conv2"]["w"], params["conv2"]["b"]))
    h = pool2(h)                                   # (B, 7, 7, 32)
    h = h.reshape(h.shape[0], -1)
    return jax.nn.relu(h @ params["fc1"]["w"] + params["fc1"]["b"])


def classifier_apply(params: dict, x: jax.Array) -> jax.Array:
    """x: (B, 28, 28, 1) in [-1, 1] -> logits (B, 10)."""
    h = classifier_features(params, x)
    return h @ params["fc2"]["w"] + params["fc2"]["b"]
