"""Fidelity metric tests (classifier + inception score math)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools")
)

from fidelity import inception_score, train_classifier  # noqa: E402

from tinydiffusionmodels_tpu.models.classifier import (  # noqa: E402
    classifier_apply,
    init_classifier,
)


class TestClassifier:
    def test_shapes(self):
        params = init_classifier(jax.random.PRNGKey(0))
        logits = classifier_apply(params, jnp.zeros((4, 28, 28, 1)))
        assert logits.shape == (4, 10)

    def test_learns_synthetic_digits(self):
        from tinydiffusionmodels_tpu.data.mnist import load_mnist

        images, labels, _ = load_mnist("/nonexistent", synthetic_size=2000)
        _, _, acc = train_classifier(images, labels, epochs=3)
        # Well above 10% chance on a tiny budget (2k images, 3 epochs);
        # the full-data TPU run reaches ~99% (tools/fidelity.py).
        assert acc > 0.6


class TestInceptionScore:
    def test_perfectly_confident_uniform_classes(self):
        # One-hot over 10 classes, uniformly distributed -> IS = 10.
        probs = np.eye(10)[np.arange(100) % 10]
        probs = probs * (1 - 1e-9) + 1e-10
        assert inception_score(probs) == pytest.approx(10.0, rel=1e-3)

    def test_uniform_predictions_score_one(self):
        probs = np.full((50, 10), 0.1)
        assert inception_score(probs) == pytest.approx(1.0, rel=1e-6)

    def test_mode_collapse_scores_low(self):
        # Confident but all the same class -> IS = 1 (no diversity).
        probs = np.zeros((50, 10))
        probs[:, 3] = 1.0
        probs = probs * (1 - 1e-9) + 1e-10
        assert inception_score(probs) == pytest.approx(1.0, rel=1e-3)
