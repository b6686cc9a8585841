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

from fidelity import (  # noqa: E402
    fid,
    inception_score,
    nn_train_distance,
    train_classifier,
)

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


class TestFID:
    def test_identical_sets_score_zero(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(500, 16))
        assert fid(x, x.copy()) == pytest.approx(0.0, abs=1e-6)

    def test_mean_shift_is_squared_distance(self):
        # Same covariance, mean shifted by d: FID = |d|^2 (trace terms
        # cancel). Large n keeps the empirical covariances close.
        rng = np.random.default_rng(1)
        x = rng.normal(size=(20000, 8))
        shift = np.zeros(8)
        shift[0] = 3.0
        got = fid(x, x + shift)
        assert got == pytest.approx(9.0, rel=1e-6)

    def test_scale_difference_detected(self):
        # N(0, I) vs N(0, 4I) in d dims: FID = d*(1 + 4 - 2*2) = d.
        rng = np.random.default_rng(2)
        d = 6
        a = rng.normal(size=(60000, d))
        b = 2.0 * rng.normal(size=(60000, d))
        assert fid(a, b) == pytest.approx(d, rel=0.05)

    def test_mode_drop_visible_where_is_blind(self):
        # Two clusters vs only one of them: IS-style metrics can miss it
        # (confident classifier either way); FID must not.
        rng = np.random.default_rng(3)
        a = np.concatenate([
            rng.normal(loc=-5, size=(500, 4)),
            rng.normal(loc=+5, size=(500, 4)),
        ])
        b = rng.normal(loc=-5, size=(1000, 4))
        assert fid(a, b) > 10.0


class TestNNTrainDistance:
    def test_exact_copies_score_zero(self):
        rng = np.random.default_rng(0)
        train = rng.normal(size=(100, 7, 7, 1)).astype(np.float32)
        d = nn_train_distance(train[:10].copy(), train)
        np.testing.assert_allclose(d, 0.0, atol=1e-2)

    def test_known_offset(self):
        train = np.zeros((5, 4), dtype=np.float32)
        gen = np.full((3, 4), 0.5, dtype=np.float32)  # L2 = 1.0 to zeros
        np.testing.assert_allclose(
            nn_train_distance(gen, train), 1.0, rtol=1e-5
        )

    def test_blocked_matches_unblocked(self):
        rng = np.random.default_rng(4)
        train = rng.normal(size=(300, 12)).astype(np.float32)
        gen = rng.normal(size=(20, 12)).astype(np.float32)
        np.testing.assert_allclose(
            nn_train_distance(gen, train, block=64),
            nn_train_distance(gen, train, block=10**6),
            rtol=1e-4,
        )
