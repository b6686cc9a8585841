"""counter_normal / draw_noise: the fused train-noise fast path.

Statistical acceptance for a non-crypto counter-based Gaussian stream
(murmur3-fmix32 avalanche + exact Box-Muller; see core/rng.counter_normal).
Diffusion training needs uniformity, independence, and correct moments —
these tests pin all three plus the routing knob.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinydiffusionmodels_tpu.core.rng import (
    counter_bernoulli,
    counter_normal,
    draw_keep,
    draw_noise,
)


class TestCounterNormal:
    def test_moments(self):
        z = np.asarray(counter_normal(jax.random.PRNGKey(0), (1 << 20,)))
        assert abs(z.mean()) < 5e-3
        assert abs(z.var() - 1.0) < 1e-2
        # standardized skewness / excess kurtosis of N(0,1)
        s = ((z - z.mean()) / z.std())
        assert abs((s**3).mean()) < 2e-2
        assert abs((s**4).mean() - 3.0) < 5e-2

    def test_tail_mass(self):
        """Exact Box-Muller ⇒ real Gaussian tails (the reason we did not
        use an Irwin-Hall approximation)."""
        z = np.asarray(counter_normal(jax.random.PRNGKey(1), (1 << 21,)))
        n = z.size
        for sigma, p in [(1.0, 0.3173), (2.0, 0.0455), (3.0, 0.0027)]:
            frac = float((np.abs(z) > sigma).mean())
            # binomial stderr at this n
            tol = 5 * np.sqrt(p * (1 - p) / n) + 2e-4
            assert abs(frac - p) < tol, (sigma, frac, p)

    def test_deterministic_and_key_dependent(self):
        k = jax.random.PRNGKey(7)
        a = counter_normal(k, (4096,))
        b = counter_normal(k, (4096,))
        c = counter_normal(jax.random.PRNGKey(8), (4096,))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert float(jnp.abs(a - c).max()) > 0.1
        # streams from different keys are decorrelated
        corr = float(jnp.corrcoef(a, c)[0, 1])
        assert abs(corr) < 0.05

    def test_fold_in_substream_differs(self):
        """fold_in-derived keys (the per-step pattern) give fresh noise."""
        k = jax.random.PRNGKey(3)
        a = counter_normal(jax.random.fold_in(k, 0), (4096,))
        b = counter_normal(jax.random.fold_in(k, 1), (4096,))
        assert abs(float(jnp.corrcoef(a, b)[0, 1])) < 0.05

    def test_lag_correlation(self):
        z = np.asarray(counter_normal(jax.random.PRNGKey(2), (1 << 18,)))
        for lag in (1, 2, 128):
            c = np.corrcoef(z[:-lag], z[lag:])[0, 1]
            assert abs(c) < 0.01, (lag, c)
        # Box-Muller pairs are concatenated [cos block | sin block]; the
        # pair (i, i + half) shares (u1, u2) — cos/sin of the same angle
        # are uncorrelated in aggregate but must also pass:
        half = z.size // 2
        c = np.corrcoef(z[:half], z[half:])[0, 1]
        assert abs(c) < 0.01

    def test_shapes_dtype(self):
        for shape in [(7,), (3, 5), (2, 3, 4, 1), (1,)]:
            z = counter_normal(jax.random.PRNGKey(0), shape)
            assert z.shape == shape and z.dtype == jnp.float32
        zb = counter_normal(jax.random.PRNGKey(0), (64,), jnp.bfloat16)
        assert zb.dtype == jnp.bfloat16
        assert counter_normal(jax.random.PRNGKey(0), (0,)).shape == (0,)

    def test_finite(self):
        z = counter_normal(jax.random.PRNGKey(4), (1 << 20,))
        assert bool(jnp.isfinite(z).all())

    def test_jit_and_scan_safe(self):
        """Usable inside jit/scan with a folded key (the train-loop form)."""
        @jax.jit
        def f(key):
            def body(c, i):
                z = counter_normal(jax.random.fold_in(key, i), (8, 8))
                return c + z.mean(), None
            out, _ = jax.lax.scan(body, 0.0, jnp.arange(4))
            return out
        assert np.isfinite(float(f(jax.random.PRNGKey(0))))


class TestDrawNoise:
    def test_default_is_stock_normal_off_tpu(self, monkeypatch):
        """auto = stock path on non-TPU backends (these tests run on CPU)."""
        monkeypatch.delenv("TDM_FAST_NOISE", raising=False)
        k = jax.random.PRNGKey(5)
        np.testing.assert_array_equal(
            np.asarray(draw_noise(k, (128,))),
            np.asarray(jax.random.normal(k, (128,))),
        )

    def test_explicit_off(self, monkeypatch):
        monkeypatch.setenv("TDM_FAST_NOISE", "0")
        k = jax.random.PRNGKey(6)
        np.testing.assert_array_equal(
            np.asarray(draw_noise(k, (64,))),
            np.asarray(jax.random.normal(k, (64,))),
        )

    def test_fast_path_routes(self, monkeypatch):
        monkeypatch.setenv("TDM_FAST_NOISE", "1")
        k = jax.random.PRNGKey(5)
        np.testing.assert_array_equal(
            np.asarray(draw_noise(k, (128,))),
            np.asarray(counter_normal(k, (128,))),
        )


class TestCounterBernoulli:
    def test_keep_rate(self):
        for p in (0.1, 0.5, 0.9):
            m = counter_bernoulli(jax.random.PRNGKey(0), p, (1 << 18,))
            frac = float(jnp.mean(m.astype(jnp.float32)))
            assert abs(frac - p) < 5e-3, (p, frac)

    def test_deterministic_and_key_dependent(self):
        k = jax.random.PRNGKey(1)
        a = counter_bernoulli(k, 0.5, (4096,))
        b = counter_bernoulli(k, 0.5, (4096,))
        c = counter_bernoulli(jax.random.PRNGKey(2), 0.5, (4096,))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert float(jnp.mean((a != c).astype(jnp.float32))) > 0.4

    def test_independent_of_noise_stream(self):
        """The mask hash and the normal hash from the SAME key must not be
        correlated (dropout and noise share per-step keys upstream)."""
        k = jax.random.PRNGKey(3)
        z = np.asarray(counter_normal(k, (1 << 16,)))
        m = np.asarray(counter_bernoulli(k, 0.5, (1 << 16,))).astype(float)
        assert abs(np.corrcoef(z, m)[0, 1]) < 0.01

    def test_draw_keep_routes(self, monkeypatch):
        k = jax.random.PRNGKey(4)
        monkeypatch.setenv("TDM_FAST_NOISE", "1")
        np.testing.assert_array_equal(
            np.asarray(draw_keep(k, 0.9, (256,))),
            np.asarray(counter_bernoulli(k, 0.9, (256,))),
        )
        monkeypatch.delenv("TDM_FAST_NOISE")
        np.testing.assert_array_equal(
            np.asarray(draw_keep(k, 0.9, (256,))),
            np.asarray(jax.random.bernoulli(k, 0.9, (256,))),
        )


class TestAttentionWeightDropoutFastPath:
    """VERDICT r4 item 7: xla_ref.attention's (B, H, Lq, Lk) weight mask —
    the one RNG draw whose footprint scales with L^2 — goes through
    draw_keep, so TDM_FAST_NOISE covers it too."""

    def _qkv(self, b=1, h=2, l=16, dh=8):
        key = jax.random.PRNGKey(0)
        return tuple(
            jax.random.normal(jax.random.fold_in(key, i), (b, l, h, dh))
            for i in range(3)
        )

    def test_counter_mask_used_when_fast(self, monkeypatch):
        from tinydiffusionmodels_tpu.ops import xla_ref

        q, k, v = self._qkv()
        t = lambda a: a.transpose(0, 2, 1, 3)
        dk = jax.random.PRNGKey(9)
        monkeypatch.setenv("TDM_FAST_NOISE", "1")
        fast = xla_ref.attention(t(q), t(k), t(v),
                                 dropout_rate=0.5, dropout_key=dk)
        monkeypatch.setenv("TDM_FAST_NOISE", "0")
        stock = xla_ref.attention(t(q), t(k), t(v),
                                  dropout_rate=0.5, dropout_key=dk)
        # Different mask streams -> different results; both finite.
        assert not np.allclose(np.asarray(fast), np.asarray(stock))
        assert np.isfinite(np.asarray(fast)).all()

    def test_layout_bit_identity_under_fast_noise(self, monkeypatch):
        """The BLHD/BHLD bit-identity contract must hold on the counter
        path exactly as it does on the stock path (same key, same
        (B,H,Lq,Lk) draw shape)."""
        from tinydiffusionmodels_tpu.ops import xla_ref

        q, k, v = self._qkv()
        t = lambda a: a.transpose(0, 2, 1, 3)
        dk = jax.random.PRNGKey(11)
        for mode in ("0", "1"):
            monkeypatch.setenv("TDM_FAST_NOISE", mode)
            out_blhd = xla_ref.attention(
                q, k, v, dropout_rate=0.3, dropout_key=dk, layout="blhd"
            )
            out_bhld = xla_ref.attention(
                t(q), t(k), t(v), dropout_rate=0.3, dropout_key=dk
            )
            np.testing.assert_array_equal(
                np.asarray(t(out_blhd)), np.asarray(out_bhld)
            )
