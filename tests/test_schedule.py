"""Golden tests for schedule tables vs DDPM closed forms and torch parity.

The reference has no tests for its diffusion math (SURVEY.md §4); these are
the numerical goldens it lacks.
"""

import numpy as np
import pytest

from tinydiffusionmodels_tpu.core import make_schedule, linear_beta_schedule


def _ulp_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Distance in units-in-the-last-place between two float32 arrays."""
    ai = a.astype(np.float32).view(np.int32).astype(np.int64)
    bi = b.astype(np.float32).view(np.int32).astype(np.int64)
    # Map to a monotonic integer line (two's-complement float ordering).
    ai = np.where(ai < 0, np.int64(-(2**31)) - ai, ai)
    bi = np.where(bi < 0, np.int64(-(2**31)) - bi, bi)
    return np.abs(ai - bi)


class TestLinearSchedule:
    def test_endpoints_and_monotone(self):
        betas = linear_beta_schedule(1000)
        assert betas.shape == (1000,)
        assert betas[0] == pytest.approx(1e-4, rel=0, abs=0)
        assert betas[-1] == pytest.approx(2e-2, rel=0, abs=0)
        assert np.all(np.diff(betas) > 0)

    def test_closed_form_float64(self):
        betas = linear_beta_schedule(1000)
        step = (2e-2 - 1e-4) / 999
        expected = 1e-4 + np.arange(1000) * step
        np.testing.assert_allclose(betas, expected, rtol=1e-15)

    def test_tables_consistent(self):
        s = make_schedule(1000)
        b = np.asarray(s.betas, dtype=np.float64)
        a = np.asarray(s.alphas, dtype=np.float64)
        np.testing.assert_allclose(a, 1.0 - b, rtol=1e-6)
        acp = np.asarray(s.alphas_cumprod)
        assert np.all(np.diff(acp) < 0), "alphas_cumprod must decrease"
        assert 0 < acp[-1] < 1e-4  # near-total noise at t=T-1
        np.testing.assert_allclose(
            np.asarray(s.sqrt_alphas_cumprod) ** 2, acp, rtol=1e-5
        )
        # atol: (1 - acp) computed from the f32 acp table cancels near t=0;
        # the stored sqrt table comes from f64 and is the more accurate one.
        np.testing.assert_allclose(
            np.asarray(s.sqrt_one_minus_alphas_cumprod) ** 2,
            1.0 - acp,
            rtol=1e-4,
            atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(s.sqrt_recip_alphas), 1.0 / np.sqrt(np.asarray(s.alphas)),
            rtol=1e-6,
        )

    def test_custom_timesteps(self):
        s = make_schedule(50)
        assert s.timesteps == 50
        assert s.betas.shape == (50,)

    def test_astype(self):
        import jax.numpy as jnp

        s = make_schedule(10).astype(jnp.bfloat16)
        assert s.betas.dtype == jnp.bfloat16
        assert s.timesteps == 10


class TestTorchParity:
    """Bit-level agreement with the reference's float32 torch pipeline.

    Our tables are float64 closed form cast to f32; torch chains f32 ops
    (reference src/mnist.py:28-33). Allowed slack: <=1 ulp on betas/alphas,
    <=8 ulp on the cumprod-derived tables (f32 cumprod accumulates error on
    torch's side).
    """

    torch = pytest.importorskip("torch")

    def _torch_tables(self):
        import torch

        betas = torch.linspace(1e-4, 2e-2, 1000)
        alphas = 1.0 - betas
        acp = torch.cumprod(alphas, dim=0)
        return {
            "betas": betas.numpy(),
            "alphas": alphas.numpy(),
            "alphas_cumprod": acp.numpy(),
            "sqrt_alphas_cumprod": torch.sqrt(acp).numpy(),
            "sqrt_one_minus_alphas_cumprod": torch.sqrt(1.0 - acp).numpy(),
        }

    def test_ulp_agreement(self):
        ours = make_schedule(1000)
        theirs = self._torch_tables()
        for name, limit in [
            ("betas", 1),
            ("alphas", 1),
            ("alphas_cumprod", 8),
            ("sqrt_alphas_cumprod", 8),
        ]:
            got = np.asarray(getattr(ours, name))
            ulps = _ulp_distance(got, theirs[name])
            assert ulps.max() <= limit, (
                f"{name}: max ulp distance {ulps.max()} > {limit}"
            )

    def test_sqrt_one_minus_relative(self):
        """torch computes sqrt(1 - acp) after an f32 cancellation near t=0
        (acp ~ 0.9999), costing it ~1e-4 relative accuracy there. Our f64
        table cannot (and should not) reproduce that error bit-for-bit, so
        this table is held to torch's own accuracy envelope instead."""
        ours = np.asarray(make_schedule(1000).sqrt_one_minus_alphas_cumprod)
        theirs = self._torch_tables()["sqrt_one_minus_alphas_cumprod"]
        np.testing.assert_allclose(ours, theirs, rtol=2e-4)


class TestCosineSchedule:
    def test_shape_and_range(self):
        s = make_schedule(1000, kind="cosine")
        b = np.asarray(s.betas)
        assert b.shape == (1000,)
        assert np.all(b > 0) and np.all(b <= 0.999)

    def test_unknown_kind(self):
        with pytest.raises(ValueError):
            make_schedule(10, kind="nope")


class TestSqrtSchedule:
    """Diffusion-LM sqrt schedule (Li et al. 2022 §4.1; core/schedule.py
    sqrt_beta_schedule — a text-specific lever absent from the reference)."""

    def test_alpha_bar_closed_form(self):
        from tinydiffusionmodels_tpu.core.schedule import sqrt_beta_schedule

        T = 1000
        betas = sqrt_beta_schedule(T)
        acp = np.cumprod(1.0 - betas)
        t = np.arange(1, T + 1, dtype=np.float64)
        # Normalized by alpha_bar(0) = 1 - sqrt(s), the same convention the
        # cosine schedule uses (cumprod of betas telescopes the ratio).
        # The final step clips at beta=0.999 (alpha_bar(T) = 1-sqrt(1+s)
        # is slightly negative by construction), so check the unclipped
        # prefix only.
        expected = (1.0 - np.sqrt(t / T + 1e-4)) / (1.0 - np.sqrt(1e-4))
        n = int(np.sum(betas < 0.999))
        assert n >= T - 1
        np.testing.assert_allclose(acp[:n], expected[:n], rtol=1e-10,
                                   atol=1e-12)

    def test_valid_beta_range_and_noisier_early(self):
        from tinydiffusionmodels_tpu.core.schedule import sqrt_beta_schedule

        betas = sqrt_beta_schedule(1000)
        lin = linear_beta_schedule(1000)
        assert betas.shape == (1000,)
        assert np.all(betas > 0) and np.all(betas <= 0.999)
        # The design point: much more noise at small t than linear.
        assert np.cumprod(1 - betas)[:100].min() < np.cumprod(1 - lin)[:100].min()

    def test_make_schedule_kind(self):
        s = make_schedule(100, kind="sqrt")
        acp = np.asarray(s.alphas_cumprod, np.float64)
        expected0 = (1.0 - np.sqrt(1 / 100 + 1e-4)) / (1.0 - np.sqrt(1e-4))
        np.testing.assert_allclose(acp[0], expected0, rtol=1e-6)
        assert np.all(np.diff(acp) < 0)
