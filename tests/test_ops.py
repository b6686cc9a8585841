"""Op backend tests: Pallas kernels diffed against the XLA references.

On the CPU test backend the kernels run in interpreter mode — same kernel
code, same semantics; the compiled Mosaic path is exercised on TPU by bench
and the TPU test job (TDM_TEST_BACKEND=tpu).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinydiffusionmodels_tpu.ops import registry, xla_ref
from tinydiffusionmodels_tpu.ops import pallas_kernels


class TestRegistry:
    def test_default_backend_off_tpu(self):
        registry.set_backend(None)
        assert registry.get_backend() in ("xla", "pallas", "auto")
        # Off-TPU, auto resolves every op to the XLA reference.
        import jax

        if jax.default_backend() != "tpu":
            assert registry._resolve("attention") == "xla"
            assert registry._resolve("fused_resblock") == "xla"

    def test_set_backend(self):
        registry.set_backend("pallas")
        assert registry.get_backend() == "pallas"
        registry.set_backend(None)

    def test_bad_backend(self):
        with pytest.raises(ValueError):
            registry.set_backend("cuda")

    def test_causal_flag_builds_tril_mask(self):
        """ops.attention(causal=True) == explicit tril mask on the
        single-chip path."""
        import jax.numpy as jnp

        from tinydiffusionmodels_tpu import ops
        from tinydiffusionmodels_tpu.ops import xla_ref

        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (2, 2, 16, 8))
        mask = jnp.tril(jnp.ones((16, 16), dtype=bool))
        np.testing.assert_allclose(
            np.asarray(ops.attention(q, q, q, causal=True)),
            np.asarray(xla_ref.attention(q, q, q, mask=mask)),
            rtol=1e-6, atol=1e-6,
        )


def _attn_tol():
    """Compiled Mosaic uses VPU transcendental approximations (exp in the
    softmax), costing ~1e-3 absolute vs XLA on TPU; the CPU interpreter is
    bit-faithful to the math."""
    if jax.default_backend() == "tpu":
        return dict(rtol=5e-3, atol=5e-3)
    return dict(rtol=2e-5, atol=2e-5)


def _grad_tol():
    """Gradients accumulate two bf16 MXU passes on TPU (~2% worst case,
    observed 0.03 abs on O(1) grads); the CPU interpreter is f32-exact."""
    if jax.default_backend() == "tpu":
        return dict(rtol=4e-2, atol=4e-2)
    return dict(rtol=2e-3, atol=2e-3)


class TestAttentionParity:
    @pytest.mark.parametrize("l,dh", [(64, 64), (128, 64), (16, 32)])
    def test_matches_xla(self, l, dh):
        key = jax.random.PRNGKey(0)
        shape = (2, 4, l, dh)
        q = jax.random.normal(key, shape)
        k = jax.random.normal(jax.random.fold_in(key, 1), shape)
        v = jax.random.normal(jax.random.fold_in(key, 2), shape)
        ref = xla_ref.attention(q, k, v)
        out = pallas_kernels.attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), **_attn_tol()
        )

    @pytest.mark.parametrize("l,causal", [(256, False), (256, True),
                                          (200, False), (512, True)])
    def test_flash_attention_matches_xla(self, l, causal):
        """Tiled flash kernel vs XLA reference, incl. non-multiple lengths
        and causal masking."""
        key = jax.random.PRNGKey(0)
        shape = (2, 2, l, 64)
        q = jax.random.normal(key, shape)
        k = jax.random.normal(jax.random.fold_in(key, 1), shape)
        v = jax.random.normal(jax.random.fold_in(key, 2), shape)
        mask = (
            jnp.tril(jnp.ones((l, l), bool))[None, None] if causal else None
        )
        ref = xla_ref.attention(q, k, v, mask=mask)
        out = pallas_kernels.flash_attention(q, k, v, causal=causal)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), **_attn_tol()
        )

    def test_spilled_footprint_routes_to_flash(self, monkeypatch):
        """Above the eval spill threshold the pallas attention routes to
        the tiled flash kernel (asserted by spying on it, not assumed —
        ADVICE r4) and still matches XLA."""
        calls = []
        real_flash = pallas_kernels.flash_attention

        def spy(*a, **kw):
            calls.append(1)
            return real_flash(*a, **kw)

        monkeypatch.setattr(pallas_kernels, "flash_attention", spy)
        # (1,2,320,32) scores are ~0.8 MB; force the spill route on it.
        monkeypatch.setattr(pallas_kernels, "EVAL_SPILL_BYTES", 512 * 1024)
        key = jax.random.PRNGKey(0)
        shape = (1, 2, 320, 32)
        q = jax.random.normal(key, shape)
        k = jax.random.normal(jax.random.fold_in(key, 1), shape)
        v = jax.random.normal(jax.random.fold_in(key, 2), shape)
        out = pallas_kernels.attention(q, k, v)
        assert calls, "flash_attention was never invoked"
        ref = xla_ref.attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), **_attn_tol()
        )

    def test_training_spilled_routes_to_flash(self, monkeypatch):
        """With dropout active, a score footprint above TRAIN_SPILL_BYTES
        takes the flash branch; below it the XLA branch is taken (the
        end-to-end routing decision — round-5 mid-L production A/B,
        docs/docs/assets/r5/layout_ab_midL_bf16.txt — pinned by spying on
        flash_attention)."""
        calls = []
        real_flash = pallas_kernels.flash_attention

        def spy(*a, **kw):
            calls.append(1)
            return real_flash(*a, **kw)

        monkeypatch.setattr(pallas_kernels, "flash_attention", spy)
        # (1,2,320,32) scores are ~0.8 MB; force the training spill on it.
        monkeypatch.setattr(pallas_kernels, "TRAIN_SPILL_BYTES", 512 * 1024)
        key = jax.random.PRNGKey(3)
        shape = (1, 2, 320, 32)
        q = jax.random.normal(key, shape)
        k = jax.random.normal(jax.random.fold_in(key, 1), shape)
        v = jax.random.normal(jax.random.fold_in(key, 2), shape)
        out = pallas_kernels.attention(
            q, k, v, dropout_rate=0.5, dropout_key=jax.random.PRNGKey(7)
        )
        assert calls, "flash_attention was never invoked"
        assert np.isfinite(np.asarray(out)).all()
        # Below the threshold the XLA branch is taken instead.
        calls.clear()
        monkeypatch.setattr(
            pallas_kernels, "TRAIN_SPILL_BYTES", 192 * 1024 * 1024
        )
        pallas_kernels.attention(
            q, k, v, dropout_rate=0.5, dropout_key=jax.random.PRNGKey(7)
        )
        assert not calls

    def test_masked_falls_back(self):
        """Masked attention routes to the XLA reference (exactness)."""
        shape = (1, 2, 8, 16)
        q = jax.random.normal(jax.random.PRNGKey(0), shape)
        mask = jnp.tril(jnp.ones((8, 8), bool))[None, None]
        out = pallas_kernels.attention(q, q, q, mask=mask)
        ref = xla_ref.attention(q, q, q, mask=mask)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestAttentionLayoutBLHD:
    """The copy-free (B, L, H, Dh) layout must be semantics-identical to
    the transposed (B, H, L, Dh) path — including dropout masks, which are
    drawn in (B, H, Lq, Lk) in both layouts for the same key."""

    def _qkv(self, b=2, l=8, h=4, dh=16):
        key = jax.random.PRNGKey(0)
        return tuple(
            jax.random.normal(jax.random.fold_in(key, i), (b, l, h, dh))
            for i in range(3)
        )

    @staticmethod
    def _t(a):  # blhd <-> bhld
        return a.transpose(0, 2, 1, 3)

    def test_xla_eval_exact(self):
        q, k, v = self._qkv()
        ref = xla_ref.attention(self._t(q), self._t(k), self._t(v))
        out = xla_ref.attention(q, k, v, layout="blhd")
        np.testing.assert_allclose(
            np.asarray(self._t(out)), np.asarray(ref), rtol=1e-6, atol=1e-6
        )

    def test_xla_dropout_same_mask(self):
        q, k, v = self._qkv()
        dk = jax.random.PRNGKey(7)
        ref = xla_ref.attention(
            self._t(q), self._t(k), self._t(v),
            dropout_rate=0.4, dropout_key=dk,
        )
        out = xla_ref.attention(
            q, k, v, layout="blhd", dropout_rate=0.4, dropout_key=dk
        )
        np.testing.assert_allclose(
            np.asarray(self._t(out)), np.asarray(ref), rtol=1e-6, atol=1e-6
        )

    def test_xla_masked(self):
        q, k, v = self._qkv()
        mask = jnp.tril(jnp.ones((8, 8), bool))[None, None]
        ref = xla_ref.attention(self._t(q), self._t(k), self._t(v), mask=mask)
        out = xla_ref.attention(q, k, v, layout="blhd", mask=mask)
        np.testing.assert_allclose(
            np.asarray(self._t(out)), np.asarray(ref), rtol=1e-6, atol=1e-6
        )

    def test_registry_causal_blhd(self):
        """causal=True must build the tril mask from the L axis (axis 1 in
        blhd), not the head axis."""
        q, k, v = self._qkv(b=1, l=8, h=2, dh=16)
        out = registry.attention(q, k, v, causal=True, layout="blhd")
        ref = registry.attention(
            self._t(q), self._t(k), self._t(v), causal=True
        )
        np.testing.assert_allclose(
            np.asarray(self._t(out)), np.asarray(ref), rtol=1e-6, atol=1e-6
        )

    def test_pallas_flash_route_blhd(self, monkeypatch):
        """Above the score-footprint threshold the blhd path transposes
        into the flash kernel and back; results must match the bhld route.
        The threshold is patched down so both calls actually take the
        flash branch (spied — ADVICE r4: the old shape routed to XLA on
        both sides and the transpose branch had zero coverage)."""
        calls = []
        real_flash = pallas_kernels.flash_attention

        def spy(*a, **kw):
            calls.append(1)
            return real_flash(*a, **kw)

        monkeypatch.setattr(pallas_kernels, "flash_attention", spy)
        monkeypatch.setattr(pallas_kernels, "EVAL_SPILL_BYTES", 512 * 1024)
        key = jax.random.PRNGKey(1)
        b, l, h, dh = 1, 320, 2, 32
        q, k, v = (
            jax.random.normal(jax.random.fold_in(key, i), (b, l, h, dh))
            for i in range(3)
        )
        out = pallas_kernels.attention(q, k, v, layout="blhd")
        ref = pallas_kernels.attention(self._t(q), self._t(k), self._t(v))
        assert len(calls) == 2, "both routes must invoke flash_attention"
        np.testing.assert_allclose(
            np.asarray(self._t(out)), np.asarray(ref), **_attn_tol()
        )

    def test_grads_match_layouts(self):
        q, k, v = self._qkv()

        def loss_blhd(q, k, v):
            return xla_ref.attention(q, k, v, layout="blhd").sum()

        def loss_bhld(q, k, v):
            return xla_ref.attention(
                self._t(q), self._t(k), self._t(v)
            ).sum()

        g_new = jax.grad(loss_blhd, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_bhld, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g_new, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-6
            )

    def test_ring_rejects_blhd(self):
        q, k, v = self._qkv(b=1, l=8, h=2, dh=16)
        with pytest.raises(NotImplementedError):
            registry.attention(q, k, v, seq_axis="seq", layout="blhd")


class TestResblockParity:
    def _params(self, key, cin, cout):
        from tinydiffusionmodels_tpu.models.torch_init import conv_params

        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "conv1": conv_params(k1, 3, 3, cin, cout),
            "conv2": conv_params(k2, 3, 3, cout, cout),
            "skip": conv_params(k3, 1, 1, cin, cout) if cin != cout else None,
        }

    @pytest.mark.parametrize("cin,cout,hw", [(1, 32, 28), (32, 64, 14),
                                             (64, 64, 14), (96, 32, 28)])
    def test_matches_xla(self, cin, cout, hw):
        """All four UNet block shapes (reference src/mnist.py:68-74)."""
        key = jax.random.PRNGKey(0)
        p = self._params(key, cin, cout)
        x = jax.random.normal(jax.random.fold_in(key, 1), (2, hw, hw, cin))
        tb = jax.random.normal(jax.random.fold_in(key, 2), (2, 1, 1, cout))
        ref = xla_ref.fused_resblock(x, p, tb)
        out = pallas_kernels.fused_resblock(x, p, tb)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_gradients_flow_through_pallas_ops(self):
        """custom VJP: grads through the pallas kernels match grads through
        the XLA reference (training with TDM_KERNELS=pallas works)."""
        key = jax.random.PRNGKey(0)
        p = self._params(key, 1, 32)
        x = jax.random.normal(jax.random.fold_in(key, 1), (2, 28, 28, 1))
        tb = jax.random.normal(jax.random.fold_in(key, 2), (2, 1, 1, 32))

        def loss_pallas(x):
            return jnp.sum(pallas_kernels.fused_resblock(x, p, tb) ** 2)

        def loss_xla(x):
            return jnp.sum(xla_ref.fused_resblock(x, p, tb) ** 2)

        gp = jax.grad(loss_pallas)(x)
        gx = jax.grad(loss_xla)(x)
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), **_grad_tol()
        )

        # Attention grads too (single-block and flash paths).
        q = jax.random.normal(key, (1, 2, 64, 32))
        ga = jax.grad(lambda q: jnp.sum(pallas_kernels.attention(q, q, q)))(q)
        gr = jax.grad(lambda q: jnp.sum(xla_ref.attention(q, q, q)))(q)
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gr), **_grad_tol()
        )
        qq = jax.random.normal(key, (1, 1, 256, 32))
        gf = jax.grad(
            lambda q: jnp.sum(pallas_kernels.flash_attention(q, q, q))
        )(qq)
        gr2 = jax.grad(lambda q: jnp.sum(xla_ref.attention(q, q, q)))(qq)
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr2), **_grad_tol()
        )

    def test_unet_train_step_with_pallas_backend(self):
        """A full UNet train step (value_and_grad + optimizer) under the
        forced pallas backend produces a finite loss."""
        from tinydiffusionmodels_tpu.core import make_schedule
        from tinydiffusionmodels_tpu.models import init_unet
        from tinydiffusionmodels_tpu.train.mnist_train import make_train_step
        from tinydiffusionmodels_tpu.train.optim import adamw
        from tinydiffusionmodels_tpu.train.state import TrainState

        registry.set_backend("pallas")
        try:
            sched = make_schedule(50)
            tx = adamw(1e-3)
            state = TrainState.create(init_unet(jax.random.PRNGKey(0)), tx)
            step = make_train_step(sched, tx)
            batch = jax.random.normal(jax.random.PRNGKey(1), (4, 28, 28, 1))
            state, loss = step(state, batch, jax.random.PRNGKey(2))
            assert np.isfinite(float(loss))
        finally:
            registry.set_backend(None)

    def test_unet_forward_with_pallas_backend(self):
        """Whole UNet under the pallas registry backend == xla backend."""
        from tinydiffusionmodels_tpu.models import init_unet, unet_apply

        params = init_unet(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 1))
        t = jnp.array([10, 500])
        registry.set_backend("xla")
        try:
            ref = unet_apply(params, x, t)
        finally:
            registry.set_backend(None)
        registry.set_backend("pallas")
        try:
            out = unet_apply(params, x, t)
        finally:
            registry.set_backend(None)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )


class TestPallasBackwardKernels:
    """The custom VJPs are real Pallas kernels (no XLA-recompute fallback):
    single-block recompute backward, and flash dq/dkv kernels driven by the
    saved logsumexp — O(L) memory with no (L, L) materialization."""

    def _qkv(self, l, dh=32, b=1, h=2):
        key = jax.random.PRNGKey(7)
        q = jax.random.normal(key, (b, h, l, dh))
        k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, l, dh))
        v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, l, dh))
        return q, k, v

    def _grads(self, fn, q, k, v):
        # cotangent that is not all-ones, to catch transposition bugs
        w = jnp.cos(jnp.arange(q.size, dtype=jnp.float32)).reshape(q.shape)
        return jax.grad(
            lambda q, k, v: jnp.sum(fn(q, k, v) * w), argnums=(0, 1, 2)
        )(q, k, v)

    def test_single_block_bwd_distinct_qkv(self):
        q, k, v = self._qkv(64)
        gp = self._grads(pallas_kernels._attention_diffable, q, k, v)
        gx = self._grads(xla_ref.attention, q, k, v)
        for a, b_ in zip(gp, gx):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), **_grad_tol()
            )

    @pytest.mark.parametrize("l,causal", [(256, False), (256, True),
                                          (200, False), (200, True)])
    def test_flash_bwd_matches_xla(self, l, causal):
        """Flash dq/dkv kernels vs XLA-autodiff reference, incl. padded
        (non-block-multiple) lengths and the causal triangle."""
        q, k, v = self._qkv(l)
        mask = (
            jnp.tril(jnp.ones((l, l), bool))[None, None] if causal else None
        )
        gp = self._grads(
            lambda q, k, v: pallas_kernels.flash_attention(
                q, k, v, causal=causal
            ),
            q, k, v,
        )
        gx = self._grads(
            lambda q, k, v: xla_ref.attention(q, k, v, mask=mask), q, k, v
        )
        for name, a, b_ in zip(("dq", "dk", "dv"), gp, gx):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), **_grad_tol(),
                err_msg=f"{name} mismatch (l={l}, causal={causal})",
            )

    def test_flash_bwd_small_length(self):
        """L=64 below one block: the sampler/training shape."""
        q, k, v = self._qkv(64)
        gp = self._grads(pallas_kernels.flash_attention, q, k, v)
        gx = self._grads(xla_ref.attention, q, k, v)
        for a, b_ in zip(gp, gx):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), **_grad_tol()
            )
