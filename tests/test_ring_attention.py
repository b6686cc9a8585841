"""Ring attention vs single-device full attention on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinydiffusionmodels_tpu.ops import xla_ref
from tinydiffusionmodels_tpu.parallel import make_mesh
from tinydiffusionmodels_tpu.parallel.ring_attention import ring_attention


class TestRingAttention:
    @pytest.mark.parametrize("l", [128, 256])
    def test_matches_full_attention(self, eight_devices, l):
        mesh = make_mesh()
        key = jax.random.PRNGKey(0)
        shape = (2, 4, l, 32)
        q = jax.random.normal(key, shape)
        k = jax.random.normal(jax.random.fold_in(key, 1), shape)
        v = jax.random.normal(jax.random.fold_in(key, 2), shape)
        ref = xla_ref.attention(q, k, v)
        out = ring_attention(q, k, v, mesh)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    @pytest.mark.parametrize("l", [128, 256])
    def test_bidirectional_matches_full(self, eight_devices, l):
        mesh = make_mesh()
        key = jax.random.PRNGKey(3)
        shape = (1, 2, l, 32)
        q = jax.random.normal(key, shape)
        k = jax.random.normal(jax.random.fold_in(key, 1), shape)
        v = jax.random.normal(jax.random.fold_in(key, 2), shape)
        ref = xla_ref.attention(q, k, v)
        out = ring_attention(q, k, v, mesh, bidirectional=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_bidirectional_needs_even_shard(self, eight_devices):
        mesh = make_mesh()
        q = jnp.zeros((1, 1, 8, 16))  # 1 row per device -> odd shard
        with pytest.raises(ValueError):
            ring_attention(q, q, q, mesh, bidirectional=True)

    def test_output_stays_sequence_sharded(self, eight_devices):
        from jax.sharding import PartitionSpec as P

        mesh = make_mesh()
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 64, 16))
        out = ring_attention(q, q, q, mesh)
        assert out.sharding.spec == P(None, None, "data", None)

    def test_rejects_indivisible_length(self, eight_devices):
        mesh = make_mesh()
        q = jnp.zeros((1, 1, 100, 16))
        with pytest.raises(ValueError):
            ring_attention(q, q, q, mesh)

    def test_jittable(self, eight_devices):
        mesh = make_mesh()
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 64, 16))
        fn = jax.jit(lambda a: ring_attention(a, a, a, mesh))
        ref = xla_ref.attention(q, q, q)
        np.testing.assert_allclose(
            np.asarray(fn(q)), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_dropout_without_key_raises(self, eight_devices):
        # ADVICE r2: the shard_map wrapper substitutes a dummy key, which
        # must never silently stand in for a real dropout key.
        mesh = make_mesh()
        q = jnp.zeros((1, 1, 64, 16))
        with pytest.raises(ValueError, match="dropout_key"):
            ring_attention(q, q, q, mesh, dropout_rate=0.5)


class TestRingFlashBlock:
    """Ring x flash composition: each ring step's block compute through the
    lse-carrying Pallas kernel (VERDICT r2 item 4). Numerics must match the
    einsum ring / full attention; grads must flow."""

    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_full_attention(self, eight_devices, causal):
        mesh = make_mesh()
        key = jax.random.PRNGKey(0)
        shape = (2, 2, 128, 32)
        q = jax.random.normal(key, shape)
        k = jax.random.normal(jax.random.fold_in(key, 1), shape)
        v = jax.random.normal(jax.random.fold_in(key, 2), shape)
        if causal:
            mask = jnp.tril(jnp.ones((128, 128), bool))
            ref = xla_ref.attention(q, k, v, mask=mask)
        else:
            ref = xla_ref.attention(q, k, v)
        out = ring_attention(q, k, v, mesh, causal=causal,
                             block_impl="flash")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_matches_einsum_ring_bidirectional(self, eight_devices):
        mesh = make_mesh()
        key = jax.random.PRNGKey(3)
        shape = (1, 2, 128, 32)
        q = jax.random.normal(key, shape)
        k = jax.random.normal(jax.random.fold_in(key, 1), shape)
        v = jax.random.normal(jax.random.fold_in(key, 2), shape)
        ein = ring_attention(q, k, v, mesh, bidirectional=True)
        fl = ring_attention(q, k, v, mesh, bidirectional=True,
                            block_impl="flash")
        np.testing.assert_allclose(
            np.asarray(fl), np.asarray(ein), rtol=2e-5, atol=2e-5
        )

    def test_grads_match_einsum_ring(self, eight_devices):
        mesh = make_mesh()
        key = jax.random.PRNGKey(4)
        shape = (1, 2, 64, 16)
        q = jax.random.normal(key, shape)
        k = jax.random.normal(jax.random.fold_in(key, 1), shape)
        v = jax.random.normal(jax.random.fold_in(key, 2), shape)

        def loss(impl):
            return lambda q, k, v: jnp.sum(
                ring_attention(q, k, v, mesh, causal=True,
                               block_impl=impl) ** 2
            )

        g_e = jax.grad(loss("einsum"), argnums=(0, 1, 2))(q, k, v)
        g_f = jax.grad(loss("flash"), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_f, g_e):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
            )

    def test_dropout_runs_and_differs_by_key(self, eight_devices):
        mesh = make_mesh()
        key = jax.random.PRNGKey(5)
        q = jax.random.normal(key, (1, 2, 64, 16))
        a = ring_attention(q, q, q, mesh, dropout_rate=0.3,
                           dropout_key=jax.random.PRNGKey(1),
                           block_impl="flash")
        b = ring_attention(q, q, q, mesh, dropout_rate=0.3,
                           dropout_key=jax.random.PRNGKey(1),
                           block_impl="flash")
        c = ring_attention(q, q, q, mesh, dropout_rate=0.3,
                           dropout_key=jax.random.PRNGKey(2),
                           block_impl="flash")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not np.allclose(np.asarray(a), np.asarray(c))
        assert np.all(np.isfinite(np.asarray(a)))

    def test_rejects_unknown_impl(self, eight_devices):
        mesh = make_mesh()
        q = jnp.zeros((1, 1, 64, 16))
        with pytest.raises(ValueError, match="block_impl"):
            ring_attention(q, q, q, mesh, block_impl="nope")
