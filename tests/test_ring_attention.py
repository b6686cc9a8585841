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
