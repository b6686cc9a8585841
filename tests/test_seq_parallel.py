"""Sequence-parallel ring attention as a training component.

VERDICT round-1 item 5: ring attention must be callable inside jit on
sharded operands, causal-capable, routable behind ops.attention, and proven
loss-equivalent to the single-device path in a real training step on the
8-device virtual mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tinydiffusionmodels_tpu import ops
from tinydiffusionmodels_tpu.core import make_schedule
from tinydiffusionmodels_tpu.models import (
    init_learned_embedding,
    init_learned_rounding,
    init_tiny_transformer,
    tiny_transformer_apply,
)
from tinydiffusionmodels_tpu.models.transformer import TransformerConfig
from tinydiffusionmodels_tpu.ops import xla_ref
from tinydiffusionmodels_tpu.parallel import make_mesh, ring_attention
from tinydiffusionmodels_tpu.train.state import TrainState
from tinydiffusionmodels_tpu.train.text_train import (
    make_text_train_step_multi,
)


def _qkv(key, shape):
    return (
        jax.random.normal(key, shape),
        jax.random.normal(jax.random.fold_in(key, 1), shape),
        jax.random.normal(jax.random.fold_in(key, 2), shape),
    )


class TestCausalRing:
    @pytest.mark.parametrize("bidirectional", [False, True])
    def test_causal_matches_masked_full(self, eight_devices, bidirectional):
        mesh = make_mesh()
        l = 128
        q, k, v = _qkv(jax.random.PRNGKey(0), (2, 2, l, 16))
        mask = jnp.tril(jnp.ones((l, l), dtype=bool))
        ref = xla_ref.attention(q, k, v, mask=mask)
        out = ring_attention(
            q, k, v, mesh, causal=True, bidirectional=bidirectional
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_causal_jittable_on_sharded_operands(self, eight_devices):
        """The component contract: no internal device_put; composes under
        jit with inputs already sequence-sharded."""
        mesh = make_mesh()
        q, k, v = _qkv(jax.random.PRNGKey(1), (1, 2, 64, 16))
        shard = NamedSharding(mesh, P(None, None, "data", None))
        qs, ks, vs = (jax.device_put(a, shard) for a in (q, k, v))
        fn = jax.jit(lambda a, b, c: ring_attention(a, b, c, mesh, causal=True))
        mask = jnp.tril(jnp.ones((64, 64), dtype=bool))
        ref = xla_ref.attention(q, k, v, mask=mask)
        np.testing.assert_allclose(
            np.asarray(fn(qs, ks, vs)), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("bidirectional", [False, True])
    def test_kv_chunking_matches_unchunked(self, eight_devices, causal,
                                           bidirectional):
        """kv_chunk bounds the score buffer to (B,H,Lq,chunk) per ring step
        (the flash memory property) without changing the math."""
        mesh = make_mesh()
        l = 128  # 16 keys per device -> chunk 4 gives 4 sub-blocks
        q, k, v = _qkv(jax.random.PRNGKey(6), (1, 2, l, 16))
        full = ring_attention(
            q, k, v, mesh, causal=causal, bidirectional=bidirectional
        )
        chunked = ring_attention(
            q, k, v, mesh, causal=causal, bidirectional=bidirectional,
            kv_chunk=4,
        )
        np.testing.assert_allclose(
            np.asarray(chunked), np.asarray(full), rtol=2e-5, atol=2e-5
        )

    def test_kv_chunk_gradients_match(self, eight_devices):
        """The chunked online-softmax (fori over sub-blocks) is
        differentiable and grad-identical to the unchunked ring."""
        mesh = make_mesh()
        q, k, v = _qkv(jax.random.PRNGKey(7), (1, 2, 64, 16))

        def loss(qkv, kv_chunk):
            out = ring_attention(
                *qkv, mesh, causal=True, kv_chunk=kv_chunk
            )
            return jnp.sum(out * out)

        g_full = jax.grad(lambda t: loss(t, None))((q, k, v))
        g_chunk = jax.grad(lambda t: loss(t, 4))((q, k, v))
        for a, b in zip(g_chunk, g_full):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6
            )

    def test_kv_chunk_must_divide(self, eight_devices):
        mesh = make_mesh()
        q = jnp.zeros((1, 1, 128, 16))
        with pytest.raises(ValueError, match="divide"):
            ring_attention(q, q, q, mesh, kv_chunk=5)

    def test_dropout_runs_and_differs(self, eight_devices):
        mesh = make_mesh()
        q, k, v = _qkv(jax.random.PRNGKey(2), (1, 2, 64, 16))
        base = ring_attention(q, k, v, mesh)
        dropped = ring_attention(
            q, k, v, mesh, dropout_rate=0.5,
            dropout_key=jax.random.PRNGKey(9),
        )
        assert np.isfinite(np.asarray(dropped)).all()
        assert not np.allclose(np.asarray(base), np.asarray(dropped))

    def test_dropout_is_unbiased(self, eight_devices):
        """E[dropped weights] = weights: averaging many dropout draws of a
        single attention row converges to the undropped output."""
        mesh = make_mesh()
        q, k, v = _qkv(jax.random.PRNGKey(4), (1, 1, 32, 8))
        fn = jax.jit(
            lambda key: ring_attention(
                q, k, v, mesh, dropout_rate=0.3, dropout_key=key
            )
        )
        base = np.asarray(ring_attention(q, k, v, mesh))
        acc = np.zeros_like(base)
        n = 200
        for i in range(n):
            acc += np.asarray(fn(jax.random.PRNGKey(100 + i)))
        np.testing.assert_allclose(acc / n, base, atol=0.08)


class TestOpsRouting:
    def test_attention_routes_to_ring_when_seq_axis_set(self, eight_devices):
        mesh = make_mesh()
        ops.register_sequence_mesh(mesh, "data")
        q, k, v = _qkv(jax.random.PRNGKey(3), (2, 4, 64, 16))
        ref = xla_ref.attention(q, k, v)
        out = ops.attention(q, k, v, seq_axis="data")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_unregistered_axis_raises(self):
        q = jnp.zeros((1, 1, 8, 4))
        with pytest.raises(ValueError, match="no mesh"):
            ops.attention(q, q, q, seq_axis="nonexistent-axis")

    def test_mask_with_seq_axis_rejected(self, eight_devices):
        mesh = make_mesh()
        ops.register_sequence_mesh(mesh, "data")
        q = jnp.zeros((1, 1, 64, 4))
        mask = jnp.ones((64, 64), dtype=bool)
        with pytest.raises(NotImplementedError):
            ops.attention(q, q, q, mask=mask, seq_axis="data")

    def test_ring_kv_chunk_env_knob(self, eight_devices, monkeypatch):
        mesh = make_mesh()
        ops.register_sequence_mesh(mesh, "data")
        monkeypatch.setenv("TDM_RING_KV_CHUNK", "4")
        q, k, v = _qkv(jax.random.PRNGKey(8), (1, 2, 64, 16))
        out = ops.attention(q, k, v, seq_axis="data")
        ref = xla_ref.attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_transformer_forward_equivalent(self, eight_devices):
        """Same params, same input: seq-parallel transformer == single-chip
        transformer (deterministic)."""
        mesh = make_mesh()
        ops.register_sequence_mesh(mesh, "data")
        cfg = TransformerConfig(dim=32, n_heads=4, depth=2, ffn_dim=64,
                                timesteps=100)
        cfg_sp = TransformerConfig(dim=32, n_heads=4, depth=2, ffn_dim=64,
                                   timesteps=100, seq_axis="data")
        params = init_tiny_transformer(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 32))
        t = jnp.array([3, 7])
        ref = tiny_transformer_apply(params, x, t, cfg)
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "data", None)))
        out = tiny_transformer_apply(params, xs, t, cfg_sp)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


def _joint_setup():
    """Shared fixture data for the training-equivalence tests."""
    sched = make_schedule(10)
    vocab, dim, seq = 97, 32, 128
    base = dict(dim=dim, n_heads=4, depth=2, dropout=0.0, ffn_dim=64,
                timesteps=sched.timesteps)
    cfg = TransformerConfig(**base)
    cfg_sp = TransformerConfig(**base, seq_axis="data")
    key = jax.random.PRNGKey(0)
    joint = {
        "diffusion_model": init_tiny_transformer(key, cfg),
        "rounding_fn": init_learned_rounding(
            jax.random.fold_in(key, 1), dim, vocab
        ),
        "embedding_fn": init_learned_embedding(
            jax.random.fold_in(key, 2), vocab, dim
        ),
    }
    tokens = np.asarray(
        jax.random.randint(jax.random.PRNGKey(5), (3, 4, seq), 0, vocab)
    )
    return sched, cfg, cfg_sp, joint, tokens


class TestSeqParallelTraining:
    def test_gradients_equivalent(self, eight_devices):
        """Forward AND backward of one training step match the single-device
        path exactly (ring attention has a well-defined VJP through the
        collectives). dropout=0: attention-weight dropout uses a different
        per-block PRNG pattern on the ring by construction."""
        from tinydiffusionmodels_tpu.train.text_train import _losses

        mesh = make_mesh()
        ops.register_sequence_mesh(mesh, "data")
        sched, cfg, cfg_sp, joint, tokens = _joint_setup()
        t = jnp.array([1, 3, 5, 7])
        noise = jax.random.normal(jax.random.PRNGKey(9), (4, 128, 32))
        w = jnp.asarray(1.0)

        def loss(params, cfg_used, toks):
            total, _ = _losses(
                params, toks, t, noise, w, cfg=cfg_used, sched=sched,
                use_learned_embeddings=True, pretrained_matrix=None,
                deterministic=True, key=None,
            )
            return total

        batch = jnp.asarray(tokens[0])
        g_ref = jax.grad(loss)(joint, cfg, batch)
        shard = NamedSharding(mesh, P(None, "data"))
        g_sp = jax.grad(loss)(joint, cfg_sp, jax.device_put(batch, shard))
        for a, b in zip(
            jax.tree_util.tree_leaves(g_sp), jax.tree_util.tree_leaves(g_ref)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6
            )

    def test_train_loss_equivalence(self, eight_devices):
        """VERDICT item-5 done-when: a long-sequence text training run on
        the 8-device mesh (sequence sharded, ring attention) produces the
        same losses and parameters as the single-device path.

        SGD keeps the comparison well-conditioned — AdamW's early steps are
        ~lr*sign(grad), which amplifies O(1e-6) float differences on
        near-zero gradient coordinates to O(lr) param differences."""
        import optax

        mesh = make_mesh()
        ops.register_sequence_mesh(mesh, "data")
        sched, cfg, cfg_sp, joint, tokens = _joint_setup()
        tx = optax.sgd(1e-2)
        w = jnp.asarray(1.0)
        k_train = jax.random.PRNGKey(7)

        def run(cfg_used, put):
            state = TrainState.create(
                jax.tree_util.tree_map(jnp.copy, joint), tx
            )
            step = make_text_train_step_multi(
                sched, cfg_used, tx, use_learned_embeddings=True
            )
            state, losses = step(state, put(jnp.asarray(tokens)), w, k_train)
            return jax.device_get(state.params), np.asarray(losses)

        params_ref, losses_ref = run(cfg, lambda t: t)
        shard = NamedSharding(mesh, P(None, None, "data"))
        params_sp, losses_sp = run(
            cfg_sp, lambda t: jax.device_put(t, shard)
        )

        np.testing.assert_allclose(losses_sp, losses_ref, rtol=1e-4, atol=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(params_sp),
            jax.tree_util.tree_leaves(params_ref),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )


class TestDataSeqMesh:
    """Combined data x sequence mesh ({'data': 4, 'seq': 2}): batch sharded
    AND ring attention active — the realistic long-context deployment
    (VERDICT r3 item 5). Mirrors deployment/configs/tpu_v5e_8_dp4sp2.yaml
    and the __graft_entry__ dryrun stage."""

    def test_ring_attention_batch_sharded(self, eight_devices):
        """ring_attention on a dp x sp mesh shards the batch over 'data'
        (each (data,seq) submesh runs an independent ring on its batch
        shard) and still matches full causal attention."""
        mesh = make_mesh({"data": 4, "seq": 2})
        l = 64
        q, k, v = _qkv(jax.random.PRNGKey(20), (4, 2, l, 16))
        mask = jnp.tril(jnp.ones((l, l), dtype=bool))
        ref = xla_ref.attention(q, k, v, mask=mask)
        shard = NamedSharding(mesh, P("data", None, "seq", None))
        qs, ks, vs = (jax.device_put(a, shard) for a in (q, k, v))
        out = ring_attention(qs, ks, vs, mesh, axis="seq", causal=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )
        # The output keeps the dp x sp sharding (no silent all-gather).
        out_spec = out.sharding.spec
        assert out_spec[0] == "data" and out_spec[2] == "seq"

    def test_batch_not_divisible_raises(self, eight_devices):
        mesh = make_mesh({"data": 4, "seq": 2})
        q = jnp.zeros((3, 1, 64, 8))  # batch 3 on a 4-way data axis
        with pytest.raises(ValueError, match="batch 3"):
            ring_attention(q, q, q, mesh, axis="seq")

    def test_train_loss_equivalence_dp4_sp2(self, eight_devices):
        """One scanned train step on the {'data': 4, 'seq': 2} mesh (tokens
        sharded on BOTH axes via shard_stacked_batch) produces the same
        losses and parameters as the single-device path."""
        import optax

        from tinydiffusionmodels_tpu.parallel import shard_stacked_batch

        mesh = make_mesh({"data": 4, "seq": 2})
        ops.register_sequence_mesh(mesh, "seq")
        sched, cfg, _, joint, tokens = _joint_setup()
        cfg_dpsp = TransformerConfig(
            dim=cfg.dim, n_heads=cfg.n_heads, depth=cfg.depth,
            dropout=0.0, ffn_dim=cfg.ffn_dim, timesteps=cfg.timesteps,
            seq_axis="seq",
        )
        tx = optax.sgd(1e-2)
        w = jnp.asarray(1.0)
        k_train = jax.random.PRNGKey(7)

        def run(cfg_used, put):
            state = TrainState.create(
                jax.tree_util.tree_map(jnp.copy, joint), tx
            )
            step = make_text_train_step_multi(
                sched, cfg_used, tx, use_learned_embeddings=True
            )
            state, losses = step(state, put(jnp.asarray(tokens)), w, k_train)
            return jax.device_get(state.params), np.asarray(losses)

        params_ref, losses_ref = run(cfg, lambda t: t)
        params_sp, losses_sp = run(
            cfg_dpsp,
            lambda t: shard_stacked_batch(mesh, t, seq_axis="seq"),
        )

        np.testing.assert_allclose(losses_sp, losses_ref, rtol=1e-4, atol=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(params_sp),
            jax.tree_util.tree_leaves(params_ref),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )

    def test_dropout_masks_differ_across_batch_shards(self, eight_devices):
        """Each data-shard folds its axis index into the dropout key; with a
        batch of identical rows, different shards must drop differently
        (without the fold they would draw the SAME mask)."""
        mesh = make_mesh({"data": 4, "seq": 2})
        q1, k1, v1 = _qkv(jax.random.PRNGKey(21), (1, 2, 64, 16))
        rep = lambda a: jnp.broadcast_to(a, (4, *a.shape[1:]))
        shard = NamedSharding(mesh, P("data", None, "seq", None))
        qs, ks, vs = (jax.device_put(rep(a), shard) for a in (q1, k1, v1))
        out = np.asarray(ring_attention(
            qs, ks, vs, mesh, axis="seq", dropout_rate=0.5,
            dropout_key=jax.random.PRNGKey(3),
        ))
        assert not np.allclose(out[0], out[1])


class TestFlashRingBlock:
    """TDM_RING_BLOCK=flash: the ring's per-step block compute through the
    lse-carrying Pallas flash kernel (VERDICT r2 item 4), exercised through
    the ops routing and a full seq-parallel training gradient."""

    def test_routing_env_knob(self, eight_devices, monkeypatch):
        mesh = make_mesh()
        ops.register_sequence_mesh(mesh, "data")
        monkeypatch.setenv("TDM_RING_BLOCK", "flash")
        q, k, v = _qkv(jax.random.PRNGKey(11), (1, 2, 64, 16))
        out = ops.attention(q, k, v, seq_axis="data", causal=True)
        mask = jnp.tril(jnp.ones((64, 64), bool))
        ref = xla_ref.attention(q, k, v, mask=mask)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_training_gradients_equivalent(self, eight_devices, monkeypatch):
        """Same training-step gradients whether the ring blocks run through
        einsum or the flash kernel."""
        from tinydiffusionmodels_tpu.train.text_train import _losses

        mesh = make_mesh()
        ops.register_sequence_mesh(mesh, "data")
        sched, cfg, cfg_sp, joint, tokens = _joint_setup()
        t = jnp.array([1, 3, 5, 7])
        noise = jax.random.normal(jax.random.PRNGKey(9), (4, 128, 32))
        w = jnp.asarray(1.0)

        def loss(params, toks):
            total, _ = _losses(
                params, toks, t, noise, w, cfg=cfg_sp, sched=sched,
                use_learned_embeddings=True, pretrained_matrix=None,
                deterministic=True, key=None,
            )
            return total

        batch = jax.device_put(
            jnp.asarray(tokens[0]), NamedSharding(mesh, P(None, "data"))
        )
        g_einsum = jax.grad(loss)(joint, batch)
        monkeypatch.setenv("TDM_RING_BLOCK", "flash")
        jax.clear_caches()  # env knob is read at trace time
        g_flash = jax.grad(loss)(joint, batch)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_flash),
            jax.tree_util.tree_leaves(g_einsum),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6
            )
