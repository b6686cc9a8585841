"""Diffusion-LM anchor term (--anchor_ce): rounding CE on the PREDICTED x0.

Li et al. 2022 ("Diffusion-LM Improves Controllable Text Generation")
fold the rounding CE evaluated on the model output into the training
objective so the denoiser is pulled toward *decodable* embeddings; the
plain rounding CE (reference /root/reference/src/shakespeare.py:224-243)
only teaches the head to decode clean embeddings. Framework extension —
train-only (samplers are unchanged).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinydiffusionmodels_tpu.core import make_schedule
from tinydiffusionmodels_tpu.models import (
    init_learned_embedding,
    init_learned_rounding,
    init_tiny_transformer,
)
from tinydiffusionmodels_tpu.models.transformer import TransformerConfig
from tinydiffusionmodels_tpu.train.optim import adamw
from tinydiffusionmodels_tpu.train.state import TrainState
from tinydiffusionmodels_tpu.train.text_train import (
    _checkpoint_dict,
    make_text_eval_step,
    make_text_train_step,
)

CFG = TransformerConfig(dim=32, depth=1, ffn_dim=64, timesteps=50)


@pytest.fixture(scope="module")
def sched():
    return make_schedule(50)


def _joint_params(key, cfg=CFG, vocab=30):
    return {
        "diffusion_model": init_tiny_transformer(key, cfg),
        "rounding_fn": init_learned_rounding(
            jax.random.fold_in(key, 1), cfg.dim, vocab
        ),
        "embedding_fn": init_learned_embedding(
            jax.random.fold_in(key, 2), vocab, cfg.dim
        ),
    }


class TestAnchorCE:
    def test_zero_weight_is_default_path(self, sched):
        """anchor_ce=0.0 must be bit-identical to not passing it."""
        key = jax.random.PRNGKey(0)
        params = _joint_params(key)
        tokens = jax.random.randint(key, (4, 8), 0, 30)
        w = jnp.asarray(1.0)
        base = make_text_eval_step(
            sched, CFG, use_learned_embeddings=True, parameterization="x0",
        )
        zero = make_text_eval_step(
            sched, CFG, use_learned_embeddings=True, parameterization="x0",
            anchor_ce=0.0,
        )
        for a, b in zip(base(params, tokens, w, key),
                        zero(params, tokens, w, key)):
            assert float(a) == float(b)

    def test_anchor_adds_positive_term(self, sched):
        """Total grows by weight * CE(pred-x0); diff/round aux unchanged."""
        key = jax.random.PRNGKey(1)
        params = _joint_params(key)
        tokens = jax.random.randint(key, (4, 8), 0, 30)
        w = jnp.asarray(1.0)
        evs = {
            a: make_text_eval_step(
                sched, CFG, use_learned_embeddings=True,
                parameterization="x0", anchor_ce=a,
            )(params, tokens, w, key)
            for a in (0.0, 0.5, 1.0)
        }
        d0, r0, t0 = (float(x) for x in evs[0.0])
        for a in (0.5, 1.0):
            d, r, t = (float(x) for x in evs[a])
            # aux losses are anchor-free (allclose: the extra branch changes
            # XLA fusion order, shifting the reduction by a few ulps)
            np.testing.assert_allclose([d, r], [d0, r0], rtol=1e-6)
            assert t > t0
        # the anchor term scales linearly with its weight
        np.testing.assert_allclose(
            float(evs[1.0][2]) - t0, 2 * (float(evs[0.5][2]) - t0), rtol=1e-5
        )

    @pytest.mark.parametrize("parameterization", ["x0", "eps"])
    def test_grad_reaches_denoiser(self, sched, parameterization):
        """The anchor gradient must flow INTO the denoiser (that is its
        whole point; the plain rounding CE never touches it)."""
        from tinydiffusionmodels_tpu.train.text_train import _losses

        key = jax.random.PRNGKey(2)
        params = _joint_params(key)
        tokens = jax.random.randint(key, (4, 8), 0, 30)
        t = jnp.full((4,), 5)
        noise = jax.random.normal(key, (4, 8, CFG.dim))

        def loss(p, a):
            total, _ = _losses(
                p, tokens, t, noise, jnp.asarray(1.0), cfg=CFG, sched=sched,
                use_learned_embeddings=True, pretrained_matrix=None,
                deterministic=True, key=None,
                parameterization=parameterization, anchor_ce=a,
            )
            return total

        g0 = jax.grad(loss)(params, 0.0)["diffusion_model"]
        g1 = jax.grad(loss)(params, 1.0)["diffusion_model"]
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), g0, g1
        )
        assert max(jax.tree_util.tree_leaves(diffs)) > 0.0

    def test_training_decreases_loss(self, sched):
        key = jax.random.PRNGKey(3)
        params = _joint_params(key)
        tx = adamw(1e-3)
        step = make_text_train_step(
            sched, CFG, tx, use_learned_embeddings=True,
            parameterization="x0", anchor_ce=0.5,
        )
        state = TrainState.create(params, tx)
        tokens = jax.random.randint(jax.random.fold_in(key, 3), (8, 8), 0, 30)
        w = jnp.asarray(1.0)
        losses = []
        for i in range(30):
            state, (_, _, total) = step(
                state, tokens, w, jax.random.fold_in(key, 100 + i)
            )
            losses.append(float(total))
        assert np.all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    def test_checkpoint_provenance(self):
        params = _joint_params(jax.random.PRNGKey(4))
        with_anchor = _checkpoint_dict(
            params, epoch=1, use_learned_embeddings=True, anchor_ce=0.3
        )
        without = _checkpoint_dict(
            params, epoch=1, use_learned_embeddings=True
        )
        assert with_anchor["anchor_ce"] == 0.3
        assert "anchor_ce" not in without  # old key set preserved
