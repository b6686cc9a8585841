"""Model zoo: pytree parameters + pure apply functions.

Each model is (init_fn -> params pytree, apply_fn(params, ...) -> output).
No module objects, no hidden state: dropout takes an explicit rng +
deterministic flag, which is what makes the train/sample loops jittable and
shardable as whole functions.
"""

from tinydiffusionmodels_tpu.models.unet import init_unet, unet_apply
from tinydiffusionmodels_tpu.models.transformer import (
    init_tiny_transformer,
    tiny_transformer_apply,
)
from tinydiffusionmodels_tpu.models.embedding import (
    init_learned_embedding,
    embedding_apply,
    rms_normalize_rows,
    init_learned_rounding,
    rounding_apply,
)
from tinydiffusionmodels_tpu.models.ar_lm import (
    init_tiny_gpt,
    tiny_gpt_apply,
    tiny_gpt_init_cache,
    tiny_gpt_decode_step,
)

__all__ = [
    "init_unet",
    "unet_apply",
    "init_tiny_transformer",
    "tiny_transformer_apply",
    "init_learned_embedding",
    "embedding_apply",
    "rms_normalize_rows",
    "init_learned_rounding",
    "rounding_apply",
    "init_tiny_gpt",
    "tiny_gpt_apply",
    "tiny_gpt_init_cache",
    "tiny_gpt_decode_step",
]
