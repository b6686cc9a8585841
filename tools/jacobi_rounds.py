#!/usr/bin/env python3
"""Count Jacobi verification rounds for guided_generate_verified.

VERDICT r4 item 3 asked whether draft-refinement rounds drop to ~1 on a
TRAINED (peaked-logit) base LM vs the random weights bench.py uses. The
Jacobi rewrite made rounds cheap (one parallel teacher-forced forward
each, sample/guided.py:300-318) and routed large batches to the plain
scan — but the round count still sets the bs<=8 fused path's verify
overhead, so this tool measures it: same CLI config as the hermetic
guided sampler (shakespeare.py TinyGPT fallback; char tokenizer), random
vs 3-epoch-trained params, fused and scan_bf16 drafts, bs in {8, 256}.

Usage: python tools/jacobi_rounds.py   (run solo on the TPU)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from tinydiffusionmodels_tpu import runtime

runtime.enable_compile_cache()

from tinydiffusionmodels_tpu.data.loader import tokenize_corpus
from tinydiffusionmodels_tpu.data.shakespeare import load_text_corpus
from tinydiffusionmodels_tpu.data.tokenizer import CharTokenizer
from tinydiffusionmodels_tpu.models import init_tiny_gpt, tiny_gpt_apply
from tinydiffusionmodels_tpu.models.ar_lm import TinyGPTConfig
from tinydiffusionmodels_tpu.ops.decode_kernel import fused_guided_decode
from tinydiffusionmodels_tpu.sample.guided import _scan_bf16_draft, mix_logits
from tinydiffusionmodels_tpu.train.lm_train import train_lm

SEQ_LEN = 64
ALPHA = 0.3


def count_rounds(params, cfg, tokens0, diff, *, max_rounds=SEQ_LEN + 1):
    """Python replica of guided.py's Jacobi loop, counting verify calls.

    rounds = number of verify forwards until tokens stop changing; the
    production while_loop runs the same iteration (guided.py:310-318)."""
    b = diff.shape[0]

    @jax.jit
    def verify(tokens):
        ids_in = jnp.concatenate(
            [jnp.full((b, 1), 1, jnp.int32), tokens[:, :-1]], axis=1
        )
        ar_all = tiny_gpt_apply(params, ids_in, cfg)
        return jnp.argmax(
            mix_logits(ar_all, diff, ALPHA), axis=-1
        ).astype(jnp.int32)

    tokens = tokens0
    for r in range(1, max_rounds + 1):
        nxt = verify(tokens)
        if bool(jnp.all(nxt == tokens)):
            return r, tokens
        tokens = nxt
    return max_rounds, tokens


def main() -> None:
    corpus, _src = load_text_corpus()
    tokenizer = CharTokenizer(corpus)
    vocab = tokenizer.vocab_size
    cfg = TinyGPTConfig(vocab_size=vocab, dim=256, n_heads=4, depth=4,
                        max_len=SEQ_LEN + 1)

    key = jax.random.PRNGKey(0)
    random_params = init_tiny_gpt(key, cfg)
    chunks, _ = tokenize_corpus(corpus, tokenizer, SEQ_LEN + 1, 0.0)
    trained_params = train_lm(chunks, cfg, epochs=3, seed=0)

    print(f"# Jacobi verify rounds — vocab={vocab} dim=256 depth=4 "
          f"L={SEQ_LEN} alpha={ALPHA}, diff ~ N(0,1) (bench distribution)")
    for label, params in (("random", random_params),
                          ("trained", trained_params)):
        for b in (8, 256):
            diff = jax.random.normal(jax.random.PRNGKey(7),
                                     (b, SEQ_LEN, vocab))
            fused0 = fused_guided_decode(params, cfg, diff, 1, alpha=ALPHA)
            r_fused, _ = count_rounds(params, cfg, fused0, diff)
            p16 = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
            scan0 = _scan_bf16_draft(
                p16, cfg, diff.astype(jnp.bfloat16), 1,
                alpha=ALPHA, temperature=1.0, normalize=False)
            r_scan, _ = count_rounds(params, cfg, scan0, diff)
            print(f"params={label:7s} bs={b:3d} "
                  f"rounds: fused_draft={r_fused} scan_bf16_draft={r_scan}")


if __name__ == "__main__":
    main()
