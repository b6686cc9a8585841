#!/usr/bin/env python3
"""Quantitative text-sampling fidelity for Shakespeare diffusion checkpoints.

The reference judges generated text only by eye
(/root/reference/src/shakespeare.py:355-415,429-470; SURVEY.md §4). This tool
makes guided/clamp/alpha claims regression-testable (VERDICT round-1 item 10):

- ``lm_perplexity``: token perplexity of generated samples under a TinyGPT
  base LM trained on the corpus (lower = more corpus-like). Reported next to
  ``corpus_perplexity`` (the same LM on held-out real text = the floor) and
  ``uniform_perplexity`` (= vocab size, the ceiling for noise).
- ``distinct_1`` / ``distinct_2``: unique unigram/bigram fraction across all
  samples (low values = mode collapse, the failure mode the reference's
  rounding-weight schedule exists to prevent, src/shakespeare.py:169-172).
- ``dup_8gram_rate``: fraction of 8-grams appearing in more than one sample
  (cross-sample copying indicator).

Statistical rigor (VERDICT r3 item 1a): ``--seeds K`` replicates the whole
generate+score protocol over K independent PRNG seeds and reports
mean ± stderr for every metric (keys ``<metric>`` = mean,
``<metric>_stderr``, ``<metric>_per_seed``). Single-seed point estimates on
this metric are volatile (ladder_r3.jsonl shows dup_8gram flipping 0.00→0.37
between adjacent configs); claims should quote the replicated form.

Usage:
  python tools/text_fidelity.py --ckpt text_ckpt.pth [--n 64] [--seeds 3]
         [--seq_len 64] [--mode pure|guided] [--alpha 0.3] [--clamp]
         [--sampler ancestral] [--temperature 1.0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def ngram_stats(token_seqs: list[np.ndarray]) -> dict:
    def distinct(n: int) -> float:
        grams = [
            tuple(seq[i:i + n])
            for seq in token_seqs for i in range(len(seq) - n + 1)
        ]
        return len(set(grams)) / max(1, len(grams))

    per_sample_8grams = [
        {tuple(seq[i:i + 8]) for i in range(len(seq) - 7)}
        for seq in token_seqs
    ]
    counts: dict = {}
    for grams in per_sample_8grams:
        for g in grams:
            counts[g] = counts.get(g, 0) + 1
    dup = sum(1 for c in counts.values() if c > 1) / max(1, len(counts))
    return {
        "distinct_1": round(distinct(1), 4),
        "distinct_2": round(distinct(2), 4),
        "dup_8gram_rate": round(dup, 4),
    }


def lm_perplexity(lm_params, lm_cfg, token_seqs: list[np.ndarray]) -> float:
    """Mean token perplexity of sequences under the TinyGPT base LM."""
    import jax
    import jax.numpy as jnp

    from tinydiffusionmodels_tpu.models.ar_lm import tiny_gpt_apply

    @jax.jit
    def nll(ids, n_real):
        # Fixed (max_len,) input so the jit compiles once; the mean masks
        # out the padded tail (positions >= n_real-1 predict padding).
        logits = tiny_gpt_apply(lm_params, ids[None, :-1], lm_cfg)[0]
        logp = jax.nn.log_softmax(logits, axis=-1)
        tgt = ids[1:]
        tok_nll = -jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
        valid = jnp.arange(tok_nll.shape[0]) < (n_real - 1)
        return jnp.sum(jnp.where(valid, tok_nll, 0.0)) / jnp.maximum(
            jnp.sum(valid), 1
        )

    max_len = lm_cfg.max_len
    nlls = []
    for seq in token_seqs:
        seq = np.asarray(seq[:max_len], dtype=np.int32)
        if len(seq) < 2:
            continue
        padded = np.zeros((max_len,), dtype=np.int32)
        padded[: len(seq)] = seq
        # n_real as an array, not a Python int — ints are baked into the
        # trace and would retrace per distinct length.
        nlls.append(float(nll(jnp.asarray(padded), jnp.asarray(len(seq)))))
    return float(np.exp(np.mean(nlls))) if nlls else float("nan")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", type=str, default="text_ckpt.pth")
    ap.add_argument("--lm_ckpt", type=str, default="lm_ckpt.pth")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--seq_len", type=int, default=64)
    ap.add_argument("--mode", choices=["pure", "guided"], default="pure")
    ap.add_argument("--alpha", type=float, default=0.3)
    ap.add_argument("--guidance_norm", action="store_true",
                    help="log-prob mixing (sample.guided.mix_logits)")
    ap.add_argument("--clamp", action="store_true")
    ap.add_argument("--sampler", type=str, default="ancestral")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--temperature", type=float, default=1.0,
                    help="ancestral sampling noise scale (pure mode); "
                         "errors with deterministic solvers (ddim/dpm++), "
                         "where it would silently no-op")
    ap.add_argument("--lm_epochs", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--seeds", type=int, default=1,
                    help="replicate generate+score over this many PRNG "
                         "seeds; metrics become mean with _stderr and "
                         "_per_seed companions (VERDICT r3 item 1a)")
    args = ap.parse_args()

    import jax

    from tinydiffusionmodels_tpu import runtime
    from tinydiffusionmodels_tpu.core import make_schedule
    from tinydiffusionmodels_tpu.core.rng import substream
    from tinydiffusionmodels_tpu.data.loader import tokenize_corpus
    from tinydiffusionmodels_tpu.data.shakespeare import load_text_corpus
    from tinydiffusionmodels_tpu.data.tokenizer import (
        CharTokenizer,
        tokenizer_from_state,
    )
    from tinydiffusionmodels_tpu.io import load_checkpoint, save_checkpoint
    from tinydiffusionmodels_tpu.io.checkpoint import (
        embedding_from_state_dict,
        rounding_from_state_dict,
        transformer_from_state_dict,
        tree_to_jax,
        tree_to_numpy,
    )
    from tinydiffusionmodels_tpu.models.ar_lm import TinyGPTConfig
    from tinydiffusionmodels_tpu.models.embedding import embedding_matrix
    from tinydiffusionmodels_tpu.models.transformer import TransformerConfig
    from tinydiffusionmodels_tpu.sample.text import sample_text
    from tinydiffusionmodels_tpu.train.lm_train import train_lm

    runtime.enable_compile_cache()
    sched = make_schedule()  # rebuilt below if the ckpt records a schedule

    corpus, _ = load_text_corpus()
    data_limit = int(os.environ.get("TDM_DATA_LIMIT", "0"))
    if data_limit:
        corpus = corpus[:data_limit]

    ckpt = load_checkpoint(args.ckpt)
    if not (isinstance(ckpt, dict) and "diffusion_model" in ckpt):
        raise SystemExit("text_fidelity needs a dict-format text checkpoint")
    tokenizer = (
        tokenizer_from_state(ckpt["tokenizer"])
        if "tokenizer" in ckpt else CharTokenizer(corpus)
    )
    diff_params = transformer_from_state_dict(ckpt["diffusion_model"])
    rounding_params = rounding_from_state_dict(ckpt["rounding_fn"])
    embed_norm = ckpt.get("embed_norm", "none")
    embed_matrix = None
    if "embedding_fn" in ckpt:
        embed_matrix = embedding_matrix(
            embedding_from_state_dict(ckpt["embedding_fn"]),
            norm=embed_norm,
        )
    # torch layout (out=vocab, in=embed_dim) — io/checkpoint.py:187-193
    embed_dim = np.asarray(ckpt["rounding_fn"]["decoder.weight"]).shape[1]
    self_cond = bool(ckpt.get("self_cond")) or (
        "selfcond_proj.weight" in ckpt["diffusion_model"]
    )
    if ckpt.get("noise_schedule", "linear") != "linear":
        sched = make_schedule(kind=ckpt["noise_schedule"])
    cfg = TransformerConfig(dim=int(embed_dim), timesteps=sched.timesteps,
                            self_cond=self_cond,
                            pos_emb=ckpt.get("pos_emb", "none"))
    parameterization = ckpt.get("parameterization", "eps")

    # --- judge LM (shared across replicate seeds) --------------------------
    lm_cfg = TinyGPTConfig(
        vocab_size=tokenizer.vocab_size, dim=256, n_heads=4, depth=4,
        max_len=max(args.seq_len + 1, 64),
    )
    lm_params = _load_or_train_lm(
        args, corpus, tokenizer, lm_cfg, tokenize_corpus, train_lm,
        load_checkpoint, save_checkpoint, tree_to_jax, tree_to_numpy,
    )

    # --- generation, replicated over seeds ----------------------------------
    def generate(gen_key):
        if args.mode == "pure":
            return sample_text(
                diff_params, cfg, sched, tokenizer, gen_key,
                rounding_params=rounding_params, embed_matrix=embed_matrix,
                n_samples=args.n, seq_len=args.seq_len,
                embed_dim=int(embed_dim),
                use_learned_rounding=True, method=args.sampler,
                num_steps=args.steps, clamp=args.clamp, save=False,
                parameterization=parameterization,
                temperature=args.temperature,
                log_fn=lambda *_: None,
            )
        from tinydiffusionmodels_tpu.models import (
            tiny_gpt_decode_step,
            tiny_gpt_init_cache,
        )
        from tinydiffusionmodels_tpu.sample.guided import default_seg
        from tinydiffusionmodels_tpu.sample.text import (
            guided_sample_text,
            sample_diffusion_embeddings,
        )

        z = sample_diffusion_embeddings(
            diff_params, cfg, sched, gen_key,
            n=args.n, seq_len=args.seq_len, embed_dim=int(embed_dim),
            method=args.sampler, num_steps=args.steps,
            parameterization=parameterization,
            temperature=args.temperature,
        )
        # The guided base LM is the same judge-size TinyGPT (shared cache).
        return guided_sample_text(
            lambda cache, tok, attn_len=None: tiny_gpt_decode_step(
                lm_params, cache, tok, lm_cfg, attn_len
            ),
            tiny_gpt_init_cache(lm_cfg, args.n),
            z, tokenizer,
            rounding_params=rounding_params, embed_matrix=embed_matrix,
            use_learned_rounding=True, alpha=args.alpha,
            normalize=args.guidance_norm, save=False, seg=default_seg(args.n),
            log_fn=lambda *_: None,
        )

    # Corpus references, computed once: held-out floor + matched-window
    # diversity ceilings + the corpus 8-gram set for the novelty metric.
    chunks, val = tokenize_corpus(corpus, tokenizer, args.seq_len, 0.1)
    val_seqs = [np.asarray(c) for c in (val if len(val) else chunks)[:32]]
    corpus_ids = np.asarray(tokenizer.encode(corpus[:200_000]))
    corpus_grams = {
        tuple(corpus_ids[i:i + 8]) for i in range(len(corpus_ids) - 7)
    }

    def score(token_seqs) -> dict:
        """Per-replicate metrics of one generated batch."""
        out = {
            "lm_perplexity": round(
                lm_perplexity(lm_params, lm_cfg, token_seqs), 3
            ),
            **ngram_stats(token_seqs),
        }
        # Memorization check: fraction of generated 8-grams appearing
        # verbatim anywhere in the corpus (real corpus windows score 1.0
        # by construction; lower = more novel recombination).
        gen_grams = [
            tuple(seq[i:i + 8])
            for seq in token_seqs for i in range(len(seq) - 7)
        ]
        if gen_grams:
            out["corpus_8gram_overlap"] = round(
                sum(1 for g in gen_grams if g in corpus_grams)
                / len(gen_grams), 4,
            )
        return out

    per_seed = []
    for rep in range(max(1, args.seeds)):
        rep_key = substream(
            jax.random.PRNGKey(args.seed + 1000 * rep), "sample"
        )
        texts = generate(rep_key)
        per_seed.append(score(
            [np.asarray(tokenizer.encode(t)) for t in texts]
        ))
        print(f"[fidelity] seed {args.seed + 1000 * rep}: {per_seed[-1]}",
              file=sys.stderr)

    result = {
        "mode": args.mode,
        "guidance_norm": bool(args.guidance_norm),
        "n_samples": args.n,
        "n_seeds": len(per_seed),
        "corpus_perplexity": round(
            lm_perplexity(lm_params, lm_cfg, val_seqs), 3
        ),
        "uniform_perplexity": tokenizer.vocab_size,
    }
    metric_keys = sorted({k for d in per_seed for k in d})
    for k in metric_keys:
        vals = np.asarray([d[k] for d in per_seed if k in d], dtype=float)
        result[k] = round(float(vals.mean()), 4)
        if len(per_seed) > 1:
            # Standard error over replicate seeds (ddof=1).
            result[f"{k}_stderr"] = round(
                float(vals.std(ddof=1) / np.sqrt(len(vals))), 4
            )
            result[f"{k}_per_seed"] = [round(float(v), 4) for v in vals]

    # Calibrated diversity ceiling: real corpus windows at the SAME
    # n/seq_len protocol. Measured round 3: real text at 16x64 scores
    # distinct-2 ~0.26 — absolute diversity targets above this are
    # miscalibrated, so report the reference value alongside.
    rng = np.random.RandomState(args.seed)
    ref_seqs = []
    for _ in range(args.n):
        i = rng.randint(0, max(1, len(corpus_ids) - args.seq_len))
        ref_seqs.append(corpus_ids[i:i + args.seq_len])
    result.update({
        f"corpus_{k}": v for k, v in ngram_stats(ref_seqs).items()
    })
    print(json.dumps(result))


def _load_or_train_lm(args, corpus, tokenizer, lm_cfg, tokenize_corpus,
                      train_lm, load_checkpoint, save_checkpoint,
                      tree_to_jax, tree_to_numpy):
    if os.path.exists(args.lm_ckpt):
        try:
            params = tree_to_jax(load_checkpoint(args.lm_ckpt)["params"])
            if params["tok_emb"].shape[0] != lm_cfg.vocab_size:
                raise ValueError(
                    f"cached judge vocab {params['tok_emb'].shape[0]} != "
                    f"tokenizer vocab {lm_cfg.vocab_size}"
                )
            if params["pos_emb"].shape[0] < lm_cfg.max_len:
                raise ValueError(
                    f"cached judge max_len {params['pos_emb'].shape[0]} < "
                    f"required {lm_cfg.max_len}"
                )
            print(f"[lm] loaded TinyGPT from {args.lm_ckpt}", file=sys.stderr)
            return params
        except Exception as e:  # wrong vocab/shape -> retrain
            print(f"[lm] could not load {args.lm_ckpt}: {e}", file=sys.stderr)
    chunks, _ = tokenize_corpus(corpus, tokenizer, lm_cfg.max_len, 0.0)
    params = train_lm(
        chunks, lm_cfg, epochs=args.lm_epochs, seed=args.seed,
        log_fn=lambda m: print(m, file=sys.stderr),
    )
    save_checkpoint({"params": tree_to_numpy(params)}, args.lm_ckpt)
    return params


if __name__ == "__main__":
    main()
