"""Shakespeare text-diffusion CLI.

Flag-for-flag parity with reference src/shakespeare.py:473-606:

  python -m tinydiffusionmodels_tpu.shakespeare --train --epochs 100 \
      --batch_size 8 --use_learned_embeddings --embed_dim 256
  python -m tinydiffusionmodels_tpu.shakespeare --sample --n 4
  python -m tinydiffusionmodels_tpu.shakespeare --guided_sample --alpha 0.3

Hermetic behavior: when the HF model_id cannot be loaded (zero-egress TPU
pods), the tokenizer falls back to a char-level vocab built from the corpus,
learned embeddings are forced (there is no pretrained matrix to index), and
the guided sampler's base LM is a locally trained TinyGPT
(--base_lm tinygpt). All reference flags keep their meaning when HF *is*
available.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    # Reference surface (src/shakespeare.py:474-497).
    parser.add_argument("--train", action="store_true")
    parser.add_argument("--sample", action="store_true",
                        help="plain diffusion sample")
    parser.add_argument("--guided_sample", action="store_true",
                        help="AR + diffusion guidance")
    parser.add_argument("--epochs", type=int, default=1)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--seq_len", type=int, default=64)
    parser.add_argument(
        "--ckpt", type=str,
        default="gs://text-diffusion/diffusion/outputs/model/text-model.pth"
        if "AIP_MODEL_DIR" in os.environ
        else "text_ckpt.pth",
    )
    parser.add_argument("--model_id", type=str, default="google/gemma-2b-it")
    parser.add_argument("--n", type=int, default=10)
    parser.add_argument("--alpha", type=float, default=0.3)
    parser.add_argument("--rounding_weight", type=float, default=1.0,
                        help="Weight for learned rounding loss")
    parser.add_argument("--use_cosine_fallback", action="store_true",
                        help="Use cosine similarity instead of learned rounding")
    parser.add_argument("--use_learned_embeddings", action="store_true",
                        help="Use custom learned embedding space")
    parser.add_argument("--embed_dim", type=int, default=None,
                        help="Custom embedding dimension")
    parser.add_argument("--init_from_pretrained", action="store_true",
                        help="Initialize learned embeddings from pre-trained weights")
    parser.add_argument("--dropout", type=float, default=0.1)
    parser.add_argument("--weight_decay", type=float, default=1e-4)
    parser.add_argument("--patience", type=int, default=5)
    parser.add_argument("--use_lr_scheduling", action="store_true", default=True)
    parser.add_argument("--warmup_steps", type=int, default=100)
    parser.add_argument("--val_split", type=float, default=0.1)
    parser.add_argument("--lr", type=float, default=1e-4)
    # Framework extensions.
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--data_root", type=str, default="./data")
    parser.add_argument("--sampler", type=str, default="ancestral",
                        choices=["ancestral", "ddim", "dpm++"])
    parser.add_argument("--steps", type=int, default=None,
                        help="sampler steps (ddim)")
    parser.add_argument("--base_lm", type=str, default="auto",
                        choices=["auto", "hf", "tinygpt"],
                        help="base LM for guided sampling")
    parser.add_argument("--lm_epochs", type=int, default=3,
                        help="TinyGPT base-LM training epochs (guided fallback)")
    parser.add_argument("--lm_ckpt", type=str, default="lm_ckpt.pth")
    parser.add_argument("--resume", action="store_true",
                        help="checkpoint full train state each epoch and "
                             "resume if present")
    parser.add_argument("--resume_every", type=int, default=1,
                        help="epochs between resume-state checkpoints")
    parser.add_argument("--clamp", action="store_true",
                        help="Diffusion-LM clamping trick: snap x0 to the "
                             "nearest embedding at every reverse step")
    parser.add_argument("--temperature", type=float, default=1.0,
                        help="guided-sampling logit temperature (the "
                             "reference hardcodes 1.0)")
    parser.add_argument("--parameterization", choices=["eps", "x0"],
                        default="eps",
                        help="denoiser output: eps (reference) or x0 "
                             "(original Diffusion-LM; samplers auto-detect "
                             "from the checkpoint)")
    parser.add_argument("--noise_schedule", choices=["linear", "cosine",
                        "sqrt"], default="linear",
                        help="beta schedule: linear (reference), cosine, or "
                             "sqrt (Diffusion-LM's text schedule; sampling "
                             "auto-detects from the checkpoint)")
    parser.add_argument("--embed_norm",
                        choices=["none", "rms", "zscore"],
                        default="none",
                        help="pin embedding rows to the unit-RMS noise "
                             "sphere during training/decoding (fixes the "
                             "Diffusion-LM embedding-scale collapse; "
                             "sampling auto-detects from the checkpoint)")
    parser.add_argument("--pos_emb", nargs="?", const="abs",
                        default="none", choices=["none", "abs", "rope"],
                        help="positional encoding in the denoiser (the "
                             "reference transformer has none and is "
                             "permutation-equivariant, "
                             "src/shakespeare.py:105-120): 'abs' = learned "
                             "absolute table (Diffusion-LM), 'rope' = "
                             "rotary relative (parameter-free; language "
                             "structure is translation-invariant); "
                             "sampling auto-detects from the checkpoint)")
    parser.add_argument("--freeze_embeddings", action="store_true",
                        help="train around a FIXED embedding table "
                             "(stop-gradient; Analog Bits/CDCD-style fixed "
                             "encodings — with --embed_norm zscore the "
                             "random init is near-orthogonal and immune to "
                             "scale collapse)")
    parser.add_argument("--self_cond", action="store_true",
                        help="self-conditioning: feed the previous x0 "
                             "estimate back into the denoiser (Analog Bits "
                             "style; samplers auto-detect from the "
                             "checkpoint)")
    parser.add_argument("--clamp_train", action="store_true",
                        help="clamp-aware training: add a straight-through "
                             "loss term against the nearest-embedding "
                             "clamped prediction the sampler uses "
                             "(requires --parameterization x0)")
    parser.add_argument("--anchor_ce", type=float, default=0.0,
                        help="weight of Diffusion-LM's anchor term: the "
                             "rounding head's CE on the PREDICTED x0, "
                             "gradient flowing into the denoiser so its "
                             "outputs are decodable (0 = off; designed "
                             "for --parameterization x0)")
    parser.add_argument("--depth", type=int, default=3,
                        help="denoiser encoder layers (reference hardcodes "
                             "3, src/shakespeare.py:106; sampling infers "
                             "depth from the checkpoint)")
    parser.add_argument("--ema_decay", type=float, default=None,
                        help="EMA of the joint weights (e.g. 0.999); "
                             "val/best/final checkpoints use the EMA "
                             "(framework extension)")
    parser.add_argument("--seq_parallel", nargs="?", const=-1, type=int,
                        default=None, metavar="RING",
                        help="sequence-parallel training: shard the token "
                             "sequence and route attention through the ring "
                             "(parallel/ring_attention). No value = ring "
                             "over ALL devices; an integer RING builds a "
                             "combined {'data': n/RING, 'seq': RING} mesh "
                             "(batch sharded AND ring attention)")
    parser.add_argument("--guidance_norm", action="store_true",
                        help="mix log-probabilities instead of raw logits in "
                             "guided sampling (framework extension; default "
                             "is exact reference mixing — see "
                             "sample.guided.mix_logits)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a jax.profiler trace to this directory")
    parser.add_argument("--metrics_path", type=str, default=None,
                        help="write per-epoch JSONL metrics here "
                             "(or set TDM_METRICS_PATH)")
    parser.add_argument("--dtype", type=str,
                        default=os.environ.get("TDM_DTYPE", "f32"),
                        choices=["f32", "bf16"],
                        help="compute dtype for the train step "
                             "(master params stay f32)")
    return parser


def _load_hf(model_id: str):
    """Try to load the HF tokenizer + embedding matrix (+ torch LM).

    Returns (tokenizer_adapter, pretrained_matrix, torch_lm) or
    (None, None, None) when unavailable. The reference always loads the full
    2B LM just for its embedding matrix (src/shakespeare.py:509-510); we do
    the same only when HF is actually reachable.
    """
    try:
        # Hermetic-first: only hit the network when explicitly allowed;
        # otherwise restrict to the local HF cache (fails fast offline).
        local_only = os.environ.get("TDM_ALLOW_DOWNLOADS") != "1"
        from transformers import AutoModelForCausalLM, AutoTokenizer  # type: ignore

        from tinydiffusionmodels_tpu.data.tokenizer import HFTokenizerAdapter

        tok = AutoTokenizer.from_pretrained(model_id, local_files_only=local_only)
        lm = AutoModelForCausalLM.from_pretrained(
            model_id, local_files_only=local_only
        )
        matrix = lm.get_input_embeddings().weight.detach().cpu().numpy()
        return HFTokenizerAdapter(tok), matrix, lm
    except Exception as e:  # pragma: no cover - network/path dependent
        print(f"[hf] {model_id} unavailable ({type(e).__name__}); "
              "falling back to char tokenizer / TinyGPT base LM")
        return None, None, None


def _guided_with_torch_lm(lm, tokenizer, diff_logits_all, *, alpha,
                          temperature=1.0):
    """Guided decode against a torch HF LM, matching the reference loop
    (src/shakespeare.py:445-470) including its no-KV-cache full-prefix
    forwards (kept for exact behavioral parity on the HF path)."""
    import torch

    b, seq_len, _ = diff_logits_all.shape
    bos = tokenizer.bos_token_id or tokenizer.eos_token_id
    input_ids = torch.full((b, 1), bos, dtype=torch.long)
    diff_np = torch.from_numpy(np.asarray(diff_logits_all))
    with torch.no_grad():
        for pos in range(seq_len):
            ar_logits = lm(input_ids).logits[:, -1, :] / temperature
            mixed = (1 - alpha) * ar_logits + alpha * (
                diff_np[:, pos, :] / temperature
            )
            next_id = torch.argmax(mixed, dim=-1, keepdim=True)
            input_ids = torch.cat([input_ids, next_id], dim=1)
    return tokenizer.batch_decode(
        input_ids[:, 1:].numpy(), skip_special_tokens=True
    )


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if not (args.train or args.sample or args.guided_sample):
        print("Nothing to do. Try --train or --guided_sample.")
        return

    import contextlib

    import jax

    from tinydiffusionmodels_tpu.runtime import (
        configure_fast_rng,
        configure_platform,
        enable_compile_cache,
        profile_trace,
    )

    configure_platform()
    enable_compile_cache()
    configure_fast_rng()
    _prof = contextlib.ExitStack()
    _prof.enter_context(profile_trace(args.profile_dir))
    from tinydiffusionmodels_tpu.core import make_schedule
    from tinydiffusionmodels_tpu.core.rng import substream
    from tinydiffusionmodels_tpu.data import load_text_corpus, tokenize_corpus
    from tinydiffusionmodels_tpu.data.tokenizer import (
        BPETokenizer,
        CharTokenizer,
        parse_bpe_spec,
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
    from tinydiffusionmodels_tpu.models import (
        init_learned_embedding,
        init_learned_rounding,
        init_tiny_transformer,
    )
    from tinydiffusionmodels_tpu.models.embedding import embedding_matrix
    from tinydiffusionmodels_tpu.models.transformer import TransformerConfig

    key = jax.random.PRNGKey(args.seed)
    sched = make_schedule(kind=args.noise_schedule)

    # --- tokenizer / pretrained-matrix resolution -------------------------
    hf_tok, pretrained_matrix, torch_lm = (None, None, None)
    is_bpe = bool(args.model_id) and args.model_id.split(":")[0] == "bpe"
    if args.model_id and args.model_id != "char" and not is_bpe:
        hf_tok, pretrained_matrix, torch_lm = _load_hf(args.model_id)

    corpus, corpus_source = load_text_corpus(args.data_root)
    if corpus_source == "builtin":
        print("[data] tiny_shakespeare unavailable -> built-in fallback corpus")
    data_limit = int(os.environ.get("TDM_DATA_LIMIT", "0"))
    if data_limit:
        corpus = corpus[:data_limit]
    if hf_tok is not None:
        tokenizer = hf_tok
    elif is_bpe:
        # Hermetic subword option (--model_id bpe[:VOCAB]): BPE merges
        # trained on the corpus, no downloads.
        tokenizer = BPETokenizer.train(corpus, parse_bpe_spec(args.model_id))
        print(f"[tok] trained corpus BPE (vocab={tokenizer.vocab_size})")
    else:
        tokenizer = CharTokenizer(corpus)
    tokenizer_state = (
        tokenizer.state()
        if isinstance(tokenizer, (CharTokenizer, BPETokenizer)) else None
    )
    vocab_size = tokenizer.vocab_size

    use_learned_embeddings = args.use_learned_embeddings
    if pretrained_matrix is None:
        if not use_learned_embeddings:
            print("[cfg] no pretrained embedding matrix available -> "
                  "forcing --use_learned_embeddings")
            use_learned_embeddings = True
        pretrained_dim = None
    else:
        vocab_size = pretrained_matrix.shape[0]
        pretrained_dim = pretrained_matrix.shape[1]

    if use_learned_embeddings:
        embed_dim = args.embed_dim or pretrained_dim or 256
        init_embeddings = (
            pretrained_matrix if args.init_from_pretrained else None
        )
        embedding_params = init_learned_embedding(
            substream(key, "embedding"), vocab_size, embed_dim, init_embeddings
        )
        print(f"Using learned embeddings (dim={embed_dim}, "
              f"init_from_pretrained={args.init_from_pretrained})")
    else:
        embed_dim = pretrained_dim
        embedding_params = None
        print(f"Using pre-trained embeddings (dim={embed_dim})")

    train_mesh = None
    seq_axis = None
    if args.seq_parallel:
        # Shard the sequence dim over the ring. Register the mesh HERE,
        # not only in the train loop, so --sample/--guided_sample on a
        # seq-parallel-trained checkpoint work without --train in the same
        # process (ops.attention looks the mesh up at trace time).
        from tinydiffusionmodels_tpu import ops
        from tinydiffusionmodels_tpu.parallel import make_mesh

        if args.seq_parallel == -1:
            train_mesh = make_mesh({"seq": -1})  # ring over every device
        else:
            # Combined dp x sp: remaining devices shard the batch
            # (train.text_train shards tokens (K, B, L) on both axes via
            # shard_stacked_batch; ring_attention splits its shard_map's
            # batch dim over 'data').
            train_mesh = make_mesh({"data": -1, "seq": args.seq_parallel})
        seq_axis = "seq"
        ops.register_sequence_mesh(train_mesh, seq_axis)
        if args.seq_len % train_mesh.shape["seq"]:
            raise SystemExit(
                f"--seq_parallel needs seq_len divisible by the ring size "
                f"{train_mesh.shape['seq']}"
            )
        dp = train_mesh.shape.get("data", 1)
        if args.batch_size % dp:
            raise SystemExit(
                f"--seq_parallel {args.seq_parallel}: batch_size "
                f"{args.batch_size} not divisible by the {dp}-way data axis"
            )
        print(f"[parallel] sequence-parallel: ring({train_mesh.shape['seq']})"
              + (f" x dp({dp})" if dp > 1 else "") + " (ring attention)")
    cfg = TransformerConfig(
        dim=embed_dim, n_heads=4, depth=args.depth, dropout=args.dropout,
        timesteps=sched.timesteps, seq_axis=seq_axis,
        self_cond=args.self_cond,
        pos_emb=args.pos_emb, max_len=max(512, args.seq_len),
    )
    diff_params = init_tiny_transformer(substream(key, "diffusion"), cfg)
    rounding_params = init_learned_rounding(
        substream(key, "rounding"), embed_dim, vocab_size
    )

    # --- train ------------------------------------------------------------
    if args.train:
        from tinydiffusionmodels_tpu.train import text_train
        from tinydiffusionmodels_tpu.train.precision import (
            resolve_compute_dtype,
        )

        train_chunks, val_chunks = tokenize_corpus(
            corpus, tokenizer, args.seq_len, args.val_split
        )
        print(f"Training on {len(train_chunks)} chunks, "
              f"validating on {len(val_chunks)} chunks")
        joint = {
            "diffusion_model": diff_params,
            "rounding_fn": rounding_params,
        }
        if use_learned_embeddings:
            joint["embedding_fn"] = embedding_params
        final = text_train.train(
            joint, train_chunks, val_chunks,
            cfg=cfg, sched=sched, mesh=train_mesh,
            ckpt_path=args.ckpt, epochs=args.epochs,
            batch_size=args.batch_size, lr=args.lr,
            weight_decay=args.weight_decay,
            rounding_weight=args.rounding_weight,
            use_learned_embeddings=use_learned_embeddings,
            pretrained_matrix=pretrained_matrix,
            patience=args.patience,
            use_lr_scheduling=args.use_lr_scheduling,
            warmup_steps=args.warmup_steps,
            seed=args.seed,
            tokenizer_state=tokenizer_state,
            resume=args.resume,
            resume_every=args.resume_every,
            metrics_path=args.metrics_path,
            compute_dtype=resolve_compute_dtype(args.dtype),
            ema_decay=args.ema_decay,
            parameterization=args.parameterization,
            clamp_train=args.clamp_train,
            noise_schedule=args.noise_schedule,
            embed_norm=args.embed_norm,
            freeze_embeddings=args.freeze_embeddings,
            anchor_ce=args.anchor_ce,
        )
        diff_params = final["diffusion_model"]
        rounding_params = final["rounding_fn"]
        if use_learned_embeddings:
            embedding_params = final["embedding_fn"]

    # --- checkpoint loading for sample/guided -----------------------------
    use_cosine_fallback = args.use_cosine_fallback
    if (args.sample or args.guided_sample) and not args.train:
        checkpoint = load_checkpoint(args.ckpt)
        if isinstance(checkpoint, dict) and "parameterization" in checkpoint:
            if checkpoint["parameterization"] != args.parameterization:
                print(f"[ckpt] parameterization="
                      f"{checkpoint['parameterization']} (from checkpoint)")
            args.parameterization = checkpoint["parameterization"]
        if isinstance(checkpoint, dict) and "noise_schedule" in checkpoint:
            if checkpoint["noise_schedule"] != args.noise_schedule:
                print(f"[ckpt] noise_schedule="
                      f"{checkpoint['noise_schedule']} (from checkpoint)")
                args.noise_schedule = checkpoint["noise_schedule"]
                sched = make_schedule(kind=args.noise_schedule)
        if isinstance(checkpoint, dict) and "pos_emb" in checkpoint:
            if checkpoint["pos_emb"] != args.pos_emb:
                print(f"[ckpt] pos_emb={checkpoint['pos_emb']} "
                      "(from checkpoint)")
            args.pos_emb = checkpoint["pos_emb"]
            if cfg.pos_kind != args.pos_emb:
                import dataclasses

                cfg = dataclasses.replace(cfg, pos_emb=args.pos_emb)
        if isinstance(checkpoint, dict) and "embed_norm" in checkpoint:
            if checkpoint["embed_norm"] != args.embed_norm:
                print(f"[ckpt] embed_norm={checkpoint['embed_norm']} "
                      "(from checkpoint)")
            args.embed_norm = checkpoint["embed_norm"]
        if isinstance(checkpoint, dict):
            ckpt_sc = bool(checkpoint.get("self_cond")) or (
                isinstance(checkpoint.get("diffusion_model"), dict)
                and "selfcond_proj.weight" in checkpoint["diffusion_model"]
            )
            if ckpt_sc != cfg.self_cond:
                print(f"[ckpt] self_cond={ckpt_sc} (from checkpoint)")
                import dataclasses

                cfg = dataclasses.replace(cfg, self_cond=ckpt_sc)
        if isinstance(checkpoint, dict) and "rounding_fn" in checkpoint:
            # Infer embed_dim from the checkpoint (torch decoder layout is
            # (vocab, dim)) so sampling a non-default-dim checkpoint does
            # not require repeating --embed_dim. The reference would crash
            # on the dim mismatch instead.
            ckpt_dim = int(
                np.asarray(checkpoint["rounding_fn"]["decoder.weight"]).shape[1]
            )
            if ckpt_dim != embed_dim:
                print(f"[ckpt] embed_dim={ckpt_dim} (from checkpoint)")
                embed_dim = ckpt_dim
                import dataclasses

                cfg = dataclasses.replace(cfg, dim=ckpt_dim)
        if isinstance(checkpoint, dict) and "diffusion_model" in checkpoint:
            diff_params = transformer_from_state_dict(
                checkpoint["diffusion_model"]
            )
            rounding_params = rounding_from_state_dict(checkpoint["rounding_fn"])
            if use_learned_embeddings and "embedding_fn" in checkpoint:
                embedding_params = embedding_from_state_dict(
                    checkpoint["embedding_fn"]
                )
            elif use_learned_embeddings:
                print("Warning: Learned embeddings requested but not found in "
                      "checkpoint. Using pre-trained fallback.")
                use_learned_embeddings = False
            if "tokenizer" in checkpoint and hf_tok is None:
                tokenizer = tokenizer_from_state(checkpoint["tokenizer"])
                if tokenizer.vocab_size != vocab_size:
                    # Keep every downstream vocab consumer (the guided
                    # base-LM config most of all) in sync with the
                    # checkpoint's tokenizer — a char-sized LM against
                    # BPE-sized diffusion logits crashes in the jitted
                    # guided mix.
                    print(f"[ckpt] vocab_size={tokenizer.vocab_size} "
                          "(from checkpoint tokenizer)")
                    vocab_size = tokenizer.vocab_size
        else:
            # Old single-model checkpoint (reference src/shakespeare.py:556-562).
            diff_params = transformer_from_state_dict(checkpoint)
            print("Warning: Using old checkpoint format. Falling back to "
                  "pre-trained embeddings and cosine similarity.")
            use_cosine_fallback = True
            use_learned_embeddings = False

    embed_matrix = None
    if use_learned_embeddings:
        embed_matrix = embedding_matrix(embedding_params,
                                        norm=args.embed_norm)
    elif pretrained_matrix is not None:
        import jax.numpy as jnp

        from tinydiffusionmodels_tpu.models.embedding import _apply_norm

        embed_matrix = _apply_norm(
            jnp.asarray(pretrained_matrix), args.embed_norm
        )
    elif embedding_params is not None:
        # Legacy checkpoint + no HF matrix (hermetic env): the only usable
        # decoding space is the freshly-initialized learned embedding.
        print("Warning: no pre-trained embedding matrix available; cosine "
              "decoding will use randomly-initialized embeddings.")
        embed_matrix = embedding_matrix(embedding_params,
                                        norm=args.embed_norm)

    # --- plain sampling ---------------------------------------------------
    if args.sample:
        from tinydiffusionmodels_tpu.sample.text import sample_text

        sample_text(
            diff_params, cfg, sched, tokenizer, substream(key, "sample"),
            rounding_params=rounding_params,
            embed_matrix=embed_matrix,
            n_samples=args.n, seq_len=args.seq_len, embed_dim=embed_dim,
            use_learned_rounding=not use_cosine_fallback,
            method=args.sampler, num_steps=args.steps,
            clamp=args.clamp,
            parameterization=args.parameterization,
        )

    # --- guided sampling --------------------------------------------------
    if args.guided_sample:
        from tinydiffusionmodels_tpu.sample.guided import default_seg
        from tinydiffusionmodels_tpu.sample.text import (
            diffusion_position_logits,
            guided_sample_text,
            sample_diffusion_embeddings,
        )

        z = sample_diffusion_embeddings(
            diff_params, cfg, sched, substream(key, "guided"),
            n=args.n, seq_len=args.seq_len, embed_dim=embed_dim,
            method=args.sampler, num_steps=args.steps,
            parameterization=args.parameterization,
        )

        lm_choice = args.base_lm
        if lm_choice == "auto":
            lm_choice = "hf" if torch_lm is not None else "tinygpt"

        if lm_choice == "hf":
            if torch_lm is None:
                raise RuntimeError(
                    f"--base_lm hf requested but {args.model_id} not loadable"
                )
            # Prefer running the base LM natively on TPU: Gemma checkpoints
            # convert to the JAX implementation and use the KV-cached scan
            # decoder; other architectures fall back to the torch loop
            # (reference behavior, src/shakespeare.py:445-470).
            jax_lm = None
            try:
                from tinydiffusionmodels_tpu.models.gemma import (
                    GemmaConfig,
                    gemma_decode_step,
                    gemma_from_hf_state_dict,
                    gemma_init_cache,
                )

                if torch_lm.config.model_type == "gemma":
                    sd = {
                        k: v.detach().cpu().numpy()
                        for k, v in torch_lm.state_dict().items()
                    }
                    gcfg = GemmaConfig.from_hf(
                        torch_lm.config, max_len=max(args.seq_len + 1, 64)
                    )
                    jax_lm = (gemma_from_hf_state_dict(sd, gcfg), gcfg)
                    print("[lm] running Gemma natively in JAX (scan decode)")
            except Exception as e:
                print(f"[lm] JAX Gemma conversion failed ({e}); torch loop")

            if jax_lm is not None:
                gparams, gcfg = jax_lm
                decode = lambda cache, tok: gemma_decode_step(
                    gparams, cache, tok, gcfg
                )
                guided_sample_text(
                    decode,
                    gemma_init_cache(gcfg, args.n),
                    z, tokenizer,
                    rounding_params=rounding_params,
                    embed_matrix=embed_matrix,
                    use_learned_rounding=not use_cosine_fallback,
                    alpha=args.alpha,
                    temperature=args.temperature,
                    normalize=args.guidance_norm,
                )
            else:
                diff_logits = diffusion_position_logits(
                    z,
                    rounding_params=rounding_params,
                    embed_matrix=embed_matrix,
                    use_learned_rounding=not use_cosine_fallback,
                )
                texts = _guided_with_torch_lm(
                    torch_lm, tokenizer, np.asarray(diff_logits),
                    alpha=args.alpha, temperature=args.temperature,
                )
                from pathlib import Path

                from tinydiffusionmodels_tpu.io import (
                    get_samples_dir,
                    save_samples,
                )

                samples_dir = get_samples_dir("samples")
                for i, text in enumerate(texts):
                    if isinstance(samples_dir, str) and samples_dir.startswith(
                        "gs://"
                    ):
                        sample_path = f"{samples_dir}/guided_sample_{i}.txt"
                    else:
                        sample_path = (
                            Path(samples_dir) / f"guided_sample_{i}.txt"
                        )
                    save_samples(text, sample_path)
                    print(f"✔ Wrote {sample_path}")
        else:
            # TinyGPT fallback: load or train a local base LM.
            from tinydiffusionmodels_tpu.models import (
                tiny_gpt_decode_step,
                tiny_gpt_init_cache,
            )
            from tinydiffusionmodels_tpu.models.ar_lm import TinyGPTConfig

            lm_cfg = TinyGPTConfig(
                vocab_size=vocab_size, dim=256, n_heads=4, depth=4,
                max_len=max(args.seq_len + 1, 64),
            )
            lm_params = None
            if os.path.exists(args.lm_ckpt):
                try:
                    lm_params = tree_to_jax(load_checkpoint(args.lm_ckpt)["params"])
                    # Same validation as tools/text_fidelity._load_or_train_lm:
                    # a cached LM trained under a different tokenizer (e.g.
                    # char-54 vs bpe-96) would crash — or silently misguide —
                    # deep inside the jitted decode.
                    if lm_params["tok_emb"].shape[0] != lm_cfg.vocab_size:
                        raise ValueError(
                            f"cached base-LM vocab {lm_params['tok_emb'].shape[0]}"
                            f" != tokenizer vocab {lm_cfg.vocab_size}"
                        )
                    if lm_params["pos_emb"].shape[0] < lm_cfg.max_len:
                        raise ValueError(
                            f"cached base-LM max_len {lm_params['pos_emb'].shape[0]}"
                            f" < required {lm_cfg.max_len}"
                        )
                    print(f"[lm] loaded TinyGPT from {args.lm_ckpt}")
                except Exception as e:
                    print(f"[lm] could not load {args.lm_ckpt}: {e} — retraining")
                    lm_params = None
            if lm_params is None:
                from tinydiffusionmodels_tpu.train.lm_train import train_lm

                print(f"[lm] training TinyGPT base LM for {args.lm_epochs} epochs")
                train_chunks, _ = tokenize_corpus(
                    corpus, tokenizer, args.seq_len + 1, 0.0
                )
                lm_params = train_lm(
                    train_chunks, lm_cfg, epochs=args.lm_epochs, seed=args.seed
                )
                save_checkpoint(
                    {"params": tree_to_numpy(lm_params)}, args.lm_ckpt
                )

            decode = lambda cache, tok, attn_len=None: tiny_gpt_decode_step(
                lm_params, cache, tok, lm_cfg, attn_len
            )
            guided_sample_text(
                decode,
                tiny_gpt_init_cache(lm_cfg, args.n),
                z, tokenizer,
                rounding_params=rounding_params,
                embed_matrix=embed_matrix,
                use_learned_rounding=not use_cosine_fallback,
                alpha=args.alpha,
                temperature=args.temperature,
                normalize=args.guidance_norm,
                seg=default_seg(args.n),
            )

    _prof.close()


if __name__ == "__main__":
    main()
