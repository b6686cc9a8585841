"""MNIST diffusion CLI.

Flag-for-flag parity with reference src/mnist.py:215-241:

  python -m tinydiffusionmodels_tpu.mnist --train --epochs 3 --batch_size 128
  python -m tinydiffusionmodels_tpu.mnist --sample --ckpt ckpt.pth

Additions beyond the reference: --sampler ddim --steps N (accelerated
sampling), --seed, --data_root.
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    from tinydiffusionmodels_tpu.io import get_vertex_checkpoint_path

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--train", action="store_true", help="Train the model")
    parser.add_argument("--sample", action="store_true", help="Generate samples")
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument(
        "--ckpt",
        type=str,
        default=get_vertex_checkpoint_path("image-model.pth")
        if "AIP_MODEL_DIR" in os.environ
        else "ckpt.pth",
    )
    # Framework extensions (not in the reference surface):
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--data_root", type=str, default="./data")
    parser.add_argument(
        "--sampler", type=str, default="ancestral", choices=["ancestral", "ddim", "dpm++"]
    )
    parser.add_argument(
        "--steps", type=int, default=None,
        help="sampler steps (ddim); ancestral always runs the full schedule",
    )
    parser.add_argument(
        "--no_epoch_samples", action="store_true",
        help="skip the per-epoch sample grid during training",
    )
    parser.add_argument(
        "--ema_decay", type=float, default=None,
        help="maintain an EMA of the weights (e.g. 0.999) and sample/"
             "checkpoint from it (framework extension; DDPM standard)",
    )
    parser.add_argument(
        "--resume", action="store_true",
        help="checkpoint full train state each epoch and resume if present",
    )
    parser.add_argument(
        "--resume_every", type=int, default=1,
        help="epochs between resume-state checkpoints",
    )
    parser.add_argument(
        "--profile_dir", type=str, default=None,
        help="capture a jax.profiler trace of the run to this directory",
    )
    parser.add_argument(
        "--metrics_path", type=str, default=None,
        help="write per-epoch JSONL metrics here (or set TDM_METRICS_PATH)",
    )
    parser.add_argument(
        "--dtype", type=str, default=os.environ.get("TDM_DTYPE", "f32"),
        choices=["f32", "bf16"],
        help="compute dtype for the train step (master params stay f32)",
    )
    return parser


def _dtype(name: str):
    from tinydiffusionmodels_tpu.train.precision import resolve_compute_dtype

    return resolve_compute_dtype(name)


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from tinydiffusionmodels_tpu.runtime import (
        configure_fast_rng,
        configure_platform,
        enable_compile_cache,
        profile_trace,
    )

    configure_platform()
    enable_compile_cache()
    configure_fast_rng()
    from tinydiffusionmodels_tpu.train import mnist_train

    with profile_trace(args.profile_dir):
        if args.train:
            mnist_train.train(
                epochs=args.epochs,
                batch_size=args.batch_size,
                ckpt_path=args.ckpt,
                seed=args.seed,
                data_root=args.data_root,
                sample_every_epoch=not args.no_epoch_samples,
                resume=args.resume,
                resume_every=args.resume_every,
                metrics_path=args.metrics_path,
                compute_dtype=_dtype(args.dtype),
                ema_decay=args.ema_decay,
            )
        if args.sample:
            mnist_train.sample(
                ckpt_path=args.ckpt,
                seed=args.seed,
                method=args.sampler,
                num_steps=args.steps,
            )
    if not args.train and not args.sample:
        print("Nothing to do. Pass --train or --sample.")


if __name__ == "__main__":
    main()
