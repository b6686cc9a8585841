#!/usr/bin/env python3
"""Loss-curve parity check: our JAX MNIST training vs a torch replica.

Exact step parity across frameworks is impossible (different PRNG streams —
SURVEY.md §7), so parity is distributional: train both stacks on the SAME
data with the SAME init distribution and compare smoothed loss curves. The
torch side is the reference architecture verbatim (src/mnist.py:45-87) with
the same AdamW hyperparameters.

Usage: python tools/parity_check.py [--steps 300] [--batch_size 64]
Prints one JSON line: final smoothed losses + relative gap.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def jax_losses(data: np.ndarray, steps: int, batch_size: int, lr: float,
               seed: int) -> list[float]:
    import jax
    import jax.numpy as jnp

    from tinydiffusionmodels_tpu.core import make_schedule
    from tinydiffusionmodels_tpu.models import init_unet
    from tinydiffusionmodels_tpu.train.mnist_train import make_train_step
    from tinydiffusionmodels_tpu.train.optim import adamw
    from tinydiffusionmodels_tpu.train.state import TrainState

    sched = make_schedule()
    tx = adamw(lr, weight_decay=0.01)
    state = TrainState.create(init_unet(jax.random.PRNGKey(seed)), tx)
    step = make_train_step(sched, tx)
    rng = np.random.default_rng(seed)
    losses = []
    for i in range(steps):
        idx = rng.integers(0, data.shape[0], size=batch_size)
        batch = jnp.asarray(data[idx])  # NHWC
        state, loss = step(state, batch, jax.random.PRNGKey(1000 + i))
        losses.append(float(loss))
    return losses


def torch_losses(data: np.ndarray, steps: int, batch_size: int, lr: float,
                 seed: int) -> list[float]:
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(seed)

    class RefResBlock(nn.Module):
        def __init__(self, in_ch, out_ch):
            super().__init__()
            self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
            self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
            self.time_emb = nn.Linear(1, out_ch)
            self.skip = (
                nn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else nn.Identity()
            )

        def forward(self, x, t):
            h = F.relu(self.conv1(x))
            h = h + self.time_emb(t).view(t.shape[0], -1, 1, 1)
            h = F.relu(self.conv2(h))
            return h + self.skip(x)

    class RefUNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.rb1 = RefResBlock(1, 32)
            self.rb2 = RefResBlock(32, 64)
            self.rb3 = RefResBlock(64, 64)
            self.rb4 = RefResBlock(96, 32)
            self.out = nn.Conv2d(32, 1, 1)

        def forward(self, x, t):
            t = (t.float() / 1000).view(-1, 1, 1, 1)
            h1 = self.rb1(x, t)
            h2 = self.rb2(F.avg_pool2d(h1, 2), t)
            h3 = self.rb3(h2, t)
            h4 = F.interpolate(h3, scale_factor=2, mode="nearest")
            h4 = torch.cat([h4, h1], dim=1)
            h4 = self.rb4(h4, t)
            return self.out(h4)

    betas = torch.linspace(1e-4, 2e-2, 1000)
    acp = torch.cumprod(1.0 - betas, dim=0)
    sa, so = torch.sqrt(acp), torch.sqrt(1.0 - acp)

    model = RefUNet()
    opt = torch.optim.AdamW(model.parameters(), lr=lr)
    rng = np.random.default_rng(seed)
    losses = []
    for i in range(steps):
        idx = rng.integers(0, data.shape[0], size=batch_size)
        x = torch.from_numpy(np.moveaxis(data[idx], -1, 1)).float()  # NCHW
        t = torch.randint(0, 1000, (batch_size,))
        noise = torch.randn_like(x)
        x_noisy = sa[t][:, None, None, None] * x + so[t][:, None, None, None] * noise
        loss = F.mse_loss(model(x_noisy, t), noise)
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss))
    return losses


def jax_text_losses(tokens: np.ndarray, steps: int, batch_size: int,
                    lr: float, seed: int, vocab: int, dim: int) -> list[float]:
    import jax
    import jax.numpy as jnp

    from tinydiffusionmodels_tpu.core import make_schedule
    from tinydiffusionmodels_tpu.models import (
        init_learned_embedding,
        init_learned_rounding,
        init_tiny_transformer,
    )
    from tinydiffusionmodels_tpu.models.transformer import TransformerConfig
    from tinydiffusionmodels_tpu.train.optim import adamw
    from tinydiffusionmodels_tpu.train.state import TrainState
    from tinydiffusionmodels_tpu.train.text_train import make_text_train_step

    sched = make_schedule()
    cfg = TransformerConfig(dim=dim, n_heads=4, depth=3, dropout=0.1)
    key = jax.random.PRNGKey(seed)
    joint = {
        "diffusion_model": init_tiny_transformer(key, cfg),
        "rounding_fn": init_learned_rounding(jax.random.fold_in(key, 1),
                                             dim, vocab),
        "embedding_fn": init_learned_embedding(jax.random.fold_in(key, 2),
                                               vocab, dim),
    }
    tx = adamw(lr, weight_decay=1e-4)
    state = TrainState.create(joint, tx)
    step = make_text_train_step(sched, cfg, tx, use_learned_embeddings=True)
    rng = np.random.default_rng(seed)
    w = jnp.asarray(1.0)
    losses = []
    for i in range(steps):
        idx = rng.integers(0, tokens.shape[0], size=batch_size)
        state, (d, r, t) = step(
            state, jnp.asarray(tokens[idx]), w, jax.random.PRNGKey(1000 + i)
        )
        losses.append(float(t))
    return losses


def torch_text_losses(tokens: np.ndarray, steps: int, batch_size: int,
                      lr: float, seed: int, vocab: int, dim: int) -> list[float]:
    """Reference text stack verbatim (src/shakespeare.py:46-120,174-263)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(seed)
    T = 1000
    betas = torch.linspace(1e-4, 2e-2, T)
    acp = torch.cumprod(1.0 - betas, dim=0)
    sa, so = torch.sqrt(acp), torch.sqrt(1.0 - acp)

    class RefTransformer(nn.Module):
        def __init__(self):
            super().__init__()
            layer = nn.TransformerEncoderLayer(
                d_model=dim, nhead=4, batch_first=True, dropout=0.1
            )
            self.encoder = nn.TransformerEncoder(layer, num_layers=3)
            self.time_emb = nn.Linear(1, dim)
            self.dropout = nn.Dropout(0.1)

        def forward(self, x, t):
            t_scaled = (t.float() / T).unsqueeze(-1)
            x = x + self.time_emb(t_scaled).unsqueeze(1)
            return self.encoder(self.dropout(x))

    model = RefTransformer()
    embedding = nn.Embedding(vocab, dim)
    nn.init.normal_(embedding.weight, 0.0, 0.02)
    rounding = nn.Linear(dim, vocab)
    params = (
        list(model.parameters()) + list(rounding.parameters())
        + list(embedding.parameters())
    )
    opt = torch.optim.AdamW(params, lr=lr, weight_decay=1e-4)
    rng = np.random.default_rng(seed)
    losses = []
    for i in range(steps):
        idx = rng.integers(0, tokens.shape[0], size=batch_size)
        ids = torch.from_numpy(tokens[idx])
        x0 = embedding(ids)
        t = torch.randint(0, T, (batch_size,))
        noise = torch.randn_like(x0)
        x_noisy = (
            sa[t][:, None, None] * x0 + so[t][:, None, None] * noise
        )
        eps = model(x_noisy, t)
        diff_loss = F.mse_loss(eps, noise)
        logits = rounding(x0)
        round_loss = F.cross_entropy(
            logits.reshape(-1, vocab), ids.reshape(-1)
        )
        total = diff_loss + round_loss
        opt.zero_grad()
        total.backward()
        opt.step()
        losses.append(float(total))
    return losses


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--workload", choices=["mnist", "text"],
                        default="mnist")
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--data_limit", type=int, default=4096)
    args = parser.parse_args()

    if args.workload == "mnist":
        from tinydiffusionmodels_tpu.data.mnist import (
            load_mnist,
            normalize_mnist,
        )

        images, _, source = load_mnist("./data", synthetic_size=args.data_limit)
        data = normalize_mnist(images[: args.data_limit])
        ours = jax_losses(data, args.steps, args.batch_size, args.lr, args.seed)
        theirs = torch_losses(
            data, args.steps, args.batch_size, args.lr, args.seed
        )
    else:
        from tinydiffusionmodels_tpu.data import load_text_corpus
        from tinydiffusionmodels_tpu.data.loader import tokenize_corpus
        from tinydiffusionmodels_tpu.data.tokenizer import CharTokenizer

        corpus, source = load_text_corpus("./data", min_chars=200_000)
        tok = CharTokenizer(corpus)
        chunks, _ = tokenize_corpus(corpus[: args.data_limit * 64], tok, 32, 0.0)
        ours = jax_text_losses(
            chunks, args.steps, args.batch_size, args.lr, args.seed,
            tok.vocab_size, 64,
        )
        theirs = torch_text_losses(
            chunks, args.steps, args.batch_size, args.lr, args.seed,
            tok.vocab_size, 64,
        )

    tail = max(10, args.steps // 10)
    ours_tail = float(np.mean(ours[-tail:]))
    theirs_tail = float(np.mean(theirs[-tail:]))
    gap = abs(ours_tail - theirs_tail) / max(theirs_tail, 1e-9)
    print(
        json.dumps(
            {
                "workload": args.workload,
                "data_source": source,
                "steps": args.steps,
                "jax_first10": float(np.mean(ours[:10])),
                "torch_first10": float(np.mean(theirs[:10])),
                "jax_final": ours_tail,
                "torch_final": theirs_tail,
                "relative_gap": round(gap, 4),
                "parity": gap < 0.15,
            }
        )
    )


if __name__ == "__main__":
    main()
