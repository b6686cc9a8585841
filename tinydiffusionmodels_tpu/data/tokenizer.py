"""Tokenizers: a hermetic char-level tokenizer plus an HF adapter.

The reference always loads an HF tokenizer + the full CausalLM
(src/shakespeare.py:508-512), even for training that only needs the
embedding matrix. Here the tokenizer is an interface:

- ``CharTokenizer``: deterministic char-level vocab built from the corpus,
  no downloads. The default in hermetic environments.
- ``HFTokenizerAdapter``: wraps a HuggingFace tokenizer when the model is
  available (cached or network-reachable), preserving the reference's
  ``--model_id`` surface.

``get_tokenizer(model_id, corpus)`` tries HF, falls back to chars.
"""

from __future__ import annotations

from typing import Protocol, Sequence

import numpy as np


class Tokenizer(Protocol):
    vocab_size: int
    bos_token_id: int | None
    eos_token_id: int | None

    def encode(self, text: str) -> np.ndarray: ...
    def decode(self, ids: Sequence[int]) -> str: ...
    def batch_decode(self, ids) -> list[str]: ...


class CharTokenizer:
    """Char-level tokenizer with a BOS token, vocab from the corpus."""

    BOS = "\x02"  # STX control char as BOS sentinel

    def __init__(self, corpus: str):
        chars = sorted(set(corpus))
        self._itos = [self.BOS] + chars
        self._stoi = {c: i for i, c in enumerate(self._itos)}
        self.vocab_size = len(self._itos)
        self.bos_token_id = 0
        self.eos_token_id = 0

    def encode(self, text: str) -> np.ndarray:
        return np.array(
            [self._stoi[c] for c in text if c in self._stoi], dtype=np.int64
        )

    def decode(self, ids: Sequence[int]) -> str:
        return "".join(
            self._itos[int(i)]
            for i in ids
            if 0 < int(i) < self.vocab_size  # skip BOS/invalid
        )

    def batch_decode(self, ids, skip_special_tokens: bool = True) -> list[str]:
        return [self.decode(row) for row in np.asarray(ids)]

    def state(self) -> dict:
        """Serializable vocab (stored in checkpoints for offline reload)."""
        return {"itos": "".join(self._itos[1:])}

    @classmethod
    def from_state(cls, state: dict) -> "CharTokenizer":
        tok = cls.__new__(cls)
        tok._itos = [cls.BOS] + list(state["itos"])
        tok._stoi = {c: i for i, c in enumerate(tok._itos)}
        tok.vocab_size = len(tok._itos)
        tok.bos_token_id = 0
        tok.eos_token_id = 0
        return tok


class HFTokenizerAdapter:
    """Thin adapter over a HuggingFace tokenizer."""

    def __init__(self, hf_tokenizer):
        self._tok = hf_tokenizer
        self.vocab_size = len(hf_tokenizer)
        self.bos_token_id = hf_tokenizer.bos_token_id
        self.eos_token_id = hf_tokenizer.eos_token_id

    def encode(self, text: str) -> np.ndarray:
        ids = self._tok(
            text, add_special_tokens=False, return_attention_mask=False
        ).input_ids
        return np.asarray(ids, dtype=np.int64)

    def decode(self, ids) -> str:
        return self._tok.decode(list(map(int, ids)), skip_special_tokens=True)

    def batch_decode(self, ids, skip_special_tokens: bool = True) -> list[str]:
        return self._tok.batch_decode(
            np.asarray(ids), skip_special_tokens=skip_special_tokens
        )


def get_tokenizer(model_id: str | None, corpus: str):
    """HF tokenizer for ``model_id`` if loadable, else CharTokenizer.

    Returns (tokenizer, kind) with kind in {'hf', 'char'}.
    """
    if model_id and model_id != "char":
        try:
            from transformers import AutoTokenizer  # type: ignore

            return HFTokenizerAdapter(AutoTokenizer.from_pretrained(model_id)), "hf"
        except Exception:
            pass
    return CharTokenizer(corpus), "char"
