"""Unit tests for the text-fidelity metrics (tools/text_fidelity.py)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.text_fidelity import lm_perplexity, ngram_stats  # noqa: E402


class TestNgramStats:
    def test_distinct_on_all_unique(self):
        seqs = [np.arange(10), np.arange(10, 20)]
        s = ngram_stats(seqs)
        assert s["distinct_1"] == 1.0
        assert s["distinct_2"] == 1.0

    def test_distinct_detects_mode_collapse(self):
        seqs = [np.zeros(32, dtype=int) for _ in range(4)]
        s = ngram_stats(seqs)
        assert s["distinct_1"] < 0.05
        assert s["distinct_2"] < 0.05

    def test_dup_8gram_rate(self):
        a = np.arange(16)
        seqs = [a, a.copy(), np.arange(100, 116)]
        s = ngram_stats(seqs)
        # every 8-gram of `a` appears in two samples; the third is unique
        assert 0.4 < s["dup_8gram_rate"] < 0.6

    def test_empty_and_short_sequences(self):
        s = ngram_stats([np.array([], dtype=int), np.array([1, 2, 3])])
        assert 0.0 <= s["distinct_1"] <= 1.0
        assert s["dup_8gram_rate"] == 0.0


class TestLmPerplexity:
    def test_trained_lm_prefers_corpus_text(self):
        """A TinyGPT trained on a toy corpus must give lower perplexity to
        corpus chunks than to uniform-random token sequences."""
        import jax

        from tinydiffusionmodels_tpu.data.loader import tokenize_corpus
        from tinydiffusionmodels_tpu.data.tokenizer import CharTokenizer
        from tinydiffusionmodels_tpu.models.ar_lm import TinyGPTConfig
        from tinydiffusionmodels_tpu.train.lm_train import train_lm

        corpus = "the quick brown fox jumps over the lazy dog. " * 200
        tok = CharTokenizer(corpus)
        cfg = TinyGPTConfig(vocab_size=tok.vocab_size, dim=32, n_heads=2,
                            depth=1, max_len=33)
        chunks, _ = tokenize_corpus(corpus, tok, 33, 0.0)
        params = train_lm(chunks, cfg, epochs=2, batch_size=32,
                          log_fn=lambda *_: None)

        corpus_seqs = [np.asarray(c) for c in chunks[:8]]
        rng = np.random.default_rng(0)
        noise_seqs = [
            rng.integers(0, tok.vocab_size, size=32) for _ in range(8)
        ]
        ppl_corpus = lm_perplexity(params, cfg, corpus_seqs)
        ppl_noise = lm_perplexity(params, cfg, noise_seqs)
        assert np.isfinite(ppl_corpus) and np.isfinite(ppl_noise)
        assert ppl_corpus < ppl_noise / 2
