"""Datasets and tokenization with hermetic (zero-egress) fallbacks.

The reference downloads MNIST via torchvision (src/mnist.py:139-145) and
tiny_shakespeare via HF datasets (src/shakespeare.py:122-125). TPU pods
frequently run in locked-down networks, so every loader here resolves in
order: explicit local files -> upstream download (when the optional dep and
network exist) -> a deterministic synthetic fallback that keeps training,
tests, and benchmarks runnable anywhere. Benchmarks are content-independent;
fallback provenance is reported so sample-quality comparisons are never made
against synthetic data silently.
"""

from tinydiffusionmodels_tpu.data.mnist import load_mnist
from tinydiffusionmodels_tpu.data.shakespeare import load_text_corpus
from tinydiffusionmodels_tpu.data.tokenizer import CharTokenizer, get_tokenizer
from tinydiffusionmodels_tpu.data.loader import batch_iterator, tokenize_corpus

__all__ = [
    "load_mnist",
    "load_text_corpus",
    "CharTokenizer",
    "get_tokenizer",
    "batch_iterator",
    "tokenize_corpus",
]
