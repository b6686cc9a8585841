"""Data layer tests: loaders, tokenizer, chunking, iterators."""

import numpy as np
import pytest

from tinydiffusionmodels_tpu.data import (
    load_mnist,
    load_text_corpus,
    CharTokenizer,
    batch_iterator,
    tokenize_corpus,
)
from tinydiffusionmodels_tpu.data.loader import num_batches
from tinydiffusionmodels_tpu.data.mnist import normalize_mnist, _read_idx


class TestMnist:
    def test_synthetic_fallback(self, tmp_path):
        images, labels, source = load_mnist(tmp_path, synthetic_size=100)
        assert source == "synthetic"
        assert images.shape == (100, 28, 28)
        assert images.dtype == np.uint8
        assert labels.shape == (100,)
        assert set(np.unique(labels)) <= set(range(10))

    def test_synthetic_deterministic(self, tmp_path):
        a, la, _ = load_mnist(tmp_path, synthetic_size=10)
        b, lb, _ = load_mnist(tmp_path, synthetic_size=10)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(la, lb)

    def test_idx_reader(self, tmp_path):
        """Write a tiny IDX file and read it back."""
        import struct

        images = np.arange(2 * 28 * 28, dtype=np.uint8).reshape(2, 28, 28)
        raw = struct.pack(">IIII", 0x00000803, 2, 28, 28) + images.tobytes()
        p = tmp_path / "train-images-idx3-ubyte"
        p.write_bytes(raw)
        out = _read_idx(p)
        np.testing.assert_array_equal(out, images)

    def test_idx_gz_reader(self, tmp_path):
        import gzip
        import struct

        images = np.arange(28 * 28, dtype=np.uint8).reshape(1, 28, 28)
        raw = struct.pack(">IIII", 0x803, 1, 28, 28) + images.tobytes()
        p = tmp_path / "train-images-idx3-ubyte.gz"
        p.write_bytes(gzip.compress(raw))
        out = _read_idx(p)
        np.testing.assert_array_equal(out, images)

    def test_idx_layout_detected(self, tmp_path):
        import struct

        images = np.zeros((3, 28, 28), dtype=np.uint8)
        labels = np.array([1, 2, 3], dtype=np.uint8)
        (tmp_path / "train-images-idx3-ubyte").write_bytes(
            struct.pack(">IIII", 0x803, 3, 28, 28) + images.tobytes()
        )
        (tmp_path / "train-labels-idx1-ubyte").write_bytes(
            struct.pack(">II", 0x801, 3) + labels.tobytes()
        )
        out_images, out_labels, source = load_mnist(tmp_path)
        assert source == "idx"
        assert out_images.shape == (3, 28, 28)
        np.testing.assert_array_equal(out_labels, [1, 2, 3])

    def test_normalize_range(self, tmp_path):
        images, _, _ = load_mnist(tmp_path, synthetic_size=10)
        x = normalize_mnist(images)
        assert x.shape == (10, 28, 28, 1)
        assert x.min() >= -1.0 and x.max() <= 1.0
        assert x.dtype == np.float32

    def test_strict_mode_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_mnist(tmp_path / "nope", allow_synthetic=False)


class TestCorpus:
    def test_builtin_fallback(self, tmp_path):
        text, source = load_text_corpus(tmp_path, min_chars=10_000)
        assert source == "builtin"
        assert len(text) >= 10_000
        assert "To be, or not to be" in text

    def test_local_file_priority(self, tmp_path):
        (tmp_path / "tiny_shakespeare.txt").write_text("hello corpus")
        text, source = load_text_corpus(tmp_path)
        assert source == "file"
        assert text == "hello corpus"


class TestCharTokenizer:
    def test_roundtrip(self):
        tok = CharTokenizer("hello world")
        ids = tok.encode("hello")
        assert tok.decode(ids) == "hello"

    def test_bos_reserved(self):
        tok = CharTokenizer("ab")
        assert tok.bos_token_id == 0
        assert tok.vocab_size == 3  # BOS + 'a' + 'b'

    def test_batch_decode(self):
        tok = CharTokenizer("abc")
        ids = np.stack([tok.encode("ab"), tok.encode("bc")])
        assert tok.batch_decode(ids) == ["ab", "bc"]

    def test_state_roundtrip(self):
        tok = CharTokenizer("xyz abc")
        tok2 = CharTokenizer.from_state(tok.state())
        assert tok2.vocab_size == tok.vocab_size
        assert tok2.decode(tok2.encode("abc")) == "abc"


class TestChunkingAndBatching:
    def test_tokenize_corpus_shapes(self):
        tok = CharTokenizer("abcdefgh" * 100)
        train, val = tokenize_corpus("abcdefgh" * 100, tok, seq_len=16,
                                     val_split=0.1)
        assert train.shape[1] == 16
        assert val.shape[1] == 16
        total = train.shape[0] + val.shape[0]
        assert total == 800 // 16
        assert val.shape[0] == int(total * 0.1)

    def test_batch_iterator_fixed_shapes(self):
        data = np.arange(100).reshape(50, 2)
        batches = list(batch_iterator(data, 8))
        assert len(batches) == 6  # drop_last
        assert all(b.shape == (8, 2) for b in batches)

    def test_batch_iterator_deterministic_per_epoch(self):
        data = np.arange(100).reshape(50, 2)
        a = list(batch_iterator(data, 8, seed=1, epoch=0))
        b = list(batch_iterator(data, 8, seed=1, epoch=0))
        c = list(batch_iterator(data, 8, seed=1, epoch=1))
        np.testing.assert_array_equal(a[0], b[0])
        assert not np.array_equal(a[0], c[0])

    def test_num_batches(self):
        assert num_batches(50, 8) == 6
        assert num_batches(50, 8, drop_last=False) == 7
