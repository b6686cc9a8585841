"""Hermetic BPE tokenizer (--model_id bpe[:VOCAB]).

Framework extension: the reference's only subword tokenizer is a gated HF
download (src/shakespeare.py:508); this trains deterministic word-internal
BPE merges on the corpus locally.
"""

from __future__ import annotations

import numpy as np

from tinydiffusionmodels_tpu.data.tokenizer import (
    BPETokenizer,
    get_tokenizer,
    tokenizer_from_state,
)

CORPUS = (
    "the quick brown fox jumps over the lazy dog. "
    "the dog barks; the fox runs away into the night.\n"
) * 50


def test_train_and_lossless_roundtrip():
    tok = BPETokenizer.train(CORPUS, 96)
    assert tok.vocab_size <= 96
    text = "the quick fox barks at night."
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    # Subword compression: fewer tokens than characters.
    assert len(ids) < len(text)


def test_unseen_chars_fall_back_to_known_symbols():
    tok = BPETokenizer.train(CORPUS, 64)
    ids = tok.encode("dogédog")  # e-acute never seen
    assert "dog" in tok.decode(ids)


def test_state_roundtrip_through_checkpoint(tmp_path):
    from tinydiffusionmodels_tpu.io import load_checkpoint, save_checkpoint

    tok = BPETokenizer.train(CORPUS, 96)
    save_checkpoint({"tokenizer": tok.state()}, str(tmp_path / "t.pth"))
    state = load_checkpoint(str(tmp_path / "t.pth"))["tokenizer"]
    tok2 = tokenizer_from_state(state)
    text = "the lazy dog jumps."
    np.testing.assert_array_equal(tok.encode(text), tok2.encode(text))


def test_get_tokenizer_kinds():
    tok, kind = get_tokenizer("bpe:64", CORPUS)
    assert kind == "bpe" and tok.vocab_size <= 64
    _, kind = get_tokenizer("char", CORPUS)
    assert kind == "char"


def test_determinism():
    a = BPETokenizer.train(CORPUS, 80)
    b = BPETokenizer.train(CORPUS, 80)
    assert a.state() == b.state()


def test_control_chars_in_corpus_roundtrip():
    # \x00/\x01 corrupted the legacy joined-string state format and a
    # literal \x02 shadowed the BOS row; train() now strips them and
    # state() is JSON (ADVICE r3).
    dirty = CORPUS + "\x00abc\x01def\x02ghi "
    tok = BPETokenizer.train(dirty, 96)
    assert all("\x00" not in s and "\x01" not in s for s in tok._itos[1:])
    assert tok._stoi["\x02"] == tok.bos_token_id  # BOS row not shadowed
    tok2 = tokenizer_from_state(tok.state())
    text = "the quick fox barks."
    np.testing.assert_array_equal(tok.encode(text), tok2.encode(text))


def test_legacy_separator_state_still_loads():
    tok = BPETokenizer.train(CORPUS, 80)
    legacy = {
        "kind": "bpe",
        "vocab": "\x00".join(tok._itos[1:]),
        "merges": "\x00".join(a + "\x01" + b for a, b in tok._merges),
    }
    tok2 = tokenizer_from_state(legacy)
    text = "the lazy dog runs away."
    np.testing.assert_array_equal(tok.encode(text), tok2.encode(text))


def test_parse_bpe_spec_errors():
    import pytest

    from tinydiffusionmodels_tpu.data.tokenizer import parse_bpe_spec

    assert parse_bpe_spec("bpe") == 512
    assert parse_bpe_spec("bpe:128") == 128
    for bad in ("bpe:", "bpe:abc", "bpe:1", "bpe:64:9"):
        with pytest.raises(SystemExit, match="bpe"):
            parse_bpe_spec(bad)
