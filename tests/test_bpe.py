"""GPT-2 BPE tokenizer: identical ids to HF's GPT2Tokenizer on the same
vocab/merges files (tiny fixture built in-test)."""

import json
import os

import numpy as np
import pytest

from image_captioning_ml_project_tpu.data.bpe import GPT2BPETokenizer, bytes_to_unicode


@pytest.fixture()
def bpe_files(tmp_path):
    # Build a tiny but real byte-level BPE: base vocab = all 256 byte units,
    # plus a few merges over common English fragments.
    b2u = bytes_to_unicode()
    units = [b2u[b] for b in range(256)]
    merges = [
        ("Ġ", "t"), ("Ġt", "h"), ("Ġth", "e"),     # " the"
        ("a", "n"), ("an", "d"),                   # "and"
        ("i", "n"), ("in", "g"),                   # "ing"
        ("Ġ", "a"), ("c", "a"), ("ca", "t"),
    ]
    vocab_tokens = units + ["".join(m) for m in merges] + ["<|endoftext|>"]
    vocab = {tok: i for i, tok in enumerate(vocab_tokens)}
    vocab_file = str(tmp_path / "vocab.json")
    merges_file = str(tmp_path / "merges.txt")
    with open(vocab_file, "w", encoding="utf-8") as f:
        json.dump(vocab, f)
    with open(merges_file, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        # trailing newline: HF's GPT2Tokenizer slices [1:-1] on split("\n")
        f.write("\n".join(" ".join(m) for m in merges) + "\n")
    return vocab_file, merges_file


def test_matches_hf_gpt2_tokenizer(bpe_files):
    from transformers import GPT2Tokenizer

    vocab_file, merges_file = bpe_files
    hf = GPT2Tokenizer(vocab_file=vocab_file, merges_file=merges_file)
    ours = GPT2BPETokenizer(vocab_file, merges_file)

    for text in ["the cat and the dog", "a man riding a horse!",
                 "running and jumping", "hello, world 123"]:
        assert ours.tokenize_ids(text) == hf.encode(text), text


def test_encode_decode_roundtrip(bpe_files):
    vocab_file, merges_file = bpe_files
    tok = GPT2BPETokenizer(vocab_file, merges_file)
    ids, mask = tok.encode("the cat and the cat", max_length=24)
    assert ids.shape == (24,)
    n = int(mask.sum())
    assert (ids[n:] == tok.pad_token_id).all()
    assert tok.decode(ids) == "the cat and the cat"


def test_special_ids_shared(bpe_files):
    vocab_file, merges_file = bpe_files
    tok = GPT2BPETokenizer(vocab_file, merges_file)
    # GPT-2 convention: one <|endoftext|> token serves as bos/eos/pad
    assert tok.pad_token_id == tok.bos_token_id == tok.eos_token_id


def test_matches_hf_on_non_ascii(bpe_files):
    """Unicode letters must pre-tokenize like HF's \\p{L} classes."""
    from transformers import GPT2Tokenizer

    vocab_file, merges_file = bpe_files
    hf = GPT2Tokenizer(vocab_file=vocab_file, merges_file=merges_file)
    ours = GPT2BPETokenizer(vocab_file, merges_file)
    for text in ["a café on the corner", "naïve θ measures 3½ cm",
                 "snake_case_word", "日本語 text"]:
        assert ours.tokenize_ids(text) == hf.encode(text), text


def test_encode_appends_eos(bpe_files):
    vocab_file, merges_file = bpe_files
    tok = GPT2BPETokenizer(vocab_file, merges_file)
    ids, mask = tok.encode("the cat", max_length=10)
    n = int(mask.sum())
    assert ids[n - 1] == tok.eos_token_id  # explicit EOS inside the mask


def test_fuzz_matches_hf_on_random_text(bpe_files):
    """Seeded fuzz vs HF GPT2Tokenizer: random mixes of merge-covered
    fragments, unicode (multi-byte UTF-8), digits, punctuation runs,
    whitespace shapes (leading/trailing/double spaces, newlines, tabs) —
    token ids must match exactly, and decode must round-trip."""
    import random

    from transformers import GPT2Tokenizer

    vocab_file, merges_file = bpe_files
    hf = GPT2Tokenizer(vocab_file=vocab_file, merges_file=merges_file)
    ours = GPT2BPETokenizer(vocab_file, merges_file)

    pieces = ["the", "cat", "and", "ing", "running", "a", "zq", "Ж", "日本",
              "café", "123", "45.6", "!!", "?!", "'s", "don't", ",", "...",
              "\n", "\t", "  ", " "]
    r = random.Random(31337)
    for trial in range(60):
        n = r.randint(1, 10)
        text = "".join(r.choice(pieces) for _ in range(n))
        got, want = ours.tokenize_ids(text), hf.encode(text)
        assert got == want, f"trial {trial}: {text!r}\n{got}\n{want}"
        assert ours.decode(got) == hf.decode(want), f"decode {text!r}"
