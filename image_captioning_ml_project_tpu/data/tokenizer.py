"""Tokenizers: legacy word-level vocabulary and a HuggingFace adapter.

Two tokenization paths, mirroring the reference's two stacks:

* :class:`WordVocab` — the legacy stack's vocabulary
  (reference: processData.py:9-50): lowercase word tokenization over COCO
  captions, frequency threshold (default 5), specials
  ``<pad>/<start>/<end>/<unk>`` at ids 0..3 (reference: models/constants.py:1-4,
  processData.py:43-46). Uses a self-contained regex tokenizer equivalent to
  nltk ``word_tokenize`` for caption text (words + punctuation).
* :class:`HFTokenizerAdapter` — wraps a HuggingFace tokenizer (the modern
  stack's GPT-2 BPE path, reference: src/main.py:156-168) behind the same
  small interface, with the reference's pad←eos fallback.

Both expose::

    encode(text, max_length) -> (ids [L], attention_mask [L])
    decode(ids, skip_special_tokens=True) -> str
    vocab_size, pad/bos/eos/unk token ids
"""

from __future__ import annotations

import json
import re
from collections import Counter
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

PAD, START, END, UNK = 0, 1, 2, 3  # reference: models/constants.py:1-4

_TOKEN_RE = re.compile(r"[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]")


def word_tokenize(text: str) -> List[str]:
    """Simple word tokenizer: alphabetic runs, digit runs, punctuation marks
    (lowercased). Behaviorally equivalent to the legacy pipeline's
    nltk.word_tokenize(lower()) for COCO-style captions
    (reference: processData.py:37)."""
    return _TOKEN_RE.findall(text.lower())


class WordVocab:
    """Word-level vocabulary (reference: processData.py:9-27 ``Vocabulary``).

    ids: ``<pad>``=0, ``<start>``=1, ``<end>``=2, ``<unk>``=3, then corpus
    words above the frequency threshold in insertion order
    (reference: processData.py:43-50).
    """

    specials = ["<pad>", "<start>", "<end>", "<unk>"]

    def __init__(self, word2idx: Optional[Dict[str, int]] = None):
        if word2idx is None:
            word2idx = {w: i for i, w in enumerate(self.specials)}
        self.word2idx = dict(word2idx)
        self.idx2word = {i: w for w, i in self.word2idx.items()}

    # -- construction -------------------------------------------------------

    @classmethod
    def build(cls, captions: Iterable[str], threshold: int = 5) -> "WordVocab":
        """Build from a caption corpus with a frequency threshold
        (reference: processData.py:30-50)."""
        counter = Counter()
        for cap in captions:
            counter.update(word_tokenize(cap))
        vocab = cls()
        for word, count in counter.items():
            if count >= threshold:
                vocab.add_word(word)
        return vocab

    def add_word(self, word: str) -> int:
        if word not in self.word2idx:
            idx = len(self.word2idx)
            self.word2idx[word] = idx
            self.idx2word[idx] = word
        return self.word2idx[word]

    # -- serialization ------------------------------------------------------

    def save(self, path: str):
        with open(path, "w") as f:
            json.dump(self.word2idx, f)

    @classmethod
    def load(cls, path: str) -> "WordVocab":
        with open(path) as f:
            return cls(json.load(f))

    # -- tokenizer interface ------------------------------------------------

    @property
    def vocab_size(self) -> int:
        return len(self.word2idx)

    pad_token_id = PAD
    bos_token_id = START
    eos_token_id = END
    unk_token_id = UNK

    def __len__(self):
        return len(self.word2idx)

    def __call__(self, word: str) -> int:
        return self.word2idx.get(word, UNK)

    def encode(self, text: str, max_length: int) -> Tuple[np.ndarray, np.ndarray]:
        """``<start> tokens... <end>`` framing (reference: data_loader.py:33-35),
        padded/truncated to ``max_length``; mask marks real tokens."""
        ids = [START] + [self(w) for w in word_tokenize(text)] + [END]
        ids = ids[: max_length]
        mask = np.zeros(max_length, dtype=np.int32)
        mask[: len(ids)] = 1
        out = np.full(max_length, PAD, dtype=np.int32)
        out[: len(ids)] = ids
        return out, mask

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        words = []
        for i in ids:
            i = int(i)
            if skip_special_tokens and i in (PAD, START, UNK):
                continue
            if i == END and skip_special_tokens:
                break
            words.append(self.idx2word.get(i, "<unk>"))
        return " ".join(words)


def truncate_at_eos(ids: List[int], eos_id, bos_id=None, pad_id=None) -> List[int]:
    """Cut a generated id sequence at its first *content-terminating* EOS.

    Decoded sequences start with BOS (position 0); GPT-2-style tokenizers
    have bos == eos == pad, so leading special ids are skipped first, then
    everything from the next EOS on is dropped. Matches the reference's HF
    ``generate`` semantics where rows are padded after EOS and padding is
    never decoded (reference: src/models/decoders.py:645-654)."""
    specials = {int(eos_id)}
    if bos_id is not None:
        specials.add(int(bos_id))
    if pad_id is not None:
        specials.add(int(pad_id))
    start = 0
    while start < len(ids) and int(ids[start]) in specials:
        start += 1
    for i in range(start, len(ids)):
        if int(ids[i]) == int(eos_id):
            return ids[:i]
    return ids


class HFTokenizerAdapter:
    """Wraps a HuggingFace tokenizer with the reference's special-token
    wiring (reference: src/main.py:160-168): pad←eos when missing, bos
    falling back to cls."""

    def __init__(self, hf_tokenizer):
        self.hf = hf_tokenizer
        if self.hf.pad_token is None:
            self.hf.pad_token = self.hf.eos_token

    @property
    def vocab_size(self) -> int:
        return len(self.hf)

    def __len__(self):
        return len(self.hf)

    @property
    def pad_token_id(self):
        return self.hf.pad_token_id

    @property
    def bos_token_id(self):
        bid = getattr(self.hf, "bos_token_id", None)
        return bid if bid is not None else self.hf.cls_token_id

    @property
    def eos_token_id(self):
        eid = self.hf.eos_token_id
        # BERT-style tokenizers have no eos; [SEP] terminates sequences
        return eid if eid is not None else self.hf.sep_token_id

    def encode(self, text: str, max_length: int) -> Tuple[np.ndarray, np.ndarray]:
        """``[BOS] token ids [EOS]`` (all covered by the attention mask).
        GPT-2 style tokenizers use pad==eos, so the mask — not the pad id —
        is what marks the supervised positions incl. sequence termination.
        The leading BOS makes shifted CE supervise p(first_word | BOS),
        matching decode-time conditioning (the reference trains without BOS
        but decodes from BOS — src/models/decoders.py:571-581 vs :627-644 —
        leaving the first word unsupervised; fixed here, see docs/parity.md).
        ``add_special_tokens=False``: the adapter frames specials itself —
        cls/sep-style tokenizers would otherwise get a second set inside."""
        enc = self.hf(text, truncation=True, max_length=max_length - 2,
                      add_special_tokens=False)
        ids = ([int(self.bos_token_id)] + list(enc["input_ids"])
               + [int(self.eos_token_id)])
        out = np.full(max_length, int(self.pad_token_id), dtype=np.int32)
        mask = np.zeros(max_length, dtype=np.int32)
        out[: len(ids)] = ids
        mask[: len(ids)] = 1
        return out, mask

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        ids = [int(i) for i in ids]
        if skip_special_tokens:
            ids = truncate_at_eos(ids, self.eos_token_id, self.bos_token_id,
                                  self.pad_token_id)
        return self.hf.decode(ids, skip_special_tokens=skip_special_tokens)


def load_tokenizer(name_or_path: str, vocab_path: Optional[str] = None):
    """Resolve a tokenizer: ``word`` / a vocab JSON path → WordVocab;
    otherwise a HF pretrained name (requires local cache — this environment
    has no network egress)."""
    if name_or_path == "word":
        if not vocab_path:
            raise ValueError(
                "the 'word' tokenizer needs vocab_path (a vocab JSON "
                "built by legacy/process_data.py or setup_tokenizer)")
        return WordVocab.load(vocab_path)
    if name_or_path.endswith(".json"):
        return WordVocab.load(name_or_path)
    from transformers import AutoTokenizer

    return HFTokenizerAdapter(AutoTokenizer.from_pretrained(name_or_path))
