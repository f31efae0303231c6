"""On-device per-sample CIDEr-D for SCST rewards.

Implements CIDEr-D (tf-idf n-gram cosine, n = 1..4, count clipping, length
gaussian sigma = 6, ×10) entirely in jnp over **token ids**, so the SCST
reward sits inside the jitted RL step (BASELINE.json north star; fixes both
host round-trips and the reference's corpus-broadcast reward defect,
src/train/trainer.py:455-482 / SURVEY.md §2.4).

Token-space note: rewards are computed over tokenizer ids (the standard
SCST practice) rather than PTB-normalized words; final evaluation metrics
still use the host scorers in :mod:`.metrics` for published-number parity.

Flow:
* :func:`build_df_table` — host, once per training corpus: document
  frequencies of hashed n-grams → sorted uint32 table + idf payloads.
* :func:`encode_references` — host, per batch (cheap numpy): reference
  token arrays [B, R, L] + validity mask.
* :func:`per_sample_cider_device` — device: candidate tokens [B, L] →
  rewards [B].
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.ngram import lookup_sorted, ngram_hashes, ngram_hashes_np

MAX_N = 4
SIGMA = 6.0


class DFTable(NamedTuple):
    """Sorted hash → idf lookup, one per n-gram order."""

    tables: Tuple[jnp.ndarray, ...]   # each [M_n] sorted uint32
    idfs: Tuple[jnp.ndarray, ...]     # each [M_n] float32
    log_n: float                      # log(num reference images)


def _strip(tokens: Sequence[int], special_ids) -> np.ndarray:
    return np.asarray([t for t in tokens if t not in special_ids],
                      dtype=np.uint32)


def build_df_table(references: List[List[Sequence[int]]],
                   special_ids=(0, 1, 2)) -> DFTable:
    """Host: document frequencies over a reference corpus.

    ``references[i]`` is the list of reference token sequences for image i.
    """
    from collections import defaultdict

    log_n = float(np.log(max(len(references), 1)))
    tables, idfs = [], []
    for n in range(1, MAX_N + 1):
        df: Dict[int, float] = defaultdict(float)
        for refs in references:
            seen = set()
            for ref in refs:
                toks = _strip(ref, special_ids)
                seen.update(ngram_hashes_np(toks, n).tolist())
            for h in seen:
                df[h] += 1.0
        keys = np.array(sorted(df.keys()), dtype=np.uint32)
        vals = np.array([log_n - np.log(max(df[int(k)], 1.0)) for k in keys],
                        dtype=np.float32)
        tables.append(jnp.asarray(keys))
        idfs.append(jnp.asarray(vals))
    return DFTable(tuple(tables), tuple(idfs), log_n)


def encode_references(refs_per_image: List[List[Sequence[int]]],
                      max_refs: int, max_len: int) -> Tuple[np.ndarray, np.ndarray]:
    """Host: pack per-image reference token lists into fixed arrays.

    Returns (tokens [B, R, L] int32 — entries beyond a ref's length are
    **-1**, which no tokenizer emits, so a real token id 0 (e.g. "!" in
    the GPT-2 vocab) is never conflated with packing — and ref_valid
    [B, R] bool). Special-token stripping is the device side's job (pass
    the special ids to :func:`per_sample_cider_device`)."""
    B = len(refs_per_image)
    tokens = np.full((B, max_refs, max_len), -1, dtype=np.int32)
    ref_valid = np.zeros((B, max_refs), dtype=bool)
    for i, refs in enumerate(refs_per_image):
        for r, ref in enumerate(refs[:max_refs]):
            arr = np.asarray(list(ref)[:max_len], dtype=np.int32)
            tokens[i, r, : len(arr)] = arr
            ref_valid[i, r] = True
    return tokens, ref_valid


def _token_valid(tokens: jnp.ndarray, special_ids) -> jnp.ndarray:
    valid = jnp.ones(tokens.shape, dtype=bool)
    for s in special_ids:
        valid = valid & (tokens != s)
    return valid


def _tf(hashes: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Term frequency of each window's hash within its own sequence.
    hashes [..., L] -> counts [..., L] (0 where invalid)."""
    eq = (hashes[..., :, None] == hashes[..., None, :])
    eq = eq & valid[..., None, :] & valid[..., :, None]
    return eq.sum(axis=-1).astype(jnp.float32)


def per_sample_cider_device(cand_tokens: jnp.ndarray,
                            ref_tokens: jnp.ndarray,
                            ref_valid: jnp.ndarray,
                            df: DFTable,
                            special_ids=(0, 1, 2)) -> jnp.ndarray:
    """Device CIDEr-D: cand [B, L], refs [B, R, Lr] (+ ref_valid [B, R])
    → rewards [B] float32."""
    cand_valid = _token_valid(cand_tokens, special_ids)
    refs_tok_valid = _token_valid(ref_tokens, special_ids) & \
        (ref_tokens >= 0)  # packing sentinel is -1 (encode_references) —
    # token id 0 can be a real vocab word (GPT-2 "!") and must count
    cand_len = cand_valid.sum(axis=-1).astype(jnp.float32)          # [B]
    ref_len = refs_tok_valid.sum(axis=-1).astype(jnp.float32)       # [B, R]

    score_n = []
    for n in range(1, MAX_N + 1):
        table, idf = df.tables[n - 1], df.idfs[n - 1]
        default_idf = jnp.float32(df.log_n)  # unseen n-gram: df=1

        ch, cv = ngram_hashes(cand_tokens, n, cand_valid)           # [B, L]
        rh, rv = ngram_hashes(ref_tokens, n, refs_tok_valid)        # [B, R, Lr]
        rv = rv & ref_valid[..., None]

        c_idf = lookup_sorted(table, ch, default_idf, idf) * cv     # [B, L]
        r_idf = lookup_sorted(table, rh, default_idf, idf) * rv

        c_w = _tf(ch, cv) * c_idf        # tf*idf per window
        r_w = _tf(rh, rv) * r_idf

        # norms count each distinct n-gram once: divide by its multiplicity
        c_tf = jnp.maximum(_tf(ch, cv), 1.0)
        r_tf = jnp.maximum(_tf(rh, rv), 1.0)
        c_norm = jnp.sqrt((c_w * c_w / c_tf).sum(axis=-1))          # [B]
        r_norm = jnp.sqrt((r_w * r_w / r_tf).sum(axis=-1))          # [B, R]

        # min(cand_w, ref_w) * ref_w for each candidate window matched in ref
        match = (ch[:, None, :, None] == rh[:, :, None, :])         # [B,R,L,Lr]
        match = match & cv[:, None, :, None] & rv[:, :, None, :]
        # ref weight of the candidate window's n-gram (0 if unmatched)
        r_w_for_c = jnp.where(match, r_w[:, :, None, :], 0.0).max(axis=-1)
        c_w_b = jnp.broadcast_to(c_w[:, None, :], r_w_for_c.shape)
        contrib = jnp.minimum(c_w_b, r_w_for_c) * r_w_for_c / \
            jnp.broadcast_to(jnp.maximum(c_tf, 1.0)[:, None, :],
                             r_w_for_c.shape)
        val = contrib.sum(axis=-1)                                   # [B, R]

        denom = jnp.maximum(c_norm[:, None] * r_norm, 1e-8)
        val = val / denom
        delta = cand_len[:, None] - ref_len
        val = val * jnp.exp(-(delta ** 2) / (2 * SIGMA ** 2))
        val = jnp.where(ref_valid, val, 0.0)
        score_n.append(val.sum(axis=-1) /
                       jnp.maximum(ref_valid.sum(axis=-1), 1))       # [B]

    return 10.0 * jnp.stack(score_n, axis=0).mean(axis=0)
