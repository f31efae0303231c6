"""Fast exact top-k for large rows on TPU.

XLA:TPU's ``lax.top_k`` lowering is catastrophically slow for small k over
large rows — ablation on this chip showed the beam-search step's
``top_k([64, 251285], k=10)`` consuming ~98% of the entire KV-cached decode
(see bench notes in the repo history). This module implements an **exact**
blocked top-k:

1. one bandwidth-bound pass computes per-block maxima ``[B, nblk]``;
2. k tiny iterations each pick the argmax block, fetch that single block,
   take its best untaken element, and update that block's cached max.

Heavy traffic = a single read of the input; everything else touches
``O(B * (nblk + k * block))`` elements. Ties resolve to the lowest index,
matching ``lax.top_k``.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# -inf, not finfo.min: pad/mask entries must never outrank a genuine
# -inf in the input (ties at -inf resolve by index order, and pads sit
# at the highest flat indices — matching lax.top_k's lowest-index rule)
_NEG_INF = -jnp.inf


def blocked_top_k(x: jnp.ndarray, k: int, block: int = 1024
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over the last axis of ``x [B, N]``.

    Returns (values [B, k], indices [B, k]) sorted descending.
    """
    B, N = x.shape
    nblk = -(-N // block)
    pad = nblk * block - N
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=_NEG_INF)
    xb = x.reshape(B, nblk, block)
    block_max = xb.max(axis=-1)  # the one full pass

    rows = jnp.arange(B)
    pos = jnp.arange(block)[None, :]

    def body(i, carry):
        block_max, taken, vals, idxs = carry
        b = jnp.argmax(block_max, axis=-1)                       # [B]
        blk = xb[rows, b]                                        # [B, block]
        gpos = b[:, None] * block + pos                          # [B, block]
        # mask out elements already taken from this block
        already = (gpos[:, None, :] == taken[:, :, None]).any(axis=1)
        masked = jnp.where(already, _NEG_INF, blk)
        # lowest-index argmax among UNTAKEN ties: a pure value argmax
        # cannot distinguish a taken -inf from an untaken -inf (rows with
        # fewer than k finite entries would return duplicate indices)
        best = masked.max(axis=-1, keepdims=True)
        cand = (~already) & (masked == best)
        w = jnp.argmax(cand, axis=-1)                            # [B]
        v = masked[rows, w]
        g = b * block + w
        vals = vals.at[:, i].set(v)
        idxs = idxs.at[:, i].set(g)
        taken = taken.at[:, i].set(g)
        # refresh this block's cached max without its taken element
        masked = jnp.where(pos == w[:, None], _NEG_INF, masked)
        block_max = block_max.at[rows, b].set(masked.max(axis=-1))
        return block_max, taken, vals, idxs

    taken = jnp.full((B, k), -1, dtype=jnp.int32)
    vals = jnp.full((B, k), _NEG_INF, dtype=x.dtype)
    idxs = jnp.zeros((B, k), dtype=jnp.int32)
    _, _, vals, idxs = jax.lax.fori_loop(
        0, k, body, (block_max, taken, vals, idxs))
    return vals, idxs


def two_stage_top_k(x: jnp.ndarray, k: int, block: int = 512
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k via top-k *blocks*: any block containing one of the k
    best elements has a block max ≥ the k-th best value, and at most k
    values are ≥ it — so the k best-by-max blocks contain every top-k
    element. One bandwidth pass for block maxima, then a cheap top-k over
    ``[B, nblk]``, a gather of k blocks, and a final top-k over
    ``[B, k*block]``."""
    B, N = x.shape
    nblk = -(-N // block)
    if nblk < k:  # fewer blocks than k (small rows): plain top_k is exact
        return jax.lax.top_k(x, k)
    pad = nblk * block - N
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=_NEG_INF)
    xb = x.reshape(B, nblk, block)
    block_max = xb.max(axis=-1)                                   # [B, nblk]
    _, top_blocks = jax.lax.top_k(block_max, k)                   # [B, k]
    # Sort the selected blocks by index so the final top_k scans candidates
    # in ascending global-index order — exact ties then resolve to the
    # lowest index, token-identical to lax.top_k's tie rule (block_max ties
    # already pick lowest-indexed blocks via lax.top_k above).
    top_blocks = jnp.sort(top_blocks, axis=-1)
    gathered = jnp.take_along_axis(xb, top_blocks[:, :, None], axis=1)
    flat = gathered.reshape(B, k * block)
    vals, local = jax.lax.top_k(flat, k)
    blk_of = jnp.take_along_axis(top_blocks, local // block, axis=1)
    idxs = blk_of * block + (local % block)
    return vals, idxs.astype(jnp.int32)


def fused_beam_top_k(logits: jnp.ndarray, row_bias: jnp.ndarray,
                     rows_per_group: int, k: int, *,
                     suppress_token: int = -1,
                     suppress=None,
                     block: int = 512,
                     block_max=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over virtual beam-candidate rows without materializing
    any vocab-sized intermediate.

    Beam search needs ``top_k(live[r] + log_softmax(logits)[r, v])`` over
    each image's ``rows_per_group`` consecutive rows of ``logits [R, V]``.
    Materializing ``log_softmax`` and the biased sum costs three
    vocab-sized arrays per step (~190 MB at [320, 50257] f32 — measured as
    the dominant non-model cost of the flagship decode). This routine
    reads ``logits`` as-is (bf16 ok) and exploits
    ``max_v(x + bias) == max_v(x) + bias``:

    1. one fused pass: per-block maxima of raw logits ``[R, nblk]``;
    2. ``row_bias`` (= live score - logsumexp) added to the tiny block-max
       matrix, suppressed-token handling via one extra single-block pass;
    3. top-k *blocks* per group (any block holding a top-k element must
       have block-max + bias >= the k-th best — same argument as
       :func:`two_stage_top_k`), one gather of k blocks, final top-k over
       ``[B, k * block]``.

    ``suppress`` (traced bool or None) masks ``suppress_token`` to -inf
    (min-length EOS suppression). Ties resolve to the lowest candidate
    index, matching ``lax.top_k``. Returns (values f32 [B, k], indices
    int32 [B, k] flat in ``[0, rows_per_group * V)``).
    """
    R, V = logits.shape
    Kg = rows_per_group
    B = R // Kg
    nfull = V // block
    tail = V - nfull * block
    nblk = nfull + (1 if tail else 0)
    if V < block:
        raise ValueError(
            f"fused_beam_top_k needs vocab >= block ({V} < {block}); the "
            f"dispatch gate routes small vocabs to the materialized path")
    if k > Kg * nblk:
        raise ValueError(
            f"fused_beam_top_k selects k blocks from rows_per_group*nblk "
            f"candidates; k={k} > {Kg}*{nblk}")

    main = logits[:, :nfull * block].reshape(R, nfull, block)
    if block_max is not None:
        # precomputed raw (bias-free) per-block maxima — e.g. from the
        # one-pass ops.pallas_lse.lse_and_block_max kernel
        bm = block_max.astype(jnp.float32)
    else:
        bm = main.max(axis=-1).astype(jnp.float32)             # [R, nfull]
        if tail:
            bm_tail = logits[:, nfull * block:].max(
                axis=-1, keepdims=True).astype(jnp.float32)
            bm = jnp.concatenate([bm, bm_tail], axis=1)        # [R, nblk]

    if suppress is not None and suppress_token >= 0:
        # the suppressed token only perturbs its own block's max
        eb = suppress_token // block
        lo = eb * block
        hi = min(lo + block, V)
        seg = logits[:, lo:hi]
        lane = jnp.arange(hi - lo) + lo
        seg_noeos = jnp.where(lane[None, :] == suppress_token,
                              jnp.full((), _NEG_INF, seg.dtype), seg)
        bm_noeos = seg_noeos.max(axis=-1).astype(jnp.float32)  # [R]
        bm = bm.at[:, eb].set(jnp.where(suppress, bm_noeos, bm[:, eb]))

    bm = bm + row_bias.astype(jnp.float32)[:, None]
    bmg = bm.reshape(B, Kg * nblk)
    _, top_blocks = jax.lax.top_k(bmg, k)                      # [B, k]
    # ascending global-block order -> final scan sees candidates in
    # ascending flat-index order, so exact ties pick the lowest index
    top_blocks = jnp.sort(top_blocks, axis=-1)
    kg_sel = top_blocks // nblk                                # beam in group
    blk_sel = top_blocks % nblk
    rows = (jnp.arange(B, dtype=jnp.int32)[:, None] * Kg
            + kg_sel.astype(jnp.int32))                        # [B, k]

    # Gather whole blocks (XLA gather with slice size ``block`` — an
    # element-granularity fancy-index gather here lowered catastrophically:
    # 2.4x slower than the materializing path AND a 7-minute compile).
    main_flat = main.reshape(R * nfull, block)
    main_idx = rows * nfull + jnp.minimum(blk_sel, nfull - 1)
    gathered = main_flat[main_idx].astype(jnp.float32)         # [B, k, block]
    if tail:
        tail_seg = jnp.pad(logits[:, nfull * block:],
                           ((0, 0), (0, block - tail)),
                           constant_values=_NEG_INF)           # [R, block]
        tail_g = tail_seg[rows].astype(jnp.float32)            # [B, k, block]
        gathered = jnp.where((blk_sel == nfull)[:, :, None], tail_g, gathered)

    lanes = (blk_sel[:, :, None] * block
             + jnp.arange(block)[None, None, :])               # [B, k, block]
    if suppress is not None and suppress_token >= 0:
        gathered = jnp.where(
            suppress & (lanes == suppress_token), _NEG_INF, gathered)
    bias_sel = row_bias.astype(jnp.float32)[rows]              # [B, k]
    gathered = gathered + bias_sel[:, :, None]

    flat = gathered.reshape(B, k * block)
    vals, local = jax.lax.top_k(flat, k)
    which = local // block                                     # selected cand
    lane_in = local % block
    idx = (jnp.take_along_axis(kg_sel, which, axis=1) * V
           + jnp.take_along_axis(blk_sel, which, axis=1) * block + lane_in)
    return vals, idx.astype(jnp.int32)


def fast_top_k(x: jnp.ndarray, k: int, method: str = "two_stage"
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch: 'two_stage' / 'blocked' (exact, fast on TPU), 'exact'
    (lax.top_k), 'approx' (lax.approx_max_k, recall ~0.95)."""
    if x.shape[-1] <= 4096:
        method = "exact"
    if method == "two_stage":
        return two_stage_top_k(x, k)
    if method == "blocked":
        return blocked_top_k(x, k)
    if method == "approx":
        return jax.lax.approx_max_k(x, k)
    return jax.lax.top_k(x, k)
