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

_NEG_INF = jnp.finfo(jnp.float32).min


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
        blk = jnp.where(already, _NEG_INF, blk)
        w = jnp.argmax(blk, axis=-1)                             # [B]
        v = blk[rows, w]
        g = b * block + w
        vals = vals.at[:, i].set(v)
        idxs = idxs.at[:, i].set(g)
        taken = taken.at[:, i].set(g)
        # refresh this block's cached max without its taken element
        blk = jnp.where(pos == w[:, None], _NEG_INF, blk)
        block_max = block_max.at[rows, b].set(blk.max(axis=-1))
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
