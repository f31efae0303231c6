"""On-device n-gram hashing utilities.

The SCST reward path needs per-sample CIDEr computed **on device** so the
whole RL step (rollout + reward + REINFORCE update) is one XLA program
(BASELINE.json north star; the reference instead decoded to text on the host
per batch, src/train/trainer.py:359-368). Token sequences are mapped to
rolling polynomial hashes (uint32, multiplier 1000003) — the same hash is
computed host-side (numpy) when building document-frequency tables, so
device lookups and host statistics agree.

Collision risk: with vocab ≤ 50257 and n ≤ 4 over ≤ 20-token captions the
uint32 space makes collisions vanishingly rare (and a collision merely
perturbs one reward sample).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

HASH_MULT = np.uint32(1000003)


def ngram_hashes_np(tokens: np.ndarray, n: int) -> np.ndarray:
    """Host-side hash of all n-grams of a 1-D token array (uint32)."""
    tokens = np.asarray(tokens, dtype=np.uint32)
    if len(tokens) < n:
        return np.zeros((0,), dtype=np.uint32)
    h = np.zeros(len(tokens) - n + 1, dtype=np.uint32)
    with np.errstate(over="ignore"):
        for i in range(n):
            h = h * HASH_MULT + tokens[i: len(tokens) - n + 1 + i] + np.uint32(1)
    return h


def ngram_hashes(tokens: jnp.ndarray, n: int, valid: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device-side n-gram hashes over the time axis.

    tokens [..., L] int32; valid [..., L] bool marks real (non-special)
    tokens. Returns (hashes [..., L], window_valid [..., L]) where position
    i hashes tokens[i:i+n]; windows that run past the end or contain any
    invalid token are masked False (their hash value is arbitrary).
    """
    L = tokens.shape[-1]
    t = tokens.astype(jnp.uint32)
    h = jnp.zeros_like(t)
    w_valid = jnp.ones(tokens.shape, dtype=bool)
    for i in range(n):
        shifted = jnp.roll(t, -i, axis=-1)
        sh_valid = jnp.roll(valid, -i, axis=-1)
        h = h * HASH_MULT + shifted + jnp.uint32(1)
        w_valid = w_valid & sh_valid
    # windows starting after L-n are out of range
    idx = jnp.arange(L)
    w_valid = w_valid & (idx <= L - n)[(None,) * (tokens.ndim - 1) + (slice(None),)]
    return h, w_valid


def lookup_sorted(table: jnp.ndarray, values: jnp.ndarray,
                  default: jnp.ndarray, payload: jnp.ndarray) -> jnp.ndarray:
    """Binary-search lookup: for each value, return payload[j] where
    table[j] == value, else ``default``. ``table`` must be sorted."""
    if table.shape[0] == 0:
        # empty df table (e.g. no reference caption reaches this n-gram
        # order): every lookup misses
        return jnp.broadcast_to(default, values.shape).astype(payload.dtype)
    idx = jnp.searchsorted(table, values)
    idx = jnp.clip(idx, 0, table.shape[0] - 1)
    found = table[idx] == values
    return jnp.where(found, payload[idx], default)
