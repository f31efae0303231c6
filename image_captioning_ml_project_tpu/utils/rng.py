"""Seeded RNG threading for functional JAX code.

The reference relies on torch's global RNG (e.g. multinomial sampling in
SCST, src/train/trainer.py:423-425, and curriculum shuffles,
src/train/curriculum.py:150). JAX is functional: randomness is explicit key
threading. ``RngStream`` is a tiny convenience wrapper that hands out fresh
subkeys deterministically from one seed.
"""

from __future__ import annotations

import jax


class RngStream:
    """Deterministic stream of PRNG keys from a single seed.

    Not jit-traceable (holds Python state); use inside host-side driver code
    and pass the produced keys into jitted functions.
    """

    def __init__(self, seed: int):
        self._key = jax.random.PRNGKey(seed)

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def next_n(self, n: int):
        self._key, *subs = jax.random.split(self._key, n + 1)
        return list(subs)
