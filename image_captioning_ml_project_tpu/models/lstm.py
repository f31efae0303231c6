"""Fused LSTM primitives for TPU.

The reference's decoders use cuDNN ``nn.LSTM`` / ``nn.LSTMCell`` driven by
per-timestep Python loops (reference: src/models/decoders.py:187-219,
models/decoder.py:148-173). On TPU the idiomatic design is a single fused
gate matmul per step (one MXU call) inside ``jax.lax.scan``.

Gate order follows torch's packed layout (i, f, g, o) so torch LSTM weights
port by simple concatenation: ``kernel = concat(W_ih.T, W_hh.T, axis=0)``,
``bias = b_ih + b_hh``.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class FusedLSTMCell(nn.Module):
    """Single-layer LSTM cell with one fused [x; h] @ W -> 4H matmul.

    Semantics match torch: i, f, o gates sigmoid; g tanh;
    c' = f*c + i*g; h' = o * tanh(c').
    """

    hidden_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry: Tuple[jnp.ndarray, jnp.ndarray],
                 x: jnp.ndarray) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
        h, c = carry
        H = self.hidden_dim
        z = jnp.concatenate([x, h], axis=-1)
        gates = nn.Dense(4 * H, dtype=self.dtype, name="gates")(z)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new


class StackedLSTM(nn.Module):
    """num_layers stacked FusedLSTMCells (torch multi-layer LSTM semantics;
    inter-layer dropout is applied by callers during training only)."""

    hidden_dim: int
    num_layers: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, x, deterministic: bool = True):
        """carry: (h [L,B,H], c [L,B,H]); x: [B, in_dim].
        Returns ((h', c'), top_output [B, H])."""
        h, c = carry
        new_h, new_c = [], []
        inp = x
        for l in range(self.num_layers):
            (h_l, c_l), out = FusedLSTMCell(
                self.hidden_dim, dtype=self.dtype, name=f"cell_{l}")((h[l], c[l]), inp)
            new_h.append(h_l)
            new_c.append(c_l)
            inp = out
            if l < self.num_layers - 1 and self.dropout > 0.0 and not deterministic:
                inp = nn.Dropout(rate=self.dropout)(inp, deterministic=False)
        return (jnp.stack(new_h), jnp.stack(new_c)), inp
