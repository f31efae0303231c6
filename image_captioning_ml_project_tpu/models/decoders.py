"""Caption decoders: LSTM (lax.scan), Transformer (KV-cached), GPT-2
(per-layer prefix-KV; see :mod:`.gpt2`).

Capability parity with the reference decoder zoo
(reference: src/models/decoders.py:72-692), redesigned TPU-first:

* The reference's per-timestep Python loops (LSTM forward
  src/models/decoders.py:187-219, greedy generate 269-306, Transformer
  generate re-running the full prefix each step 461-491) become a single
  traced ``lax.scan`` / explicit KV-cache step — one compiled program, no
  host round-trips.
* Variable-length handling drops the reference's length-sort/unsort
  (src/models/decoders.py:157-166, 221-229) for masking under static shapes
  (XLA requirement; loss masking gives identical gradients).
* Every decoder exposes the uniform decode interface consumed by
  :mod:`..inference.decoding`::

      variables -> init_cache(encoder_features, max_length) -> state
      step(state, tokens[B]) -> (logits[B, V], state)

  States are pytrees with a leading batch axis on every array (so beam
  search can tile/gather them) except scalar position counters.

Intended-behavior fixes over the reference (SURVEY.md §2.4): ``generate``
uses the configured BOS id instead of the hardcoded ``start_token_id=1``
(src/models/decoders.py:240); the no-captions forward branch does not crash
on an undefined ``config`` (src/models/decoders.py:148).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import AttentionConfig, DecoderConfig, DecoderType
from ..ops.pallas_cross import fused_cross_attention, fused_cross_supported
from ..ops.pallas_decode import fused_beam_decode_attention
from .attention import build_attention
from .lstm import StackedLSTM

_NEG_INF = -1e9


# ---------------------------------------------------------------------------
# LSTM decoder (Show-Attend-Tell style)
# ---------------------------------------------------------------------------


class LSTMDecoder(nn.Module):
    """LSTM decoder with per-step cross-attention
    (reference: src/models/decoders.py:72-314).

    Per step: lstm_input = [embed(prev_token); prev_context] -> stacked LSTM
    -> attention(query=top hidden, kv=image features, sentinel states=last
    layer h/c) -> logits = output_layer(context). Hidden init from pooled
    features through init_h/init_c (reference :122-135).
    """

    config: DecoderConfig
    attention_config: AttentionConfig
    vocab_size: int
    pad_token_id: int
    bos_token_id: int = 1
    eos_token_id: int = 2
    embedding_dim: Optional[int] = None
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.embed_dim = self.embedding_dim or cfg.hidden_dim
        self.embedding = nn.Embed(self.vocab_size, self.embed_dim, dtype=self.dtype)
        self.lstm = StackedLSTM(cfg.hidden_dim, cfg.num_layers,
                                dropout=cfg.dropout, dtype=self.dtype)
        self.attention = build_attention(self.attention_config, dtype=self.dtype)
        self.output_layer = nn.Dense(self.vocab_size, dtype=self.dtype)
        self.init_h = nn.Dense(cfg.hidden_dim * cfg.num_layers, dtype=self.dtype)
        self.init_c = nn.Dense(cfg.hidden_dim * cfg.num_layers, dtype=self.dtype)
        self.drop = nn.Dropout(rate=cfg.dropout)

    def _init_states(self, pooled: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[B, D] -> (h, c) each [B, L, H] (reference :122-135)."""
        B = pooled.shape[0]
        L, H = self.config.num_layers, self.config.hidden_dim
        h = self.init_h(pooled).reshape(B, L, H)
        c = self.init_c(pooled).reshape(B, L, H)
        return h, c

    def _step_core(self, h, c, prev_context, token_emb, features, key_padding_mask):
        """One decode step shared by teacher forcing and generation."""
        lstm_input = jnp.concatenate([token_emb, prev_context], axis=-1)
        # StackedLSTM carries [L, B, H]
        (h_new, c_new), top = self.lstm(
            (h.transpose(1, 0, 2), c.transpose(1, 0, 2)), lstm_input)
        h_new = h_new.transpose(1, 0, 2)
        c_new = c_new.transpose(1, 0, 2)
        context, attn_w = self.attention(
            top, features, features,
            key_padding_mask=key_padding_mask,
            memory_state=h_new[:, -1], cell_state=c_new[:, -1])
        return h_new, c_new, context, attn_w

    def __call__(self, encoder_features: Dict[str, jnp.ndarray],
                 captions: jnp.ndarray,
                 caption_lengths: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """Teacher-forced forward: captions [B, T] -> logits [B, T, V]."""
        features = encoder_features["features"]
        attention_mask = encoder_features.get("attention_mask")
        key_padding_mask = None if attention_mask is None else ~attention_mask.astype(bool)
        B, T = captions.shape
        H = self.config.hidden_dim

        h, c = self._init_states(encoder_features["pooled_features"])
        embeddings = self.embedding(captions)
        embeddings = self.drop(embeddings, deterministic=deterministic)

        prev_context = jnp.zeros((B, H), dtype=embeddings.dtype)

        def body(mdl, carry, emb_t):
            h, c, prev_context = carry
            h, c, context, attn_w = mdl._step_core(
                h, c, prev_context, emb_t, features, key_padding_mask)
            logits_t = mdl.output_layer(
                mdl.drop(context, deterministic=deterministic))
            return (h, c, context), (logits_t, attn_w, h[:, -1])

        # nn.scan over time axis 1: params broadcast, dropout rng split.
        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False, "dropout": True},
                       in_axes=1, out_axes=1)
        _, (logits, attn_ws, hidden) = scan(self, (h, c, prev_context), embeddings)
        return {"logits": logits, "attention_weights": attn_ws,
                "hidden_states": hidden}

    def generate(self, encoder_features: Dict[str, jnp.ndarray],
                 max_length: int,
                 start_token_id: Optional[int] = None) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        """Greedy decode via lax.scan (reference: src/models/decoders.py:236-314).

        Output parity: position 0 holds the start token (the reference stores
        the current input before predicting the next, :269-271)."""
        features = encoder_features["features"]
        attention_mask = encoder_features.get("attention_mask")
        key_padding_mask = None if attention_mask is None else ~attention_mask.astype(bool)
        B = features.shape[0]
        H = self.config.hidden_dim
        start = self.bos_token_id if start_token_id is None else start_token_id

        h, c = self._init_states(encoder_features["pooled_features"])
        prev_context = jnp.zeros((B, H), dtype=features.dtype)
        current = jnp.full((B,), start, dtype=jnp.int32)

        def scan_body(carry, _):
            h, c, prev_context, current = carry
            emb = self.embedding(current)
            h, c, context, attn_w = self._step_core(
                h, c, prev_context, emb, features, key_padding_mask)
            logits = self.output_layer(context)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (h, c, context, nxt), (current, attn_w)

        _, (tokens, attn_ws) = jax.lax.scan(
            scan_body, (h, c, prev_context, current), None, length=max_length)
        return tokens.transpose(1, 0), {"attention_weights": attn_ws.transpose(1, 0, 2)}

    # -- uniform decode interface -------------------------------------------

    def init_cache(self, encoder_features: Dict[str, jnp.ndarray],
                   max_length: int) -> Dict[str, jnp.ndarray]:
        """LSTM carries (h/c/context) follow the beam; the image features
        and their mask are beam-permutation-invariant, so they sit under
        ``static`` (tiled once by beam search, never gathered per step)."""
        features = encoder_features["features"]
        attention_mask = encoder_features.get("attention_mask")
        if attention_mask is None:
            attention_mask = jnp.ones(features.shape[:2], dtype=jnp.bool_)
        B = features.shape[0]
        h, c = self._init_states(encoder_features["pooled_features"])
        return {
            "h": h,
            "c": c,
            "prev_context": jnp.zeros((B, self.config.hidden_dim), dtype=features.dtype),
            "static": {
                "features": features,
                "attention_mask": attention_mask.astype(jnp.bool_),
            },
        }

    def step(self, state: Dict[str, jnp.ndarray],
             tokens: jnp.ndarray) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        emb = self.embedding(tokens)
        h, c, context, _ = self._step_core(
            state["h"], state["c"], state["prev_context"], emb,
            state["static"]["features"], ~state["static"]["attention_mask"])
        logits = self.output_layer(context)
        new_state = dict(state, h=h, c=c, prev_context=context)
        return logits, new_state


# ---------------------------------------------------------------------------
# Transformer decoder
# ---------------------------------------------------------------------------


class CachedMHA(nn.Module):
    """Multi-head attention with optional explicit KV cache.

    Modes:
      * full: q_input [B, T, H], kv_input [B, S, H], additive bias.
      * cached self-attn step: q_input [B, 1, H], cache (k, v)
        [B, max_len, nh, hd], current position ``pos``.
    """

    hidden_dim: int
    num_heads: int
    dtype: Any = jnp.float32

    def setup(self):
        h = self.hidden_dim
        self.q_proj = nn.Dense(h, dtype=self.dtype)
        self.k_proj = nn.Dense(h, dtype=self.dtype)
        self.v_proj = nn.Dense(h, dtype=self.dtype)
        self.out_proj = nn.Dense(h, dtype=self.dtype)

    def _heads(self, x):
        B, T, _ = x.shape
        hd = self.hidden_dim // self.num_heads
        return x.reshape(B, T, self.num_heads, hd)

    def full(self, q_input, kv_input, bias=None):
        q = self._heads(self.q_proj(q_input))
        k = self._heads(self.k_proj(kv_input))
        v = self._heads(self.v_proj(kv_input))
        hd = q.shape[-1]
        scores = jnp.einsum("bqnd,bknd->bnqk", q, k,
                            preferred_element_type=jnp.float32) / (hd ** 0.5)
        if bias is not None:
            scores = scores + bias
        w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bnqk,bknd->bqnd", w, v)
        B, T = q_input.shape[:2]
        return self.out_proj(out.reshape(B, T, self.hidden_dim))

    def project_kv(self, kv_input):
        """Precompute cross-attention K/V: [B, S, nh, hd] each."""
        return self._heads(self.k_proj(kv_input)), self._heads(self.v_proj(kv_input))

    def attend_precomputed(self, q_input, k, v, key_padding_mask=None):
        """q_input [B, T, H] against precomputed k/v [B, S, nh, hd]
        (cross-attention over a fixed memory)."""
        q = self._heads(self.q_proj(q_input))
        hd = q.shape[-1]
        scores = jnp.einsum("bqnd,bknd->bnqk", q, k,
                            preferred_element_type=jnp.float32) / (hd ** 0.5)
        if key_padding_mask is not None:
            scores = jnp.where(key_padding_mask[:, None, None, :], _NEG_INF, scores)
        w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bnqk,bknd->bqnd", w, v)
        B, T = q_input.shape[:2]
        return self.out_proj(out.reshape(B, T, self.hidden_dim))


class TransformerDecoderLayer(nn.Module):
    """Post-LN decoder layer with gelu FFN (torch
    nn.TransformerDecoderLayer semantics, reference:
    src/models/decoders.py:349-360)."""

    hidden_dim: int
    num_heads: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    def setup(self):
        h = self.hidden_dim
        self.self_attn = CachedMHA(h, self.num_heads, dtype=self.dtype)
        self.cross_attn = CachedMHA(h, self.num_heads, dtype=self.dtype)
        self.linear1 = nn.Dense(h * 4, dtype=self.dtype)
        self.linear2 = nn.Dense(h, dtype=self.dtype)
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm3 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.drop = nn.Dropout(rate=self.dropout)

    def _ffn(self, x, deterministic):
        y = nn.gelu(self.linear1(x), approximate=False)
        y = self.drop(y, deterministic=deterministic)
        return self.linear2(y)

    def full(self, x, memory, self_bias=None, memory_key_padding_mask=None,
             deterministic: bool = True):
        y = self.self_attn.full(x, x, bias=self_bias)
        x = self.norm1(x + self.drop(y, deterministic=deterministic))
        y = self.cross_attn.attend_precomputed(
            x, *self.cross_attn.project_kv(memory),
            key_padding_mask=memory_key_padding_mask)
        x = self.norm2(x + self.drop(y, deterministic=deterministic))
        y = self._ffn(x, deterministic)
        return self.norm3(x + self.drop(y, deterministic=deterministic))

    def init_layer_cache(self, memory, max_length):
        B = memory.shape[0]
        # flat [B, pos, H] layout shared by the fused Pallas decode kernel
        # and the XLA fallback; position axis rounded up to a multiple of 8
        # (Mosaic DMA alignment; the s < pos masks exclude padding rows)
        s_alloc = -(-max_length // 8) * 8
        return {
            "k": jnp.zeros((B, s_alloc, self.hidden_dim), dtype=memory.dtype),
            "v": jnp.zeros((B, s_alloc, self.hidden_dim), dtype=memory.dtype),
        }

    def init_memory_cache(self, memory):
        """Cross-attention K/V: per-*image* constants (beam-invariant) —
        kept in the decode state's ``shared`` subtree. Keys are stored
        **pre-transposed** ``[B, H, Sm8]`` so the fused cross-attention
        kernel's score dot (``Q_exp [K*NH, H] x [H, Sm]``) reads them
        without an in-kernel transpose; values stay ``[B, Sm8, H]``. The
        memory axis is padded to a multiple of 8 (Mosaic sublane
        alignment; padded rows are masked by the decode-time
        ``mem_pad``)."""
        mem_k, mem_v = self.cross_attn.project_kv(memory)
        B, S = mem_k.shape[:2]
        S8 = -(-S // 8) * 8
        mk = mem_k.reshape(B, S, self.hidden_dim)
        mv = mem_v.reshape(B, S, self.hidden_dim)
        if S8 != S:
            mk = jnp.pad(mk, ((0, 0), (0, S8 - S), (0, 0)))
            mv = jnp.pad(mv, ((0, 0), (0, S8 - S), (0, 0)))
        # default mask covering the zero-padded tail rows: callers that
        # pass memory_key_padding_mask=None would otherwise let the pad
        # keys (score exactly 0) into the softmax denominator
        tail = jnp.arange(S8) >= S                          # [S8]
        return {"mem_k": mk.transpose(0, 2, 1), "mem_v": mv,
                "pad_tail": jnp.broadcast_to(tail, (B, S8))}

    def _cross_attend_shared(self, x, mem_k, mem_v, memory_key_padding_mask,
                             kernel="xla"):
        """Cross-attention against per-image memory: x [Bk, 1, H] with
        mem_k [B, H, Sm8] (pre-transposed) / mem_v [B, Sm8, H] shared
        across the Bk = B*K beam tiles. ``kernel="pallas"`` runs the
        fused grid-cell kernel (ops/pallas_cross.py) when the shapes
        support it."""
        Bk = x.shape[0]
        B, H, Sm8 = mem_k.shape
        K = Bk // B
        nh = self.num_heads
        hd = self.hidden_dim // nh
        # same reciprocal-multiply on both paths: x/(hd**0.5) and
        # x*(1/(hd**0.5)) differ by 1 ulp for non-power-of-two hd, enough
        # to flip near-tied beam tokens between kernel and fallback
        scale = 1.0 / (hd ** 0.5)
        if kernel == "pallas" and fused_cross_supported(Sm8, H,
                                                        mem_k.dtype):
            q = self.cross_attn.q_proj(x)[:, 0, :]
            out = fused_cross_attention(
                q, mem_k, mem_v, memory_key_padding_mask,
                num_heads=nh, beam_size=K, scale=scale)
            return self.cross_attn.out_proj(out[:, None, :])
        mkh = mem_k.reshape(B, nh, hd, Sm8)
        mvh = mem_v.reshape(B, Sm8, nh, hd)
        q = self.cross_attn._heads(self.cross_attn.q_proj(x))  # [Bk,1,nh,hd]
        qg = q.reshape(B, K, nh, hd)
        scores = jnp.einsum("bgnd,bnds->bgns", qg, mkh,
                            preferred_element_type=jnp.float32) * scale
        if memory_key_padding_mask is not None:
            scores = jnp.where(
                memory_key_padding_mask[:, None, None, :], _NEG_INF, scores)
        w = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bgns,bsnd->bgnd", w.astype(mvh.dtype), mvh)
        return self.cross_attn.out_proj(
            out.reshape(Bk, 1, self.hidden_dim))

    def cached_step(self, x, cache, pos, mem, memory_key_padding_mask=None,
                    anc_local=None, kernel="xla"):
        """x [Bk, 1, H]; self-KV cached flat [Bk, S, H] and written at
        ``pos``; ``anc_local`` [Bk, S] int32 in [0, K) applies lazy beam
        reorder at read time; cross-attention memory comes from the shared
        subtree ``mem``.

        ``kernel="pallas"`` routes the self-attention read-score-mix-append
        through :func:`..ops.pallas_decode.fused_beam_decode_attention`
        (prefix-free mode) — XLA copies the whole cache on every append on
        this toolchain, the kernel updates it in place."""
        sa = self.self_attn
        xf = x[:, 0, :]
        q = sa.q_proj(xf)
        k_new = sa.k_proj(xf)
        v_new = sa.v_proj(xf)
        nh = self.num_heads
        hd = self.hidden_dim // nh
        scale = 1.0 / (hd ** 0.5)
        Bk = xf.shape[0]
        k_cache, v_cache = cache["k"], cache["v"]
        S = k_cache.shape[1]
        B = mem["mem_k"].shape[0]
        K = Bk // B

        if kernel == "pallas":
            from ..models.gpt2 import _fold_qkv_enabled
            from ..ops.pallas_decode import (fused_beam_decode_attention_qkv,
                                             fused_decode_qkv_supported)

            H = self.hidden_dim
            if _fold_qkv_enabled() and (
                    jax.default_backend() != "tpu"
                    or fused_decode_qkv_supported(S, H, k_cache.dtype, K)):
                # folded fast path (see GPT2Attention.cached_step): the
                # three separate projections concatenate into one [H, 3H]
                # weight — bit-identical (each output column contracts
                # only its own weight column) and loop-invariant, so XLA
                # hoists the concat out of the decode scan
                qp = sa.q_proj.variables["params"]
                kp = sa.k_proj.variables["params"]
                vp = sa.v_proj.variables["params"]
                op = sa.out_proj.variables["params"]
                wqkv = jnp.concatenate(
                    [qp["kernel"], kp["kernel"], vp["kernel"]],
                    axis=1).astype(self.dtype)
                bqkv = jnp.concatenate(
                    [qp["bias"], kp["bias"], vp["bias"]]).astype(self.dtype)
                out, k_cache, v_cache = fused_beam_decode_attention_qkv(
                    xf.astype(self.dtype), wqkv, bqkv,
                    op["kernel"].astype(self.dtype),
                    op["bias"].astype(self.dtype),
                    k_cache, v_cache, None, None, anc_local, pos,
                    num_heads=nh, beam_size=K, scale=scale)
                y = out[:, None, :]
            else:
                out, k_cache, v_cache = fused_beam_decode_attention(
                    q, k_new, v_new, k_cache, v_cache, None, None,
                    anc_local, pos, num_heads=nh, beam_size=K, scale=scale)
                y = sa.out_proj(out)[:, None, :]
        else:
            qh = q.reshape(Bk, 1, nh, hd)
            kh_new = k_new.reshape(Bk, 1, nh, hd)
            vh_new = v_new.reshape(Bk, 1, nh, hd)
            if anc_local is not None:
                idx = (anc_local
                       + (jnp.arange(Bk, dtype=anc_local.dtype)[:, None]
                          // K) * K)[:, :, None, None]
                k_read = jnp.take_along_axis(
                    k_cache.reshape(Bk, S, nh, hd), idx, axis=0)
                v_read = jnp.take_along_axis(
                    v_cache.reshape(Bk, S, nh, hd), idx, axis=0)
            else:
                k_read = k_cache.reshape(Bk, S, nh, hd)
                v_read = v_cache.reshape(Bk, S, nh, hd)

            scores_old = jnp.einsum("bqnd,bknd->bnqk", qh, k_read,
                                    preferred_element_type=jnp.float32) * scale
            scores_old = jnp.where(
                (jnp.arange(S) < pos)[None, None, None, :],
                scores_old, _NEG_INF)
            score_self = (qh.astype(jnp.float32)
                          * kh_new.astype(jnp.float32)).sum(-1) * scale
            score_self = score_self.transpose(0, 2, 1)[:, :, :, None]
            w = jax.nn.softmax(
                jnp.concatenate([scores_old, score_self], axis=-1), axis=-1)
            out = jnp.einsum("bnqk,bknd->bqnd",
                             w[..., :S].astype(v_read.dtype), v_read)
            out = out + w[..., S].transpose(0, 2, 1)[..., None].astype(
                vh_new.dtype) * vh_new
            y = sa.out_proj(out.reshape(Bk, 1, self.hidden_dim))
            # write LAST: final buffer use in the scan iteration
            k_cache = jax.lax.dynamic_update_slice_in_dim(
                k_cache, k_new[:, None, :], pos, axis=1)
            v_cache = jax.lax.dynamic_update_slice_in_dim(
                v_cache, v_new[:, None, :], pos, axis=1)

        x = self.norm1(x + y)
        if memory_key_padding_mask is None:
            # the memory axis is stored zero-padded to Sm8: without a
            # caller mask the pad tail must still be excluded
            memory_key_padding_mask = mem.get("pad_tail")
        y = self._cross_attend_shared(x, mem["mem_k"], mem["mem_v"],
                                      memory_key_padding_mask, kernel=kernel)
        x = self.norm2(x + y)
        y = self._ffn(x, True)
        x = self.norm3(x + y)
        return x, dict(cache, k=k_cache, v=v_cache)


class TransformerDecoder(nn.Module):
    """Transformer caption decoder
    (reference: src/models/decoders.py:317-493): learned positional
    embeddings (:344-346), visual memory projection (:366), causal mask
    (:401); generation here is KV-cached instead of re-encoding the prefix
    every step (:461-491)."""

    config: DecoderConfig
    vocab_size: int
    pad_token_id: int
    bos_token_id: int
    eos_token_id: int
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        h = cfg.hidden_dim
        self.embedding = nn.Embed(self.vocab_size, h, dtype=self.dtype)
        self.position_encoding = nn.Embed(cfg.max_length, h, dtype=self.dtype)
        self.layers = [
            TransformerDecoderLayer(h, cfg.num_heads, cfg.dropout,
                                    dtype=self.dtype, name=f"layer_{i}")
            for i in range(cfg.num_layers)
        ]
        self.output_layer = nn.Dense(self.vocab_size, dtype=self.dtype)
        self.visual_projection = nn.Dense(h, dtype=self.dtype)
        self.drop = nn.Dropout(rate=cfg.dropout)

    def __call__(self, encoder_features: Dict[str, jnp.ndarray],
                 captions: jnp.ndarray,
                 caption_lengths: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        memory = self.visual_projection(encoder_features["features"])
        mem_mask = encoder_features.get("attention_mask")
        mem_pad = None if mem_mask is None else ~mem_mask.astype(bool)
        B, T = captions.shape

        x = self.embedding(captions)
        x = x + self.position_encoding(jnp.arange(T)[None, :])
        x = self.drop(x, deterministic=deterministic)

        # causal + target padding additive bias [B, 1, T, T]
        causal = jnp.tril(jnp.ones((T, T), dtype=bool))
        bias = jnp.where(causal[None, None], 0.0, _NEG_INF)
        tgt_pad = captions == self.pad_token_id
        bias = bias + jnp.where(tgt_pad[:, None, None, :], _NEG_INF, 0.0)

        for layer in self.layers:
            x = layer.full(x, memory, self_bias=bias,
                           memory_key_padding_mask=mem_pad,
                           deterministic=deterministic)
        logits = self.output_layer(x)
        return {"logits": logits, "hidden_states": x}

    # -- uniform decode interface -------------------------------------------

    def init_cache(self, encoder_features: Dict[str, jnp.ndarray],
                   max_length: int) -> Dict[str, Any]:
        """Self-attention caches live under ``lazy`` (unpermuted scan
        carries; beam search reorders an ancestry map instead); the
        cross-attention memory K/V and padding mask are per-image constants
        under ``shared`` (never tiled/gathered)."""
        memory = self.visual_projection(encoder_features["features"])
        mem_mask = encoder_features.get("attention_mask")
        if mem_mask is None:
            mem_mask = jnp.ones(memory.shape[:2], dtype=jnp.bool_)
        layer_caches = [l.init_layer_cache(memory, max_length)
                        for l in self.layers]
        mem_caches = [l.init_memory_cache(memory) for l in self.layers]
        # memory K/V are stored 8-row-padded (init_memory_cache); the pad
        # rows are masked here so both decode paths ignore them
        S = memory.shape[1]
        S8 = -(-S // 8) * 8
        mem_pad = ~mem_mask.astype(bool)
        if S8 != S:
            mem_pad = jnp.pad(mem_pad, ((0, 0), (0, S8 - S)),
                              constant_values=True)
        return {
            "lazy": {"layers": layer_caches},
            "shared": {"layers": mem_caches,
                       "mem_pad": mem_pad},
            "pos": jnp.zeros((), dtype=jnp.int32),
        }

    def step(self, state: Dict[str, Any],
             tokens: jnp.ndarray) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        from ..ops.pallas_decode import resolve_decode_kernel

        pos = state["pos"]
        _c0 = state["lazy"]["layers"][0]
        # beam width = tiled rows / per-image shared rows ("auto" must fall
        # back to XLA when a whole beam block can't fit the VMEM scratch)
        _K = tokens.shape[0] // state["shared"]["layers"][0]["mem_k"].shape[0]
        kernel = resolve_decode_kernel(
            self.config.decode_kernel, cache_len=_c0["k"].shape[1],
            width=_c0["k"].shape[2], dtype=_c0["k"].dtype, beam_size=_K)
        ancestry = state["lazy"].get("ancestry")  # set by beam search only
        anc_local = None
        if ancestry is not None:
            Bk = tokens.shape[0]
            B = state["shared"]["layers"][0]["mem_k"].shape[0]
            K = Bk // B
            anc_local = (ancestry - (jnp.arange(
                Bk, dtype=ancestry.dtype)[:, None] // K) * K)
            s_alloc = state["lazy"]["layers"][0]["k"].shape[1]
            if anc_local.shape[1] < s_alloc:  # cache axis is 8-aligned
                anc_local = jnp.pad(
                    anc_local, ((0, 0), (0, s_alloc - anc_local.shape[1])))
        x = self.embedding(tokens)[:, None, :]
        x = x + self.position_encoding(pos[None, None])
        new_caches = []
        for layer, cache, mem in zip(self.layers, state["lazy"]["layers"],
                                     state["shared"]["layers"]):
            x, cache = layer.cached_step(
                x, cache, pos, mem,
                memory_key_padding_mask=state["shared"]["mem_pad"],
                anc_local=anc_local, kernel=kernel)
            new_caches.append(cache)
        logits = self.output_layer(x[:, 0])
        new_lazy = dict(state["lazy"], layers=new_caches)
        return logits, dict(state, lazy=new_lazy, pos=pos + 1)

    def generate(self, encoder_features: Dict[str, jnp.ndarray],
                 max_length: int) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        """Greedy KV-cached generation. Parity with the reference's greedy
        loop (src/models/decoders.py:439-493): sequence starts with BOS."""
        B = encoder_features["features"].shape[0]
        state = self.init_cache(encoder_features, max_length)
        current = jnp.full((B,), self.bos_token_id, dtype=jnp.int32)

        def scan_body(carry, _):
            state, current = carry
            logits, state = self.step(state, current)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (state, nxt), current

        (_, _), tokens = jax.lax.scan(
            scan_body, (state, current), None, length=max_length)
        return tokens.transpose(1, 0), {}


def build_decoder(config: DecoderConfig,
                  attention_config: AttentionConfig,
                  vocab_size: int,
                  pad_token_id: int,
                  bos_token_id: int,
                  eos_token_id: int,
                  dtype=jnp.float32) -> nn.Module:
    """Factory (reference: src/models/decoders.py:659-692)."""
    from .gpt2 import GPT2Decoder

    if config.decoder_type == DecoderType.LSTM:
        return LSTMDecoder(config=config, attention_config=attention_config,
                           vocab_size=vocab_size, pad_token_id=pad_token_id,
                           bos_token_id=bos_token_id, eos_token_id=eos_token_id,
                           dtype=dtype)
    if config.decoder_type == DecoderType.TRANSFORMER:
        return TransformerDecoder(config=config, vocab_size=vocab_size,
                                  pad_token_id=pad_token_id,
                                  bos_token_id=bos_token_id,
                                  eos_token_id=eos_token_id, dtype=dtype)
    if config.decoder_type == DecoderType.GPT2:
        return GPT2Decoder(config=config, vocab_size=vocab_size,
                           pad_token_id=pad_token_id,
                           bos_token_id=bos_token_id,
                           eos_token_id=eos_token_id, dtype=dtype)
    raise ValueError(f"Unsupported decoder type: {config.decoder_type}")
