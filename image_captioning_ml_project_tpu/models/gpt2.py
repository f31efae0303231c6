"""GPT-2 caption decoder with per-layer prefix-KV image conditioning.

Capability parity with the reference's GPT2Decoder
(reference: src/models/decoders.py:496-656) on a from-scratch Flax GPT-2
backbone (HF GPT2LMHeadModel weights port via
:func:`..models.hf_port.port_gpt2`; tied LM head; gelu_new activation).

The reference conditions the LM on the image by mapping pooled features to a
``prefix_length``-token prefix (src/models/decoders.py:550-552, 571-574) but
feeds it through an *acknowledged placeholder* past-KV constructor that
reuses raw embeddings as every layer's K and V with the wrong shapes
(src/models/decoders.py:597-617, comment at 599-601). Here the intended
design is implemented: the prefix embeddings are run through the transformer
itself, so each layer's prefix K/V are that layer's real key/value
projections of its own hidden states — equivalent to prepending the prefix
as soft-prompt tokens at positions ``0..P-1`` (captions start at position
``P``, matching HF's past-KV position offsetting).

TPU-first: teacher-forced training runs one fused pass over
``[prefix; captions]``; generation uses an explicit KV cache pytree
(prefix prefilled) through the uniform init_cache/step interface consumed by
:mod:`..inference.decoding`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import DecoderConfig
from ..ops.pallas_decode import (STACK_WEIGHT_KEYS, _stack_fold_enabled,
                                 fused_beam_decode_attention,
                                 fused_beam_decode_attention_qkv,
                                 fused_beam_decode_stack,
                                 fused_decode_qkv_supported,
                                 fused_decode_stack_supported)


def _fold_qkv_enabled() -> bool:
    """Experiment knob: ICT_DECODE_FOLD=0 reverts the pallas decode path
    to the split formulation (XLA-side QKV/out-proj matmuls around the
    attention kernel) for A/B runs; default is the folded kernel."""
    import os

    return os.environ.get("ICT_DECODE_FOLD", "1") != "0"

_NEG_INF = -1e9


class GPT2Attention(nn.Module):
    hidden_dim: int
    num_heads: int
    dropout: float = 0.0  # HF attn_pdrop/resid_pdrop (train path only)
    dtype: Any = jnp.float32

    def setup(self):
        self.c_attn = nn.Dense(3 * self.hidden_dim, dtype=self.dtype)
        self.c_proj = nn.Dense(self.hidden_dim, dtype=self.dtype)
        self.attn_drop = nn.Dropout(self.dropout)
        self.resid_drop = nn.Dropout(self.dropout)

    def _qkv(self, x):
        B, T, _ = x.shape
        nh = self.num_heads
        hd = self.hidden_dim // nh
        qkv = self.c_attn(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return (q.reshape(B, T, nh, hd), k.reshape(B, T, nh, hd),
                v.reshape(B, T, nh, hd))

    def full(self, x, attn_bias=None, deterministic: bool = True):
        """Causal self-attention over x [B, T, H] (+ additive bias).
        ``deterministic=False`` applies HF's attn/resid dropout (the
        reference fine-tunes GPT2LMHeadModel in train mode,
        src/models/decoders.py:535-543)."""
        q, k, v = self._qkv(x)
        hd = q.shape[-1]
        scores = jnp.einsum("bqnd,bknd->bnqk", q, k,
                            preferred_element_type=jnp.float32) / (hd ** 0.5)
        T = x.shape[1]
        causal = jnp.tril(jnp.ones((T, T), dtype=bool))
        scores = jnp.where(causal[None, None], scores, _NEG_INF)
        if attn_bias is not None:
            scores = scores + attn_bias
        w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        w = self.attn_drop(w, deterministic=deterministic)
        out = jnp.einsum("bnqk,bknd->bqnd", w, v)
        B = x.shape[0]
        out = self.c_proj(out.reshape(B, T, self.hidden_dim))
        return self.resid_drop(out, deterministic=deterministic), (k, v)

    def cached_step(self, x, k_cache, v_cache, pos, prefix_k=None,
                    prefix_v=None, anc_local=None, kernel="xla"):
        """x [Bk, 1, H]; write K/V at suffix position ``pos``, attend over
        the (optional) shared prefix plus suffix positions <= pos.

        Caches are **flat** [Bk, S, H]; ``prefix_k``/``prefix_v`` [B, P, H]
        are per-*image* (identical across the Bk = B*K tiled beams), so beam
        search never tiles or gathers them.

        ``anc_local`` [Bk, S] int32 in [0, K): lazy beam reorder — the cache
        is *never* physically permuted by beam search; row
        ``anc_local[r, t]`` names which of slot r's image-local beam rows
        holds position t's K/V, and the permutation is applied at read time.

        ``kernel`` selects the step implementation:

        * ``"pallas"`` — the fused decode kernel
          (:func:`..ops.pallas_decode.fused_beam_decode_attention`): one
          VMEM pass over the cache block, per-head MXU reductions, and a
          truly in-place DMA append. XLA copies the full cache on every
          dynamic_update_slice on this toolchain (measured,
          scripts/bench_cache_variants.py), so this is the TPU fast path.
        * ``"xla"`` — the portable path (CPU tests, sharded multi-chip
          decode): gather-free one-hot candidate select + write-last DUS.
        """
        xf = x[:, 0, :]
        nh = self.num_heads
        H = self.hidden_dim
        hd = H // nh
        scale = 1.0 / (hd ** 0.5)
        Bk = xf.shape[0]
        S = k_cache.shape[1]

        if kernel == "pallas" and prefix_k is not None:
            K = Bk // prefix_k.shape[0]
            # interpret mode (CPU tests) has no VMEM/lane-tiling limits, so
            # the folded path engages there regardless of width — the
            # pallas-vs-xla parity tests then cover it by default
            if _fold_qkv_enabled() and (
                    jax.default_backend() != "tpu"
                    or fused_decode_qkv_supported(S, H, k_cache.dtype, K)):
                # folded fast path: QKV projection + attention + output
                # projection in ONE Pallas call per layer (bit-identical
                # to the split path below — +3.2 ms/decode measured,
                # scripts/bench_fused_qkv.py). Weights are read straight
                # off the bound submodules and cast exactly as nn.Dense's
                # promote_dtype would.
                ap = self.c_attn.variables["params"]
                pp = self.c_proj.variables["params"]
                out, k_cache, v_cache = fused_beam_decode_attention_qkv(
                    xf.astype(self.dtype),
                    ap["kernel"].astype(self.dtype),
                    ap["bias"].astype(self.dtype),
                    pp["kernel"].astype(self.dtype),
                    pp["bias"].astype(self.dtype),
                    k_cache, v_cache, prefix_k, prefix_v,
                    anc_local, pos, num_heads=nh, beam_size=K, scale=scale)
                return out[:, None, :], k_cache, v_cache
            qkv = self.c_attn(xf)                         # [Bk, 3H]
            q, k_new, v_new = jnp.split(qkv, 3, axis=-1)  # [Bk, H] each
            out, k_cache, v_cache = fused_beam_decode_attention(
                q, k_new, v_new, k_cache, v_cache, prefix_k, prefix_v,
                anc_local, pos, num_heads=nh, beam_size=K, scale=scale)
            return self.c_proj(out)[:, None, :], k_cache, v_cache

        qkv = self.c_attn(xf)                           # [Bk, 3H]
        q, k_new, v_new = jnp.split(qkv, 3, axis=-1)    # [Bk, H] each

        qh = q.reshape(Bk, 1, nh, hd)
        kh_new = k_new.reshape(Bk, 1, nh, hd)
        vh_new = v_new.reshape(Bk, 1, nh, hd)

        if anc_local is not None and prefix_k is not None:
            # Gather-free lazy-ancestry read: score q against the K
            # candidate beam rows of its own image (Kx extra dot FLOPs on a
            # tiny contraction — MXU-cheap) and select per (slot, position)
            # with a one-hot sum over the beam axis, so no permuted cache
            # copy ever materializes.
            B = prefix_k.shape[0]
            K = Bk // B
            qg = qh.reshape(B, K, nh, hd)
            kb = k_cache.reshape(B, K, S, nh, hd)
            scores_all = jnp.einsum(
                "bqnd,bcsnd->bqcns", qg, kb,
                preferred_element_type=jnp.float32) * scale      # [B,K,K,nh,S]
            onehot = (anc_local.reshape(B, K, 1, S)
                      == jnp.arange(K, dtype=anc_local.dtype)[None, None, :, None])
            scores_old = jnp.where(onehot[:, :, :, None, :], scores_all,
                                   0.0).sum(axis=2)              # [B,K,nh,S]
            scores_old = scores_old.reshape(Bk, nh, 1, S)
            v_read = None  # output side handled by the selecting einsum below
            sel = onehot
        else:
            kh = k_cache.reshape(Bk, S, nh, hd)
            v_read = v_cache.reshape(Bk, S, nh, hd)
            scores_old = jnp.einsum("bqnd,bknd->bnqk", qh, kh,
                                    preferred_element_type=jnp.float32) * scale
            sel = None

        # past suffix entries: strictly < pos (this step's entry is handled
        # separately below and the cache slot may hold stale data)
        scores_old = jnp.where((jnp.arange(S) < pos)[None, None, None, :],
                               scores_old, _NEG_INF)
        score_self = (qh.astype(jnp.float32)
                      * kh_new.astype(jnp.float32)).sum(-1) * scale  # [Bk,1,nh]
        score_self = score_self.transpose(0, 2, 1)[:, :, :, None]   # [Bk,nh,1,1]

        parts = [scores_old, score_self]
        off = 0
        if prefix_k is not None:
            B = prefix_k.shape[0]
            K = Bk // B
            P = prefix_k.shape[1]
            ph_k = prefix_k.reshape(B, P, nh, hd)
            qg = qh.reshape(B, K, nh, hd)
            scores_pre = jnp.einsum(
                "bgnd,bpnd->bgnp", qg, ph_k,
                preferred_element_type=jnp.float32).reshape(Bk, nh, 1, P) * scale
            parts = [scores_pre] + parts
            off = P
        w = jax.nn.softmax(jnp.concatenate(parts, axis=-1), axis=-1)

        out = 0.0
        if prefix_k is not None:
            ph_v = prefix_v.reshape(B, P, nh, hd)
            w_pre = w[..., :off].reshape(B, K, nh, off)
            out = jnp.einsum("bgnp,bpnd->bgnd", w_pre.astype(prefix_v.dtype),
                             ph_v).reshape(Bk, 1, nh, hd)
        w_old = w[..., off:off + S]
        w_self = w[..., off + S]  # [Bk, nh, 1]
        if sel is not None:
            onehot = sel
            vb = v_cache.reshape(B, K, S, nh, hd)
            wsel = (w_old.reshape(B, K, nh, S)[:, :, None, :, :]
                    * onehot[:, :, :, None, :])                  # [B,K,K,nh,S]
            out = out + jnp.einsum(
                "bqcns,bcsnd->bqnd", wsel.astype(vb.dtype),
                vb).reshape(Bk, 1, nh, hd)
        else:
            out = out + jnp.einsum("bnqk,bknd->bqnd",
                                   w_old.astype(v_read.dtype), v_read)
        out = out + w_self.transpose(0, 2, 1)[..., None].astype(vh_new.dtype) \
            * vh_new

        # write LAST: final use of the carried cache buffers this iteration
        k_cache = jax.lax.dynamic_update_slice_in_dim(
            k_cache, k_new[:, None, :], pos, axis=1)
        v_cache = jax.lax.dynamic_update_slice_in_dim(
            v_cache, v_new[:, None, :], pos, axis=1)
        return (self.c_proj(out.reshape(Bk, 1, self.hidden_dim)),
                k_cache, v_cache)


class GPT2MLP(nn.Module):
    hidden_dim: int
    dropout: float = 0.0  # HF resid_pdrop (train path only)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = nn.Dense(4 * self.hidden_dim, dtype=self.dtype, name="c_fc")(x)
        y = nn.gelu(y, approximate=True)  # HF gelu_new
        y = nn.Dense(self.hidden_dim, dtype=self.dtype, name="c_proj")(y)
        return nn.Dropout(self.dropout)(y, deterministic=deterministic)


class GPT2Block(nn.Module):
    hidden_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        self.ln_1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.ln_2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.attn = GPT2Attention(self.hidden_dim, self.num_heads,
                                  dropout=self.dropout, dtype=self.dtype)
        self.mlp = GPT2MLP(self.hidden_dim, dropout=self.dropout,
                           dtype=self.dtype)

    def full(self, x, attn_bias=None, deterministic: bool = True):
        y, kv = self.attn.full(self.ln_1(x), attn_bias=attn_bias,
                               deterministic=deterministic)
        x = x + y
        x = x + self.mlp(self.ln_2(x), deterministic=deterministic)
        return x, kv

    def cached_step(self, x, k_cache, v_cache, pos, prefix_k=None,
                    prefix_v=None, anc_local=None, kernel="xla"):
        y, k_cache, v_cache = self.attn.cached_step(
            self.ln_1(x), k_cache, v_cache, pos,
            prefix_k=prefix_k, prefix_v=prefix_v, anc_local=anc_local,
            kernel=kernel)
        x = x + y
        x = x + self.mlp(self.ln_2(x))
        return x, k_cache, v_cache


class GPT2Backbone(nn.Module):
    """HF GPT2LMHeadModel-compatible transformer with tied LM head."""

    vocab_size: int
    hidden_dim: int
    num_layers: int
    num_heads: int
    n_positions: int = 1024
    dropout: float = 0.0  # HF embd/attn/resid_pdrop (train path only)
    dtype: Any = jnp.float32

    def setup(self):
        self.wte = nn.Embed(self.vocab_size, self.hidden_dim, dtype=self.dtype)
        self.wpe = nn.Embed(self.n_positions, self.hidden_dim, dtype=self.dtype)
        self.blocks = [
            GPT2Block(self.hidden_dim, self.num_heads,
                      dropout=self.dropout, dtype=self.dtype,
                      name=f"block_{i}")
            for i in range(self.num_layers)
        ]
        self.ln_f = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.embd_drop = nn.Dropout(self.dropout)

    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """Plain language-model forward: ids [B, T] -> logits [B, T, V]."""
        x = self.wte(input_ids)
        x = x + self.wpe(jnp.arange(input_ids.shape[1])[None, :])
        hidden, _ = self.full(x)
        return self.logits(hidden)

    def full(self, inputs_embeds, attn_bias=None, deterministic: bool = True):
        """inputs_embeds [B, T, H] (positions already added).
        Returns (hidden [B,T,H], per-layer (k, v))."""
        x = self.embd_drop(inputs_embeds, deterministic=deterministic)
        kvs = []
        for block in self.blocks:
            x, kv = block.full(x, attn_bias=attn_bias,
                               deterministic=deterministic)
            kvs.append(kv)
        return self.ln_f(x), kvs

    def logits(self, hidden):
        return self.wte.attend(hidden)


class GPT2Decoder(nn.Module):
    """GPT-2 caption decoder (reference: src/models/decoders.py:496-656)."""

    config: DecoderConfig
    vocab_size: int
    pad_token_id: int
    bos_token_id: int
    eos_token_id: int
    feature_dim: Optional[int] = None  # encoder projection dim; defaults to hidden_dim
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        h = cfg.hidden_dim
        self.backbone = GPT2Backbone(
            vocab_size=self.vocab_size, hidden_dim=h,
            num_layers=cfg.num_layers, num_heads=cfg.num_heads,
            n_positions=cfg.gpt2_n_positions, dropout=cfg.dropout,
            dtype=self.dtype)
        self.prefix_length = cfg.prefix_length
        # reference: src/models/decoders.py:544-552 (the reference also
        # defines a visual_projection at :539-541 but never uses it; it is
        # intentionally omitted here — see docs/parity.md)
        self.image_to_prefix = nn.Dense(self.prefix_length * h, dtype=self.dtype)
        self.image_prefix = self.param(
            "image_prefix", nn.initializers.normal(stddev=1.0),
            (1, self.prefix_length, h))

    def _prefix_embeds(self, pooled: jnp.ndarray) -> jnp.ndarray:
        """Pooled image features -> [B, P, H] prefix token embeddings
        (learned global prefix + per-image projection), with position
        embeddings for slots 0..P-1."""
        B = pooled.shape[0]
        P = self.prefix_length
        h = self.config.hidden_dim
        prefix = self.image_to_prefix(pooled).reshape(B, P, h)
        prefix = prefix + self.image_prefix.astype(prefix.dtype)
        pos = self.backbone.wpe(jnp.arange(P)[None, :])
        return prefix + pos

    def __call__(self, encoder_features: Dict[str, jnp.ndarray],
                 captions: jnp.ndarray,
                 caption_lengths: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """Teacher-forced forward: one fused pass over [prefix; captions].

        Returns logits for the caption positions, [B, T, V]."""
        pooled = encoder_features["pooled_features"]
        B, T = captions.shape
        P = self.prefix_length

        prefix = self._prefix_embeds(pooled)
        tok = self.backbone.wte(captions)
        tok = tok + self.backbone.wpe(P + jnp.arange(T)[None, :])
        x = jnp.concatenate([prefix.astype(tok.dtype), tok], axis=1)

        # key padding: prefix always visible; caption pads masked
        # (reference builds attention_mask = captions != pad, :581)
        pad = captions == self.pad_token_id
        key_pad = jnp.concatenate(
            [jnp.zeros((B, P), dtype=bool), pad], axis=1)
        attn_bias = jnp.where(key_pad[:, None, None, :], _NEG_INF, 0.0)

        hidden, _ = self.backbone.full(x, attn_bias=attn_bias,
                                       deterministic=deterministic)
        logits = self.backbone.logits(hidden[:, P:])
        return {"logits": logits, "hidden_states": hidden[:, P:]}

    # -- uniform decode interface -------------------------------------------

    def init_cache(self, encoder_features: Dict[str, jnp.ndarray],
                   max_length: int) -> Dict[str, Any]:
        """Split KV cache: the prefix K/V (positions 0..P-1, identical for
        all beams of an image) live in the ``shared`` subtree that beam
        search neither tiles nor gathers; only the generated-suffix caches
        take part in per-step beam reordering."""
        pooled = encoder_features["pooled_features"]
        B = pooled.shape[0]
        nh = self.config.num_heads
        hd = self.config.hidden_dim // nh

        prefix = self._prefix_embeds(pooled)
        _, kvs = self.backbone.full(prefix)
        P = self.prefix_length
        H = self.config.hidden_dim
        # flat [*, pos, H] layouts: what both the fused Pallas decode kernel
        # and the XLA fallback consume (heads split as H = nh * hd views).
        # The position axis is rounded up to a multiple of 8 — Mosaic DMA
        # slices on a tiled axis must be 8-aligned; padding rows are never
        # valid (the s < pos masks exclude them).
        s_alloc = -(-max_length // 8) * 8
        cdtype = kvs[0][0].dtype
        if self._use_stack(s_alloc, H, cdtype):
            # whole-stack layout: ONE pallas_call runs all L layers per
            # decode step (ops/pallas_decode.fused_beam_decode_stack).
            # Caches live layer-stacked [L, B, S, H] under
            # ``lazy["stacked"]`` (beam search tiles that subtree on
            # axis 1 — inference.decoding._tile_state); the per-layer
            # prefix K/V and the layer-stacked weights ride in ``shared``
            # (per-decode constants, never tiled or gathered).
            L = len(kvs)
            lazy = {"stacked": {
                "k": jnp.zeros((L, B, s_alloc, H), dtype=cdtype),
                "v": jnp.zeros((L, B, s_alloc, H), dtype=cdtype)}}
            shared = {"pk": jnp.stack([k.reshape(B, P, H) for k, _ in kvs]),
                      "pv": jnp.stack([v.reshape(B, P, H) for _, v in kvs]),
                      "stack": self._stacked_weights()}
            return {"lazy": lazy, "shared": shared,
                    "pos": jnp.zeros((), dtype=jnp.int32)}
        layers = [
            {"k": jnp.zeros((B, s_alloc, H), dtype=k.dtype),
             "v": jnp.zeros((B, s_alloc, H), dtype=v.dtype)}
            for (k, v) in kvs
        ]
        shared = {"layers": [{"pk": k.reshape(B, P, H),
                              "pv": v.reshape(B, P, H)} for (k, v) in kvs]}
        # Suffix caches sit under "lazy": beam search leaves them unpermuted
        # (in-place-updatable scan carries) and reorders only an ancestry
        # map that this decoder applies at attention-read time. ``pos``
        # counts within the suffix; absolute position = P + pos.
        return {"lazy": {"layers": layers}, "shared": shared,
                "pos": jnp.zeros((), dtype=jnp.int32)}

    def _use_stack(self, s_alloc: int, width: int, dtype) -> bool:
        """Whether this decode should use the whole-stack fused kernel
        (the measured-fastest TPU path, docs/performance.md round 5):
        the pallas path must resolve, the ICT_DECODE_STACK knob must be
        on, and — on a real TPU — the stack kernel's VMEM envelope must
        fit (gated with a conservative beam_size=8 upper bound; the
        beam width is not known at init_cache time). Interpret mode
        (CPU tests) has no Mosaic constraints, so the stack path engages
        there whenever the caller asked for pallas — the pallas-vs-xla
        parity tests then cover it by default."""
        from ..ops.pallas_decode import resolve_decode_kernel

        kernel = resolve_decode_kernel(
            self.config.decode_kernel, cache_len=s_alloc, width=width,
            dtype=dtype, beam_size=8)
        return (kernel == "pallas" and _stack_fold_enabled()
                and (jax.default_backend() != "tpu"
                     or fused_decode_stack_supported(
                         s_alloc, width, dtype, 8, self.prefix_length)))

    def _stacked_weights(self):
        """Layer-stacked kernel operands (STACK_WEIGHT_KEYS), read
        straight off the bound submodules. Dense kernels/biases are cast
        exactly as nn.Dense's promote_dtype would (the module dtype);
        LayerNorm scale/bias stay in their f32 param dtype — flax
        ``_normalize`` uses them unpromoted in the f32 statistics path,
        and the kernel mirrors that for bit-exactness."""
        blocks = self.backbone.blocks
        dt = self.dtype

        def dense(get):
            return (jnp.stack([get(b)["kernel"] for b in blocks]).astype(dt),
                    jnp.stack([get(b)["bias"] for b in blocks]).astype(dt))

        def ln(get):
            return (jnp.stack([get(b)["scale"] for b in blocks]),
                    jnp.stack([get(b)["bias"] for b in blocks]))

        wqkv, bqkv = dense(lambda b: b.attn.c_attn.variables["params"])
        wo, bo = dense(lambda b: b.attn.c_proj.variables["params"])
        wfc, bfc = dense(lambda b: b.mlp.variables["params"]["c_fc"])
        wpj, bpj = dense(lambda b: b.mlp.variables["params"]["c_proj"])
        g1, b1 = ln(lambda b: b.ln_1.variables["params"])
        g2, b2 = ln(lambda b: b.ln_2.variables["params"])
        stack = {"wqkv": wqkv, "bqkv": bqkv, "wo": wo, "bo": bo,
                 "g1": g1, "b1": b1, "g2": g2, "b2": b2,
                 "wfc": wfc, "bfc": bfc, "wpj": wpj, "bpj": bpj}
        assert set(stack) == set(STACK_WEIGHT_KEYS)
        return stack

    def _resolve_kernel(self, cache=None, beam_size: int = 1) -> str:
        from ..ops.pallas_decode import resolve_decode_kernel

        if cache is None:
            return resolve_decode_kernel(self.config.decode_kernel)
        return resolve_decode_kernel(
            self.config.decode_kernel, cache_len=cache["k"].shape[1],
            width=cache["k"].shape[2], dtype=cache["k"].dtype,
            beam_size=beam_size)

    def step(self, state: Dict[str, Any],
             tokens: jnp.ndarray) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        pos = state["pos"]
        P = self.prefix_length
        stacked = state["lazy"].get("stacked")
        Bk = tokens.shape[0]
        if stacked is not None:
            B = state["shared"]["pk"].shape[1]
            s_alloc = stacked["k"].shape[2]
        else:
            B = state["shared"]["layers"][0]["pk"].shape[0]
            s_alloc = state["lazy"]["layers"][0]["k"].shape[1]
        K = Bk // B
        ancestry = state["lazy"].get("ancestry")  # set by beam search only
        anc_local = None
        if ancestry is not None:
            anc_local = (ancestry - (jnp.arange(
                Bk, dtype=ancestry.dtype)[:, None] // K) * K)  # [Bk,L] in 0..K-1
            if anc_local.shape[1] < s_alloc:  # cache axis is 8-aligned
                anc_local = jnp.pad(
                    anc_local, ((0, 0), (0, s_alloc - anc_local.shape[1])))
        x = self.backbone.wte(tokens)[:, None, :]
        x = x + self.backbone.wpe((P + pos)[None, None])
        if stacked is not None:
            # whole-stack fast path: all L layers in ONE pallas call (the
            # layout chosen by init_cache/_use_stack; measured 34.2 ->
            # 30.0 ms on the flagship scan, docs/performance.md round 5)
            nh = self.config.num_heads
            scale = 1.0 / ((self.config.hidden_dim // nh) ** 0.5)
            hidden, kc, vc = fused_beam_decode_stack(
                x[:, 0, :], state["shared"]["stack"],
                stacked["k"], stacked["v"],
                state["shared"]["pk"], state["shared"]["pv"],
                anc_local, pos, num_heads=nh, beam_size=K, scale=scale)
            hidden = self.backbone.ln_f(hidden[:, None, :])
            logits = self.backbone.logits(hidden[:, 0])
            new_lazy = dict(state["lazy"], stacked={"k": kc, "v": vc})
            return logits, dict(state, lazy=new_lazy, pos=pos + 1)
        kernel = self._resolve_kernel(
            state["lazy"]["layers"][0], beam_size=K)
        new_layers = []
        for block, cache, pre in zip(self.backbone.blocks,
                                     state["lazy"]["layers"],
                                     state["shared"]["layers"]):
            x, k_cache, v_cache = block.cached_step(
                x, cache["k"], cache["v"], pos,
                prefix_k=pre["pk"], prefix_v=pre["pv"], anc_local=anc_local,
                kernel=kernel)
            new_layers.append({"k": k_cache, "v": v_cache})
        hidden = self.backbone.ln_f(x)
        logits = self.backbone.logits(hidden[:, 0])
        new_lazy = dict(state["lazy"], layers=new_layers)
        return logits, dict(state, lazy=new_lazy, pos=pos + 1)

    def generate(self, encoder_features: Dict[str, jnp.ndarray],
                 max_length: int) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        """Greedy KV-cached generation (beam search lives in
        inference.decoding and drives init_cache/step directly).
        Finished rows emit pads after the first EOS — the same contract
        as inference.decoding.greedy_decode and HF ``generate``
        (post-EOS argmax tokens would otherwise survive
        ``skip_special_tokens`` decoding as garbage words)."""
        B = encoder_features["pooled_features"].shape[0]
        state = self.init_cache(encoder_features, max_length)
        current = jnp.full((B,), self.bos_token_id, dtype=jnp.int32)
        done = jnp.zeros((B,), dtype=bool)

        def scan_body(carry, _):
            state, current, done = carry
            logits, state = self.step(state, current)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            nxt = jnp.where(done, self.pad_token_id, nxt)
            done = done | (nxt == self.eos_token_id)
            return (state, nxt, done), current

        (_, _, _), tokens = jax.lax.scan(
            scan_body, (state, current, done), None, length=max_length)
        return tokens.transpose(1, 0), {}
