"""Decode parity harness: captions token-identical at equal weights.

The BASELINE.json north star requires generated captions to be
*token-identical* to the reference's decode rules given the same weights.
This test loads identical weights into (a) our jit KV-cached decoders and
(b) independent torch implementations of the reference's decode loops
(greedy, storing the current token before predicting the next —
src/models/decoders.py:269-306, 461-491), and asserts the produced token
sequences match exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from image_captioning_ml_project_tpu.config import (
    AttentionConfig,
    AttentionType,
    DecoderConfig,
    DecoderType,
)
from image_captioning_ml_project_tpu.models.decoders import (
    LSTMDecoder,
    TransformerDecoder,
)

B, S, H, V, L = 3, 7, 16, 41, 12


def make_features(rng):
    return {
        "features": jnp.asarray(rng.randn(B, S, H).astype(np.float32)),
        "pooled_features": jnp.asarray(rng.randn(B, H).astype(np.float32)),
        "attention_mask": jnp.ones((B, S), dtype=bool),
    }


def test_lstm_greedy_token_parity(rng):
    from tests.test_decoders import lstm_torch_reference

    dcfg = DecoderConfig(decoder_type=DecoderType.LSTM, hidden_dim=H,
                         num_layers=2, dropout=0.0, max_length=L)
    acfg = AttentionConfig(attention_type=AttentionType.SOFT, hidden_dim=H)
    dec = LSTMDecoder(config=dcfg, attention_config=acfg, vocab_size=V,
                      pad_token_id=0, bos_token_id=1, eos_token_id=2)
    feats = make_features(rng)
    caps = jnp.zeros((B, 4), dtype=jnp.int32)
    variables = dec.init(jax.random.PRNGKey(0), feats, caps)

    ours, _ = dec.apply(variables, feats, L, method=dec.generate)
    ours = np.asarray(ours)

    # torch greedy loop with the reference's convention: output position t
    # holds the input token at step t (BOS first)
    tokens = np.full((B, L), 1, dtype=np.int64)
    cur = np.full((B,), 1, dtype=np.int64)
    for t in range(L):
        tokens[:, t] = cur
        # teacher-force the prefix so far, take logits at step t
        prefix = jnp.asarray(tokens[:, : t + 1].astype(np.int32))
        logits = lstm_torch_reference(
            variables["params"], feats, prefix, num_layers=2, hidden_dim=H)
        cur = logits[:, -1].argmax(-1)
    np.testing.assert_array_equal(ours, tokens)


def test_transformer_greedy_token_parity(rng):
    from tests.test_decoders import transformer_torch_reference

    dcfg = DecoderConfig(decoder_type=DecoderType.TRANSFORMER, hidden_dim=H,
                         num_layers=2, num_heads=4, dropout=0.0, max_length=L)
    dec = TransformerDecoder(config=dcfg, vocab_size=V, pad_token_id=0,
                             bos_token_id=1, eos_token_id=2)
    feats = make_features(rng)
    caps = jnp.zeros((B, 4), dtype=jnp.int32)
    variables = dec.init(jax.random.PRNGKey(0), feats, caps)

    ours, _ = dec.apply(variables, feats, L, method=dec.generate)
    ours = np.asarray(ours)

    # torch: re-run the full prefix each step, exactly like the reference's
    # generate loop (no KV cache, src/models/decoders.py:461-491)
    tokens = np.full((B, L), 1, dtype=np.int64)
    cur = np.full((B,), 1, dtype=np.int64)
    for t in range(L):
        tokens[:, t] = cur
        prefix = jnp.asarray(tokens[:, : t + 1].astype(np.int32))
        logits = transformer_torch_reference(
            variables["params"], feats, prefix, 2, 4)
        cur = logits[:, -1].argmax(-1)
    np.testing.assert_array_equal(ours, tokens)
