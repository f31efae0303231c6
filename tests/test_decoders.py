"""Decoder tests: torch golden parity (LSTM, Transformer, GPT-2) and
KV-cache consistency (cached single-step decode must equal the full
teacher-forced pass — the property that makes jit beam search correct).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from image_captioning_ml_project_tpu.config import (
    AttentionConfig,
    AttentionType,
    DecoderConfig,
    DecoderType,
)
from image_captioning_ml_project_tpu.models import hf_port
from image_captioning_ml_project_tpu.models.decoders import (
    LSTMDecoder,
    TransformerDecoder,
    build_decoder,
)
from image_captioning_ml_project_tpu.models.gpt2 import GPT2Backbone, GPT2Decoder

B, T, S, H, V = 2, 5, 7, 16, 29


def make_features(rng):
    return {
        "features": jnp.asarray(rng.randn(B, S, H).astype(np.float32)),
        "pooled_features": jnp.asarray(rng.randn(B, H).astype(np.float32)),
        "attention_mask": jnp.ones((B, S), dtype=bool),
    }


def _np(x):
    return np.asarray(x)


# ---------------------------------------------------------------------------
# LSTM
# ---------------------------------------------------------------------------


def lstm_torch_reference(params, feats, captions, num_layers, hidden_dim):
    """Independent torch re-derivation of the reference LSTM decode loop
    (src/models/decoders.py:137-234) using torch.nn.LSTM with weights ported
    from the flax module (validates the fused-gate layout claims)."""
    embed = torch.tensor(_np(params["embedding"]["embedding"]))
    emb_dim = embed.shape[1]

    lstm = torch.nn.LSTM(input_size=emb_dim + hidden_dim, hidden_size=hidden_dim,
                         num_layers=num_layers, batch_first=True)
    sd = {}
    for l in range(num_layers):
        kernel = _np(params["lstm"][f"cell_{l}"]["gates"]["kernel"])
        bias = _np(params["lstm"][f"cell_{l}"]["gates"]["bias"])
        in_dim = kernel.shape[0] - hidden_dim
        sd[f"weight_ih_l{l}"] = torch.tensor(kernel[:in_dim].T.copy())
        sd[f"weight_hh_l{l}"] = torch.tensor(kernel[in_dim:].T.copy())
        sd[f"bias_ih_l{l}"] = torch.tensor(bias)
        sd[f"bias_hh_l{l}"] = torch.zeros(4 * hidden_dim)
    lstm.load_state_dict(sd)
    lstm.eval()

    def lin(prefix, x):
        k = torch.tensor(_np(params[prefix]["kernel"]))
        b = torch.tensor(_np(params[prefix]["bias"]))
        return x @ k + b

    pooled = torch.tensor(_np(feats["pooled_features"]))
    bsz = pooled.shape[0]
    h0 = lin("init_h", pooled).reshape(bsz, num_layers, hidden_dim).transpose(0, 1).contiguous()
    c0 = lin("init_c", pooled).reshape(bsz, num_layers, hidden_dim).transpose(0, 1).contiguous()

    # soft attention params
    ap = params["attention"]
    features = torch.tensor(_np(feats["features"]))

    def soft_attn(q):
        qp = q @ torch.tensor(_np(ap["query_proj"]["kernel"])) + torch.tensor(_np(ap["query_proj"]["bias"]))
        kp = features @ torch.tensor(_np(ap["key_proj"]["kernel"])) + torch.tensor(_np(ap["key_proj"]["bias"]))
        e = torch.tanh(qp.unsqueeze(1) + kp) @ torch.tensor(_np(ap["energy"]["kernel"])) + torch.tensor(_np(ap["energy"]["bias"]))
        w = torch.softmax(e.squeeze(-1), dim=-1)
        return torch.einsum("bs,bsd->bd", w, features)

    caps = torch.tensor(_np(captions))
    h, c = h0, c0
    prev_ctx = torch.zeros(bsz, hidden_dim)
    logits_all = []
    with torch.no_grad():
        for t in range(caps.shape[1]):
            emb_t = embed[caps[:, t]]
            inp = torch.cat([emb_t, prev_ctx], dim=1).unsqueeze(1)
            out, (h, c) = lstm(inp, (h, c))
            ctx = soft_attn(out.squeeze(1))
            prev_ctx = ctx
            logits_all.append(lin("output_layer", ctx))
    return torch.stack(logits_all, dim=1).numpy()


@pytest.fixture
def lstm_setup(rng):
    dcfg = DecoderConfig(decoder_type=DecoderType.LSTM, hidden_dim=H,
                         num_layers=2, dropout=0.0, max_length=10)
    acfg = AttentionConfig(attention_type=AttentionType.SOFT, hidden_dim=H)
    dec = LSTMDecoder(config=dcfg, attention_config=acfg, vocab_size=V,
                      pad_token_id=0, bos_token_id=1, eos_token_id=2)
    feats = make_features(rng)
    caps = jnp.asarray(rng.randint(0, V, (B, T)))
    variables = dec.init(jax.random.PRNGKey(0), feats, caps)
    return dec, variables, feats, caps


def test_lstm_forward_matches_torch(lstm_setup):
    dec, variables, feats, caps = lstm_setup
    out = dec.apply(variables, feats, caps)
    expected = lstm_torch_reference(variables["params"], feats, caps,
                                    num_layers=2, hidden_dim=H)
    np.testing.assert_allclose(_np(out["logits"]), expected, rtol=1e-4, atol=1e-4)


def test_lstm_generate_starts_with_bos_and_is_greedy(lstm_setup):
    dec, variables, feats, _ = lstm_setup
    tokens, aux = dec.apply(variables, feats, 8, method=dec.generate)
    assert tokens.shape == (B, 8)
    assert (_np(tokens[:, 0]) == 1).all()  # bos first (reference :269-271)
    assert aux["attention_weights"].shape == (B, 8, S)

    # greedy rollout through the uniform step interface must agree
    state = dec.apply(variables, feats, 8, method=dec.init_cache)
    cur = jnp.full((B,), 1, dtype=jnp.int32)
    toks = [cur]
    for _ in range(7):
        logits, state = dec.apply(variables, state, cur, method=dec.step)
        cur = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        toks.append(cur)
    np.testing.assert_array_equal(_np(jnp.stack(toks, axis=1)), _np(tokens))


def test_lstm_step_matches_teacher_forcing(lstm_setup):
    dec, variables, feats, caps = lstm_setup
    full = dec.apply(variables, feats, caps)["logits"]
    state = dec.apply(variables, feats, T, method=dec.init_cache)
    for t in range(T):
        logits, state = dec.apply(variables, state, caps[:, t], method=dec.step)
        np.testing.assert_allclose(_np(logits), _np(full[:, t]), rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Transformer
# ---------------------------------------------------------------------------


def _torch_mha_from_flax(mha_params, h):
    def k(n):
        return torch.tensor(_np(mha_params[n]["kernel"]))

    def b(n):
        return torch.tensor(_np(mha_params[n]["bias"]))

    in_proj_weight = torch.cat([k("q_proj").T, k("k_proj").T, k("v_proj").T], dim=0)
    in_proj_bias = torch.cat([b("q_proj"), b("k_proj"), b("v_proj")], dim=0)
    out_w = k("out_proj").T
    out_b = b("out_proj")
    return in_proj_weight, in_proj_bias, out_w, out_b


def transformer_torch_reference(params, feats, captions, num_layers, num_heads):
    """torch nn.TransformerDecoder with weights ported from the flax module
    (reference architecture: src/models/decoders.py:349-360)."""
    layer = torch.nn.TransformerDecoderLayer(
        d_model=H, nhead=num_heads, dim_feedforward=H * 4, dropout=0.0,
        activation="gelu", batch_first=True)
    tdec = torch.nn.TransformerDecoder(layer, num_layers=num_layers)

    sd = tdec.state_dict()
    for i in range(num_layers):
        lp = params[f"layer_{i}"]
        ipw, ipb, ow, ob = _torch_mha_from_flax(lp["self_attn"], H)
        sd[f"layers.{i}.self_attn.in_proj_weight"] = ipw
        sd[f"layers.{i}.self_attn.in_proj_bias"] = ipb
        sd[f"layers.{i}.self_attn.out_proj.weight"] = ow
        sd[f"layers.{i}.self_attn.out_proj.bias"] = ob
        ipw, ipb, ow, ob = _torch_mha_from_flax(lp["cross_attn"], H)
        sd[f"layers.{i}.multihead_attn.in_proj_weight"] = ipw
        sd[f"layers.{i}.multihead_attn.in_proj_bias"] = ipb
        sd[f"layers.{i}.multihead_attn.out_proj.weight"] = ow
        sd[f"layers.{i}.multihead_attn.out_proj.bias"] = ob
        for src, dst in [("linear1", "linear1"), ("linear2", "linear2")]:
            sd[f"layers.{i}.{dst}.weight"] = torch.tensor(_np(lp[src]["kernel"])).T
            sd[f"layers.{i}.{dst}.bias"] = torch.tensor(_np(lp[src]["bias"]))
        for n in ["norm1", "norm2", "norm3"]:
            sd[f"layers.{i}.{n}.weight"] = torch.tensor(_np(lp[n]["scale"]))
            sd[f"layers.{i}.{n}.bias"] = torch.tensor(_np(lp[n]["bias"]))
    tdec.load_state_dict(sd)
    tdec.eval()

    def lin(prefix, x):
        return x @ torch.tensor(_np(params[prefix]["kernel"])) + torch.tensor(
            _np(params[prefix]["bias"]))

    caps = torch.tensor(_np(captions))
    embed = torch.tensor(_np(params["embedding"]["embedding"]))
    posemb = torch.tensor(_np(params["position_encoding"]["embedding"]))
    x = embed[caps] + posemb[: caps.shape[1]][None]
    memory = lin("visual_projection", torch.tensor(_np(feats["features"])))
    causal = torch.nn.Transformer.generate_square_subsequent_mask(caps.shape[1])
    with torch.no_grad():
        out = tdec(tgt=x, memory=memory, tgt_mask=causal)
        logits = lin("output_layer", out)
    return logits.numpy()


@pytest.fixture
def transformer_setup(rng):
    dcfg = DecoderConfig(decoder_type=DecoderType.TRANSFORMER, hidden_dim=H,
                         num_layers=2, num_heads=4, dropout=0.0, max_length=12)
    dec = TransformerDecoder(config=dcfg, vocab_size=V, pad_token_id=0,
                             bos_token_id=1, eos_token_id=2)
    feats = make_features(rng)
    caps = jnp.asarray(rng.randint(3, V, (B, T)))  # no pads: torch NaN quirk
    variables = dec.init(jax.random.PRNGKey(0), feats, caps)
    return dec, variables, feats, caps


def test_transformer_forward_matches_torch(transformer_setup):
    dec, variables, feats, caps = transformer_setup
    out = dec.apply(variables, feats, caps)
    expected = transformer_torch_reference(variables["params"], feats, caps, 2, 4)
    np.testing.assert_allclose(_np(out["logits"]), expected, rtol=1e-3, atol=1e-4)


def test_transformer_cached_step_matches_full(transformer_setup):
    dec, variables, feats, caps = transformer_setup
    full = dec.apply(variables, feats, caps)["logits"]
    state = dec.apply(variables, feats, T, method=dec.init_cache)
    for t in range(T):
        logits, state = dec.apply(variables, state, caps[:, t], method=dec.step)
        np.testing.assert_allclose(_np(logits), _np(full[:, t]), rtol=1e-3, atol=1e-4)


def test_transformer_generate_greedy(transformer_setup):
    dec, variables, feats, _ = transformer_setup
    tokens, _ = dec.apply(variables, feats, 6, method=dec.generate)
    assert tokens.shape == (B, 6)
    assert (_np(tokens[:, 0]) == 1).all()


# ---------------------------------------------------------------------------
# GPT-2
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_gpt2_backbone_matches_hf(rng):
    from transformers import GPT2Config, GPT2LMHeadModel

    hf_cfg = GPT2Config(vocab_size=V, n_positions=32, n_embd=H, n_layer=2,
                        n_head=4, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)
    torch_model = GPT2LMHeadModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    ported = hf_port.port_gpt2(sd, num_layers=2)

    backbone = GPT2Backbone(vocab_size=V, hidden_dim=H, num_layers=2,
                            num_heads=4, n_positions=32)
    ids = rng.randint(0, V, (B, T))

    logits = backbone.apply(ported, jnp.asarray(ids))
    with torch.no_grad():
        expected = torch_model(torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(_np(logits), expected, rtol=2e-3, atol=1e-3)


@pytest.fixture
def gpt2_setup(rng):
    dcfg = DecoderConfig(decoder_type=DecoderType.GPT2, hidden_dim=H,
                         num_layers=2, num_heads=4, dropout=0.0,
                         max_length=12, prefix_length=3, gpt2_n_positions=64)
    dec = GPT2Decoder(config=dcfg, vocab_size=V, pad_token_id=0,
                      bos_token_id=1, eos_token_id=2)
    feats = make_features(rng)
    caps = jnp.asarray(rng.randint(3, V, (B, T)))
    variables = dec.init(jax.random.PRNGKey(0), feats, caps)
    return dec, variables, feats, caps


def test_gpt2_cached_step_matches_full(gpt2_setup):
    dec, variables, feats, caps = gpt2_setup
    full = dec.apply(variables, feats, caps)["logits"]
    state = dec.apply(variables, feats, T, method=dec.init_cache)
    # split-cache convention: pos counts within the generated suffix
    # (absolute position = prefix_length + pos); prefix KV live in 'shared'
    assert int(state["pos"]) == 0
    assert "shared" in state
    assert state["shared"]["layers"][0]["pk"].shape[1] == 3  # prefix len
    for t in range(T):
        logits, state = dec.apply(variables, state, caps[:, t], method=dec.step)
        np.testing.assert_allclose(_np(logits), _np(full[:, t]), rtol=1e-3, atol=1e-4)


def test_gpt2_prefix_conditions_output(gpt2_setup, rng):
    """Different images must give different logits (the reference's
    placeholder prefix-KV did not correctly condition per layer)."""
    dec, variables, feats, caps = gpt2_setup
    out1 = dec.apply(variables, feats, caps)["logits"]
    feats2 = dict(feats, pooled_features=feats["pooled_features"] + 1.0)
    out2 = dec.apply(variables, feats2, caps)["logits"]
    assert float(jnp.abs(out1 - out2).max()) > 1e-4


def test_gpt2_generate(gpt2_setup):
    dec, variables, feats, _ = gpt2_setup
    tokens, _ = dec.apply(variables, feats, 6, method=dec.generate)
    assert tokens.shape == (B, 6)
    assert (_np(tokens[:, 0]) == 1).all()


def test_gpt2_dropout_active_in_train_mode(rng):
    """The reference fine-tunes HF GPT2LMHeadModel in train mode (embd/
    attn/resid dropout 0.1); config.dropout must regularize the forward
    when deterministic=False and be a no-op when True."""
    dcfg = DecoderConfig(decoder_type=DecoderType.GPT2, hidden_dim=H,
                         num_layers=2, num_heads=4, dropout=0.5,
                         max_length=12, prefix_length=3,
                         gpt2_n_positions=64)
    dec = GPT2Decoder(config=dcfg, vocab_size=V, pad_token_id=0,
                      bos_token_id=1, eos_token_id=2)
    feats = make_features(rng)
    caps = jnp.asarray(rng.randint(3, V, (B, T)))
    variables = dec.init(jax.random.PRNGKey(0), feats, caps)

    det = dec.apply(variables, feats, caps, deterministic=True)["logits"]
    det2 = dec.apply(variables, feats, caps, deterministic=True)["logits"]
    np.testing.assert_array_equal(_np(det), _np(det2))

    tr1 = dec.apply(variables, feats, caps, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(1)})["logits"]
    tr2 = dec.apply(variables, feats, caps, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(2)})["logits"]
    assert float(jnp.abs(tr1 - det).max()) > 1e-3   # dropout perturbs
    assert float(jnp.abs(tr1 - tr2).max()) > 1e-3   # and is stochastic


def test_gpt2_generate_pads_after_eos(rng):
    """generate must emit pads after the first EOS (greedy_decode/HF
    contract) instead of argmax continuation garbage."""
    dcfg = DecoderConfig(decoder_type=DecoderType.GPT2, hidden_dim=H,
                         num_layers=1, num_heads=4, dropout=0.0,
                         max_length=12, prefix_length=2,
                         gpt2_n_positions=64)
    dec = GPT2Decoder(config=dcfg, vocab_size=V, pad_token_id=0,
                      bos_token_id=1, eos_token_id=2)
    feats = make_features(rng)
    variables = dec.init(jax.random.PRNGKey(0), feats,
                         jnp.zeros((B, 4), jnp.int32))
    tokens = _np(dec.apply(variables, feats, 10, method=dec.generate)[0])
    for row in tokens:
        eos_pos = np.where(row == 2)[0]
        if len(eos_pos):
            assert (row[eos_pos[0] + 1:] == 0).all()


def test_build_decoder_factory():
    dcfg = DecoderConfig(hidden_dim=H, num_layers=1, num_heads=4)
    acfg = AttentionConfig(hidden_dim=H)
    for dt, cls in [(DecoderType.LSTM, LSTMDecoder),
                    (DecoderType.TRANSFORMER, TransformerDecoder),
                    (DecoderType.GPT2, GPT2Decoder)]:
        dcfg2 = DecoderConfig(decoder_type=dt, hidden_dim=H, num_layers=1, num_heads=4)
        dec = build_decoder(dcfg2, acfg, V, 0, 1, 2)
        assert isinstance(dec, cls)
    with pytest.raises(ValueError):
        build_decoder(DecoderConfig(decoder_type=DecoderType.T5, hidden_dim=H),
                      acfg, V, 0, 1, 2)
