"""Golden-parity tests for the attention zoo.

Each variant is re-derived independently in torch from the reference's
documented math (src/models/attention.py:38-360) with weights copied from the
Flax modules; outputs must match to float32 tolerance. This is the
"attention variants vs reference math on fixed inputs" strategy from
SURVEY.md §4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from image_captioning_ml_project_tpu.config import AttentionConfig, AttentionType
from image_captioning_ml_project_tpu.models.attention import (
    AdaptiveAttention,
    AttentionOnAttention,
    MultiHeadAttention,
    SoftAttention,
    build_attention,
)

B, Q, S, H = 3, 4, 7, 16


def _lin(params, name):
    """flax Dense params -> torch weight/bias tensors."""
    kernel = torch.tensor(np.asarray(params[name]["kernel"]))
    bias = torch.tensor(np.asarray(params[name]["bias"]))
    return kernel, bias


def _apply_lin(x, kernel, bias):
    return x @ kernel + bias


def make_inputs(rng, with_mask=True, q_dims=3):
    q = rng.randn(B, Q, H).astype(np.float32) if q_dims == 3 else rng.randn(B, H).astype(np.float32)
    k = rng.randn(B, S, H).astype(np.float32)
    v = rng.randn(B, S, H).astype(np.float32)
    mask = None
    if with_mask:
        mask = np.zeros((B, S), dtype=bool)
        mask[:, -2:] = True  # last two keys are padding
    return q, k, v, mask


def torch_soft_attention(params, q, k, v, mask, temperature):
    qk, qb = _lin(params, "query_proj")
    kk, kb = _lin(params, "key_proj")
    ek, eb = _lin(params, "energy")
    q_t, k_t, v_t = map(torch.tensor, (q, k, v))
    squeeze = q_t.dim() == 2
    if squeeze:
        q_t = q_t.unsqueeze(1)
    qp = _apply_lin(q_t, qk, qb).unsqueeze(2)  # [B,Q,1,H]
    kp = _apply_lin(k_t, kk, kb).unsqueeze(1)  # [B,1,S,H]
    scores = _apply_lin(torch.tanh(qp + kp), ek, eb).squeeze(-1) / temperature
    if mask is not None:
        scores = scores.masked_fill(torch.tensor(mask).unsqueeze(1), -1e9)
    w = F.softmax(scores, dim=-1)
    ctx = torch.matmul(w.unsqueeze(-2), v_t.unsqueeze(1)).squeeze(-2)
    if squeeze:
        return ctx.squeeze(1).numpy(), w.squeeze(1).numpy()
    return ctx.numpy(), w.numpy()


def torch_multihead(params, q, k, v, mask, num_heads, temperature):
    head_dim = H // num_heads
    q_t, k_t, v_t = map(torch.tensor, (q, k, v))
    squeeze = q_t.dim() == 2
    if squeeze:
        q_t = q_t.unsqueeze(1)
    bsz = q_t.shape[0]

    def project(x, name):
        kk, kb = _lin(params, name)
        y = _apply_lin(x, kk, kb)
        return y.view(bsz, -1, num_heads, head_dim).transpose(1, 2)

    qh = project(q_t, "query_proj")
    kh = project(k_t, "key_proj")
    vh = project(v_t, "value_proj")
    scores = torch.matmul(qh, kh.transpose(-1, -2)) / (temperature * head_dim ** 0.5)
    if mask is not None:
        scores = scores.masked_fill(
            torch.tensor(mask).unsqueeze(1).unsqueeze(1), -1e9)
    w = F.softmax(scores, dim=-1)
    att = torch.matmul(w, vh).transpose(1, 2).reshape(bsz, -1, H)
    ok, ob = _lin(params, "output_proj")
    ctx = _apply_lin(att, ok, ob)
    w_avg = w.mean(dim=1)
    if squeeze:
        return ctx.squeeze(1).numpy(), w_avg.squeeze(1).numpy()
    return ctx.numpy(), w_avg.numpy()


@pytest.mark.parametrize("q_dims", [2, 3])
@pytest.mark.parametrize("with_mask", [False, True])
def test_soft_attention_parity(rng, q_dims, with_mask):
    cfg = AttentionConfig(attention_type=AttentionType.SOFT, hidden_dim=H,
                          temperature=1.5)
    q, k, v, mask = make_inputs(rng, with_mask, q_dims)
    mod = SoftAttention(cfg)
    params = mod.init(jax.random.PRNGKey(0), q, k, v, key_padding_mask=mask)["params"]
    ctx, w = mod.apply({"params": params}, q, k, v, key_padding_mask=mask)
    ctx_t, w_t = torch_soft_attention(params, q, k, v, mask, cfg.temperature)
    np.testing.assert_allclose(np.asarray(ctx), ctx_t, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), w_t, rtol=1e-5, atol=1e-5)
    # Weights over valid keys sum to 1
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, rtol=1e-5)
    if with_mask:
        assert np.asarray(w)[..., -2:].max() < 1e-6


@pytest.mark.parametrize("q_dims", [2, 3])
@pytest.mark.parametrize("with_mask", [False, True])
def test_multihead_attention_parity(rng, q_dims, with_mask):
    cfg = AttentionConfig(attention_type=AttentionType.MULTI_HEAD, hidden_dim=H,
                          num_heads=4, temperature=1.0)
    q, k, v, mask = make_inputs(rng, with_mask, q_dims)
    mod = MultiHeadAttention(cfg)
    params = mod.init(jax.random.PRNGKey(0), q, k, v, key_padding_mask=mask)["params"]
    ctx, w = mod.apply({"params": params}, q, k, v, key_padding_mask=mask)
    ctx_t, w_t = torch_multihead(params, q, k, v, mask, cfg.num_heads, cfg.temperature)
    np.testing.assert_allclose(np.asarray(ctx), ctx_t, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), w_t, rtol=1e-4, atol=1e-5)


def test_adaptive_attention_parity(rng):
    cfg = AttentionConfig(attention_type=AttentionType.ADAPTIVE, hidden_dim=H,
                          num_heads=4)
    q, k, v, mask = make_inputs(rng, True, 2)
    mem = rng.randn(B, H).astype(np.float32)
    cell = rng.randn(B, H).astype(np.float32)
    mod = AdaptiveAttention(cfg)
    params = mod.init(jax.random.PRNGKey(0), q, k, v, key_padding_mask=mask,
                      memory_state=mem, cell_state=cell)["params"]
    ctx, w = mod.apply({"params": params}, q, k, v, key_padding_mask=mask,
                       memory_state=mem, cell_state=cell)

    # torch re-derivation (reference math: src/models/attention.py:242-294)
    base_ctx, base_w = torch_multihead(
        params["base_attention"], q, k, v, mask, cfg.num_heads, cfg.temperature)
    q_t = torch.tensor(q).unsqueeze(1)
    mem_t = torch.tensor(mem).unsqueeze(1)
    cell_t = torch.tensor(cell).unsqueeze(1)
    gk, gb = _lin(params, "sentinel_gate")
    sk, sb = _lin(params, "sentinel_proj")
    ak, ab = _lin(params, "adaptive_weight")
    gate = torch.sigmoid(_apply_lin(torch.cat([q_t, mem_t], -1), gk, gb))
    sentinel = _apply_lin(gate * torch.tanh(cell_t), sk, sb)
    base_ctx_t = torch.tensor(base_ctx).unsqueeze(1)
    aw = torch.sigmoid(_apply_lin(torch.cat([base_ctx_t, sentinel], -1), ak, ab))
    final = (aw * base_ctx_t + (1 - aw) * sentinel).squeeze(1)
    np.testing.assert_allclose(np.asarray(ctx), final.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), base_w, rtol=1e-4, atol=1e-5)


def test_adaptive_requires_states(rng):
    cfg = AttentionConfig(attention_type=AttentionType.ADAPTIVE, hidden_dim=H)
    q, k, v, mask = make_inputs(rng, False, 2)
    mod = AdaptiveAttention(cfg)
    with pytest.raises(AssertionError):
        mod.init(jax.random.PRNGKey(0), q, k, v)


def test_aoa_attention_parity(rng):
    cfg = AttentionConfig(attention_type=AttentionType.AOA, hidden_dim=H,
                          num_heads=4)
    q, k, v, mask = make_inputs(rng, True, 2)
    mod = AttentionOnAttention(cfg)
    params = mod.init(jax.random.PRNGKey(0), q, k, v, key_padding_mask=mask)["params"]
    ctx, w = mod.apply({"params": params}, q, k, v, key_padding_mask=mask)

    base_ctx, base_w = torch_multihead(
        params["base_attention"], q, k, v, mask, cfg.num_heads, cfg.temperature)
    q_t = torch.tensor(q).unsqueeze(1)
    qk_, qb_ = _lin(params, "query_proj")
    ik, ib = _lin(params, "info_vector_proj")
    gk, gb = _lin(params, "info_gate_proj")
    concat = torch.cat([torch.tensor(base_ctx).unsqueeze(1),
                        _apply_lin(q_t, qk_, qb_)], -1)
    info = torch.tanh(_apply_lin(concat, ik, ib))
    gate = torch.sigmoid(_apply_lin(concat, gk, gb))
    filtered = (info * gate).squeeze(1)
    np.testing.assert_allclose(np.asarray(ctx), filtered.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), base_w, rtol=1e-4, atol=1e-5)


def test_aoa_single_head_uses_soft_base(rng):
    cfg = AttentionConfig(attention_type=AttentionType.AOA, hidden_dim=H,
                          num_heads=1)
    q, k, v, mask = make_inputs(rng, False, 2)
    mod = AttentionOnAttention(cfg)
    params = mod.init(jax.random.PRNGKey(0), q, k, v)["params"]
    # SoftAttention base has an 'energy' projection; MultiHead does not.
    assert "energy" in params["base_attention"]


def test_build_attention_factory():
    for at, cls in [
        (AttentionType.SOFT, SoftAttention),
        (AttentionType.MULTI_HEAD, MultiHeadAttention),
        (AttentionType.ADAPTIVE, AdaptiveAttention),
        (AttentionType.AOA, AttentionOnAttention),
    ]:
        mod = build_attention(AttentionConfig(attention_type=at, hidden_dim=H))
        assert isinstance(mod, cls)
    with pytest.raises(ValueError):
        build_attention(AttentionConfig(attention_type=AttentionType.OBJECT, hidden_dim=H))
