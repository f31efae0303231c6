"""Pallas kernel tests (interpreter mode on CPU): fused SDPA and fused
additive attention must match the jnp reference paths bit-for-tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_captioning_ml_project_tpu.config import AttentionConfig, AttentionType
from image_captioning_ml_project_tpu.models.attention import (
    MultiHeadAttention,
    SoftAttention,
)
from image_captioning_ml_project_tpu.ops.pallas_attention import (
    fused_additive_scores,
    fused_sdpa,
)


@pytest.mark.parametrize("with_mask", [False, True])
def test_fused_sdpa_matches_jnp(rng, with_mask):
    B, H, Q, S, D = 2, 3, 5, 17, 12
    q = jnp.asarray(rng.randn(B, H, Q, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, S, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, S, D).astype(np.float32))
    mask = None
    if with_mask:
        m = np.zeros((B, S), dtype=bool)
        m[:, -3:] = True
        mask = jnp.asarray(m)
    scale = 1.0 / np.sqrt(D)

    ctx, w = fused_sdpa(q, k, v, mask, scale)

    scores = jnp.einsum("bhqd,bhsd->bhqs", q, k) * scale
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :], -1e9, scores)
    w_ref = jax.nn.softmax(scores, axis=-1)
    ctx_ref = jnp.einsum("bhqs,bhsd->bhqd", w_ref, v)

    np.testing.assert_allclose(np.asarray(ctx), np.asarray(ctx_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                               rtol=1e-5, atol=1e-5)
    if with_mask:
        assert np.asarray(w)[..., -3:].max() < 1e-7


def test_fused_additive_scores_matches_jnp(rng):
    B, Q, S, H = 2, 4, 11, 16
    qp = jnp.asarray(rng.randn(B, Q, H).astype(np.float32))
    kp = jnp.asarray(rng.randn(B, S, H).astype(np.float32))
    ew = jnp.asarray(rng.randn(H, 1).astype(np.float32))
    eb = jnp.asarray(rng.randn(1).astype(np.float32))
    m = np.zeros((B, S), dtype=bool)
    m[:, -2:] = True
    mask = jnp.asarray(m)
    temp = 1.5

    scores = fused_additive_scores(qp, kp, ew, eb, mask, temp)

    t = jnp.tanh(qp[:, :, None, :] + kp[:, None, :, :])
    ref = ((jnp.einsum("bqsh,ho->bqso", t, ew)[..., 0] + eb) / temp)
    ref = jnp.where(mask[:, None, :], -1e9, ref)

    got = np.asarray(scores)
    want = np.asarray(ref)
    # unmasked entries match exactly; masked entries are both <= -1e8
    np.testing.assert_allclose(got[:, :, :-2], want[:, :, :-2],
                               rtol=1e-5, atol=1e-5)
    assert (got[:, :, -2:] < -1e8).all()


@pytest.mark.parametrize("q_dims", [2, 3])
def test_soft_attention_pallas_parity(rng, q_dims):
    H = 16
    cfg = AttentionConfig(attention_type=AttentionType.SOFT, hidden_dim=H,
                          temperature=1.3)
    cfg_p = AttentionConfig(attention_type=AttentionType.SOFT, hidden_dim=H,
                            temperature=1.3, use_pallas=True)
    B, Q, S = 2, 4, 9
    q = rng.randn(B, Q, H).astype(np.float32) if q_dims == 3 else \
        rng.randn(B, H).astype(np.float32)
    k = rng.randn(B, S, H).astype(np.float32)
    v = rng.randn(B, S, H).astype(np.float32)
    m = np.zeros((B, S), dtype=bool)
    m[:, -2:] = True

    mod = SoftAttention(cfg)
    params = mod.init(jax.random.PRNGKey(0), q, k, v, key_padding_mask=m)["params"]
    ctx, w = mod.apply({"params": params}, q, k, v, key_padding_mask=m)
    mod_p = SoftAttention(cfg_p)
    ctx_p, w_p = mod_p.apply({"params": params}, q, k, v, key_padding_mask=m)
    np.testing.assert_allclose(np.asarray(ctx_p), np.asarray(ctx),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w),
                               rtol=1e-4, atol=1e-5)
    # identical param structure between jnp and pallas paths
    params_p = mod_p.init(jax.random.PRNGKey(0), q, k, v)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_p)


@pytest.mark.parametrize("q_dims", [2, 3])
def test_multihead_pallas_parity(rng, q_dims):
    H = 16
    cfg = AttentionConfig(attention_type=AttentionType.MULTI_HEAD,
                          hidden_dim=H, num_heads=4)
    cfg_p = AttentionConfig(attention_type=AttentionType.MULTI_HEAD,
                            hidden_dim=H, num_heads=4, use_pallas=True)
    B, Q, S = 2, 4, 9
    q = rng.randn(B, Q, H).astype(np.float32) if q_dims == 3 else \
        rng.randn(B, H).astype(np.float32)
    k = rng.randn(B, S, H).astype(np.float32)
    v = rng.randn(B, S, H).astype(np.float32)
    m = np.zeros((B, S), dtype=bool)
    m[:, -2:] = True

    mod = MultiHeadAttention(cfg)
    params = mod.init(jax.random.PRNGKey(0), q, k, v, key_padding_mask=m)["params"]
    ctx, w = mod.apply({"params": params}, q, k, v, key_padding_mask=m)
    ctx_p, w_p = MultiHeadAttention(cfg_p).apply(
        {"params": params}, q, k, v, key_padding_mask=m)
    np.testing.assert_allclose(np.asarray(ctx_p), np.asarray(ctx),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w),
                               rtol=1e-4, atol=1e-5)


def test_fused_sdpa_under_jit(rng):
    B, H, Q, S, D = 1, 2, 3, 7, 8
    q = jnp.asarray(rng.randn(B, H, Q, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, S, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, S, D).astype(np.float32))

    @jax.jit
    def f(q, k, v):
        return fused_sdpa(q, k, v, None, 0.5)[0]

    out = f(q, k, v)
    assert out.shape == (B, H, Q, D)
