"""Composed-model tests: encoder → (Q-Former) → decoder wiring, generate,
and the uniform decode interface through the full model."""

import jax
import jax.numpy as jnp
import numpy as np

from image_captioning_ml_project_tpu.config import (
    AttentionType,
    DecoderType,
    EncoderType,
    get_default_config,
)
from image_captioning_ml_project_tpu.models.captioning_model import (
    ImageCaptioningModel,
    QFormer,
)

B, T, V = 2, 5, 31


def tiny_config(encoder=EncoderType.VIT, decoder=DecoderType.LSTM,
                attention=AttentionType.SOFT, use_q_former=False):
    c = get_default_config()
    c.model.encoder.encoder_type = encoder
    c.model.encoder.feature_dim = 16
    c.model.encoder.hidden_size = 16
    c.model.encoder.num_layers = 1
    c.model.encoder.num_heads = 2
    c.model.encoder.patch_size = 8
    c.model.encoder.image_size = 16
    c.model.decoder.decoder_type = decoder
    c.model.decoder.hidden_dim = 16
    c.model.decoder.num_layers = 1
    c.model.decoder.num_heads = 2
    c.model.decoder.dropout = 0.0
    c.model.decoder.prefix_length = 2
    c.model.decoder.gpt2_n_positions = 64
    c.model.attention.attention_type = attention
    c.model.attention.hidden_dim = 16
    c.model.attention.num_heads = 2
    c.model.projection_dim = 16
    c.model.use_q_former = use_q_former
    c.model.q_former_num_queries = 4
    c.model.q_former_num_heads = 2
    c.model.vocab_size = V
    c.inference.max_length = 6
    return c


def make_batch(rng):
    images = jnp.asarray(rng.randn(B, 16, 16, 3).astype(np.float32))
    caps = jnp.asarray(rng.randint(3, V, (B, T)))
    return images, caps


def test_forward_and_generate_all_decoders(rng):
    images, caps = make_batch(rng)
    for dec in [DecoderType.LSTM, DecoderType.TRANSFORMER, DecoderType.GPT2]:
        cfg = tiny_config(decoder=dec)
        model = ImageCaptioningModel(cfg)
        variables = model.init(jax.random.PRNGKey(0), images, caps)
        out = model.apply(variables, images, caps)
        assert out["logits"].shape == (B, T, V)
        assert out["pooled_features"].shape == (B, 16)
        tokens, _ = model.apply(variables, images, method=model.generate)
        assert tokens.shape == (B, 6)
        assert (np.asarray(tokens[:, 0]) == cfg.model.bos_token_id).all()


def test_q_former_replaces_features(rng):
    images, caps = make_batch(rng)
    cfg = tiny_config(use_q_former=True)
    model = ImageCaptioningModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), images, caps)
    feats = model.apply(variables, images, method=model.encode)
    # 4 queries replace the 4 vision patches (reference :85-90)
    assert feats["features"].shape == (B, 4, 16)
    assert np.asarray(feats["attention_mask"]).all()
    out = model.apply(variables, images, caps)
    assert out["logits"].shape == (B, T, V)


def test_qformer_standalone(rng):
    vision = jnp.asarray(rng.randn(B, 7, 12).astype(np.float32))
    qf = QFormer(query_dim=8, vision_dim=12, num_queries=3, num_layers=2,
                 num_heads=2)
    variables = qf.init(jax.random.PRNGKey(0), vision)
    out = qf.apply(variables, vision)
    assert out["queries"].shape == (B, 3, 8)
    # masked vision tokens must not affect queries
    mask = jnp.ones((B, 7), dtype=bool)
    mask = mask.at[:, -2:].set(False)
    out1 = qf.apply(variables, vision, mask)
    vision2 = vision.at[:, -2:].set(999.0)
    out2 = qf.apply(variables, vision2, mask)
    np.testing.assert_allclose(np.asarray(out1["queries"]),
                               np.asarray(out2["queries"]), rtol=1e-4, atol=1e-5)


def test_model_decode_interface_beam(rng):
    from image_captioning_ml_project_tpu.inference.decoding import beam_search

    images, caps = make_batch(rng)
    cfg = tiny_config(decoder=DecoderType.GPT2)
    model = ImageCaptioningModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), images, caps)

    state = model.apply(variables, images, 6, method=model.init_cache)

    def step_fn(s, toks):
        return model.apply(variables, s, toks, method=model.step)

    res = jax.jit(lambda s: beam_search(
        step_fn, s, B, 3, cfg.model.bos_token_id, cfg.model.eos_token_id,
        cfg.model.pad_token_id, 6, length_penalty=0.8))(state)
    assert res.tokens.shape == (B, 6)
    assert np.isfinite(np.asarray(res.scores)).all()
