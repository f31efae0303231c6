"""Q-Former and BUTD (object-region) decode stays on the fused kernels.

VERDICT r3 task 7's test half: the measured-family table
(docs/performance.md) gains Q-Former and BUTD rows, and these tests pin
the properties those measurements rely on:

* the Q-Former's 32-query memory is already 8-aligned (Sm8 == 32, zero
  pad rows) and dispatches through the fused cross-attention kernel
  (`ops/pallas_cross.py`) — a feature-length change here would silently
  drop the decoder to the ~835 img/s XLA path;
* BUTD's 36-region memory pads to 40 with the tail masked, the invalid
  regions stay masked under the kernel, and tokens are identical to the
  XLA path.

Reference families being covered: Q-Former src/models/captioning_model.py
:153-245; object-region encoder src/models/encoders.py:233-296.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_captioning_ml_project_tpu.config import (
    AttentionType,
    DecoderType,
    EncoderType,
    get_default_config,
)
from image_captioning_ml_project_tpu.inference.decoding import beam_search
from image_captioning_ml_project_tpu.models.captioning_model import (
    ImageCaptioningModel)
from image_captioning_ml_project_tpu.ops.pallas_cross import (
    fused_cross_supported)

B, V, H = 2, 37, 128  # H=128: minimum width the fused kernels can tile


def _config(encoder: str, kernel: str):
    c = get_default_config()
    c.model.encoder.encoder_type = EncoderType(encoder)
    c.model.encoder.feature_dim = 32
    c.model.encoder.hidden_size = 32
    c.model.encoder.num_layers = 1
    c.model.encoder.num_heads = 2
    c.model.encoder.patch_size = 8
    c.model.encoder.image_size = 16
    c.image_size = 16
    c.model.decoder.decoder_type = DecoderType.TRANSFORMER
    c.model.decoder.hidden_dim = H
    c.model.decoder.num_layers = 2
    c.model.decoder.num_heads = 4
    c.model.decoder.dropout = 0.0
    c.model.decoder.max_length = 16
    c.model.decoder.decode_kernel = kernel
    c.model.attention.attention_type = AttentionType.MULTI_HEAD
    c.model.attention.hidden_dim = H
    c.model.vocab_size = V
    c.inference.max_length = 8
    c.inference.beam_size = 3
    if encoder == "vit":
        # flagship-style Q-Former: the REAL query count (32) so the test
        # pins the exact memory length the measured row uses
        c.model.use_q_former = True
        c.model.projection_dim = H
        c.model.q_former_num_queries = 32
        c.model.q_former_num_layers = 1
        c.model.q_former_num_heads = 4
    else:
        c.model.encoder.max_objects = 36
        c.model.encoder.region_feature_dim = 48
        c.model.projection_dim = 32
    return c


def _inputs(encoder: str, rng):
    if encoder == "vit":
        return jnp.asarray(rng.randn(B, 16, 16, 3).astype(np.float32))
    mask = np.ones((B, 36), dtype=bool)
    mask[0, 30:] = False  # image 0 has 30 real regions
    return {
        "region_features": jnp.asarray(
            rng.randn(B, 36, 48).astype(np.float32)),
        "region_boxes": jnp.asarray(
            rng.rand(B, 36, 4).astype(np.float32)),
        "region_mask": jnp.asarray(mask),
    }


def _build(encoder: str, kernel: str, rng):
    c = _config(encoder, kernel)
    model = ImageCaptioningModel(c)
    inputs = _inputs(encoder, rng)
    caps = jnp.asarray(rng.randint(3, V, (B, 5)))
    variables = model.init(jax.random.PRNGKey(0), inputs, caps)
    return c, model, variables, inputs


def _decode(c, model, variables, inputs):
    cache = model.apply(variables, inputs, c.inference.max_length,
                        method=model.init_cache)

    def step_fn(s, toks):
        return model.apply(variables, s, toks, method=model.step)

    mc = c.model
    return beam_search(step_fn, cache, B, c.inference.beam_size,
                       mc.bos_token_id, mc.eos_token_id, mc.pad_token_id,
                       c.inference.max_length).tokens


@pytest.mark.parametrize("encoder,sm8,n_pad", [
    ("vit", 32, 0),           # Q-Former: 32 queries, already aligned
    ("object_region", 40, 4),  # BUTD: 36 regions pad to 40
])
def test_memory_shape_stays_kernel_eligible(encoder, sm8, n_pad, rng):
    c, model, variables, inputs = _build(encoder, "xla", rng)
    state = model.apply(variables, inputs, 16, method=model.init_cache)
    mem_k = state["shared"]["layers"][0]["mem_k"]   # [B, H, Sm8]
    assert mem_k.shape == (B, H, sm8)
    assert fused_cross_supported(sm8, H)
    mem_pad = np.asarray(state["shared"]["mem_pad"])
    # pad tail masked; Q-Former additionally has NO pad (32 % 8 == 0)
    assert mem_pad[:, sm8 - n_pad:].all() if n_pad else not mem_pad.any()
    if encoder == "object_region":
        assert mem_pad[0, 30:].all() and not mem_pad[0, :30].any()
        assert not mem_pad[1, :36].any()
    # the self-attention suffix cache must be fused-eligible too
    from image_captioning_ml_project_tpu.ops.pallas_decode import (
        fused_decode_supported)
    kc = state["lazy"]["layers"][0]["k"]
    assert fused_decode_supported(kc.shape[1], kc.shape[2],
                                  beam_size=c.inference.beam_size)


@pytest.mark.parametrize("encoder", ["vit", "object_region"])
def test_fused_cross_dispatches_through_model(encoder, rng, monkeypatch):
    """Spy on the kernel entry: the pallas path through the FULL model
    (encoder -> [Q-Former] -> decoder) must reach fused_cross_attention —
    guards against a silent XLA fallback behind the parity tests."""
    from image_captioning_ml_project_tpu.models import decoders as dec_mod

    calls = []
    real = dec_mod.fused_cross_attention

    def spy(*args, **kwargs):
        calls.append(args[1].shape)  # mem_kt [B, H, Sm8]
        return real(*args, **kwargs)

    monkeypatch.setattr(dec_mod, "fused_cross_attention", spy)
    c, model, variables, inputs = _build(encoder, "pallas", rng)
    state = model.apply(variables, inputs, 8, method=model.init_cache)
    toks = jnp.asarray(np.arange(B) + 3)
    model.apply(variables, state, toks, method=model.step)
    assert calls, "fused cross-attention never dispatched"
    assert calls[0][2] == (32 if encoder == "vit" else 40)


@pytest.mark.parametrize("encoder", ["vit", "object_region"])
def test_beam_tokens_pallas_match_xla(encoder, rng):
    c_x, model_x, variables, inputs = _build(encoder, "xla", rng)
    c_p = _config(encoder, "pallas")
    model_p = ImageCaptioningModel(c_p)
    tx = np.asarray(_decode(c_x, model_x, variables, inputs))
    tp = np.asarray(_decode(c_p, model_p, variables, inputs))
    np.testing.assert_array_equal(tx, tp)


def test_butd_masked_regions_cannot_leak(rng):
    """Perturbing the masked (invalid) region features must not change
    the decode under the fused kernel — the mem_pad mask really covers
    the invalid rows, not just the 8-alignment tail."""
    c, model, variables, inputs = _build("object_region", "pallas", rng)
    t1 = np.asarray(_decode(c, model, variables, inputs))
    poisoned = dict(inputs)
    poisoned["region_features"] = inputs["region_features"].at[0, 30:].set(
        777.0)
    t2 = np.asarray(_decode(c, model, variables, poisoned))
    np.testing.assert_array_equal(t1, t2)
