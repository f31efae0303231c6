"""CLIP text tower parity vs HF, and end-to-end candidate reranking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from image_captioning_ml_project_tpu.models.clip_text import (
    CLIPScorer,
    CLIPTextBackbone,
    port_clip_model,
    port_clip_text,
)


def test_clip_text_matches_hf(rng):
    from transformers import CLIPTextConfig, CLIPTextModel

    hf_cfg = CLIPTextConfig(vocab_size=50, hidden_size=16,
                            num_hidden_layers=2, num_attention_heads=2,
                            intermediate_size=64, max_position_embeddings=16,
                            eos_token_id=49)
    torch_model = CLIPTextModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}

    backbone = CLIPTextBackbone(vocab_size=50, hidden_size=16, num_layers=2,
                                num_heads=2, mlp_ratio=4, max_positions=16,
                                eos_token_id=49)
    ids = rng.randint(0, 49, (2, 7))
    ids[:, -1] = 49  # EOT = max id
    variables = port_clip_text(sd, num_layers=2)
    hidden, pooled = backbone.apply(variables, jnp.asarray(ids))
    with torch.no_grad():
        out = torch_model(torch.tensor(ids))
    np.testing.assert_allclose(np.asarray(hidden),
                               out.last_hidden_state.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled),
                               out.pooler_output.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_clip_text_legacy_eos2_matches_hf(rng):
    """OpenAI hub checkpoints ship the legacy-wrong eos_token_id=2; HF
    special-cases it to pool at input_ids.argmax (EOT = highest vocab id).
    Matching id 2 literally would pool position 0 for every caption and
    make reranking a silent no-op."""
    from transformers import CLIPTextConfig, CLIPTextModel

    hf_cfg = CLIPTextConfig(vocab_size=50, hidden_size=16,
                            num_hidden_layers=2, num_attention_heads=2,
                            intermediate_size=64, max_position_embeddings=16,
                            eos_token_id=2)
    torch_model = CLIPTextModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}

    backbone = CLIPTextBackbone(vocab_size=50, hidden_size=16, num_layers=2,
                                num_heads=2, mlp_ratio=4, max_positions=16,
                                eos_token_id=2)
    ids = rng.randint(3, 49, (3, 7))  # id 2 never appears in the text
    ids[:, -1] = 49  # EOT = max id, as in real CLIP tokenizations
    variables = port_clip_text(sd, num_layers=2)
    _, pooled = backbone.apply(variables, jnp.asarray(ids))
    with torch.no_grad():
        out = torch_model(torch.tensor(ids))
    np.testing.assert_allclose(np.asarray(pooled),
                               out.pooler_output.numpy(),
                               rtol=1e-3, atol=1e-4)
    # and the pool is genuinely per-caption, not the degenerate position 0
    assert not np.allclose(np.asarray(pooled)[0], np.asarray(pooled)[1])


def test_clip_scorer_matches_hf_model(rng):
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

    hf_cfg = CLIPConfig(
        text_config=dict(
            vocab_size=50, hidden_size=16, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=16, eos_token_id=49),
        vision_config=dict(
            hidden_size=24, num_hidden_layers=2, num_attention_heads=3,
            intermediate_size=96, image_size=32, patch_size=8),
        projection_dim=12)
    torch_model = CLIPModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}

    scorer = CLIPScorer(vision_hidden=24, vision_layers=2, vision_heads=3,
                        patch_size=8, text_vocab=50, text_hidden=16,
                        text_layers=2, text_heads=2, text_eos_token_id=49,
                        text_max_positions=16, projection_dim=12)
    variables = port_clip_model(sd, vision_layers=2, text_layers=2)

    images = rng.randn(2, 3, 32, 32).astype(np.float32)
    ids = rng.randint(0, 49, (3, 7))
    ids[:, -1] = 49

    logits = scorer.apply(variables, jnp.asarray(
        images.transpose(0, 2, 3, 1)), jnp.asarray(ids))
    with torch.no_grad():
        hf_out = torch_model(input_ids=torch.tensor(ids),
                             pixel_values=torch.tensor(images))
    np.testing.assert_allclose(np.asarray(logits),
                               hf_out.logits_per_image.numpy(),
                               rtol=2e-3, atol=1e-3)


def test_rerank_candidates_picks_best(rng):
    """End-to-end rerank with a tiny random scorer: the candidate whose CLIP
    score is highest must be returned."""
    from image_captioning_ml_project_tpu.inference.reranking import (
        rerank_candidates)

    scorer = CLIPScorer(vision_hidden=16, vision_layers=1, vision_heads=2,
                        patch_size=8, text_vocab=30, text_hidden=16,
                        text_layers=1, text_heads=2, text_eos_token_id=29,
                        text_max_positions=16, projection_dim=8)
    images = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
    dummy_ids = jnp.asarray(rng.randint(0, 29, (1, 5)))
    variables = scorer.init(jax.random.PRNGKey(0), images, dummy_ids)

    B, K, L = 2, 3, 6
    candidates = rng.randint(3, 20, (B, K, L)).astype(np.int32)

    def decode_fn(ids):
        return " ".join(str(i) for i in ids)

    def clip_tokenize_fn(texts):
        out = np.zeros((len(texts), 5), dtype=np.int32)
        for i, t in enumerate(texts):
            toks = [int(x) % 29 for x in t.split()][:4]
            out[i, : len(toks)] = toks
            out[i, len(toks)] = 29  # EOT
        return out

    best, scores = rerank_candidates(candidates, images, decode_fn,
                                     clip_tokenize_fn, scorer, variables)
    assert best.shape == (B, L)
    assert scores.shape == (B, K)
    for b in range(B):
        np.testing.assert_array_equal(best[b],
                                      candidates[b, scores[b].argmax()])
