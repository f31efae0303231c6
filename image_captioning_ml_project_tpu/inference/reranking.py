"""CLIP candidate reranking.

Implements the reference's configured-but-unshipped reranking option
(reference: src/config.py:107-109: generate ``num_candidates`` candidates,
score with CLIP, keep the best; README.md:370-379). Pipeline:

1. generate K candidates per image with diverse beam search or sampling
   (``beam_search(..., return_all=True)`` from :mod:`.decoding`);
2. decode candidates to text on the host, re-tokenize with the CLIP
   tokenizer (a host callable — CLIP's BPE differs from the captioning
   tokenizer);
3. one jitted :class:`..models.clip_text.CLIPScorer` pass scores all
   B*K (image, caption) pairs; argmax per image selects the winner.
"""

from __future__ import annotations

import logging
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# CLIP's own preprocessing statistics (not ImageNet's)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


def clip_normalize(images_uint8):
    """uint8 NHWC -> CLIP-normalized float32 NHWC (jnp-traceable)."""
    x = images_uint8.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)


def clip_rerank_scores(scorer, scorer_variables, images: jnp.ndarray,
                       clip_ids: jnp.ndarray) -> jnp.ndarray:
    """images [B, H, W, 3]; clip_ids [B, K, L] → scores [B, K] (jittable)."""
    B, K, L = clip_ids.shape

    img_feat = scorer.apply(scorer_variables, images,
                            method=scorer.encode_image)          # [B, P]
    txt_feat = scorer.apply(scorer_variables, clip_ids.reshape(B * K, L),
                            method=scorer.encode_text)           # [B*K, P]
    txt_feat = txt_feat.reshape(B, K, -1)
    return jnp.einsum("bp,bkp->bk", img_feat, txt_feat)


def rerank_candidates(
    candidates: jnp.ndarray,
    images: jnp.ndarray,
    decode_fn: Callable[[np.ndarray], str],
    clip_tokenize_fn: Callable[[List[str]], np.ndarray],
    scorer,
    scorer_variables,
    score_fn: Optional[Callable] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """candidates [B, K, L] caption-tokenizer ids → (best [B, L], scores
    [B, K]).

    ``decode_fn``: caption ids → text; ``clip_tokenize_fn``: list of K*B
    texts → [B*K, L_clip] CLIP ids (host side). ``score_fn`` is an
    optional pre-jitted ``(variables, images, ids) -> scores`` —
    :class:`CLIPReranker` passes its persistent one so repeated batches
    reuse one compiled program (an ad-hoc ``jax.jit`` here would retrace
    every call)."""
    cand = np.asarray(candidates)
    B, K, L = cand.shape
    texts = [decode_fn(cand[b, k]) for b in range(B) for k in range(K)]
    clip_ids = np.asarray(clip_tokenize_fn(texts)).reshape(B, K, -1)

    if score_fn is None:
        score_fn = jax.jit(
            lambda variables, im, ids: clip_rerank_scores(
                scorer, variables, im, ids))
    scores = np.asarray(score_fn(scorer_variables, images,
                                 jnp.asarray(clip_ids)))
    best = scores.argmax(axis=1)
    return cand[np.arange(B), best], scores


class CLIPReranker:
    """Bundles everything the eval/demo CLI needs to turn [B, K, L] beam
    candidates into [B, L] CLIP-selected winners (the reference's configured
    surface, src/config.py:107-109 / README.md:370-379).

    ``clip_tokenize_fn``: list of B*K caption strings → [B*K, L_clip] CLIP
    ids. ``decode_fn``: caption-tokenizer ids → text. Images arrive uint8
    (or float [0, 255]) NHWC at pipeline resolution; they are resized on
    device to the CLIP checkpoint's ``image_size`` (cubic, ~HF's bicubic
    processor) and CLIP-normalized inside one **persistently jitted**
    scoring program (variables passed as arguments, compiled once, reused
    every batch)."""

    def __init__(self, scorer, scorer_variables,
                 clip_tokenize_fn: Callable[[List[str]], np.ndarray],
                 decode_fn: Callable[[np.ndarray], str],
                 image_size: int = 224):
        self.scorer = scorer
        self.variables = scorer_variables
        self.clip_tokenize_fn = clip_tokenize_fn
        self.decode_fn = decode_fn
        self.image_size = image_size

        def score(variables, images_raw, clip_ids):
            x = clip_normalize(images_raw)
            if x.shape[1:3] != (image_size, image_size):
                x = jax.image.resize(
                    x, (x.shape[0], image_size, image_size, 3),
                    method="cubic")
            return clip_rerank_scores(scorer, variables, x, clip_ids)

        self._score = jax.jit(score)

    def __call__(self, images_uint8, candidates) -> np.ndarray:
        best, _ = rerank_candidates(candidates, jnp.asarray(images_uint8),
                                    self.decode_fn, self.clip_tokenize_fn,
                                    self.scorer, self.variables,
                                    score_fn=self._score)
        return best


def build_hf_reranker(decode_fn,
                      clip_model_name: str = "openai/clip-vit-base-patch32"
                      ) -> Optional[CLIPReranker]:
    """CLIPReranker from a locally cached HF CLIP checkpoint; None (with a
    warning) when the checkpoint or tokenizer is not available offline."""
    logger = logging.getLogger(__name__)
    try:
        from transformers import CLIPModel, CLIPTokenizer

        from ..models.clip_text import CLIPScorer, port_clip_model

        model = CLIPModel.from_pretrained(clip_model_name,
                                          local_files_only=True)
        tok = CLIPTokenizer.from_pretrained(clip_model_name,
                                            local_files_only=True)
        cfg = model.config
        scorer = CLIPScorer(
            vision_hidden=cfg.vision_config.hidden_size,
            vision_layers=cfg.vision_config.num_hidden_layers,
            vision_heads=cfg.vision_config.num_attention_heads,
            patch_size=cfg.vision_config.patch_size,
            text_vocab=cfg.text_config.vocab_size,
            text_hidden=cfg.text_config.hidden_size,
            text_layers=cfg.text_config.num_hidden_layers,
            text_heads=cfg.text_config.num_attention_heads,
            text_eos_token_id=cfg.text_config.eos_token_id,
            text_max_positions=cfg.text_config.max_position_embeddings,
            projection_dim=cfg.projection_dim)
        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        variables = port_clip_model(
            sd, vision_layers=cfg.vision_config.num_hidden_layers,
            text_layers=cfg.text_config.num_hidden_layers)

        def clip_tokenize(texts: List[str]) -> np.ndarray:
            enc = tok(texts, padding="max_length", truncation=True,
                      max_length=cfg.text_config.max_position_embeddings,
                      return_tensors="np")
            return enc["input_ids"].astype(np.int32)

        return CLIPReranker(scorer, variables, clip_tokenize, decode_fn,
                            image_size=cfg.vision_config.image_size)
    except Exception as e:
        logger.warning(
            "CLIP reranking requested but no local CLIP checkpoint for "
            "'%s' (%s); continuing without reranking", clip_model_name, e)
        return None
