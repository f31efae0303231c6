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

from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


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
) -> Tuple[np.ndarray, np.ndarray]:
    """candidates [B, K, L] caption-tokenizer ids → (best [B, L], scores
    [B, K]).

    ``decode_fn``: caption ids → text; ``clip_tokenize_fn``: list of K*B
    texts → [B*K, L_clip] CLIP ids (host side)."""
    cand = np.asarray(candidates)
    B, K, L = cand.shape
    texts = [decode_fn(cand[b, k]) for b in range(B) for k in range(K)]
    clip_ids = np.asarray(clip_tokenize_fn(texts)).reshape(B, K, -1)

    scores = jax.jit(
        lambda im, ids: clip_rerank_scores(scorer, scorer_variables, im, ids)
    )(images, jnp.asarray(clip_ids))
    scores = np.asarray(scores)
    best = scores.argmax(axis=1)
    return cand[np.arange(B), best], scores
