"""Legacy validation: teacher-forced loss, corpus BLEU-1..4, attention
visualization.

Parity with the reference's validate script (reference: validate.py:82-200):
per-batch teacher-forced CE, corpus BLEU-1..4 over greedy decodes with
special-token stripping (:178-191), and attention-map overlays rendered onto
the image (:113-126) — saved to files in headless environments.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.coco import iterate_batches, normalize_images
from ..evaluate.metrics import bleu, metric_tokenize
from .train import LegacyTrainState, masked_caption_ce


def strip_specials(ids: np.ndarray, vocab) -> List[str]:
    """Drop <pad>/<start>/<unk>, stop at <end>
    (reference: validate.py:178-191)."""
    words = []
    for i in ids:
        i = int(i)
        if i == vocab.eos_token_id:
            break
        if i in (vocab.pad_token_id, vocab.bos_token_id, vocab.unk_token_id):
            continue
        words.append(vocab.idx2word.get(i, "<unk>"))
    return words


def validate(model, state: LegacyTrainState, dataset, vocab,
             batch_size: int = 16, max_length: int = 20,
             mesh=None) -> Dict[str, float]:
    """Returns val loss + corpus BLEU-1..4 (reference: validate.py:82-112)."""
    logger = logging.getLogger(__name__)

    variables = {"params": state.params}
    if jax.tree_util.tree_leaves(state.batch_stats):
        variables["batch_stats"] = state.batch_stats

    @jax.jit
    def eval_batch(images, captions):
        images = normalize_images(images)
        out = model.apply(variables, images, captions)
        loss = masked_caption_ce(out["predictions"].astype(jnp.float32),
                                 captions, vocab.pad_token_id)
        tokens, alphas = model.apply(
            variables, images, max_length,
            method=lambda mdl, im, L: mdl.generate(
                im, L, start_token_id=vocab.bos_token_id))
        return loss, tokens, alphas

    losses, hyps, refs = [], [], []
    for batch in iterate_batches(dataset, batch_size, shuffle=False,
                                 drop_last=True):
        captions = batch["caption_tokens"]
        first_ref = captions[:, 0] if captions.ndim == 3 else captions
        loss, tokens, _ = eval_batch(
            jnp.asarray(batch["image"], dtype=jnp.float32),
            jnp.asarray(first_ref))
        losses.append(float(loss))
        for row in np.asarray(tokens):
            hyps.append(strip_specials(row, vocab))
        if "captions" in batch:
            refs.extend([[metric_tokenize(c) for c in caps]
                         for caps in batch["captions"]])
        else:
            refs.extend([[strip_specials(np.asarray(first_ref[i]), vocab)]
                         for i in range(len(first_ref))])

    scores, _ = bleu(hyps, refs)
    out = {
        "loss": float(np.mean(losses)) if losses else 0.0,
        "Bleu_1": scores[0], "Bleu_2": scores[1],
        "Bleu_3": scores[2], "Bleu_4": scores[3],
    }
    logger.info("legacy validation: %s", out)
    return out


def visualize_attention(image: np.ndarray, words: List[str],
                        alphas: np.ndarray, grid_size: int = 14,
                        save_path: Optional[str] = None):
    """Overlay per-word attention maps on the image
    (reference: validate.py:113-126). alphas: [T, grid*grid]."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = min(len(words), alphas.shape[0])
    cols = 4
    rows = (n + cols) // cols
    plt.figure(figsize=(3 * cols, 3 * rows))
    ax = plt.subplot(rows, cols, 1)
    ax.imshow(image)
    ax.set_title("input")
    ax.axis("off")
    H = image.shape[0]
    for t in range(n):
        ax = plt.subplot(rows, cols, t + 2)
        ax.imshow(image)
        amap = alphas[t].reshape(grid_size, grid_size)
        amap = np.kron(amap, np.ones((H // grid_size, H // grid_size)))
        ax.imshow(amap, alpha=0.6, cmap="jet")
        ax.set_title(words[t])
        ax.axis("off")
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        plt.savefig(save_path, bbox_inches="tight")
        plt.close()
        return save_path
    return plt.gcf()
