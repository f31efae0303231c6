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
from ..evaluate.metrics import bleu
from .train import LegacyTrainState


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
             mesh=None, bert_embedder=None) -> Dict[str, float]:
    """Returns val loss + corpus BLEU-1..4 (reference: validate.py:82-112).

    Hypotheses AND references are both token-id word lists stripped of
    specials (the reference compares encoded captions, validate.py:
    178-191) — one tokenization on both sides. ``pad_last`` covers the
    trailing short batch (and datasets smaller than a batch); padded
    rows are masked out of loss and BLEU. ``bert_embedder`` is required
    for ``use_bert`` models: teacher-forced loss uses contextual
    caption embeddings, generation a static per-token vocab table."""
    logger = logging.getLogger(__name__)

    variables = {"params": state.params}
    if jax.tree_util.tree_leaves(state.batch_stats):
        variables["batch_stats"] = state.batch_stats
    use_bert = bool(getattr(model, "use_bert", False))
    table = None
    if use_bert:
        assert bert_embedder is not None, (
            "use_bert validation needs a BertCaptionEmbedder")
        table = jnp.asarray(bert_embedder.vocab_table(vocab))

    @jax.jit
    def eval_batch(images, captions, row_valid, cap_emb=None):
        images = normalize_images(images)
        out = model.apply(variables, images, captions,
                          caption_embeddings=cap_emb)
        # per-row masked CE so pad_last duplicate rows don't bias the mean:
        # return the summed nll + supervised-token count over valid rows
        preds = out["predictions"].astype(jnp.float32)
        targets = captions[:, 1:preds.shape[1] + 1]
        mask = ((targets != vocab.pad_token_id)
                & row_valid[:, None]).astype(jnp.float32)
        logp = jax.nn.log_softmax(preds, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        loss_sum, ntok = (nll * mask).sum(), mask.sum()
        tokens, alphas = model.apply(
            variables, images, max_length,
            method=lambda mdl, im, L: mdl.generate(
                im, L, start_token_id=vocab.bos_token_id,
                embedding_table=table))
        return loss_sum, ntok, tokens, alphas

    losses, hyps, refs = [], [], []
    for batch in iterate_batches(dataset, batch_size, shuffle=False,
                                 drop_last=False, pad_last=True):
        captions = batch["caption_tokens"]
        first_ref = captions[:, 0] if captions.ndim == 3 else captions
        valid = batch.get("batch_valid", np.ones(len(first_ref), dtype=bool))
        cap_emb = None
        if use_bert:
            texts = [caps[0] for caps in batch["captions"]] \
                if "captions" in batch else [
                    " ".join(strip_specials(np.asarray(r), vocab))
                    for r in first_ref]
            cap_emb = jnp.asarray(bert_embedder.embed_batch(
                texts, first_ref.shape[1]))
        loss_sum, ntok, tokens, _ = eval_batch(
            jnp.asarray(batch["image"]), jnp.asarray(first_ref),
            jnp.asarray(valid), cap_emb)
        losses.append((float(loss_sum), float(ntok)))
        ref_mask = batch.get("ref_mask")
        for i, row in enumerate(np.asarray(tokens)):
            if not valid[i]:
                continue
            hyps.append(strip_specials(row, vocab))
            if captions.ndim == 3:
                rows = [r for j, r in enumerate(captions[i])
                        if ref_mask is None or ref_mask[i][j]]
                refs.append([strip_specials(np.asarray(r), vocab)
                             for r in rows] or [[]])
            else:
                refs.append([strip_specials(np.asarray(first_ref[i]),
                                            vocab)])

    scores, _ = bleu(hyps, refs)
    out = {
        "loss": (sum(s for s, _ in losses)
                 / max(sum(n for _, n in losses), 1.0)) if losses else 0.0,
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


def main(argv=None):
    """Script entry (reference: validate.py run as a script):

    python -m image_captioning_ml_project_tpu.legacy.validate \
        --data_root data --vocab vocab.json \
        [--checkpoint_dir ckpts --encoder_ckpt ... --decoder_ckpt ...]
    """
    import argparse

    from ..data.coco import COCOCaptionDataset
    from ..data.tokenizer import WordVocab
    from ..utils.checkpoint import CheckpointManager
    from ..utils.logging import setup_logging
    from .model import ShowAttendTell

    p = argparse.ArgumentParser(
        description="Legacy Show-Attend-Tell validation")
    p.add_argument("--data_root", type=str, required=True)
    p.add_argument("--vocab", type=str, required=True)
    p.add_argument("--checkpoint_dir", type=str, default=None)
    p.add_argument("--encoder_ckpt", type=str, default="encoder_epoch_0")
    p.add_argument("--decoder_ckpt", type=str, default="decoder_epoch_0")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--max_length", type=int, default=20)
    p.add_argument("--use_bert", action="store_true")
    args = p.parse_args(argv)

    setup_logging(None)
    vocab = WordVocab.load(args.vocab)
    val_ds = COCOCaptionDataset(
        args.data_root, "annotations/captions_val2014.json", "val2014",
        vocab, image_size=args.image_size, is_training=False)
    model = ShowAttendTell(vocab_size=len(vocab), use_bert=args.use_bert)

    dummy = jnp.zeros((1, args.image_size, args.image_size, 3))
    caps = jnp.zeros((1, 4), dtype=jnp.int32)
    init_kw = {}
    embedder = None
    if args.use_bert:
        from .bert_embedder import BertCaptionEmbedder

        embedder = BertCaptionEmbedder()
        init_kw["caption_embeddings"] = jnp.zeros((1, 4, 768))
    variables = dict(model.init(jax.random.PRNGKey(0), dummy, caps,
                                **init_kw))
    batch_stats = variables.get("batch_stats", {})
    params = dict(variables["params"])
    if args.checkpoint_dir:
        ckpt = CheckpointManager(args.checkpoint_dir)
        enc, _, _ = ckpt.restore(args.encoder_ckpt)
        dec, _, _ = ckpt.restore(args.decoder_ckpt)
        params["encoder"] = enc["params"]
        params["decoder"] = dec["params"]
        if enc.get("batch_stats"):
            batch_stats = {"encoder": enc["batch_stats"]}
    state = LegacyTrainState(params=params, batch_stats=batch_stats,
                             opt_state=None, step=jnp.zeros((), jnp.int32))

    metrics = validate(model, state, val_ds, vocab,
                       batch_size=args.batch_size,
                       max_length=args.max_length, bert_embedder=embedder)
    for k, v in metrics.items():
        print(f"{k}: {v:.4f}")
    return metrics


if __name__ == "__main__":
    main()
