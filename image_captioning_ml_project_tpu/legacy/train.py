"""Legacy training loop: the baseline "Show, Attend and Tell" recipe.

Behavioral parity with the reference's legacy script
(reference: train.py:27-166): batch 16, Adam lr 4e-4 (:27-30), masked CE
over the shifted targets (pack_padded equivalent, :92-99) **plus** the
doubly-stochastic attention regularization ``((1 - Σ_t α)²).mean()``
(:101), element-wise gradient clamp ±5 (:107-110), LR ×0.8 every 1000
batches (:117-125), mid-epoch checkpoints every 1000 batches and per-epoch
encoder/decoder checkpoints (:127-153).

TPU-first: the whole step is one jitted program; the 1000-batch LR decay is
an optax schedule ``lr * 0.8^(step // 1000)``.
"""

from __future__ import annotations

import logging
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..data.coco import iterate_batches, normalize_images
from ..data.pipeline import prefetch
from ..train.losses import attention_regularization
from ..utils.checkpoint import CheckpointManager
from .model import ShowAttendTell


@struct.dataclass
class LegacyTrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def masked_caption_ce(predictions: jnp.ndarray, captions: jnp.ndarray,
                      pad_token_id: int) -> jnp.ndarray:
    """CE over decode steps: predictions[t] scores captions[t+1]
    (the reference's pack_padded CE over dec_len, train.py:92-99)."""
    targets = captions[:, 1:predictions.shape[1] + 1]
    mask = (targets != pad_token_id).astype(jnp.float32)
    logp = jax.nn.log_softmax(predictions, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


class LegacyTrainer:
    """reference: train.py:43-158."""

    def __init__(self, vocab, train_dataset, val_dataset=None,
                 batch_size: int = 16, learning_rate: float = 4e-4,
                 num_epochs: int = 4, grad_clip: float = 5.0,
                 decay_every: int = 1000, decay_rate: float = 0.8,
                 att_reg_weight: float = 1.0, use_bert: bool = False,
                 checkpoint_dir: str = "checkpoints_legacy",
                 encoder_config=None, mesh=None, seed: int = 0):
        self.vocab = vocab
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.batch_size = batch_size
        self.num_epochs = num_epochs
        self.decay_every = decay_every
        self.att_reg_weight = att_reg_weight
        self.use_bert = use_bert
        self.mesh = mesh
        self.logger = logging.getLogger(__name__)
        self.ckpt = CheckpointManager(checkpoint_dir)

        self.model = ShowAttendTell(vocab_size=len(vocab),
                                    encoder_config=encoder_config,
                                    use_bert=use_bert)

        # lr * decay_rate^(step // decay_every)  (reference: train.py:117-125)
        def schedule(step):
            return learning_rate * decay_rate ** (step // decay_every)

        # element-wise clamp +-5 (reference: train.py:107-110), then Adam
        self.tx = optax.chain(optax.clip(grad_clip),
                              optax.scale_by_adam(),
                              optax.scale_by_learning_rate(schedule))

        self.state = self._init_state(jax.random.PRNGKey(seed))
        self._build_step()

    def _init_state(self, rng):
        sample = self.train_dataset[0]
        H = sample["image"].shape[0]
        images = jnp.zeros((2, H, H, 3), dtype=jnp.float32)
        caps = jnp.zeros((2, sample["caption_tokens"].shape[0]), jnp.int32)
        kwargs = {}
        if self.use_bert:
            kwargs["caption_embeddings"] = jnp.zeros((2, caps.shape[1], 768))
        variables = self.model.init(rng, images, caps, **kwargs)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        state = LegacyTrainState(params=params, batch_stats=batch_stats,
                                 opt_state=opt_state,
                                 step=jnp.zeros((), jnp.int32))
        if self.mesh is not None:
            from ..parallel.mesh import replicate

            state = replicate(state, self.mesh)
        return state

    def _build_step(self):
        pad = self.vocab.pad_token_id

        def train_step(state: LegacyTrainState, images, captions,
                       caption_embeddings, rng):
            rng = jax.random.fold_in(rng, state.step)
            images = normalize_images(images)

            def loss_fn(params):
                variables = {"params": params}
                has_bs = bool(jax.tree_util.tree_leaves(state.batch_stats))
                if has_bs:
                    variables["batch_stats"] = state.batch_stats
                out = self.model.apply(
                    variables, images, captions,
                    caption_embeddings=caption_embeddings,
                    train=True, rngs={"dropout": rng},
                    mutable=["batch_stats"] if has_bs else False)
                if has_bs:
                    out, mutated = out
                    new_bs = mutated["batch_stats"]
                else:
                    new_bs = state.batch_stats
                ce = masked_caption_ce(out["predictions"].astype(jnp.float32),
                                       captions, pad)
                dec_mask = (captions[:, 1:out["alphas"].shape[1] + 1]
                            != pad).astype(jnp.float32)
                # ((1 - sum_t alpha)^2).mean()  (reference: train.py:101)
                reg = attention_regularization(out["alphas"], dec_mask)
                return ce + self.att_reg_weight * reg, (ce, reg, new_bs)

            grads, (ce, reg, new_bs) = jax.grad(loss_fn, has_aux=True)(
                state.params)
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              state.params)
            new_params = optax.apply_updates(state.params, updates)
            return LegacyTrainState(new_params, new_bs, new_opt,
                                    state.step + 1), {"ce": ce, "att_reg": reg}

        self._train_step = jax.jit(train_step, donate_argnums=(0,))

    def train(self, bert_embedder=None):
        rng = jax.random.PRNGKey(1)
        step = 0  # host-side counter: int(state.step) per batch would
        # block dispatch on a device fetch every iteration
        for epoch in range(self.num_epochs):
            losses = []  # device scalars; fetched once at epoch end
            it = iterate_batches(self.train_dataset, self.batch_size,
                                 shuffle=True, seed=epoch)
            for i, batch in enumerate(prefetch(it, mesh=self.mesh)):
                cap_emb = None
                if self.use_bert:
                    assert bert_embedder is not None
                    cap_emb = jnp.asarray(bert_embedder.embed_batch(
                        batch["caption"],
                        batch["caption_tokens"].shape[1]))
                # images stay uint8 on the host; normalize_images runs
                # inside the jitted step (CLAUDE.md convention)
                self.state, metrics = self._train_step(
                    self.state, batch["image"],
                    batch["caption_tokens"], cap_emb, rng)
                losses.append(metrics["ce"])
                step += 1
                if step % self.decay_every == 0:
                    self._save(epoch, mid=True)
            # one stacked transfer, not one ~16-20 ms tunnel RTT per batch
            mean_ce = float(np.mean(
                np.asarray(jnp.stack(losses)))) if losses else 0.0
            self.logger.info("legacy epoch %d: ce=%.4f", epoch + 1, mean_ce)
            self._save(epoch)
        return self.state

    def _save(self, epoch: int, mid: bool = False):
        """Per-epoch encoder/decoder checkpoints (+_mid variants)
        (reference: train.py:127-153)."""
        suffix = "_mid" if mid else ""
        params = self.state.params
        self.ckpt.save(f"encoder_epoch_{epoch}{suffix}",
                       {"params": params["encoder"],
                        "batch_stats": self.state.batch_stats.get("encoder", {})})
        self.ckpt.save(f"decoder_epoch_{epoch}{suffix}",
                       {"params": params["decoder"]})


def main(argv=None):
    """Script entry (reference: train.py run as a script):

    python -m image_captioning_ml_project_tpu.legacy.train \
        --data_root data --vocab vocab.json [--use_bert]
    """
    import argparse

    from ..data.coco import COCOCaptionDataset
    from ..data.tokenizer import WordVocab
    from ..utils.logging import setup_logging

    p = argparse.ArgumentParser(description="Legacy Show-Attend-Tell training")
    p.add_argument("--data_root", type=str, required=True)
    p.add_argument("--vocab", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_epochs", type=int, default=4)
    p.add_argument("--learning_rate", type=float, default=4e-4)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--max_length", type=int, default=50)
    p.add_argument("--use_bert", action="store_true")
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints_legacy")
    args = p.parse_args(argv)

    setup_logging(args.checkpoint_dir)
    vocab = WordVocab.load(args.vocab)
    train_ds = COCOCaptionDataset(
        args.data_root, "annotations/captions_train2014.json", "train2014",
        vocab, image_size=args.image_size, max_length=args.max_length,
        is_training=True)
    val_ds = COCOCaptionDataset(
        args.data_root, "annotations/captions_val2014.json", "val2014",
        vocab, image_size=args.image_size, max_length=args.max_length,
        is_training=False)
    trainer = LegacyTrainer(
        vocab, train_ds, val_ds, batch_size=args.batch_size,
        num_epochs=args.num_epochs, learning_rate=args.learning_rate,
        use_bert=args.use_bert, checkpoint_dir=args.checkpoint_dir)
    embedder = None
    if args.use_bert:
        from .bert_embedder import BertCaptionEmbedder

        embedder = BertCaptionEmbedder()
    trainer.train(bert_embedder=embedder)

    from .validate import validate

    validate(trainer.model, trainer.state, val_ds, vocab,
             batch_size=args.batch_size, bert_embedder=embedder)


if __name__ == "__main__":
    main()
