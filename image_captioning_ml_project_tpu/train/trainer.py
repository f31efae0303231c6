"""Training engine: jit-compiled data-parallel CE training, SCST RL
fine-tuning, validation with caption metrics, Orbax checkpoints.

Capability parity with the reference trainer
(reference: src/train/trainer.py:22-646), redesigned TPU-first:

* The per-batch step — forward, loss, backward, optimizer, LR schedule —
  is **one jitted XLA program** over a batch sharded on the mesh's
  ``data`` axis with replicated parameters; XLA inserts the gradient
  ``psum``s (SURVEY.md §2.3). The reference's host-side loop with AMP
  GradScaler (src/train/trainer.py:218-308) becomes bf16 compute
  (``use_amp`` → bfloat16 activations, fp32 params/optimizer — no loss
  scaling needed on TPU).
* Images arrive uint8 and are normalized on device
  (src/main.py:139-153's transforms moved into the jitted step).
* SCST (src/train/trainer.py:319-484): sampled + greedy rollouts run
  as jitted KV-cached decodes (replacing the Python token loop that
  re-ran the full decoder per token, :413-432); rewards are **per-sample
  CIDEr** (fixing the corpus-broadcast defect, SURVEY.md §2.4); the
  REINFORCE update is a second jitted program.
* Checkpoints: Orbax trees with the reference's best-val-CIDEr policy
  (:190-198) and full resume (:600-620).
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import Config
from ..data.coco import iterate_batches, normalize_images
from ..data.pipeline import prefetch
from ..evaluate.metrics import calculate_metrics, per_sample_cider
from ..inference.decoding import greedy_decode, sample_decode
from ..models.captioning_model import ImageCaptioningModel
from ..parallel.mesh import create_mesh, replicate
from ..utils.checkpoint import CheckpointManager
from ..utils.logging import MetricLogger, setup_logging
from .losses import CombinedLoss
from .optim import create_optimizer


@struct.dataclass
class TrainState:
    params: Any            # {"model": ..., "loss": ...}
    batch_stats: Any       # ResNet BN stats ({} otherwise)
    opt_state: Any
    step: jnp.ndarray


class CaptioningTrainer:
    """reference: src/train/trainer.py:22-109 (construction surface)."""

    def __init__(
        self,
        config: Config,
        train_dataset,
        val_dataset,
        tokenizer,
        mesh=None,
        curriculum_sampler=None,
        model: Optional[ImageCaptioningModel] = None,
        reranker=None,
    ):
        self.config = config
        # Optional CLIP reranker for validation decodes: when set (and the
        # pipeline carries raw images), `_validate_epoch` generates
        # inference.num_candidates beam candidates and lets CLIP pick —
        # best-CIDEr checkpoint selection then runs the SAME decode as the
        # final eval CLI (main._make_decode_batch rerank branch), keeping
        # the trainer's model-selection metric aligned with what ships
        # (reference rerank surface: src/config.py:107-109).
        self.reranker = reranker
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.tokenizer = tokenizer
        self.curriculum_sampler = curriculum_sampler
        self.logger = setup_logging(config.output_dir, __name__)

        self.mesh = mesh if mesh is not None else create_mesh(config.mesh)

        # bf16 compute when use_amp (reference AMP: src/train/trainer.py:70-71)
        dtype = jnp.bfloat16 if config.training.use_amp else jnp.float32
        if config.model.dtype == "float32":
            dtype = jnp.float32
        self.dtype = dtype
        self.model = model or ImageCaptioningModel(config, dtype=dtype)

        tc = config.training
        self.loss_mod = CombinedLoss(
            pad_token_id=config.model.pad_token_id,
            use_contrastive=tc.use_contrastive_loss,
            use_itm=tc.use_itm_loss,
            contrastive_weight=tc.contrastive_weight,
            itm_weight=tc.itm_weight,
            temperature=tc.contrastive_temperature,
            hidden_dim=config.model.projection_dim,
            attention_reg_weight=tc.attention_reg_weight,
            dtype=dtype,
        )

        self.steps_per_epoch = max(len(train_dataset) // tc.batch_size, 1)

        # Epochs >= rl_start_epoch take TWO optimizer passes over the data
        # (the CE pass, then the SCST pass — both advance state.step and
        # therefore the LR schedule), so they consume the horizon at 2x.
        # The reference sizes its scheduler to one pass per epoch
        # (src/train/trainer.py:139) while stepping it in both loops
        # (:286, :381), so its SCST epochs silently train at ~0 LR; fixed
        # here as intended behavior (surfaced by the full-size production
        # integration run, docs/performance.md).
        def _passes(e: int) -> int:
            return 2 if (tc.use_rl and e >= tc.rl_start_epoch) else 1

        if curriculum_sampler is not None:
            # the LR schedule horizon must match the steps that will
            # actually run: curriculum pacing shrinks early epochs, so
            # probe the sampler's per-epoch length (set_epoch only stores
            # the epoch index; train() re-sets it each epoch anyway)
            total = 0
            for e in range(tc.num_epochs):
                curriculum_sampler.set_epoch(e)
                total += _passes(e) * max(
                    len(curriculum_sampler) // tc.batch_size, 1)
            curriculum_sampler.set_epoch(0)
            self.total_steps = max(total, 1)
        else:
            self.total_steps = self.steps_per_epoch * sum(
                _passes(e) for e in range(tc.num_epochs))

        # async: the epoch-N save's disk commit overlaps epoch N+1 compute
        # (the reference's torch.save blocks the loop); train() drains
        # in-flight saves before returning.
        self.ckpt = CheckpointManager(config.checkpoint_dir, async_save=True)
        self.best_val_score = 0.0
        self.start_epoch = 0
        # mid-epoch resume position (set by load_checkpoint on a
        # ``checkpoint_step`` restore): first resumed epoch continues at
        # this batch index within this phase ("ce" | "scst")
        self.start_batch = 0
        self.start_phase = "ce"
        # per-epoch record (train loss, val loss, val metrics) appended by
        # train() — programmatic runs (scripts/production_run.py) read it
        # instead of parsing the log
        self.history = []

        # Object-region (BUTD) mode: the model consumes pre-extracted
        # detector features instead of images (reference encoder:
        # src/models/encoders.py:233-296).
        from ..config import EncoderType

        self._object_mode = (
            config.model.encoder.encoder_type == EncoderType.OBJECT_REGION
            or config.model.encoder.use_object_features)

        self.state = self._init_state(jax.random.PRNGKey(config.seed))
        self._build_steps()

    # ------------------------------------------------------------------
    # state init
    # ------------------------------------------------------------------

    def _dummy_batch(self):
        c = self.config
        B = 2
        caps = jnp.zeros((B, c.model.decoder.max_length), dtype=jnp.int32)
        if self._object_mode:
            e = c.model.encoder
            inputs = {
                "region_features": jnp.zeros(
                    (B, e.max_objects, e.region_feature_dim)),
                "region_boxes": jnp.zeros((B, e.max_objects, 4)),
                "region_mask": jnp.ones((B, e.max_objects), dtype=jnp.bool_),
            }
        else:
            inputs = jnp.zeros((B, c.image_size, c.image_size, 3),
                               dtype=jnp.uint8)
        return inputs, caps

    def _prepare_inputs(self, inputs):
        """Traced: uint8 images -> normalized floats; region dicts pass
        through (already float features); canvas dicts (device-resident
        preprocessing) resize + normalize on device (ops/resize.py). With
        ``config.fold_normalize`` on a ViT/CLIP encoder, raw uint8 passes
        straight to the model — the patch embed folds the affine into its
        matmul (models/encoders.PatchEmbed)."""
        if isinstance(inputs, dict):
            # dispatch on "image_size" (the device-resize canvas marker,
            # CLAUDE.md conventions) — a plain {"image": uint8} dict just
            # normalizes like the array path
            if "image_size" in inputs:
                from ..ops.resize import resize_normalize

                return resize_normalize(inputs["image"],
                                        inputs["image_size"],
                                        self.config.image_size)
            if "image" in inputs:
                return self._prepare_inputs(inputs["image"])
            return inputs
        if self._fold_normalize():
            return inputs
        return normalize_images(inputs)

    def _fold_normalize(self) -> bool:
        from ..config import EncoderType

        return (getattr(self.config, "fold_normalize", False)
                and self.config.model.encoder.encoder_type
                in (EncoderType.VIT, EncoderType.CLIP))

    def _batch_inputs(self, batch):
        """Host: select the model-input arrays from a data batch."""
        if self._object_mode:
            return {k: batch[k] for k in
                    ("region_features", "region_boxes", "region_mask")}
        if "image_size" in batch:  # device-resize canvas batch
            return {"image": batch["image"],
                    "image_size": batch["image_size"]}
        return batch["image"]

    def _init_state(self, rng) -> TrainState:
        inputs, caps = self._dummy_batch()
        m_rng, l_rng, itm_rng = jax.random.split(rng, 3)
        variables = self.model.init(m_rng, self._prepare_inputs(inputs), caps)
        model_params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        T, V = caps.shape[1], self.config.model.vocab_size
        dummy_logits = jnp.zeros((2, T, V))
        # match the real runtime feature dims: pooled image features carry
        # encoder.feature_dim, text features carry decoder.hidden_dim
        dummy_img = jnp.zeros((2, self.config.model.encoder.feature_dim))
        dummy_txt = jnp.zeros((2, self.config.model.decoder.hidden_dim))
        loss_vars = self.loss_mod.init(
            {"params": l_rng, "itm": itm_rng}, dummy_logits, caps,
            dummy_img, dummy_txt, None)
        loss_params = loss_vars.get("params", {})

        params = {"model": model_params, "loss": loss_params}
        self.tx, self.lr_schedule = create_optimizer(
            self.config.training, self.total_steps, params)

        if self.mesh.shape.get(self.config.mesh.model_axis, 1) > 1:
            # tensor-parallel placement for decoder matmuls; optimizer state
            # inherits shardings (optax init = zeros_like on sharded params)
            from ..parallel.sharding import shard_params

            params = shard_params(params, self.mesh)
            opt_state = jax.jit(self.tx.init)(params)
            state = TrainState(
                params=params,
                batch_stats=replicate(batch_stats, self.mesh),
                opt_state=opt_state,
                step=replicate(jnp.zeros((), dtype=jnp.int32), self.mesh))
            return state

        opt_state = self.tx.init(params)
        state = TrainState(params=params, batch_stats=batch_stats,
                           opt_state=opt_state,
                           step=jnp.zeros((), dtype=jnp.int32))
        return replicate(state, self.mesh)

    # ------------------------------------------------------------------
    # jitted programs
    # ------------------------------------------------------------------

    def _forward_loss(self, params, batch_stats, images, captions, rng,
                      train: bool, caption_mask=None):
        """Shared forward + combined loss."""
        model_vars: Dict[str, Any] = {"params": params["model"]}
        has_bs = bool(jax.tree_util.tree_leaves(batch_stats))
        if has_bs:
            model_vars["batch_stats"] = batch_stats
        drop_rng, itm_rng = jax.random.split(rng)
        mutable = ["batch_stats"] if (has_bs and train) else False
        out = self.model.apply(
            model_vars, images, captions, train=train,
            rngs={"dropout": drop_rng} if train else {},
            mutable=mutable)
        if mutable:
            out, mutated = out
            new_bs = mutated.get("batch_stats", batch_stats)
        else:
            new_bs = batch_stats
        losses = self.loss_mod.apply(
            {"params": params["loss"]},
            out["logits"].astype(jnp.float32), captions,
            image_features=out.get("pooled_features"),
            text_features=out.get("text_features"),
            attention_weights=out.get("attention_weights"),
            target_mask=caption_mask,
            deterministic=not train,
            rngs={"itm": itm_rng, "dropout": itm_rng} if train else {})
        return losses, new_bs

    def _build_steps(self):
        def train_step(state: TrainState, images, captions, caption_mask,
                       rng):
            rng = jax.random.fold_in(rng, state.step)
            images = self._prepare_inputs(images)

            def loss_fn(params):
                losses, new_bs = self._forward_loss(
                    params, state.batch_stats, images, captions, rng, True,
                    caption_mask=caption_mask)
                return losses["total_loss"], (losses, new_bs)

            grads, (losses, new_bs) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              state.params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u, state.params, updates)
            metrics = {k: v for k, v in losses.items()}
            metrics["learning_rate"] = self.lr_schedule(state.step)
            metrics["grad_norm"] = jnp.sqrt(sum(
                jnp.sum(g.astype(jnp.float32) ** 2)
                for g in jax.tree_util.tree_leaves(grads)))
            return TrainState(params=new_params, batch_stats=new_bs,
                              opt_state=new_opt, step=state.step + 1), metrics

        self._train_step = jax.jit(train_step, donate_argnums=(0,))

        def eval_loss_step(state: TrainState, images, captions,
                           caption_mask, row_valid):
            """Per-token CE over *valid* rows only. ``row_valid`` [B] masks
            out pad_last duplicate rows so the trailing short batch doesn't
            bias the epoch mean; also returns the supervised-token count so
            the caller can aggregate exactly (weighted by tokens, not rows)."""
            images = self._prepare_inputs(images)
            caption_mask = caption_mask * row_valid[:, None].astype(
                caption_mask.dtype)
            losses, _ = self._forward_loss(
                state.params, state.batch_stats, images, captions,
                jax.random.PRNGKey(0), False, caption_mask=caption_mask)
            # token count matching shifted_cross_entropy's denominator
            ntok = caption_mask[:, 1:].astype(jnp.float32).sum()
            return losses["ce_loss"], ntok

        self._eval_loss_step = jax.jit(eval_loss_step)

        def val_decode_step(state: TrainState, images, rng):
            """Decode with the *configured* InferenceConfig strategy — the
            reference's `_validate_epoch` generates through model.generate,
            which for GPT-2 is beam search (src/train/trainer.py:540 →
            src/models/decoders.py:645-654), so best-CIDEr checkpoint
            selection must run the same decode as final eval."""
            from ..inference.decoding import decode

            images = self._prepare_inputs(images)
            variables = self._model_vars(state)
            B = jax.tree_util.tree_leaves(images)[0].shape[0]
            mc = self.config.model
            max_length = self.config.inference.max_length
            cache = self.model.apply(variables, images, max_length,
                                     method=self.model.init_cache)

            def step_fn(s, toks):
                return self.model.apply(variables, s, toks,
                                        method=self.model.step)

            return decode(step_fn, cache, B, self.config.inference,
                          mc.bos_token_id, mc.eos_token_id, mc.pad_token_id,
                          rng=rng, max_length=max_length)

        self._val_decode_step = jax.jit(val_decode_step)

        # CLIP-reranked validation candidates: literally the eval CLI's
        # rerank-branch program (not a copy of it), so best-CIDEr
        # checkpoint selection can never drift from what ships. Lazy
        # import — main.py imports this module at top level.
        from ..main import _make_decode_batch

        self._val_candidates_step = _make_decode_batch(
            self, self.config, rerank=True)

        def rollout_step(state: TrainState, images, rng, max_length):
            """SCST rollouts: one sampled + one greedy decode, shared
            encoder pass (reference: src/train/trainer.py:349-356).
            ``state.step`` is folded into the key (like the fused SCST
            path) so per-batch keys never repeat across epochs — train()
            reuses one parent key per epoch."""
            rng = jax.random.fold_in(rng, state.step)
            images = self._prepare_inputs(images)
            variables = self._model_vars(state)
            B = jax.tree_util.tree_leaves(images)[0].shape[0]
            cache = self.model.apply(variables, images, max_length,
                                     method=self.model.init_cache)

            def step_fn(s, toks):
                return self.model.apply(variables, s, toks,
                                        method=self.model.step)

            mc = self.config.model
            sample = sample_decode(step_fn, cache, rng, B, mc.bos_token_id,
                                   mc.eos_token_id, mc.pad_token_id,
                                   max_length)
            greedy = greedy_decode(step_fn, cache, B, mc.bos_token_id,
                                   max_length, eos_token_id=mc.eos_token_id,
                                   pad_token_id=mc.pad_token_id)
            return sample.tokens, sample.mask, greedy

        self._rollout_step = jax.jit(rollout_step, static_argnums=(3,))

        def reinforce_update(state: TrainState, images_n, sampled,
                             token_mask, advantages):
            """Shared REINFORCE estimator + optimizer update:
            loss = -mean(adv * logp(sampled)) over the sampler's token
            mask (marks sampled tokens incl. EOS — safe when pad == eos;
            reference: src/train/trainer.py:371-378). Both SCST paths
            (host-reward and fused on-device CIDEr) must compute the
            identical update."""
            def loss_fn(params):
                model_vars = self._model_vars(state, params)
                out = self.model.apply(model_vars, images_n, sampled,
                                       train=False)
                logits = out["logits"].astype(jnp.float32)
                logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
                tok = sampled[:, 1:]
                tok_logp = jnp.take_along_axis(
                    logp, tok[..., None], axis=-1)[..., 0]
                mask = token_mask[:, 1:].astype(jnp.float32)
                loss = -(advantages[:, None] * tok_logp * mask).sum() \
                    / jnp.maximum(mask.sum(), 1.0)
                return self.config.training.rl_weight * loss

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              state.params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u, state.params, updates)
            return TrainState(params=new_params,
                              batch_stats=state.batch_stats,
                              opt_state=new_opt,
                              step=state.step + 1), loss

        def rl_update_step(state: TrainState, images, sampled, sample_mask,
                           advantages):
            images = self._prepare_inputs(images)
            new_state, loss = reinforce_update(state, images, sampled,
                                               sample_mask, advantages)
            return new_state, {"rl_loss": loss}

        self._rl_update_step = jax.jit(rl_update_step, donate_argnums=(0,))

        def scst_fused_step(state: TrainState, images, ref_tokens, ref_valid,
                            df, rng, max_length):
            """Fully-fused SCST: sampled + greedy rollouts, on-device
            per-sample CIDEr rewards, REINFORCE update — one XLA program
            (BASELINE.json north star)."""
            from ..evaluate.cider_device import per_sample_cider_device

            rng = jax.random.fold_in(rng, state.step)
            roll_rng, _ = jax.random.split(rng)
            mc = self.config.model
            specials = (mc.pad_token_id, mc.bos_token_id, mc.eos_token_id)
            images_n = self._prepare_inputs(images)
            B = jax.tree_util.tree_leaves(images_n)[0].shape[0]

            variables = self._model_vars(state)
            cache = self.model.apply(variables, images_n, max_length,
                                     method=self.model.init_cache)

            def step_fn(s, toks):
                return self.model.apply(variables, s, toks,
                                        method=self.model.step)

            sample = sample_decode(step_fn, cache, roll_rng, B,
                                   mc.bos_token_id, mc.eos_token_id,
                                   mc.pad_token_id, max_length)
            greedy = greedy_decode(step_fn, cache, B, mc.bos_token_id,
                                   max_length, eos_token_id=mc.eos_token_id,
                                   pad_token_id=mc.pad_token_id)

            sample_r = per_sample_cider_device(
                sample.tokens, ref_tokens, ref_valid, df, specials)
            greedy_r = per_sample_cider_device(
                greedy, ref_tokens, ref_valid, df, specials)
            advantages = jax.lax.stop_gradient(sample_r - greedy_r)

            new_state, loss = reinforce_update(state, images_n,
                                               sample.tokens, sample.mask,
                                               advantages)
            metrics = {"rl_loss": loss, "reward": sample_r.mean(),
                       "greedy_reward": greedy_r.mean(),
                       # mean |advantage|: 0 iff the REINFORCE gradient is
                       # identically zero (degenerate rewards) — surfaced so
                       # callers can detect a signal-free SCST step
                       "adv_abs": jnp.abs(advantages).mean()}
            return new_state, metrics

        self._scst_fused_step = jax.jit(scst_fused_step,
                                        donate_argnums=(0,),
                                        static_argnums=(6,))

    def _model_vars(self, state: TrainState, params=None):
        p = params if params is not None else state.params
        v = {"params": p["model"]}
        if jax.tree_util.tree_leaves(state.batch_stats):
            v["batch_stats"] = state.batch_stats
        return v

    def eval_state(self, state: Optional[TrainState] = None) -> TrainState:
        """State for decode-only phases: under bf16 AMP the float32 master
        params are pre-cast to bf16 **once** here, so jitted eval programs
        see bf16 leaves instead of re-casting every weight every batch
        (bit-identical — modules cast params at use anyway; the profile
        measured ~33 ms/run of convert fusions on the ViT+Transformer
        decode). Training steps keep the f32 masters."""
        state = state if state is not None else self.state
        if self.dtype != jnp.bfloat16:
            return state
        from ..utils.amp import cast_float_params

        # batch_stats stay f32: BatchNorm consumes running mean/var at
        # f32 under use_running_average (force_float32_reductions)
        return state.replace(params=cast_float_params(state.params))

    # ------------------------------------------------------------------
    # epoch loops (reference: src/train/trainer.py:164-317)
    # ------------------------------------------------------------------

    def train(self):
        self.logger.info("Starting training...")
        tc = self.config.training
        rng = jax.random.PRNGKey(self.config.seed + 1)
        for epoch in range(self.start_epoch, tc.num_epochs):
            self.logger.info("Epoch %d/%d", epoch + 1, tc.num_epochs)
            if self.curriculum_sampler is not None:
                self.curriculum_sampler.set_epoch(epoch)
                self.logger.info("Curriculum: %d samples",
                                 len(self.curriculum_sampler))
            resumed = epoch == self.start_epoch
            train_loss = self._train_epoch(
                epoch, rng,
                start_batch=self.start_batch if resumed else 0,
                start_phase=self.start_phase if resumed else "ce")
            val_loss, val_metrics = self._validate_epoch(epoch)
            self.logger.info(
                "Epoch %d: Train Loss: %.4f, Val Loss: %.4f, Val CIDEr: %.4f",
                epoch + 1, train_loss, val_loss, val_metrics.get("CIDEr", 0.0))
            self.history.append({
                "epoch": epoch + 1, "train_loss": float(train_loss),
                "val_loss": float(val_loss),
                "val_metrics": {k: float(v) for k, v in val_metrics.items()},
                "scst": bool(tc.use_rl and epoch >= tc.rl_start_epoch)})
            is_best = val_metrics.get("CIDEr", 0.0) > self.best_val_score
            if is_best:
                self.best_val_score = val_metrics.get("CIDEr", 0.0)
                self.logger.info("New best model with CIDEr: %.4f",
                                 self.best_val_score)
            if (epoch + 1) % self.config.save_every == 0 or is_best:
                self.save_checkpoint(epoch, is_best=is_best)
        self.ckpt.wait_until_finished()

    def _train_batches(self, epoch: int = 0,
                       skip_batches: int = 0) -> Iterator[Dict[str, Any]]:
        it = iterate_batches(
            self.train_dataset, self.config.training.batch_size,
            shuffle=self.curriculum_sampler is None,
            sampler=iter(self.curriculum_sampler)
            if self.curriculum_sampler is not None else None,
            # fresh shuffle every epoch (torch DataLoader(shuffle=True)
            # semantics); the curriculum sampler handles its own epoching
            seed=self.config.seed + epoch,
            num_workers=self.config.num_workers,
            skip_batches=skip_batches)
        return prefetch(it, mesh=self.mesh,
                        data_axis=self.config.mesh.data_axis)

    def save_step_checkpoint(self, epoch: int, batch_index: int, phase: str):
        """Rolling mid-epoch checkpoint (``config.save_every_steps``).

        ``batch_index`` is the number of batches *completed* this epoch in
        ``phase``; resume re-creates the identically-seeded epoch iterator
        and skips exactly that many chunks. Two alternating slots keep
        disk bounded while the newest committed save is never the
        ``force=True`` deletion target (a single rolling name lost BOTH
        saves to a host kill mid-save — utils/checkpoint.py:STEP_SLOTS);
        the wait drains the previous in-flight save so Orbax never
        overwrites a path mid-commit (N steps apart, it is long done).

        With ``config.step_ckpt_max_overhead`` > 0 the save is adaptively
        throttled: after a save whose blocking portion cost ``c`` seconds,
        further step saves are skipped until ``c / frac`` wall seconds have
        passed. A healthy storage path is unaffected; a degraded one (the
        production run measured a 36-minute blocking D2H during a tunnel
        bandwidth collapse) coarsens checkpoint granularity instead of
        repeatedly stalling the train loop."""
        import time

        frac = getattr(self.config, "step_ckpt_max_overhead", 0.0)
        now = time.monotonic()
        if frac and hasattr(self, "_step_ckpt_done_t"):
            wait_s = self._step_ckpt_cost_s / frac
            if now - self._step_ckpt_done_t < wait_s:
                self.logger.warning(
                    "step checkpoint throttled: last save blocked %.1fs; "
                    "next allowed %.0fs after it (%.0fs remain)",
                    self._step_ckpt_cost_s, wait_s,
                    wait_s - (now - self._step_ckpt_done_t))
                return
        # the measured blocking cost includes the drain of the PREVIOUS
        # in-flight save: if the slow leg of the storage path is the async
        # disk commit rather than the D2H, the throttle must still see it
        t0 = time.monotonic()
        self.ckpt.wait_until_finished()
        self.ckpt.save_step(
            self._state_tree(),
            metadata={"epoch": epoch, "batch_index": batch_index,
                      "phase": phase, "step": int(self.state.step),
                      "best_val_score": self.best_val_score},
            config=self.config)
        self._step_ckpt_done_t = time.monotonic()
        self._step_ckpt_cost_s = self._step_ckpt_done_t - t0

    def _train_epoch(self, epoch: int, rng, start_batch: int = 0,
                     start_phase: str = "ce") -> float:
        import time

        tc = self.config.training
        if start_phase == "scst":
            # resumed inside the RL phase: the CE pass of this epoch already
            # ran before preemption
            if tc.use_rl and epoch >= tc.rl_start_epoch:
                # report the RL loss so the epoch's history row carries the
                # loss that was actually trained (not a fake 0.0 CE loss)
                return self._train_reinforcement_learning(
                    epoch, rng, start_batch=start_batch)
            self.logger.warning(
                "resumed a '%s'-phase checkpoint for epoch %d but the "
                "current config has use_rl=%s rl_start_epoch=%d — no "
                "training pass remains for this epoch", start_phase,
                epoch + 1, tc.use_rl, tc.rl_start_epoch)
            return 0.0
        save_steps = getattr(self.config, "save_every_steps", 0)
        meter = MetricLogger()
        num_batches = 0
        # curriculum pacing shrinks early epochs: log the real denominator
        epoch_batches = max(
            (len(self.curriculum_sampler)
             if self.curriculum_sampler is not None
             else len(self.train_dataset)) // tc.batch_size, 1)
        # a cheap param leaf whose fetch forces the whole dispatch chain
        # (scalar fetches do NOT force chained steps on the axon backend;
        # see docs/performance.md "Steady-state measurement")
        _leaves = jax.tree_util.tree_leaves(self.state.params)
        force_leaf_ix = int(np.argmin([l.size for l in _leaves]))
        # Off the logging cadence, losses are kept as device scalars and
        # fetched at epoch end — a per-batch float() would block dispatch of
        # step i+1 on step i finishing, serializing device with host prep.
        pending_losses = []
        t0, n_since = None, 0
        for i, batch in enumerate(self._train_batches(epoch, start_batch),
                                  start=start_batch):
            self.state, metrics = self._train_step(
                self.state, self._batch_inputs(batch),
                batch["caption_tokens"], batch["attention_mask"], rng)
            num_batches += 1
            n_since += 1
            if save_steps and (i + 1) % save_steps == 0:
                self.save_step_checkpoint(epoch, i + 1, "ce")
            if t0 is None:
                # warmup boundary: force the first step (absorbs compile)
                np.asarray(
                    jax.tree_util.tree_leaves(self.state.params)
                    [force_leaf_ix])
                t0, n_since = time.perf_counter(), 0
                host = {k: float(v) for k, v in metrics.items()}
                meter.update(**host)
                continue
            if (i + 1) % self.config.log_every == 0:
                # force the chain, then report true wall ms/step over the
                # window (device + host prep — the throughput a user sees)
                np.asarray(
                    jax.tree_util.tree_leaves(self.state.params)
                    [force_leaf_ix])
                dt = time.perf_counter() - t0
                host = {k: float(v) for k, v in metrics.items()}
                meter.update(**host)
                self.logger.info(
                    "Epoch %d, Batch %d/%d, Loss: %.4f, LR: %.6f, "
                    "step: %.0f ms (windowed avg)",
                    epoch + 1, i + 1, epoch_batches,
                    host["total_loss"], host["learning_rate"],
                    1e3 * dt / max(n_since, 1))
                t0, n_since = time.perf_counter(), 0
            else:
                pending_losses.append(metrics["total_loss"])
        for v in np.asarray(pending_losses, dtype=np.float32) \
                if pending_losses else []:
            meter.update(total_loss=float(v))

        if tc.use_rl and epoch >= tc.rl_start_epoch:
            self._train_reinforcement_learning(epoch, rng)

        return meter.averages().get("total_loss", 0.0)

    # ------------------------------------------------------------------
    # SCST (reference: src/train/trainer.py:319-484)
    # ------------------------------------------------------------------

    def _references_by_image_id(self) -> Dict[int, list]:
        refs: Dict[int, list] = {}
        for ex in self.train_dataset.examples:
            refs.setdefault(ex["image_id"], []).append(ex["caption"])
        return refs

    def _tokenized_refs_by_image_id(self, max_length: int) -> Dict[int, list]:
        """Token-id reference lists per image (device-CIDEr reward path)."""
        refs: Dict[int, list] = {}
        for ex in self.train_dataset.examples:
            ids, mask = self.tokenizer.encode(ex["caption"], max_length)
            refs.setdefault(ex["image_id"], []).append(
                ids[: int(mask.sum())].tolist())
        return refs

    def _train_reinforcement_learning(self, epoch: int, rng,
                                      start_batch: int = 0):
        tc = self.config.training
        if tc.rl_reward.lower() == "cider" and tc.rl_on_device_reward:
            return self._train_scst_on_device(epoch, rng, start_batch)
        return self._train_scst_host_reward(epoch, rng, start_batch)

    def _decode_ctx(self):
        """Announce the trainer's mesh to the fused decode kernel so decodes
        keep the Pallas fast path on dp-sharded multi-chip runs
        (ops/pallas_decode.decode_mesh; harmless no-op on 1-device meshes).
        Wraps every call site whose jitted function contains a decode, so
        the mesh is visible while jit traces."""
        from ..ops.pallas_decode import decode_mesh

        return decode_mesh(self.mesh, self.config.mesh.data_axis)

    def _train_scst_on_device(self, epoch: int, rng, start_batch: int = 0):
        """Fused SCST epoch: rollouts + CIDEr rewards + update in one jit."""
        from ..evaluate.cider_device import build_df_table, encode_references

        self.logger.info("Running SCST (on-device CIDEr) for epoch %d",
                         epoch + 1)
        mc = self.config.model
        max_length = self.config.inference.max_length
        ref_len = self.config.model.decoder.max_length
        refs_by_id = self._tokenized_refs_by_image_id(ref_len)
        if not hasattr(self, "_cider_df"):
            self._cider_df = build_df_table(
                list(refs_by_id.values()),
                special_ids=(mc.pad_token_id, mc.bos_token_id,
                             mc.eos_token_id))
        meter = MetricLogger()
        # match the dataset's reference budget (eval batches carry the
        # same count), not a literal 5
        max_refs = getattr(self.train_dataset, "max_ref_captions", 5)
        save_steps = getattr(self.config, "save_every_steps", 0)
        # resume replay: per-batch keys come from sequential splits of the
        # epoch key, so splitting start_batch times reproduces the exact
        # key sequence the interrupted run would have used
        for _ in range(start_batch):
            rng, _ = jax.random.split(rng)
        for i, batch in enumerate(self._train_batches(epoch, start_batch),
                                  start=start_batch):
            rng, step_rng = jax.random.split(rng)
            refs = [refs_by_id.get(int(iid), [[mc.eos_token_id]])
                    for iid in np.asarray(batch["image_id"])]
            ref_tokens, ref_valid = encode_references(refs, max_refs, ref_len)
            with self._decode_ctx():
                self.state, metrics = self._scst_fused_step(
                    self.state, self._batch_inputs(batch),
                    jnp.asarray(ref_tokens), jnp.asarray(ref_valid),
                    self._cider_df, step_rng, max_length)
            meter.update(**{k: float(v) for k, v in metrics.items()})
            if save_steps and (i + 1) % save_steps == 0:
                self.save_step_checkpoint(epoch, i + 1, "scst")
            if (i + 1) % self.config.log_every == 0:
                self.logger.info("SCST batch %d: %s", i + 1, meter)
        return meter.averages().get("rl_loss", 0.0)

    def _train_scst_host_reward(self, epoch: int, rng, start_batch: int = 0):
        self.logger.info("Running SCST for epoch %d", epoch + 1)
        max_length = self.config.inference.max_length
        refs_by_id = self._references_by_image_id()
        meter = MetricLogger()
        save_steps = getattr(self.config, "save_every_steps", 0)
        for _ in range(start_batch):  # key-sequence replay (see on-device)
            rng, _ = jax.random.split(rng)
        for i, batch in enumerate(self._train_batches(epoch, start_batch),
                                  start=start_batch):
            rng, roll_rng = jax.random.split(rng)
            with self._decode_ctx():
                sampled, sample_mask, greedy = self._rollout_step(
                    self.state, self._batch_inputs(batch), roll_rng,
                    max_length)
            sample_texts = [self.tokenizer.decode(t, skip_special_tokens=True)
                            for t in np.asarray(sampled)]
            greedy_texts = [self.tokenizer.decode(t, skip_special_tokens=True)
                            for t in np.asarray(greedy)]
            gt = [refs_by_id.get(int(iid), [""])
                  for iid in np.asarray(batch["image_id"])]
            sample_r = self._rewards(sample_texts, gt)
            greedy_r = self._rewards(greedy_texts, gt)
            advantages = jnp.asarray(sample_r - greedy_r, dtype=jnp.float32)
            self.state, metrics = self._rl_update_step(
                self.state, self._batch_inputs(batch), sampled, sample_mask,
                advantages)
            meter.update(rl_loss=float(metrics["rl_loss"]),
                         reward=float(sample_r.mean()))
            if save_steps and (i + 1) % save_steps == 0:
                self.save_step_checkpoint(epoch, i + 1, "scst")
            if (i + 1) % self.config.log_every == 0:
                self.logger.info("SCST batch %d: %s", i + 1, meter)

    def _rewards(self, texts, refs) -> np.ndarray:
        """Per-sample rewards for the configured metric
        (reference: src/train/trainer.py:440-484, fixed to be per-sample)."""
        reward_type = self.config.training.rl_reward.lower()
        if reward_type == "cider":
            return per_sample_cider(texts, refs)
        from ..evaluate.metrics import (bleu, meteor_lite, metric_tokenize,
                                        rouge_l)

        gen = [metric_tokenize(t) for t in texts]
        rr = [[metric_tokenize(r) for r in rs] for rs in refs]
        if reward_type == "bleu":
            _, ps = bleu(gen, rr)
            return ps[:, 3]
        if reward_type == "meteor":
            _, ps = meteor_lite(gen, rr)
            return ps
        if reward_type == "rouge":
            _, ps = rouge_l(gen, rr)
            return ps
        if reward_type == "spice":
            try:
                from ..evaluate.metrics import per_sample_spice

                return per_sample_spice(texts, refs)
            except Exception as e:
                if not getattr(self, "_spice_warned", False):
                    self._spice_warned = True
                    self.logger.warning(
                        "SPICE reward unavailable (%s: pycocoevalcap SPICE "
                        "needs Java); falling back to per-sample CIDEr", e)
                return per_sample_cider(texts, refs)
        self.logger.warning("Unknown reward '%s', using CIDEr", reward_type)
        return per_sample_cider(texts, refs)

    # ------------------------------------------------------------------
    # validation (reference: src/train/trainer.py:486-567)
    # ------------------------------------------------------------------

    def _validate_epoch(self, epoch: int) -> Tuple[float, Dict[str, float]]:
        # reference quirk: val batch size = inference.num_candidates
        # (src/data/dataset.py:466) — rounded up to a multiple of the data
        # mesh axis so sharded device_put succeeds on multi-chip runs
        dp = self.mesh.shape.get(self.config.mesh.data_axis, 1)
        nc = self.config.inference.num_candidates
        batch_size = -(-nc // dp) * dp
        rng = jax.random.PRNGKey(self.config.seed + 17)
        losses = []
        generated, references, image_ids = [], [], []
        # pad_last so the trailing short batch is evaluated (static shapes),
        # covering every val image (reference iterates all batches,
        # src/train/trainer.py:506)
        it = iterate_batches(self.val_dataset, batch_size, shuffle=False,
                             drop_last=False, pad_last=True,
                             num_workers=self.config.num_workers)
        # one bf16 weight pre-cast for the whole epoch (bit-identical)
        estate = self.eval_state()
        # rerank needs raw pixels for CLIP; the object-region pipeline
        # carries detector features only (same guard as main.evaluate)
        reranker = self.reranker if not self._object_mode else None
        for batch in prefetch(it, mesh=self.mesh,
                              data_axis=self.config.mesh.data_axis):
            first_ref = batch["caption_tokens"][:, 0, :]
            first_mask = batch["attention_mask"][:, 0, :]
            inputs = self._batch_inputs(batch)
            valid = batch.get("batch_valid",
                              np.ones(batch_size, dtype=bool))
            loss_b, ntok_b = self._eval_loss_step(
                estate, inputs, first_ref, first_mask,
                jnp.asarray(valid))
            losses.append((float(loss_b), float(ntok_b)))
            rng, step_rng = jax.random.split(rng)
            if reranker is not None:
                with self._decode_ctx():
                    cand = self._val_candidates_step(estate, inputs,
                                                     step_rng)
                imgs = batch["image"]
                if "image_size" in batch:
                    # device-resize canvases: give CLIP the same resized
                    # pixels the captioner saw (main.evaluate policy)
                    from ..ops.resize import resize_square

                    imgs = resize_square(imgs, batch["image_size"],
                                         self.config.image_size)
                tokens = np.asarray(reranker(imgs, cand))
            else:
                with self._decode_ctx():
                    tokens = np.asarray(
                        self._val_decode_step(estate, inputs, step_rng))
            for j in range(len(tokens)):
                if not valid[j]:
                    continue
                generated.append(self.tokenizer.decode(
                    tokens[j], skip_special_tokens=True))
                references.append(batch["captions"][j])
                image_ids.append(int(np.asarray(batch["image_id"])[j]))
        val_loss = (sum(l * n for l, n in losses)
                    / max(sum(n for _, n in losses), 1)) if losses else 0.0
        metrics = calculate_metrics(generated, references, image_ids) \
            if generated else {"CIDEr": 0.0}
        return val_loss, metrics

    # ------------------------------------------------------------------
    # checkpointing (reference: src/train/trainer.py:569-620)
    # ------------------------------------------------------------------

    def _state_tree(self):
        """The one checkpointed view of TrainState — save_checkpoint,
        save_step_checkpoint, and load_checkpoint must agree or resume
        silently drops fields."""
        return {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }

    def save_checkpoint(self, epoch: int, is_best: bool = False):
        self.ckpt.save_epoch(
            epoch, self._state_tree(),
            metadata={"epoch": epoch, "best_val_score": self.best_val_score},
            config=self.config, is_best=is_best)

    def load_checkpoint(self, name: str = "best_model"):
        restored, meta, _ = self.ckpt.restore(name, self._state_tree())
        self.state = TrainState(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"])
        self.best_val_score = meta.get("best_val_score", 0.0)
        if "batch_index" in meta:
            # mid-epoch (step) checkpoint: resume INSIDE meta["epoch"] at
            # the recorded batch index / phase
            self.start_epoch = meta.get("epoch", 0)
            self.start_batch = int(meta["batch_index"])
            self.start_phase = meta.get("phase", "ce")
            self.logger.info(
                "Loaded step checkpoint '%s' (epoch %d, %s batch %d, "
                "best %.4f)", name, self.start_epoch + 1, self.start_phase,
                self.start_batch, self.best_val_score)
            return
        self.start_epoch = meta.get("epoch", -1) + 1
        self.start_batch = 0
        self.start_phase = "ce"
        self.logger.info("Loaded checkpoint '%s' (epoch %d, best %.4f)",
                         name, self.start_epoch, self.best_val_score)

    def load_weights(self, name: str = "best_model"):
        """Restore params + batch_stats ONLY (optimizer state untouched).

        For inference-side swaps — the serving /reload endpoint — the
        optimizer moments are dead weight: ~2/3 of an AdamW checkpoint's
        bytes. Not for resuming training (use :meth:`load_checkpoint`,
        which restores the full tree and the epoch/batch cursor)."""
        target = {"params": self.state.params}
        if jax.tree_util.tree_leaves(self.state.batch_stats):
            target["batch_stats"] = self.state.batch_stats  # ResNet BN only
        restored, meta, _ = self.ckpt.restore_partial(name, target)
        self.state = TrainState(
            params=restored["params"],
            batch_stats=restored.get("batch_stats", self.state.batch_stats),
            opt_state=self.state.opt_state,
            step=self.state.step)
        self.best_val_score = meta.get("best_val_score", 0.0)
        self.logger.info("Loaded weights from '%s' (best %.4f)",
                         name, self.best_val_score)
