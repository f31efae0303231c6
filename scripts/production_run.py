"""Full-size, everything-on production integration run on the real chip
(VERDICT r3 task 1; the integration test the per-feature evidence runs
skipped — reference protocol being mirrored: /root/reference/README.md:44-45,
54-57).

One training run at real flagship scale — CLIP ViT-B/32 (768/12L) + GPT-2
(768/12L, vocab table 50257) + AoA, caption length 50 — with EVERYTHING on:

* Q-Former (32 queries) between encoder and decoder
* curriculum sampling (caption_length strategy, linear pacing)
* contrastive + ITM auxiliary losses
* bf16 AMP, async Orbax checkpoints, step-level checkpoints (save_every_steps)
* CE → SCST switchover (on-device per-sample CIDEr rewards)
* beam-5 validation with CLIP reranking (same decode as the eval CLI)
* a REAL mid-run kill: phase 1 runs as a subprocess and is SIGTERM-killed
  mid-epoch; phase 2 resumes from the rolling ``checkpoint_step``
  mid-epoch checkpoint and finishes the protocol
* a final eval-CLI pass on the best checkpoint that must reproduce the
  training-time validation CIDEr
* a chained device step-time measurement to compare against
  ``BT_FULL=1 scripts/bench_train.py`` (same program, bench harness)

Real COCO weights/data are unavailable offline, so absolute CIDEr is not
comparable to the reference's 127.6; the evidence is that the full
production configuration executes end to end on the chip with no retraces,
VMEM pressure, or horizon bugs, loss descends, SCST lifts CIDEr, resume is
exact, and eval CLI == training val.

Usage:
    python scripts/production_run.py                 # driver (TPU, ~1 h)
    PROD_TINY=1 python scripts/production_run.py     # CPU orchestration smoke
    python scripts/production_run.py --phase1 ROOT VOCAB OUTDIR   # internal
"""

import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TINY = bool(os.environ.get("PROD_TINY"))


def _force_cpu_if_tiny():
    if TINY:
        import jax

        jax.config.update("jax_platforms", "cpu")


def prod_config(root: str, outdir: str, vocab):
    from image_captioning_ml_project_tpu.config import (
        AttentionType, DecoderType, EncoderType, get_default_config)

    c = get_default_config()
    c.data_root = root
    c.output_dir = os.path.join(outdir, "out")
    c.checkpoint_dir = os.path.join(outdir, "ckpt")
    c.log_every = 20
    c.save_every = 1
    c.save_every_steps = 5 if TINY else 50
    # bound checkpoint overhead to 25% of wall time: v1 measured 72-96 s
    # blocking D2H per step save (and one 36-minute tunnel-weather stall)
    # against ~8 s of train compute per 50-step interval
    c.step_ckpt_max_overhead = 0.0 if TINY else 0.25
    c.num_workers = 0            # one host core: serial + native batch decode
    c.native_loader = True
    c.seed = 0

    e, d, a = c.model.encoder, c.model.decoder, c.model.attention
    e.encoder_type = EncoderType.CLIP
    d.decoder_type = DecoderType.GPT2
    a.attention_type = AttentionType.AOA
    if TINY:
        c.image_size = 32
        e.hidden_size = 32
        e.num_layers = 1
        e.num_heads = 2
        e.patch_size = 16
        e.image_size = 32
        e.feature_dim = 32
        d.hidden_dim = 32
        d.num_layers = 1
        d.num_heads = 2
        d.max_length = 16
        d.prefix_length = 4
        d.gpt2_n_positions = 64
        c.model.vocab_size = max(len(vocab), 64)
        c.model.projection_dim = 32
        a.hidden_dim = 32
        c.model.q_former_num_queries = 4
        c.model.q_former_num_heads = 2
        c.training.batch_size = 8
        c.training.num_epochs = 4
        c.training.rl_start_epoch = 3
        c.inference.max_length = 8
        c.inference.num_candidates = 3
        c.inference.beam_size = 3
    else:
        # flagship towers, identical to bench.build_flagship(on_tpu=True)
        c.image_size = 224
        e.hidden_size = 768
        e.num_layers = 12
        e.num_heads = 12
        e.patch_size = 32
        e.image_size = 224
        d.hidden_dim = 768
        d.num_layers = 12
        d.num_heads = 12
        d.max_length = 50            # caption length 50 (reference README:44)
        d.prefix_length = 10
        # model vocab table at GPT-2's 50257 (real-size embedding + logits
        # compute); the word tokenizer occupies the low id range — BPE
        # token parity itself is covered by tests/test_bpe.py
        c.model.vocab_size = 50257
        c.model.projection_dim = 768
        c.model.q_former_num_queries = 32
        c.model.q_former_num_heads = 8
        c.training.batch_size = 32   # reference best-config batch
        c.training.num_epochs = 8    # 6 CE + 2 (CE+SCST)
        c.training.rl_start_epoch = 6
        c.inference.max_length = 20
        c.inference.num_candidates = 5
        c.inference.beam_size = 5
        c.inference.length_penalty = 0.8
    c.model.use_q_former = True
    c.model.q_former_num_layers = 2
    c.training.use_amp = True
    c.training.learning_rate = 3e-4
    c.training.warmup_steps = 100
    c.training.use_rl = True
    c.training.rl_on_device_reward = True
    c.training.use_contrastive_loss = True
    c.training.use_itm_loss = True
    c.training.use_curriculum = True
    c.training.curriculum_strategy = "caption_length"
    c.training.curriculum_pacing = "linear"
    c.inference.use_clip_reranking = True
    c.model.pad_token_id = vocab.pad_token_id
    c.model.bos_token_id = vocab.bos_token_id
    c.model.eos_token_id = vocab.eos_token_id
    return c


def build_random_reranker(vocab, seed: int = 7):
    """Seeded random-weight CLIP reranker at real ViT-B/32 size.

    No pretrained CLIP exists offline; the integration evidence is the
    full rerank compute path (beam candidates → host decode → CLIP
    tokenize → jitted two-tower scoring → winner gather) at production
    shapes. The SAME seed is used by the train subprocess, the resume
    process, and the eval pass — flax init is deterministic, so all three
    score with identical weights and validation CIDEr is reproducible."""
    import zlib

    import jax
    import jax.numpy as jnp
    import numpy as np

    from image_captioning_ml_project_tpu.inference.reranking import (
        CLIPReranker)
    from image_captioning_ml_project_tpu.models.clip_text import CLIPScorer

    if TINY:
        scorer = CLIPScorer(vision_hidden=32, vision_layers=1,
                            vision_heads=2, patch_size=16, text_vocab=256,
                            text_hidden=32, text_layers=1, text_heads=2,
                            text_eos_token_id=255, text_max_positions=16,
                            projection_dim=32)
        L, V, BOS, EOS, img = 16, 256, 254, 255, 32
    else:
        scorer = CLIPScorer()    # HF openai/clip-vit-base-patch32 dims
        L, V, BOS, EOS, img = 77, 49408, 49406, 49407, 224
    dummy_img = jnp.zeros((1, img, img, 3), jnp.float32)
    dummy_ids = jnp.full((1, L), EOS, jnp.int32)
    variables = scorer.init(jax.random.PRNGKey(seed), dummy_img, dummy_ids)

    def clip_tokenize(texts):
        # crc32 (not hash(): PYTHONHASHSEED-independent across processes)
        out = np.zeros((len(texts), L), np.int32)
        for r, t in enumerate(texts):
            ids = [BOS] + [zlib.crc32(w.encode()) % (V - 512) + 4
                           for w in t.split()][: L - 2] + [EOS]
            out[r, : len(ids)] = ids
        return out

    return CLIPReranker(
        scorer, variables, clip_tokenize,
        lambda ids: vocab.decode(ids, skip_special_tokens=True),
        image_size=img)


def phase1(root: str, vocab_path: str, outdir: str):
    """Train until killed (subprocess entry)."""
    _force_cpu_if_tiny()
    from image_captioning_ml_project_tpu.data.tokenizer import WordVocab
    from image_captioning_ml_project_tpu.main import train

    vocab = WordVocab.load(vocab_path)
    c = prod_config(root, outdir, vocab)
    rr = build_random_reranker(vocab)
    train(c, tokenizer=vocab, reranker=rr)


def _build_corpus(root: str):
    from image_captioning_ml_project_tpu.data.synthetic import (
        make_synthetic_coco)

    marker = os.path.join(root, ".complete")
    if os.path.exists(marker):
        return
    if TINY:
        make_synthetic_coco(root, num_images=48, captions_per_image=3,
                            image_size=32, splits=["train"], seed=0,
                            image_format="jpg")
        make_synthetic_coco(root, num_images=16, captions_per_image=3,
                            image_size=32, splits=["val"], seed=1,
                            image_format="jpg")
    else:
        # >= 200 full-size steps/epoch: 2134 imgs x 3 caps / batch 32 = 200
        make_synthetic_coco(root, num_images=2134, captions_per_image=3,
                            image_size=224, splits=["train"], seed=0,
                            image_format="jpg")
        make_synthetic_coco(root, num_images=256, captions_per_image=3,
                            image_size=224, splits=["val"], seed=1,
                            image_format="jpg")
    open(marker, "w").close()


def _kill_when_midepoch(proc, ckpt_dir: str, timeout_s: float):
    """Poll the rolling step checkpoint; SIGTERM the child once it has
    committed a mid-epoch save inside epoch >= 2 (all programs compiled,
    steady state — killing mid-compile can wedge the axon tunnel)."""
    from image_captioning_ml_project_tpu.utils.checkpoint import (
        latest_step_checkpoint)

    want_epoch, want_batch = (1, 5) if TINY else (1, 50)
    t0 = time.time()
    reason = "timeout"
    while time.time() - t0 < timeout_s:
        if proc.poll() is not None:
            return "exited"
        try:
            # latest_step_checkpoint only returns COMMITTED trees (orbax
            # renames the tmp dir into place at commit); with the two-slot
            # scheme a kill mid-save can at worst lose the stale slot
            name = latest_step_checkpoint(ckpt_dir)
            if name is None:
                raise OSError
            with open(os.path.join(ckpt_dir, name + ".meta.json")) as f:
                m = json.load(f)["metadata"]
            if (m.get("epoch", 0) >= want_epoch
                    and m.get("batch_index", 0) >= want_batch
                    and m.get("phase") == "ce"):
                reason = f"epoch {m['epoch']} batch {m['batch_index']}"
                break
        except (OSError, ValueError, KeyError):
            pass
        time.sleep(2 if TINY else 10)
    print(f"PRODRUN killing phase-1 trainer ({reason})", flush=True)
    proc.send_signal(signal.SIGTERM)
    try:
        proc.wait(timeout=60)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait(timeout=60)
    return reason


def _probe_tpu(timeout_s: int = 300) -> bool:
    if TINY:
        return True
    code = ("import numpy as np, jax, jax.numpy as jnp;"
            "x = jnp.ones((128,128), jnp.bfloat16);"
            "print(float(np.asarray(jax.jit(lambda a: a @ a)(x))[0,0]))")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True, text=True)
        return "128" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def _measure_chained_step(trainer, batch, iters: int = 20) -> float:
    """ms/step of the jitted everything-on train step, chained (the
    bench_train measurement pattern: fetch a param leaf, not a scalar)."""
    import jax
    import numpy as np

    def force(state):
        return np.asarray(jax.tree_util.tree_leaves(state.params)[0])

    key = jax.random.PRNGKey(0)
    inputs = trainer._batch_inputs(batch)
    trainer.state, _ = trainer._train_step(
        trainer.state, inputs, batch["caption_tokens"],
        batch["attention_mask"], key)
    force(trainer.state)
    t0 = time.perf_counter()
    for _ in range(iters):
        trainer.state, _ = trainer._train_step(
            trainer.state, inputs, batch["caption_tokens"],
            batch["attention_mask"], key)
    force(trainer.state)
    return (time.perf_counter() - t0) / iters * 1e3


def driver():
    base = os.environ.get(
        "PROD_DIR", "/tmp/prodrun_tiny" if TINY else "/tmp/prodrun")
    root = os.path.join(base, "data")
    outdir = os.path.join(base, "run")
    os.makedirs(root, exist_ok=True)
    os.makedirs(outdir, exist_ok=True)
    _build_corpus(root)

    from image_captioning_ml_project_tpu.data.tokenizer import WordVocab

    vocab_path = os.path.join(base, "vocab.json")
    if not os.path.exists(vocab_path):
        with open(os.path.join(root, "annotations",
                               "captions_train2014.json")) as f:
            ann = json.load(f)
        WordVocab.build([a["caption"] for a in ann["annotations"]],
                        threshold=1).save(vocab_path)
    vocab = WordVocab.load(vocab_path)

    # ---- phase 1: subprocess, killed mid-epoch ----
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    log_path = os.path.join(outdir, "phase1.log")
    t0 = time.time()
    with open(log_path, "w") as log:
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--phase1", root,
             vocab_path, outdir],
            stdout=log, stderr=subprocess.STDOUT, env=env)
        reason = _kill_when_midepoch(
            proc, os.path.join(outdir, "ckpt"),
            timeout_s=600 if TINY else 3600)
    phase1_s = time.time() - t0
    print(json.dumps({"prodrun": "phase1", "killed_at": reason,
                      "seconds": round(phase1_s, 1)}), flush=True)
    if reason == "exited":
        print("PRODRUN phase 1 exited before the kill point — check "
              f"{log_path}", flush=True)
        sys.exit(1)

    if not _probe_tpu():
        print("PRODRUN tunnel unresponsive after kill; aborting resume "
              "(re-run the driver when the probe passes)", flush=True)
        sys.exit(2)

    # ---- phase 2: resume in-process from the mid-epoch step checkpoint ----
    _force_cpu_if_tiny()
    import copy

    from image_captioning_ml_project_tpu.main import evaluate, train

    from image_captioning_ml_project_tpu.utils.checkpoint import (
        latest_step_checkpoint)

    c = prod_config(root, outdir, vocab)
    rr = build_random_reranker(vocab)
    ckpt_name = latest_step_checkpoint(os.path.join(outdir, "ckpt"))
    if ckpt_name is None:
        # SIGTERM landed before any step save committed —
        # fall back to the newest epoch checkpoint
        epochs = [int(n.rsplit("_", 1)[1])
                  for n in os.listdir(os.path.join(outdir, "ckpt"))
                  if n.startswith("checkpoint_epoch_")
                  and not n.endswith(".meta.json")]
        if not epochs:
            # nothing survived the kill: phase 2 would silently retrain
            # from scratch while claiming a resume — fail loudly instead
            print("PRODRUN no checkpoint survived the kill; the resume "
                  "leg cannot be demonstrated (kill landed too early). "
                  "Re-run with a later --kill-after.", flush=True)
            sys.exit(3)
        ckpt_name = f"checkpoint_epoch_{max(epochs)}"
        print(f"PRODRUN checkpoint_step missing; resuming from {ckpt_name}",
              flush=True)
    t1 = time.time()
    trainer = train(c, checkpoint_path=ckpt_name, tokenizer=vocab,
                    reranker=rr)
    phase2_s = time.time() - t1
    resume = {"prodrun": "resume", "from": ckpt_name,
              "start_epoch": trainer.start_epoch,
              "start_batch": trainer.start_batch,
              "start_phase": trainer.start_phase,
              "seconds": round(phase2_s, 1)}
    print(json.dumps(resume), flush=True)
    for row in trainer.history:
        print(json.dumps({"prodrun": "epoch", **row}), flush=True)

    # ---- eval CLI on the best checkpoint must reproduce training val ----
    best_cider = max((h["val_metrics"].get("CIDEr", 0.0)
                      for h in trainer.history), default=0.0)
    ec = copy.deepcopy(c)
    metrics = evaluate(ec, checkpoint_path="best_model", tokenizer=vocab,
                       reranker=rr)
    print(json.dumps({"prodrun": "eval_cli",
                      "cider": round(float(metrics.get("CIDEr", 0.0)), 6),
                      "best_val_cider": round(float(best_cider), 6)}),
          flush=True)

    # ---- chained device step time (compare: BT_FULL=1 bench_train.py) ----
    batch = next(iter(trainer._train_batches(0)))
    ms = _measure_chained_step(trainer, batch)
    bsz = c.training.batch_size
    print(json.dumps({"prodrun": "step_time", "ms_per_step": round(ms, 1),
                      "images_per_sec": round(bsz / ms * 1e3, 1),
                      "batch": bsz}), flush=True)
    trainer.ckpt.wait_until_finished()


def continue_run(from_ckpt: str):
    """Continue the finished v1 run from an epoch checkpoint under the
    fixed LR-schedule horizon (trainer counts SCST epochs' double pass).

    v1 surfaced the horizon bug live: its SCST epochs ran at LR ~0 (epoch
    8's metrics bit-identical to epoch 7's — docs/performance.md). This
    re-runs only the SCST epochs from the epoch checkpoint preceding the
    switchover, now on a live part of the schedule, to produce the
    "SCST lifts CIDEr" leg of the integration evidence without paying for
    the six CE epochs again."""
    base = os.environ.get(
        "PROD_DIR", "/tmp/prodrun_tiny" if TINY else "/tmp/prodrun")
    root = os.path.join(base, "data")
    outdir = os.path.join(base, "run")
    _force_cpu_if_tiny()
    import copy

    from image_captioning_ml_project_tpu.data.tokenizer import WordVocab
    from image_captioning_ml_project_tpu.main import evaluate, train

    vocab = WordVocab.load(os.path.join(base, "vocab.json"))
    c = prod_config(root, outdir, vocab)
    rr = build_random_reranker(vocab)
    t0 = time.time()
    trainer = train(c, checkpoint_path=from_ckpt, tokenizer=vocab,
                    reranker=rr)
    print(json.dumps({
        "prodrun": "continue", "from": from_ckpt,
        "total_steps": trainer.total_steps,
        "final_step": int(trainer.state.step),  # == total_steps when the
        # horizon exactly matches the steps actually taken
        "seconds": round(time.time() - t0, 1)}), flush=True)
    for row in trainer.history:
        print(json.dumps({"prodrun": "epoch", **row}), flush=True)
    best_cider = max((h["val_metrics"].get("CIDEr", 0.0)
                      for h in trainer.history), default=0.0)
    metrics = evaluate(copy.deepcopy(c), checkpoint_path="best_model",
                       tokenizer=vocab, reranker=rr)
    print(json.dumps({"prodrun": "eval_cli",
                      "cider": round(float(metrics.get("CIDEr", 0.0)), 6),
                      "best_val_cider": round(float(best_cider), 6)}),
          flush=True)
    trainer.ckpt.wait_until_finished()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--phase1":
        phase1(sys.argv[2], sys.argv[3], sys.argv[4])
    elif len(sys.argv) > 1 and sys.argv[1] == "--continue":
        continue_run(sys.argv[2] if len(sys.argv) > 2
                     else "checkpoint_epoch_6")
    else:
        driver()
