"""60-second CPU smoke of every user surface (VERDICT r3 task 10).

Runs, in order, against a freshly generated tiny synthetic COCO corpus:

1. modern CLI train  — 1 epoch, beam validation, step + epoch checkpoints
2. modern CLI eval   — best checkpoint, full metric suite
3. modern CLI demo   — one-image caption
4. serve round-trip  — HTTP /healthz + POST /caption + /stats
5. legacy CLI train  — 1 epoch Show-Attend-Tell + corpus-BLEU validation
6. legacy CLI demo   — one-image caption from the legacy checkpoints

Everything runs in subprocesses with ``JAX_PLATFORMS=cpu`` so the smoke
never touches (or waits on) an accelerator; each stage has a timeout and
the script exits non-zero on the first failure. Use before/after changes
when the 15-20 minute full suite is too slow:

    make smoke            # or: python scripts/smoke.py
"""

import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO,
           JAX_COMPILATION_CACHE_DIR="")


def run(stage, args, timeout=240, **kw):
    t0 = time.time()
    r = subprocess.run([sys.executable, "-m"] + args, env=ENV, cwd=REPO,
                       capture_output=True, text=True, timeout=timeout, **kw)
    dt = time.time() - t0
    if r.returncode != 0:
        print(f"[smoke] {stage} FAILED ({dt:.0f}s)\n--- stdout\n"
              f"{r.stdout[-2000:]}\n--- stderr\n{r.stderr[-2000:]}")
        sys.exit(1)
    print(f"[smoke] {stage} OK ({dt:.0f}s)", flush=True)
    return r


def tiny_config(root, outdir):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from image_captioning_ml_project_tpu.config import (config_to_dict,
                                                        get_default_config)

    c = get_default_config()
    c.data_root = root
    c.image_size = 32
    c.seed = 0
    c.output_dir = os.path.join(outdir, "out")
    c.checkpoint_dir = os.path.join(outdir, "ckpt")
    c.log_every = 4
    c.save_every_steps = 2
    c.num_workers = 0
    e, d, a = c.model.encoder, c.model.decoder, c.model.attention
    e.encoder_type = "vit"
    e.feature_dim = 16
    e.hidden_size = 16
    e.num_layers = 1
    e.num_heads = 2
    e.patch_size = 8
    e.image_size = 32
    d.decoder_type = "transformer"
    d.hidden_dim = 16
    d.num_layers = 1
    d.num_heads = 2
    d.max_length = 16
    d.dropout = 0.0
    a.attention_type = "multi_head"
    a.hidden_dim = 16
    c.model.projection_dim = 16
    c.training.batch_size = 8
    c.training.num_epochs = 1
    c.training.use_rl = False
    c.training.use_amp = False
    c.training.warmup_steps = 1
    c.inference.max_length = 8
    c.inference.beam_size = 2
    c.inference.num_candidates = 4
    c.inference.decoding_strategy = "beam"
    return config_to_dict(c)


def main():
    base = tempfile.mkdtemp(prefix="ict_smoke_")
    root = os.path.join(base, "data")
    t_all = time.time()
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from image_captioning_ml_project_tpu.data.synthetic import (
            make_synthetic_coco)

        make_synthetic_coco(root, num_images=8, captions_per_image=2,
                            image_size=32)
        cfg_path = os.path.join(base, "cfg.json")
        with open(cfg_path, "w") as f:
            json.dump(tiny_config(root, base), f)
        print("[smoke] corpus + config OK", flush=True)

        pkg = "image_captioning_ml_project_tpu"
        vocab = os.path.join(base, "out", "vocab.json")
        run("modern train", [f"{pkg}.main", "--mode", "train",
                             "--config", cfg_path])
        from image_captioning_ml_project_tpu.utils.checkpoint import (
            latest_step_checkpoint)

        assert latest_step_checkpoint(os.path.join(base, "ckpt")), \
            "step checkpoint missing"
        run("modern eval", [f"{pkg}.main", "--mode", "eval",
                            "--config", cfg_path,
                            "--checkpoint", "best_model", "--vocab", vocab])
        img_dir = os.path.join(root, "val2014")
        img = os.path.join(img_dir, sorted(os.listdir(img_dir))[0])
        run("modern demo", [f"{pkg}.main", "--mode", "demo",
                            "--config", cfg_path,
                            "--checkpoint", "best_model", "--vocab", vocab,
                            "--image_path", img])

        # serve round-trip
        port = 18000 + (os.getpid() % 1000)
        srv = subprocess.Popen(
            [sys.executable, "-m", f"{pkg}.main", "--mode", "serve",
             "--config", cfg_path, "--checkpoint", "best_model",
             "--vocab", vocab, "--port", str(port),
             "--serve_batch_size", "4", "--serve_buckets", "1,4"],
            env=ENV, cwd=REPO, stdout=subprocess.DEVNULL,
            stderr=subprocess.STDOUT)
        try:
            t0 = time.time()
            health = None
            while time.time() - t0 < 120:
                try:
                    with urllib.request.urlopen(
                            f"http://127.0.0.1:{port}/healthz",
                            timeout=2) as resp:
                        health = json.load(resp)
                    break
                except Exception:
                    if srv.poll() is not None:
                        print("[smoke] serve FAILED (process exited)")
                        sys.exit(1)
                    time.sleep(1)
            assert health and health["ok"], health
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/caption",
                data=open(img, "rb").read(),
                headers={"Content-Type": "image/png"})
            with urllib.request.urlopen(req, timeout=60) as resp:
                cap = json.load(resp)
            assert "caption" in cap, cap
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/stats", timeout=5) as resp:
                stats = json.load(resp)
            assert stats["completed"] >= 1, stats
            print(f"[smoke] serve round-trip OK ({time.time() - t0:.0f}s)",
                  flush=True)
        finally:
            srv.send_signal(signal.SIGTERM)
            try:
                srv.wait(timeout=15)
            except subprocess.TimeoutExpired:
                srv.kill()

        # legacy stack
        legacy_ckpt = os.path.join(base, "legacy_ckpt")
        run("legacy train+validate",
            [f"{pkg}.legacy.train", "--data_root", root, "--vocab", vocab,
             "--batch_size", "4", "--num_epochs", "1",
             "--image_size", "64", "--max_length", "12",
             "--checkpoint_dir", legacy_ckpt], timeout=420)
        run("legacy demo",
            [f"{pkg}.legacy.demo", "--vocab", vocab, "--image_dir", img_dir,
             "--checkpoint_dir", legacy_ckpt, "--image_size", "64",
             "--max_length", "8"])

        print(f"[smoke] ALL OK ({time.time() - t_all:.0f}s total)")
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
