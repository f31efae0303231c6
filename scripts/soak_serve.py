"""Serving soak: 10+ minutes of open-loop HTTP load on the chip, with a
hot checkpoint /reload mid-run and a SIGTERM drain at the end.

The CPU suite (tests/test_server.py) proves every piece of the ops
surface in isolation; this run proves the *lifecycle* on hardware — the
full HTTP stack (ThreadingHTTPServer -> micro-batcher -> bucketed jitted
decode -> completer) holding a sustained request rate, swapping weights
under load without downtime, and draining cleanly on SIGTERM. The
reference's closest analogue is the per-process one-image demo
(reference: src/main.py:270-343); it has no serving lifecycle to soak.

Method: open-loop load — requests fire on a fixed schedule regardless of
completion (latency is measured from the *scheduled* time, so a lagging
server shows up as queueing delay instead of silently lowering the
offered rate, the standard coordinated-omission fix). A worker-thread
pool posts JPEG bytes to /caption over keep-alive connections. At the
half-way mark one POST /reload hot-swaps the serving weights to a
checkpoint saved before the run; at the end, SIGTERM triggers the
production drain handler (stop accepting, finish in-flight, fail
stragglers loudly) and the script verifies a clean exit.

Reported (JSON line): request/error counts (errors MUST be 0), p50/p95
before vs after the swap (windows exclude warmup and a 10 s transition
around the reload), the reload wall time, mean batch fill, and whether
the drain completed.

Usage: python scripts/soak_serve.py [seconds] (default 660)
Env: SOAK_RATE_HZ (default 25), SOAK_BATCH (default 64 TPU / 8 CPU),
     SOAK_BUCKETS (default "1,8,max").
"""

import io
import json
import os
import queue
import signal
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_jpegs(n: int, side: int, seed: int = 0):
    """A few distinct in-memory JPEGs (decode cost ~ a real camera frame)."""
    from PIL import Image

    rng = np.random.RandomState(seed)
    blobs = []
    for _ in range(n):
        arr = rng.randint(0, 255, (side, side, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=85)
        blobs.append(buf.getvalue())
    return blobs


class _Vocab:
    """Minimal tokenizer stand-in (same as bench_serve): decode cost ~ a
    real WordVocab's, no tokenizer files needed offline."""

    def __init__(self, n):
        self.words = [f"w{i}" for i in range(n)]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(self.words[int(i) % len(self.words)]
                        for i in np.asarray(ids) if int(i) > 3)

    def __len__(self):
        return len(self.words)


def post(conn_factory, path, body, headers):
    """One HTTP request on a fresh-or-reused connection; returns
    (status, payload_dict, conn) — the caller reuses conn (keep-alive)."""
    import http.client

    conn = conn_factory()
    conn.request("POST", path, body=body, headers=headers)
    resp = conn.getresponse()
    data = resp.read()
    return resp.status, json.loads(data.decode()), conn


def run_soak(seconds: float):
    on_tpu = None  # resolved after jax import inside the service build
    import jax

    from bench import build_flagship
    from image_captioning_ml_project_tpu.inference.server import (
        CaptionService, make_http_server)

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    cfg, _model, batch = build_flagship(on_tpu)
    batch = int(os.environ.get("SOAK_BATCH", str(batch)))
    cfg.inference.decoding_strategy = "beam"
    cfg.inference.use_clip_reranking = False
    ckpt_dir = os.path.join("/tmp", f"soak_ckpt_{os.getpid()}")
    cfg.checkpoint_dir = ckpt_dir

    vocab = _Vocab(cfg.model.vocab_size)
    service = CaptionService(cfg, tokenizer=vocab, batch_size=batch,
                             max_wait_ms=10.0, pipeline_depth=2)

    # a checkpoint to hot-swap to mid-run (saved BEFORE load starts; the
    # async Orbax save must be committed before /reload races it)
    service.trainer.save_checkpoint(0, is_best=True)
    service.trainer.ckpt.wait_until_finished()
    service.start(warmup=True)
    httpd = make_http_server(service, port=0)
    port = httpd.server_address[1]

    # the production drain handler, wired exactly as serve() wires it
    drained = threading.Event()

    def _drain(signum, frame):
        threading.Thread(target=httpd.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _drain)

    def _serve():
        httpd.serve_forever()
        service.stop()
        drained.set()

    srv_thread = threading.Thread(target=_serve, daemon=True)
    srv_thread.start()

    jpegs = make_jpegs(16, cfg.image_size)
    rate = float(os.environ.get("SOAK_RATE_HZ", "25"))
    n_total = int(seconds * rate)
    t_reload = seconds / 2.0

    import http.client

    def conn_factory():
        return http.client.HTTPConnection("127.0.0.1", port, timeout=60)

    results = []  # (sched_t_rel, latency_ms, ok)
    res_lock = threading.Lock()
    work: "queue.Queue" = queue.Queue()

    def worker():
        conn = None
        while True:
            item = work.get()
            if item is None:
                return
            sched_abs, idx = item
            # open loop: latency includes any wait past the scheduled time
            now = time.monotonic()
            if now < sched_abs:
                time.sleep(sched_abs - now)
            body = jpegs[idx % len(jpegs)]
            try:
                if conn is None:
                    conn = conn_factory()
                conn.request("POST", "/caption", body=body,
                             headers={"Content-Type": "image/jpeg",
                                      "Content-Length": str(len(body))})
                resp = conn.getresponse()
                payload = resp.read()
                ok = resp.status == 200 and b"caption" in payload
            except Exception:
                ok, conn = False, None
            lat_ms = (time.monotonic() - sched_abs) * 1e3
            with res_lock:
                results.append((sched_abs - t0, lat_ms, ok))

    n_workers = 64
    threads = [threading.Thread(target=worker, daemon=True)
               for _ in range(n_workers)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for i in range(n_total):
        work.put((t0 + i / rate, i))

    # mid-run hot reload (its own connection; workers keep hammering)
    reload_info = {}
    while time.monotonic() - t0 < t_reload:
        time.sleep(0.25)
    body = json.dumps({"checkpoint": "best_model"}).encode()
    status, reload_info, _ = post(
        conn_factory, "/reload", body,
        {"Content-Type": "application/json",
         "Content-Length": str(len(body))})
    reload_ok = status == 200 and "reloaded" in reload_info
    t_reload_done = time.monotonic() - t0

    # wait for the schedule to finish draining through the pool
    while True:
        with res_lock:
            done = len(results)
        if done >= n_total:
            break
        time.sleep(1.0)
    for _ in threads:
        work.put(None)
    for t in threads:
        t.join(timeout=30)

    stats = service.stats.snapshot()

    # SIGTERM drain with nothing in flight left: serve_forever must
    # return, the service must stop, the process must exit cleanly
    os.kill(os.getpid(), signal.SIGTERM)
    drain_ok = drained.wait(timeout=30)
    srv_thread.join(timeout=10)

    # percentile windows: warmup excluded; +-(10 s, 5 s) around the reload
    def window(lo, hi):
        lats = sorted(l for (s, l, ok) in results if ok and lo <= s < hi)
        if not lats:
            return {"p50": None, "p95": None, "n": 0}
        import math

        def pct(p):
            rank = max(0, math.ceil(p / 100.0 * len(lats)) - 1)
            return round(lats[min(len(lats) - 1, rank)], 1)

        return {"p50": pct(50), "p95": pct(95), "n": len(lats)}

    dump = os.environ.get("SOAK_DUMP")
    if dump:
        with open(dump, "w") as f:
            for s, l, ok in sorted(results):
                f.write(f"{s:.3f}\t{l:.1f}\t{int(ok)}\n")

    # per-minute percentiles localize discrete stalls (a tunnel hiccup or
    # the reload restore) that a whole-window p95 smears into mystery
    minutes = []
    for m in range(int(seconds // 60)):
        w = window(60.0 * m, 60.0 * (m + 1))
        minutes.append({"minute": m, **w})

    errors_client = sum(1 for (_, _, ok) in results if not ok)
    out = {
        "metric": f"serve_soak[{backend}]",
        "seconds": seconds,
        "rate_hz": rate,
        "requests": len(results),
        "client_errors": errors_client,
        "server_errors": stats["errors"],
        "before_reload": window(60.0, t_reload_done - 5.0),
        "after_reload": window(t_reload_done + 10.0, seconds),
        "reload": {"ok": reload_ok,
                   "seconds": reload_info.get("seconds")},
        "mean_batch_fill": stats["mean_batch_fill"],
        "batches": stats["batches"],
        "throughput_rps": stats["throughput_rps"],
        "drain_ok": bool(drain_ok),
        "slow_1s": sum(1 for (_, l, ok) in results if ok and l > 1e3),
        "minutes": minutes,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 660.0
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    run_soak(seconds)
