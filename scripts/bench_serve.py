"""Serving throughput: closed-loop clients against the CaptionService.

The reference has no serving analogue (closest: the one-image demo,
reference: src/main.py:270-343); this measures the production surface we
added — request micro-batching + the dispatch/complete pipeline — at
flagship size on the chip.

Method: N closed-loop client threads (each submits a raw image and blocks
until its caption returns) flood one in-process CaptionService for a fixed
window; throughput = completed requests / window, latency percentiles from
ServerStats. Every completion involved a real host fetch (np.asarray in
the completer), so dispatch chains cannot hide device time. HTTP is
deliberately excluded — it measures the stdlib socket stack, not the
serving core (the HTTP layer is one client of this service).

Two phases: pipeline_depth=1 (synchronous: fetch+detokenize of batch N
blocks the dispatch of N+1) vs depth=2 (the default: the completer thread
overlaps batch N's host work with batch N+1's device work). On a
tunnel-attached dev box the overlap hides the ~16-20 ms dispatch RTT per
batch; on a real PCIe host it hides the detokenize + fetch cost.

Usage: python scripts/bench_serve.py [seconds_per_phase]
Env: SERVE_BATCH (default 64 TPU / 8 CPU), SERVE_CLIENTS (default 3x batch),
     SERVE_DEPTHS (default "1,2").
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_config(on_tpu: bool):
    """bench.py's flagship config (shared builder — no drift), serving
    knobs applied on top."""
    from bench import build_flagship

    c, _model, batch = build_flagship(on_tpu)
    batch = int(os.environ.get("SERVE_BATCH", str(batch)))
    c.inference.decoding_strategy = "beam"
    c.inference.use_clip_reranking = False
    return c, batch


class _Vocab:
    """Minimal tokenizer stand-in: decode cost ~ a real WordVocab's."""

    def __init__(self, n):
        self.words = [f"w{i}" for i in range(n)]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(self.words[int(i) % len(self.words)]
                        for i in np.asarray(ids) if int(i) > 3)

    def __len__(self):
        return len(self.words)


def flood_open(service, images, seconds: float, window: int):
    """Open-loop: ONE driver thread keeps `window` requests in flight via
    submit_async/result — measures the serving core without the GIL churn
    of hundreds of closed-loop client threads."""
    from collections import deque

    rs = np.random.RandomState(0)
    inflight = deque()
    done = 0
    t0 = time.perf_counter()
    deadline = t0 + seconds
    while time.perf_counter() < deadline:
        while len(inflight) < window:
            inflight.append(
                service.submit_async(images[rs.randint(len(images))]))
        service.result(inflight.popleft())
        done += 1
    while inflight:
        service.result(inflight.popleft())
        done += 1
    wall = time.perf_counter() - t0
    return done, wall, service.stats.snapshot()


def flood(service, images, seconds: float, clients: int):
    """Closed-loop clients; returns (completed, wall_s, stats_snapshot)."""
    stop = threading.Event()
    counts = [0] * clients

    def client(ci):
        rs = np.random.RandomState(ci)
        while not stop.is_set():
            service.submit(images[rs.randint(len(images))])
            counts[ci] += 1

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(seconds)
    stop.set()
    for t in threads:
        t.join(timeout=120)
    wall = time.perf_counter() - t0
    return sum(counts), wall, service.stats.snapshot()


def lowload(service, images, seconds: float, rate_hz: float = 1.0):
    """Quiet-hour profile: ONE client issuing rate_hz blocking requests/s.
    Measures what a single user pays when the batcher is otherwise idle —
    the case the bucketed batch shapes exist for (a 1-wide decode instead
    of a full serve_batch_size-wide one). Returns per-request ms."""
    lat = []
    t_next = time.perf_counter()
    end = t_next + seconds
    i = 0
    while t_next < end:
        now = time.perf_counter()
        if now < t_next:
            time.sleep(t_next - now)
        t0 = time.perf_counter()
        service.submit(images[i % len(images)])
        lat.append((time.perf_counter() - t0) * 1e3)
        i += 1
        t_next += 1.0 / rate_hz
    return lat


def run_lowload(cfg, vocab, images, batch, seconds: float, backend: str):
    """p50/p95 at 1 req/s with the bucket ladder vs a single full-width
    bucket (the pre-bucketing behavior), one JSON line each."""
    from image_captioning_ml_project_tpu.inference.server import (
        CaptionService)

    for label, buckets in (("bucketed[1,8,max]", None),
                           ("single[max]", [batch])):
        service = CaptionService(cfg, tokenizer=vocab, batch_size=batch,
                                 max_wait_ms=5.0, request_timeout_s=300.0,
                                 pipeline_depth=2, bucket_sizes=buckets)
        service.start(warmup=True)
        lowload(service, images, min(5.0, seconds / 3))  # settle
        lat = lowload(service, images, seconds)
        service.stop()
        lat.sort()
        print(json.dumps({
            "metric": f"serve_lowload_latency_ms[{backend}]",
            "buckets": label, "batch": service.batch_size,
            "rate_hz": 1.0, "n": len(lat),
            "p50": round(lat[len(lat) // 2], 1),
            "p95": round(lat[int(len(lat) * 0.95)], 1),
        }), flush=True)


def main():
    from bench import _backend_responsive

    if not _backend_responsive():
        print("bench_serve.py: accelerator backend unresponsive; "
              "falling back to CPU run", file=sys.stderr)
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from image_captioning_ml_project_tpu.inference.server import (
        CaptionService)

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else (
        30.0 if on_tpu else 6.0)
    cfg, batch = build_config(on_tpu)
    clients = int(os.environ.get("SERVE_CLIENTS", str(3 * batch)))
    depths = [int(d) for d in
              os.environ.get("SERVE_DEPTHS", "1,2").split(",")]

    rs = np.random.RandomState(0)
    images = [rs.randint(0, 256, (cfg.image_size, cfg.image_size, 3),
                         dtype=np.uint8) for _ in range(64)]
    vocab = _Vocab(cfg.model.vocab_size)

    mode = os.environ.get("SERVE_MODE", "closed")
    if mode == "lowload":
        run_lowload(cfg, vocab, images, batch, seconds, backend)
        return
    for depth in depths:
        service = CaptionService(cfg, tokenizer=vocab, batch_size=batch,
                                 max_wait_ms=5.0, request_timeout_s=300.0,
                                 pipeline_depth=depth)
        service.start(warmup=True)
        # steady the jit + thread pool before the measured window
        warm_s = min(5.0, seconds / 3)
        if mode == "open":
            flood_open(service, images, warm_s, window=clients)
            service.stats = type(service.stats)()
            done, wall, snap = flood_open(service, images, seconds,
                                          window=clients)
        else:
            flood(service, images, warm_s, clients=clients)
            service.stats = type(service.stats)()
            done, wall, snap = flood(service, images, seconds, clients)
        service.stop()
        print(json.dumps({
            "metric": f"serve_captions_per_sec[{backend}]",
            "mode": mode,
            "pipeline_depth": depth,
            "batch": service.batch_size,
            "clients": clients,
            "value": round(done / wall, 2),
            "mean_batch_fill": snap["mean_batch_fill"],
            "latency_ms": snap["latency_ms"],
            "errors": snap["errors"],
        }), flush=True)


if __name__ == "__main__":
    main()
