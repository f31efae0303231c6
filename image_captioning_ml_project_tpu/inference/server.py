"""Production serving: HTTP caption service with request micro-batching.

The reference ships no serving surface — its closest analogue is the
one-image demo (reference: src/main.py:270-343), which pays a full model
load per process and decodes one image per call. This module is the
TPU-first production counterpart, and three hardware facts shape it:

* **XLA static shapes**: the decode program is jit-compiled once for a
  fixed ``[B, H, W, 3]`` batch and reused forever (a per-request shape
  would recompile, stalling the service for minutes on a TPU). Incoming
  requests are therefore *micro-batched*: the batcher drains up to
  ``batch_size`` requests (waiting at most ``max_wait_ms`` after the
  first), pads the tail by repeating the last image — the same
  ``pad_last`` discipline as the eval pipeline (data/coco.py) — and each
  request reads only its own output row.
* **Weights are frozen while serving**: the decode consumes
  ``trainer.eval_state()`` (one-time bf16 pre-cast, bit-identical —
  utils/amp.py), so no per-batch f32→bf16 convert fusions run.
* **The fused Pallas decode path must stay engaged**: every batch runs
  inside ``trainer._decode_ctx()`` (ops/pallas_decode.decode_mesh), which
  keeps the shard-local kernel launches under a dp mesh instead of the
  ~1.8× slower XLA fallback.

The HTTP layer is intentionally dependency-free (``http.server`` +
``ThreadingHTTPServer``): one POST per image, batching happens behind the
queue, so N concurrent clients saturate the chip without any client-side
coordination.
"""

from __future__ import annotations

import io
import json
import logging
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)


class ServerStats:
    """Lock-protected serving counters + latency percentiles.

    Latencies are kept in a bounded ring (last ``window`` requests) so the
    percentiles track current behavior, not process history.
    """

    def __init__(self, window: int = 2048):
        self._lock = threading.Lock()
        self._window = window
        self._latencies_ms: List[float] = []
        self.requests = 0
        self.completed = 0
        self.errors = 0
        self.batches = 0
        self.batched_rows = 0
        self._started = time.monotonic()

    def record_request(self):
        with self._lock:
            self.requests += 1

    def record_batch(self, n_real: int):
        with self._lock:
            self.batches += 1
            self.batched_rows += n_real

    def record_done(self, latency_s: float, error: bool = False):
        with self._lock:
            if error:
                self.errors += 1
            else:
                self.completed += 1
            self._latencies_ms.append(latency_s * 1e3)
            if len(self._latencies_ms) > self._window:
                self._latencies_ms = self._latencies_ms[-self._window:]

    def snapshot(self) -> dict:
        with self._lock:
            lat = sorted(self._latencies_ms)
            elapsed = time.monotonic() - self._started

            def pct(p):
                if not lat:
                    return None
                # nearest-rank: ceil(p/100 * n) - 1 (int(p/100*n) reads one
                # rank high whenever the rank lands on an integer — e.g.
                # p50 of [10, 20] would report 20)
                import math

                rank = max(0, math.ceil(p / 100.0 * len(lat)) - 1)
                return round(lat[min(len(lat) - 1, rank)], 2)

            return {
                "requests": self.requests,
                "completed": self.completed,
                "errors": self.errors,
                "batches": self.batches,
                "mean_batch_fill": (round(self.batched_rows
                                          / max(1, self.batches), 2)),
                "latency_ms": {"p50": pct(50), "p95": pct(95),
                               "p99": pct(99)},
                "uptime_s": round(elapsed, 1),
                "throughput_rps": round(self.completed / max(elapsed, 1e-9),
                                        2),
            }

    def prometheus(self) -> str:
        """The same snapshot in Prometheus text exposition format."""
        s = self.snapshot()
        lines = []

        def metric(name, mtype, value, help_text, labels=""):
            lines.append(f"# HELP {name} {help_text}")
            lines.append(f"# TYPE {name} {mtype}")
            lines.append(f"{name}{labels} {value}")

        metric("ict_requests_total", "counter", s["requests"],
               "Caption requests received")
        metric("ict_completed_total", "counter", s["completed"],
               "Caption requests completed successfully")
        metric("ict_errors_total", "counter", s["errors"],
               "Caption requests that failed")
        metric("ict_batches_total", "counter", s["batches"],
               "Device batches launched")
        metric("ict_batch_fill_mean", "gauge", s["mean_batch_fill"],
               "Mean real rows per launched batch")
        metric("ict_uptime_seconds", "gauge", s["uptime_s"],
               "Seconds since service start")
        lat = s["latency_ms"]
        lines.append("# HELP ict_latency_ms Request latency percentiles "
                     "over the stats window")
        lines.append("# TYPE ict_latency_ms summary")
        for q, key in (("0.5", "p50"), ("0.95", "p95"), ("0.99", "p99")):
            if lat[key] is not None:
                lines.append(f'ict_latency_ms{{quantile="{q}"}} {lat[key]}')
        return "\n".join(lines) + "\n"


class _Request:
    __slots__ = ("image", "caption", "error", "event", "t_enqueue")

    def __init__(self, image: np.ndarray):
        self.image = image
        self.caption: Optional[str] = None
        self.error: Optional[str] = None
        self.event = threading.Event()
        self.t_enqueue = time.monotonic()


class CaptionService:
    """Micro-batching caption service around one jitted decode program.

    ``submit(image)`` blocks the calling thread until the batcher has run
    the request's batch; N threads submitting concurrently fill batches and
    share one TPU program launch. The service itself is transport-agnostic —
    the HTTP layer below is one client of it.
    """

    def __init__(self, config, tokenizer=None, checkpoint_path: str = None,
                 reranker=None, batch_size: int = 8,
                 max_wait_ms: float = 10.0, request_timeout_s: float = 60.0,
                 pipeline_depth: int = 2, bucket_sizes=None, mesh=None):
        import jax

        from ..main import (_make_decode_batch, _make_model_only_trainer,
                            _resolve_reranker, setup_tokenizer)

        self.config = config
        self.tokenizer = tokenizer or setup_tokenizer(config)
        self.trainer = _make_model_only_trainer(config, self.tokenizer,
                                                mesh=mesh)
        if checkpoint_path:
            self.trainer.load_checkpoint(checkpoint_path)
        self.reranker = (reranker
                         if reranker is not None
                         else _resolve_reranker(config, self.tokenizer, None))
        # Round the serving batch to a data-axis multiple so sharded
        # device_put works on multi-chip meshes (same policy as eval).
        dp = self.trainer.mesh.shape.get(config.mesh.data_axis, 1)
        self.batch_size = -(-batch_size // dp) * dp
        # Bucketed batch shapes: a quiet-hour single request should not pay
        # a full ``batch_size``-wide decode. Each micro-batch dispatches on
        # the smallest bucket >= queue depth; jit specializes one program
        # per bucket shape (all compiled at warmup, so no first-request
        # stall), and rows are independent in every decode strategy, so
        # captions are token-identical across buckets
        # (tests/test_server.py::test_bucketed_decode_token_identity).
        # Default ladder 1 / 8 / batch_size (dp-rounded): three compiles
        # buys a ~batch_size/1 latency factor at 1 req/s.
        if bucket_sizes is None:
            bucket_sizes = [1, 8, self.batch_size]
        buckets = sorted({min(-(-int(b) // dp) * dp, self.batch_size)
                          for b in bucket_sizes if int(b) >= 1})
        if not buckets or buckets[-1] != self.batch_size:
            buckets.append(self.batch_size)
        self.bucket_sizes = buckets
        self.max_wait_s = max_wait_ms / 1e3
        self.request_timeout_s = request_timeout_s
        self._decode_batch = _make_decode_batch(
            self.trainer, config, rerank=self.reranker is not None)
        self._estate = self.trainer.eval_state()
        self._rng = jax.random.PRNGKey(config.seed)
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        # Dispatch/fetch pipeline: JAX dispatch is async, so the batcher
        # launches batch N+1 on the device while the completer thread is
        # still host-fetching + detokenizing batch N. The bounded queue
        # caps in-flight device batches at ``pipeline_depth``; depth<=1
        # disables the pipeline (batches complete synchronously on the
        # batcher thread — Queue(0) would mean *unbounded*, not zero).
        self._sync = pipeline_depth <= 1
        self._pending: "queue.Queue" = queue.Queue(
            maxsize=max(1, pipeline_depth - 1))
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._completer: Optional[threading.Thread] = None
        self.stats = ServerStats()

    # -- lifecycle ---------------------------------------------------------

    def start(self, warmup: bool = True):
        """Compile the decode program (optional) and start the batcher."""
        if warmup:
            t0 = time.monotonic()
            dummy = np.zeros((self.config.image_size, self.config.image_size,
                              3), dtype=np.uint8)
            for b in self.bucket_sizes:  # one compile per bucket shape
                self._run_images([dummy] * b)
            logger.info("Serving warmup compile: %.1fs (buckets %s)",
                        time.monotonic() - t0, self.bucket_sizes)
        self._stop.clear()
        self._thread = threading.Thread(target=self._batch_loop,
                                        name="caption-batcher", daemon=True)
        self._thread.start()
        if not self._sync:
            self._completer = threading.Thread(target=self._complete_loop,
                                               name="caption-completer",
                                               daemon=True)
            self._completer.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
        if self._completer is not None:
            # the completer drains remaining dispatched batches, then sees
            # _stop on its poll timeout and exits — no sentinel, so nothing
            # here can block on the bounded queue (a completer hung on a
            # wedged host fetch just times this join out; the drain below
            # still fails whatever it left behind)
            self._completer.join(timeout=30)
            self._completer = None
        # fail any stragglers still queued or in flight
        for q in (self._pending, self._queue):
            while True:
                try:
                    item = q.get_nowait()
                except queue.Empty:
                    break
                reqs = item[0] if isinstance(item, tuple) else [item]
                for req in reqs or []:
                    if req is None:
                        continue
                    req.error = "server shutting down"
                    req.event.set()

    # -- request paths -----------------------------------------------------

    def submit(self, image: np.ndarray) -> str:
        """Caption one preprocessed uint8 [size, size, 3] image (blocking)."""
        return self.result(self.submit_async(image))

    def submit_async(self, image: np.ndarray) -> "_Request":
        """Enqueue a caption request and return its handle immediately.

        Open-loop clients enqueue many requests and then collect with
        ``result``; requests enqueued together fill micro-batches without
        needing one caller thread per image.

        The image must already be the serving shape and dtype: one
        malformed row would otherwise fail its whole micro-batch
        (np.stack) or — worse — present the jitted decode with a novel
        shape, a multi-minute XLA recompile stalling every client.
        """
        if self._stop.is_set() or self._thread is None:
            raise RuntimeError("caption service is not running")
        image = np.asarray(image)
        size = self.config.image_size
        if image.shape != (size, size, 3):
            raise ValueError(
                f"expected a preprocessed [{size}, {size}, 3] image, got "
                f"{image.shape} (encoded bytes go through caption_bytes)")
        if image.dtype != np.uint8:
            raise ValueError(
                f"expected uint8 pixels, got {image.dtype} (a float image "
                "would be silently truncated, not normalized)")
        self.stats.record_request()
        req = _Request(np.ascontiguousarray(image))
        self._queue.put(req)
        return req

    def result(self, req: "_Request", timeout: float = None) -> str:
        """Block until a ``submit_async`` request completes; return its
        caption (raises on decode error or timeout)."""
        if not req.event.wait(self.request_timeout_s
                              if timeout is None else timeout):
            self.stats.record_done(time.monotonic() - req.t_enqueue,
                                   error=True)
            raise TimeoutError("caption request timed out")
        self.stats.record_done(time.monotonic() - req.t_enqueue,
                               error=req.error is not None)
        if req.error is not None:
            raise RuntimeError(req.error)
        return req.caption

    def reload_checkpoint(self, name: str) -> dict:
        """Hot-swap serving weights from a checkpoint without downtime.

        The restore happens off the batcher thread; the one-line attribute
        swap of the pre-cast eval state is atomic, so in-flight batches
        finish on the old weights and the next dispatch reads the new ones.
        Shapes are unchanged (same model config), so the jitted decode
        program is reused — no recompile stall. Only the weights are
        restored (``load_weights``): the optimizer moments are ~2/3 of an
        AdamW checkpoint's bytes and serving never reads them — measured
        33.7 s -> 17.7 s swap under load on the tunnel-attached host
        (docs/serving.md §Soak).
        """
        t0 = time.monotonic()
        self.trainer.load_weights(name)
        self._estate = self.trainer.eval_state()
        dt = time.monotonic() - t0
        logger.info("Reloaded checkpoint %r in %.1fs", name, dt)
        return {"reloaded": name, "seconds": round(dt, 2)}

    def caption_bytes(self, data: bytes) -> str:
        """Caption raw encoded image bytes (JPEG/PNG/...).

        Host preprocessing matches the eval/demo transform exactly
        (data/coco.load_image: shorter-side resize + center crop), and the
        decode runs the same jitted program family at the same weights —
        pinned token-identical to the demo CLI by test on the CPU mesh
        (tests/test_server.py::test_submit_matches_demo_decode). Caveat:
        serve decodes at ``batch_size`` while demo decodes batch 1; XLA
        gives no cross-batch-shape bitwise guarantee, so a near-tied beam
        step could in principle diverge on TPU at other sizes.
        """
        from PIL import Image

        from ..data.coco import center_crop_resize

        img = Image.open(io.BytesIO(data)).convert("RGB")
        arr = np.asarray(center_crop_resize(img, self.config.image_size),
                         dtype=np.uint8)
        return self.submit(arr)

    # -- batcher -----------------------------------------------------------

    def _batch_loop(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.05)
            except queue.Empty:
                continue
            reqs = [first]
            deadline = time.monotonic() + self.max_wait_s
            while len(reqs) < self.batch_size:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    reqs.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            self._serve_batch(reqs)

    def _serve_batch(self, reqs: List[_Request]):
        """Dispatch one device batch; completion happens on the completer
        thread (the bounded put is the pipeline-depth backpressure), or
        inline when the pipeline is disabled (depth<=1)."""
        self.stats.record_batch(len(reqs))
        try:
            tokens, arr = self._dispatch([r.image for r in reqs])
        except Exception as e:  # surface the failure to every caller
            logger.exception("serving batch dispatch failed")
            for req in reqs:
                req.error = f"{type(e).__name__}: {e}"
                req.event.set()
            return
        if self._sync:
            self._complete_batch(reqs, tokens, arr)
            return
        # bounded put = pipeline-depth backpressure; poll _stop so a
        # shutdown with a stalled completer can't wedge the batcher here
        while not self._stop.is_set():
            try:
                self._pending.put((reqs, tokens, arr), timeout=0.1)
                return
            except queue.Full:
                continue
        for req in reqs:
            req.error = "server shutting down"
            req.event.set()

    def _complete_loop(self):
        while True:
            try:
                item = self._pending.get(timeout=0.1)
            except queue.Empty:
                if self._stop.is_set():
                    return
                continue
            self._complete_batch(*item)

    def _complete_batch(self, reqs, tokens, arr):
        try:
            if self.reranker is not None:
                tokens = self.reranker(arr, tokens)
            tokens = np.asarray(tokens)  # host fetch forces the batch
            for i, req in enumerate(reqs):
                req.caption = self.tokenizer.decode(
                    tokens[i], skip_special_tokens=True)
        except Exception as e:
            logger.exception("serving batch completion failed")
            for req in reqs:
                req.error = f"{type(e).__name__}: {e}"
        finally:
            for req in reqs:
                req.event.set()

    def _dispatch(self, images: List[np.ndarray]):
        """Pad to the smallest bucket >= the micro-batch and launch the
        jitted decode (async — returns device futures, does not block)."""
        import jax

        from ..data.pipeline import shard_batch

        if len(images) > self.batch_size:  # batcher never exceeds it, but
            raise ValueError(              # _run_images chunks rely on this
                f"micro-batch of {len(images)} exceeds batch_size "
                f"{self.batch_size}")
        bucket = next(b for b in self.bucket_sizes if b >= len(images))
        batch = images + [images[-1]] * (bucket - len(images))
        # same placement policy as the eval pipeline: batch-axis-sharded
        # device_put over the mesh's data axis (each chip receives only its
        # rows; a plain jnp.asarray would commit the whole batch to device 0
        # and pay an on-device reshard per micro-batch)
        mesh = self.trainer.mesh if self.trainer.mesh.size > 1 else None
        arr = shard_batch({"image": np.stack(batch)}, mesh,
                          self.config.mesh.data_axis)["image"]
        self._rng, step_rng = jax.random.split(self._rng)
        with self.trainer._decode_ctx():
            tokens = self._decode_batch(self._estate, arr, step_rng)
        return tokens, arr

    def _run_images(self, images: List[np.ndarray]) -> List[str]:
        """Synchronous decode (warmup / programmatic use). Accepts any
        number of images — chunks into ``batch_size`` micro-batches so a
        programmatic caller is never bound by the compiled bucket ladder."""
        captions: List[str] = []
        for lo in range(0, len(images), self.batch_size):
            chunk = images[lo:lo + self.batch_size]
            tokens, arr = self._dispatch(chunk)
            if self.reranker is not None:
                tokens = self.reranker(arr, tokens)
            tokens = np.asarray(tokens)
            captions.extend(
                self.tokenizer.decode(tokens[i], skip_special_tokens=True)
                for i in range(len(chunk)))
        return captions


# -- HTTP layer --------------------------------------------------------------


def _make_handler(service: CaptionService):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                mc = service.config.model
                self._reply(200, {
                    "ok": True,
                    "encoder": getattr(mc.encoder.encoder_type, "value",
                                       str(mc.encoder.encoder_type)),
                    "decoder": getattr(mc.decoder.decoder_type, "value",
                                       str(mc.decoder.decoder_type)),
                    "batch_size": service.batch_size,
                    "bucket_sizes": service.bucket_sizes,
                })
            elif self.path == "/stats":
                self._reply(200, service.stats.snapshot())
            elif self.path == "/metrics":
                body = service.stats.prometheus().encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path == "/reload":
                try:
                    length = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(length))
                    self._reply(200,
                                service.reload_checkpoint(req["checkpoint"]))
                except Exception as e:
                    self._reply(500, {"error": f"{type(e).__name__}: {e}"})
                return
            if self.path != "/caption":
                self._reply(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                data = self.rfile.read(length)
                ctype = (self.headers.get("Content-Type") or "").lower()
                if ctype.startswith("application/json"):
                    import base64

                    data = base64.b64decode(json.loads(data)["image_b64"])
                t0 = time.monotonic()
                caption = service.caption_bytes(data)
                self._reply(200, {
                    "caption": caption,
                    "latency_ms": round((time.monotonic() - t0) * 1e3, 2),
                })
            except Exception as e:
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # route through logging, not stderr
            logger.debug("%s - %s", self.address_string(), fmt % args)

    return Handler


def make_http_server(service: CaptionService, host: str = "127.0.0.1",
                     port: int = 8000) -> ThreadingHTTPServer:
    """Bind (but don't run) the HTTP front end; ``port=0`` picks a free one."""
    return ThreadingHTTPServer((host, port), _make_handler(service))


def serve(config, checkpoint_path: str = None, tokenizer=None,
          host: str = "127.0.0.1", port: int = 8000, batch_size: int = 8,
          max_wait_ms: float = 10.0, pipeline_depth: int = 2,
          bucket_sizes=None):
    """CLI entry: build the service, warm it up, and serve forever."""
    service = CaptionService(config, tokenizer=tokenizer,
                             checkpoint_path=checkpoint_path,
                             batch_size=batch_size, max_wait_ms=max_wait_ms,
                             pipeline_depth=pipeline_depth,
                             bucket_sizes=bucket_sizes)
    service.start(warmup=True)
    httpd = make_http_server(service, host, port)
    logger.info("Serving captions on http://%s:%d (buckets %s, max wait "
                "%.0f ms) — POST image bytes to /caption", host,
                httpd.server_address[1], service.bucket_sizes, max_wait_ms)

    # Graceful drain: SIGTERM stops accepting connections; service.stop()
    # then completes already-dispatched batches and fails still-queued
    # requests with a shutdown error instead of hanging their clients.
    import signal

    def _drain(signum, frame):
        logger.info("SIGTERM: draining caption service")
        threading.Thread(target=httpd.shutdown, daemon=True).start()

    try:
        signal.signal(signal.SIGTERM, _drain)
    except ValueError:  # not the main thread (programmatic use)
        pass
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        service.stop()
