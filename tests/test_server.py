"""Serving surface tests: micro-batching CaptionService + HTTP front end.

The reference has no serving analogue (its closest is the one-image demo,
reference: src/main.py:270-343); these tests pin the production contract:
served captions are bit-identical to the demo CLI at equal weights, N
concurrent clients share jitted batch launches, and the HTTP layer speaks
plain JSON over stdlib clients.
"""

import io
import json
import os
import threading
import urllib.request

import numpy as np
import pytest

from image_captioning_ml_project_tpu.config import (
    AttentionType,
    DecoderType,
    EncoderType,
    get_default_config,
)
from image_captioning_ml_project_tpu.data.synthetic import make_synthetic_coco
from image_captioning_ml_project_tpu.data.tokenizer import WordVocab
from image_captioning_ml_project_tpu.inference.server import (
    CaptionService,
    ServerStats,
    make_http_server,
)


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """One warm CaptionService + bound HTTP server shared by the module."""
    root = str(tmp_path_factory.mktemp("coco"))
    make_synthetic_coco(root, num_images=8, captions_per_image=2,
                        image_size=32)
    with open(os.path.join(root,
                           "annotations/captions_train2014.json")) as f:
        ann = json.load(f)
    vocab = WordVocab.build([a["caption"] for a in ann["annotations"]],
                            threshold=1)

    cfg = get_default_config()
    cfg.data_root = root
    cfg.image_size = 32
    cfg.seed = 0
    cfg.output_dir = str(tmp_path_factory.mktemp("out"))
    cfg.checkpoint_dir = str(tmp_path_factory.mktemp("ckpt"))
    cfg.model.encoder.encoder_type = EncoderType.VIT
    cfg.model.encoder.feature_dim = 16
    cfg.model.encoder.hidden_size = 16
    cfg.model.encoder.num_layers = 1
    cfg.model.encoder.num_heads = 2
    cfg.model.encoder.patch_size = 8
    cfg.model.encoder.image_size = 32
    cfg.model.decoder.decoder_type = DecoderType.TRANSFORMER
    cfg.model.decoder.hidden_dim = 16
    cfg.model.decoder.num_layers = 1
    cfg.model.decoder.num_heads = 2
    cfg.model.decoder.max_length = 16
    cfg.model.decoder.dropout = 0.0
    cfg.model.attention.attention_type = AttentionType.MULTI_HEAD
    cfg.model.attention.hidden_dim = 16
    cfg.model.projection_dim = 16
    cfg.model.vocab_size = vocab.vocab_size
    cfg.model.pad_token_id = vocab.pad_token_id
    cfg.model.bos_token_id = vocab.bos_token_id
    cfg.model.eos_token_id = vocab.eos_token_id
    cfg.training.use_amp = False
    cfg.inference.max_length = 8
    cfg.inference.beam_size = 2
    cfg.inference.decoding_strategy = "beam"

    service = CaptionService(cfg, tokenizer=vocab, batch_size=8,
                             max_wait_ms=30.0)
    service.start(warmup=True)
    httpd = make_http_server(service, port=0)
    http_thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    http_thread.start()
    port = httpd.server_address[1]
    yield cfg, vocab, service, port
    httpd.shutdown()
    service.stop()


def _rand_images(n, size=32, seed=0):
    rs = np.random.RandomState(seed)
    return [rs.randint(0, 256, (size, size, 3), dtype=np.uint8)
            for _ in range(n)]


def test_submit_matches_demo_decode(served):
    """A served caption is bit-identical to the demo CLI's decode of the
    same pixels at the same weights (the contract in server.py's
    caption_bytes docstring)."""
    import jax

    from image_captioning_ml_project_tpu.main import _make_decode_batch

    cfg, vocab, service, _ = served
    img = _rand_images(1, seed=3)[0]

    got = service.submit(img)

    decode_one = _make_decode_batch(service.trainer, cfg, rerank=False)
    with service.trainer._decode_ctx():
        tokens = decode_one(service.trainer.eval_state(), img[None],
                            jax.random.PRNGKey(cfg.seed))
    want = vocab.decode(np.asarray(tokens)[0], skip_special_tokens=True)
    assert got == want


def test_concurrent_submits_share_batches(served):
    """N concurrent clients fill micro-batches (not N single-row launches)
    and every client gets the same caption as a solo submit."""
    cfg, vocab, service, _ = served
    images = _rand_images(12, seed=7)
    solo = [service.submit(img) for img in images]

    batches_before = service.stats.snapshot()["batches"]
    results = [None] * len(images)

    def worker(i):
        results[i] = service.submit(images[i])

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(images))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert results == solo
    snap = service.stats.snapshot()
    used = snap["batches"] - batches_before
    # 12 requests against batch_size=8 with a 30ms window must coalesce
    # into far fewer launches than 12 (typically 2).
    assert used < len(images)
    assert snap["errors"] == 0


def test_flooded_batches_pipeline_correctly(served):
    """3+ full batches in flight at once: the dispatch/complete pipeline
    (bounded _pending queue) must preserve per-request caption identity and
    complete everything without errors."""
    cfg, vocab, service, _ = served
    images = _rand_images(24, seed=11)
    solo = [service.submit(img) for img in images]

    results = [None] * len(images)

    def worker(i):
        results[i] = service.submit(images[i])

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(images))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert results == solo
    assert service.stats.snapshot()["errors"] == 0


def test_caption_bytes_roundtrip(served):
    """Encoded-bytes path: PNG bytes of an already-square image decode to
    the same caption as submitting the raw array (lossless codec, so the
    center_crop_resize is an identity here)."""
    from PIL import Image

    cfg, vocab, service, _ = served
    img = _rand_images(1, seed=11)[0]
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    assert service.caption_bytes(buf.getvalue()) == service.submit(img)


def test_http_caption_and_stats(served):
    cfg, vocab, service, port = served
    from PIL import Image

    img = _rand_images(1, seed=13)[0]
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    raw = buf.getvalue()

    # raw-bytes POST
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/caption", data=raw,
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=60) as resp:
        body = json.loads(resp.read())
    assert resp.status == 200
    assert body["caption"] == service.submit(img)
    assert body["latency_ms"] >= 0

    # JSON/base64 POST gives the identical caption
    import base64

    payload = json.dumps({"image_b64":
                          base64.b64encode(raw).decode()}).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/caption", data=payload,
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as resp:
        assert json.loads(resp.read())["caption"] == body["caption"]

    # health + stats
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=10) as resp:
        health = json.loads(resp.read())
    assert health["ok"] and health["batch_size"] == service.batch_size
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=10) as resp:
        snap = json.loads(resp.read())
    assert snap["completed"] >= 1 and snap["latency_ms"]["p50"] is not None


def test_http_bad_image_is_500_not_crash(served):
    cfg, vocab, service, port = served
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/caption", data=b"not an image",
        headers={"Content-Type": "application/octet-stream"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 500
    assert "error" in json.loads(ei.value.read())
    # the service survives the bad request
    img = _rand_images(1, seed=17)[0]
    assert isinstance(service.submit(img), str)


def test_http_unknown_path_404(served):
    *_, port = served
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(f"http://127.0.0.1:{port}/nope", timeout=10)
    assert ei.value.code == 404


def test_stats_percentiles_and_window():
    stats = ServerStats(window=4)
    for ms in [10, 20, 30, 40, 50, 60]:
        stats.record_done(ms / 1e3)
    snap = stats.snapshot()
    # window keeps the last 4 latencies: 30..60
    assert snap["latency_ms"]["p50"] >= 30
    assert snap["completed"] == 6
    stats.record_done(0.001, error=True)
    assert stats.snapshot()["errors"] == 1


def test_metrics_prometheus_endpoint(served):
    """GET /metrics speaks Prometheus text exposition format."""
    *_, port = served
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics",
                                timeout=30) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        body = r.read().decode()
    assert "ict_requests_total" in body
    assert "ict_batches_total" in body
    for line in body.splitlines():  # every sample line parses as a number
        if line and not line.startswith("#"):
            float(line.rsplit(" ", 1)[1])


def test_hot_reload_checkpoint(served):
    """POST /reload swaps serving weights without downtime: scrambled live
    weights are restored from the checkpoint and captions return to the
    pre-scramble output."""
    import jax

    cfg, vocab, service, port = served
    img = _rand_images(1, seed=31)[0]
    want = service.submit(img)

    service.trainer.save_checkpoint(0, is_best=True)  # writes "best_model"
    service._estate = service._estate.replace(
        params=jax.tree.map(lambda a: a * 0, service._estate.params))

    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/reload",
        data=json.dumps({"checkpoint": "best_model"}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        resp = json.loads(r.read())
    assert resp["reloaded"] == "best_model"
    assert service.submit(img) == want


def test_sync_mode_matches_pipelined(served):
    """pipeline_depth=1 disables the dispatch/complete pipeline (batches
    finish synchronously on the batcher thread) and yields the same
    captions as the pipelined default."""
    cfg, vocab, service, _ = served
    images = _rand_images(10, seed=23)
    want = [service.submit(img) for img in images]

    sync = CaptionService(cfg, tokenizer=vocab, batch_size=8,
                          max_wait_ms=30.0, pipeline_depth=1)
    assert sync._sync
    sync.start(warmup=False)
    try:
        results = [None] * len(images)

        def worker(i):
            results[i] = sync.submit(images[i])

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(images))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert results == want
        assert sync.stats.snapshot()["errors"] == 0
    finally:
        sync.stop()


def test_submit_validates_shape_dtype_and_liveness(served):
    """Malformed images fail fast at submit (one bad row would otherwise
    poison its whole micro-batch or force a service-wide recompile), and
    submitting to a not-started service raises instead of hanging."""
    cfg, vocab, service, _ = served
    with pytest.raises(ValueError, match="expected a preprocessed"):
        service.submit(np.zeros((16, 16, 3), np.uint8))
    with pytest.raises(ValueError, match="uint8"):
        service.submit(np.zeros((32, 32, 3), np.float32))

    idle = CaptionService(cfg, tokenizer=vocab, batch_size=8)
    with pytest.raises(RuntimeError, match="not running"):
        idle.submit(_rand_images(1)[0])


def test_stop_fails_queued_requests():
    """Stopped service surfaces shutdown to queued callers, not a hang."""
    stats = ServerStats()
    assert stats.snapshot()["latency_ms"]["p50"] is None


@pytest.mark.slow
def test_bucketed_decode_token_identity(served):
    """Bucketed batch shapes (VERDICT r3 task 5): a request served on the
    1- or 2-wide bucket must produce exactly the caption the full 8-wide
    bucket produces — rows are independent in the beam program, so the
    ladder only changes padding, never tokens. Single-device mesh: under
    dp sharding buckets are rounded to data-axis multiples (asserted
    below), so sub-dp buckets only exist per chip."""
    cfg, vocab, service, _ = served
    import copy

    import jax

    from image_captioning_ml_project_tpu.parallel.mesh import create_mesh

    one = create_mesh(cfg.mesh, devices=jax.devices()[:1])
    bucketed = CaptionService(copy.deepcopy(cfg), tokenizer=vocab,
                              batch_size=8, max_wait_ms=1.0,
                              bucket_sizes=[1, 2, 8], mesh=one)
    assert bucketed.bucket_sizes == [1, 2, 8]
    full_svc = CaptionService(copy.deepcopy(cfg), tokenizer=vocab,
                              batch_size=8, max_wait_ms=1.0,
                              bucket_sizes=[8], mesh=one)
    bucketed.start(warmup=True)
    full_svc.start(warmup=False)
    try:
        imgs = _rand_images(8, seed=11)
        full = full_svc._run_images(imgs)          # always batch 8
        # one image -> 1-bucket; two -> 2-bucket; eight -> 8-bucket
        assert bucketed._run_images([imgs[0]]) == [full[0]]
        assert bucketed._run_images(imgs[:2]) == full[:2]
        assert bucketed._run_images(imgs) == full
        # through the live batcher too (single submit = smallest bucket)
        before = bucketed.stats.snapshot()["batches"]
        assert bucketed.submit(imgs[3]) == full[3]
        assert bucketed.stats.snapshot()["batches"] == before + 1
    finally:
        bucketed.stop()
        full_svc.stop()


def test_run_images_chunks_past_batch_size(served):
    """_run_images is documented for programmatic use: more images than
    batch_size must chunk into micro-batches (the bucket ladder tops out
    at batch_size), not raise StopIteration hunting for a bigger bucket."""
    cfg, vocab, service, _ = served
    imgs = _rand_images(8, seed=23) + _rand_images(2, seed=29)
    caps = service._run_images(imgs)
    assert len(caps) == 10
    assert caps[:8] == service._run_images(imgs[:8])
    assert caps[8:] == service._run_images(imgs[8:])


def test_bucket_ladder_dp_rounding(served):
    """Under a dp-sharded mesh every bucket must round up to a data-axis
    multiple (sharded device_put needs divisible batches); the served
    fixture spans the full 8-device mesh, so a [1, 2, 8] request ladder
    collapses to [8]."""
    cfg, vocab, service, _ = served
    import copy

    svc = CaptionService(copy.deepcopy(cfg), tokenizer=vocab, batch_size=8,
                         bucket_sizes=[1, 2, 8])
    dp = svc.trainer.mesh.shape[cfg.mesh.data_axis]
    assert all(b % dp == 0 for b in svc.bucket_sizes)
    assert svc.bucket_sizes[-1] == svc.batch_size
