"""Host→device data pipeline: background prefetch + per-chip batch sharding.

The reference's pipeline is torch DataLoader workers + ``pin_memory`` +
blocking ``.to(device)`` copies (reference: src/data/dataset.py:447-470,
src/train/trainer.py:220-221). The TPU-native equivalent:

* a background-thread prefetcher keeps ``prefetch`` batches in flight so
  host JPEG decode overlaps device compute;
* batches are placed directly as globally-sharded ``jax.Array``s over the
  mesh's data axis (``NamedSharding(mesh, P("data", ...))``) — each chip
  receives only its shard, and the jitted train step consumes them with zero
  further copies.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, Optional

import jax
import numpy as np
from jax.sharding import Mesh

from ..parallel.mesh import batch_sharding


def shard_batch(batch: Dict[str, Any], mesh: Optional[Mesh],
                data_axis: str = "data") -> Dict[str, Any]:
    """Device-put array fields of a batch, sharded on the leading (batch)
    axis over ``data_axis`` (the one batch-sharding rule lives in
    parallel.mesh.batch_sharding). Non-array fields pass through."""
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            if mesh is not None:
                out[k] = jax.device_put(
                    v, batch_sharding(mesh, v.ndim, data_axis))
            else:
                out[k] = jax.device_put(v)
        else:
            out[k] = v
    return out


def prefetch(iterator: Iterator[Dict[str, Any]], mesh: Optional[Mesh] = None,
             size: int = 2, data_axis: str = "data") -> Iterator[Dict[str, Any]]:
    """Wrap a host batch iterator with background-thread prefetch +
    device placement. ``size`` batches are decoded/transferred ahead."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()
    err: list = []
    # Abandonment-safe: if the consumer stops iterating mid-epoch (break out
    # of the batch loop), the generator's finally sets `stop`, the producer
    # unblocks from its bounded put, and the wrapped iterator is close()d so
    # its own finally runs (iterate_batches shuts down its worker pool).
    stop = threading.Event()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in iterator:
                if not _put(shard_batch(batch, mesh, data_axis)):
                    break
        except Exception as e:  # propagate to consumer
            err.append(e)
        finally:
            close = getattr(iterator, "close", None)
            if close is not None:
                try:
                    close()
                except Exception:
                    pass
            _put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
