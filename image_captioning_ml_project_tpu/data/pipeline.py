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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_batch(batch: Dict[str, Any], mesh: Optional[Mesh],
                data_axis: str = "data") -> Dict[str, Any]:
    """Device-put array fields of a batch, sharded on the leading (batch)
    axis over ``data_axis``. Non-array fields pass through."""
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            if mesh is not None:
                spec = P(data_axis, *([None] * (v.ndim - 1)))
                out[k] = jax.device_put(v, NamedSharding(mesh, spec))
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

    def producer():
        try:
            for batch in iterator:
                q.put(shard_batch(batch, mesh, data_axis))
        except Exception as e:  # propagate to consumer
            err.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            if err:
                raise err[0]
            return
        yield item
