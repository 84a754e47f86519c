"""Host->device input pipeline: threaded prefetch + double buffering.

TPU-native equivalent of the reference's 4-worker torch DataLoader with
pin_memory (data.py:135-157): batches are assembled on a background thread
while the device computes, and `jax.device_put` runs one batch ahead so the
transfer overlaps with the current step (the standard JAX double-buffer
recipe).  With sharding provided, the put is the distributed host-to-mesh
transfer.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax


class PrefetchLoader:
    """Wrap a host batch iterator with background prefetch to device."""

    def __init__(
        self,
        batch_iter: Iterator,
        prefetch: int = 2,
        sharding: Optional[jax.sharding.Sharding] = None,
    ):
        self._iter = batch_iter
        self._sharding = sharding
        self._q: queue.Queue = queue.Queue(maxsize=max(1, prefetch))
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for item in self._iter:
                if self._stop.is_set():
                    return
                batch, info = item if isinstance(item, tuple) else (item, None)
                if self._sharding is not None:
                    # multi-host safe: host data -> global mesh arrays
                    from diffab_pytorch_tpu.parallel.mesh import put_global

                    batch = put_global(batch, self._sharding)
                else:
                    batch = jax.device_put(batch)
                self._q.put((batch, info))
        except Exception as e:  # surface worker errors to the consumer
            self._q.put(e)
        finally:
            self._q.put(StopIteration)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is StopIteration:
            raise StopIteration
        if isinstance(item, Exception):
            raise item
        return item

    def close(self):
        self._stop.set()
        # drain so the worker can exit
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
