"""Host->device input prefetching.

The reference overlaps data loading with compute via DataLoader worker
processes (num_workers, R2 configs). TPU-native equivalent: a small
lookahead queue that device_puts (optionally sharded) upcoming batches on a
background thread while the current step runs — H2D rides the DMA engine
concurrently with compute, so decode/transfer time hides behind the step.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax
import numpy as np


def _is_passthrough(v) -> bool:
    return isinstance(v, (str, list, int, float))


def prefetch_to_device(batch_iter: Iterator[dict], size: int = 2,
                       mesh=None) -> Iterator[dict]:
    """Wrap a host batch iterator with device-side lookahead.

    Non-array entries (filenames, pad counts) pass through untouched.
    With ``mesh`` the batch axis is sharded over it (data parallelism).
    Exceptions raised on the producer thread (decode, transforms,
    device_put) re-raise at the consumer — a failed batch must crash the
    epoch, not silently truncate it. If the consumer abandons the
    iterator (step crash, KeyboardInterrupt), the producer shuts down
    instead of blocking forever on a full queue with device buffers
    pinned (same contract as data/dataset._prefetch_iter).
    """
    from ..parallel.mesh import shard_batch

    q: "queue.Queue" = queue.Queue(maxsize=size)
    stop = threading.Event()
    END = object()

    def to_device(batch: dict) -> dict:
        arrays = {k: v for k, v in batch.items() if not _is_passthrough(v)}
        passthrough = {k: v for k, v in batch.items() if _is_passthrough(v)}
        if mesh is not None:
            out = shard_batch(arrays, mesh)
        else:
            out = {k: jax.device_put(np.asarray(v)) for k, v in arrays.items()}
        out.update(passthrough)
        return out

    def put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for batch in batch_iter:
                if stop.is_set():
                    return
                if not put(to_device(batch)):
                    return
        except BaseException as e:  # surface in the consumer
            put(e)
            return
        put(END)

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is END:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
