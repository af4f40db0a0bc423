"""Host -> HBM prefetch pipeline.

Replaces the reference's torch ``DataLoader(num_workers=4,
pin_memory=True)`` (`train.py:190-196`) with the JAX-native equivalent:
a background thread decodes/prepares the next batches while the device
computes the current one, and `jax.device_put` overlaps the host->HBM
copy with compute (SURVEY.md §2.3 consequence (c): "host decode ->
double-buffered device_put prefetch").

Two layers:
- `prefetch(iterator, ...)`: generic bounded-queue device prefetcher for
  any host-batch iterator (training pairs, eval batches).
- `frame_chunks(...)`: SLAM-specific pipeline that walks a TUM sequence
  directory, decodes chunks with the native C++ loader (ctypes,
  `native_io`), converts to gray+depth, and prefetches them to device.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import numpy as np


def prefetch(
    iterator: Iterable,
    buffer_size: int = 2,
    transfer: Optional[Callable] = None,
) -> Iterator:
    """Wrap a host-batch iterator with a background thread + device_put.

    ``transfer`` maps a host batch to device arrays (default:
    `jax.device_put` of the whole pytree); with a mesh use
    `parallel.mesh.shard_batch` partial.
    """
    import jax

    if transfer is None:
        transfer = jax.device_put

    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    _END = object()
    err: list = []

    def producer():
        try:
            for item in iterator:
                q.put(transfer(item))
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        yield item
    t.join()
    if err:
        raise err[0]


def frame_chunks(
    rgb_paths,
    depth_paths,
    chunk: int = 16,
    width: int = 640,
    height: int = 480,
    depth_scale: float = 5000.0,
    num_threads: int = 8,
    to_gray: bool = True,
    buffer_size: int = 2,
):
    """Stream a sequence's frames to device in fixed-size chunks.

    Yields dicts of device arrays {'gray' or 'rgb': (C, H, W[, 3]),
    'depth': (C, H, W)}; the final chunk is padded by repeating the last
    frame (fixed shapes for jit) with 'count' giving the real number.
    """
    import jax

    from . import native_io

    n = len(rgb_paths)

    def host_chunks():
        for start in range(0, n, chunk):
            rp = list(rgb_paths[start : start + chunk])
            dp = list(depth_paths[start : start + chunk])
            count = len(rp)
            while len(rp) < chunk:  # pad tail
                rp.append(rp[-1])
                dp.append(dp[-1])
            rgb, depth = native_io.load_batch(
                rp, dp, width=width, height=height,
                depth_scale=depth_scale, num_threads=num_threads,
            )
            out = {"depth": depth, "count": np.int32(count)}
            if to_gray:
                out["gray"] = (
                    0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
                ).astype(np.float32)
            else:
                out["rgb"] = rgb
            yield out

    def transfer(batch):
        return {
            k: (jax.device_put(v) if isinstance(v, np.ndarray) else v)
            for k, v in batch.items()
        }

    yield from prefetch(host_chunks(), buffer_size=buffer_size, transfer=transfer)
