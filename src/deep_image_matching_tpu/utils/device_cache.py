"""Process-wide device-resident image cache (LRU, byte-bounded).

The same source image crosses the host->device link many times in a full
pipeline run: the low-res pair probe, the upright probe, extraction, tile
preselection, and detector-free matching all read the same files (reference
re-reads per stage too: ``extractor_base.py:190-196``,
``matchers/loftr.py:100-110``). On hosts where that link is slow — the dev
tunnel here moves ~12-20 MB/s; even PCIe pays latency per transfer — keeping
decoded uint8 images resident in HBM and keyed by (path, mtime, size, view)
turns every repeat use into a device-side slice instead of a re-upload.

Entries are uint8 (4x smaller than f32); consumers normalize on device. The
budget defaults to 1 GiB (a 2048 px RGB image is ~12.6 MB, so the default
holds ~80 such images) and is configurable via ``DIM_TPU_IMAGE_CACHE_MB``
(0 disables caching).
"""

from __future__ import annotations

import os
import threading
from collections import OrderedDict
from typing import Hashable, Optional, Tuple

import numpy as np


class DeviceImageCache:
    def __init__(self, max_bytes: Optional[int] = None):
        if max_bytes is None:
            max_bytes = int(
                os.environ.get("DIM_TPU_IMAGE_CACHE_MB", "1024")
            ) * (1 << 20)
        self.max_bytes = max_bytes
        self._entries: "OrderedDict[Hashable, Tuple[object, object, int]]" = (
            OrderedDict()
        )
        self._total = 0
        # decode-prefetch threads get/put concurrently; a coarse lock keeps
        # the LRU bookkeeping consistent (a racing double-upload of the same
        # key would only waste one transfer, but the byte accounting must
        # not drift)
        self._lock = threading.Lock()

    def get(self, key: Hashable) -> Optional[Tuple[object, object]]:
        """Returns (device_array, meta) and refreshes LRU order, or None."""
        with self._lock:
            e = self._entries.pop(key, None)
            if e is None:
                return None
            self._entries[key] = e
            return e[0], e[1]

    def put(self, key: Hashable, host_array: np.ndarray, meta=None):
        """Upload ``host_array`` once and cache it. Returns the device array.
        A zero/negative budget disables caching (upload still happens so the
        caller's code path is uniform)."""
        import jax

        arr = jax.device_put(np.ascontiguousarray(host_array))
        nbytes = int(host_array.nbytes)
        if self.max_bytes <= 0 or nbytes > self.max_bytes:
            return arr
        with self._lock:
            old = self._entries.pop(key, None)
            if old is not None:
                self._total -= old[2]
            while self._total + nbytes > self.max_bytes and self._entries:
                _, (_, _, sz) = self._entries.popitem(last=False)
                self._total -= sz
            self._entries[key] = (arr, meta, nbytes)
            self._total += nbytes
        return arr

    def clear(self) -> None:
        with self._lock:
            self._entries.clear()
            self._total = 0

    @property
    def nbytes(self) -> int:
        return self._total

    def __len__(self) -> int:
        return len(self._entries)


_CACHE: Optional[DeviceImageCache] = None


def image_cache() -> DeviceImageCache:
    global _CACHE
    if _CACHE is None:
        _CACHE = DeviceImageCache()
    return _CACHE


def file_key(path, *view) -> Hashable:
    """Cache key for an image file: identity (path, mtime, size) plus a
    caller-supplied view tag (grayscale/quality/...). A re-written file gets
    a fresh entry; the stale one ages out of the LRU."""
    st = os.stat(path)
    return (str(path), st.st_mtime_ns, st.st_size) + tuple(view)
