"""Threaded decode -> device-upload prefetch for extraction batches.

The reference reads and preprocesses each image inline with the GPU call
(``extractor_base.py:190-196``); this host is 1-core and the device link is
slow, so the batched extract paths were serializing [decode all] ->
[upload] -> [compute]. This module overlaps all three: a small thread pool
decodes (cv2 releases the GIL) and `device_put`s each image as soon as it's
ready (upload waits on the link, not the CPU), routed through the
process-wide device image cache (utils/device_cache.py) so repeat visits
skip both the decode and the upload entirely.
"""

from __future__ import annotations

import os
import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Callable, List, Sequence, Tuple

import numpy as np

from .device_cache import file_key, image_cache
from .image import Image, read_image

_POOL = None
_POOL_LOCK = threading.Lock()


def _pool() -> ThreadPoolExecutor:
    global _POOL
    with _POOL_LOCK:
        if _POOL is None:
            _POOL = ThreadPoolExecutor(
                max_workers=int(os.environ.get("DIM_TPU_DECODE_WORKERS", "4")),
                thread_name_prefix="dim-decode",
            )
        return _POOL


def prefetch_device_images(
    images: Sequence[Image],
    grayscale: bool,
    resize_fn: Callable[[np.ndarray], np.ndarray],
    view_tag,
) -> List[Future]:
    """Decode + resize + upload each image on the pool; returns futures
    resolving to ``(device_array uint8, (cur_h, cur_w), (w0, h0))``.
    Cache hits resolve without touching the file's pixels."""

    def task(img: Image):
        key = file_key(img.path, grayscale, view_tag)
        hit = image_cache().get(key)
        if hit is not None:
            dev, (cur_hw, orig_wh) = hit
            return dev, cur_hw, orig_wh
        arr = read_image(img.path, grayscale=grayscale)
        h0, w0 = arr.shape[:2]
        arr = resize_fn(arr)
        cur_hw = arr.shape[:2]
        dev = image_cache().put(key, arr, meta=(cur_hw, (w0, h0)))
        return dev, cur_hw, (w0, h0)

    return [_pool().submit(task, img) for img in images]


def fetch_device_image(
    img: Image, grayscale: bool,
    resize_fn: Callable[[np.ndarray], np.ndarray], view_tag,
) -> Tuple[object, Tuple[int, int], Tuple[int, int]]:
    """Synchronous single-image variant (same cache, same key schema)."""
    return prefetch_device_images([img], grayscale, resize_fn, view_tag)[0].result()
