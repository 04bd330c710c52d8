"""Asynchronous single-writer HDF5 feature queue.

SURVEY.md flags host IO as a throughput hard part: the reference writes
gzip-9 float16 features synchronously per image
(``extractor_base.py:80-86``), serializing device work behind disk IO. This
writer moves h5 writes to one background thread (h5py is single-writer; all
writes stay on that thread) so extraction batches overlap compression+IO.
"""

from __future__ import annotations

import logging
import queue
import threading
from pathlib import Path
from typing import Optional

import h5py
import numpy as np

from .h5 import save_features

logger = logging.getLogger("dim_tpu")


class MatchWriter:
    """Persistent-handle writer for ``raw_matches.h5`` + ``matches.h5``.

    ``save_matches`` opens and closes the file per call; a match stage does
    two such calls per pair, so at hundreds of pairs per second the h5
    open/close cycles dominate the host loop. This writer keeps both files
    open for the duration of a match stage (single-threaded: h5py is
    single-writer). The per-pair dataset semantics are identical to
    ``save_matches`` (group per first image, overwrite-on-rewrite)."""

    def __init__(self, matches_path):
        self.matches_path = Path(matches_path)
        self.raw_path = self.matches_path.parent / "raw_matches.h5"
        self._files = {}

    def _fd(self, path) -> "h5py.File":
        key = str(path)
        fd = self._files.get(key)
        if fd is None:
            fd = h5py.File(key, "a", libver="latest")
            self._files[key] = fd
        return fd

    @staticmethod
    def _write(fd, name0: str, name1: str, matches) -> None:
        matches = np.asarray(matches, dtype=np.int32).reshape(-1, 2)
        grp = fd.require_group(name0)
        if name1 in grp:
            del grp[name1]
        grp.create_dataset(name1, data=matches)

    def save_raw(self, name0: str, name1: str, matches) -> None:
        self._write(self._fd(self.raw_path), name0, name1, matches)

    def save_verified(self, name0: str, name1: str, matches) -> None:
        self._write(self._fd(self.matches_path), name0, name1, matches)

    def close(self) -> None:
        for fd in self._files.values():
            fd.close()
        self._files.clear()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


class _DeviceBatch:
    """Queue item for a whole extraction batch whose big arrays are still on
    device (dedicated type: a plain dict key could collide with a ``put()``
    kwarg of the same name)."""

    __slots__ = ("names", "kpts", "desc_f16", "scores_f16", "image_size",
                 "counts", "tile_idx")

    def __init__(self, names, kpts, desc_f16, scores_f16, image_size, counts,
                 tile_idx=None):
        self.names = names
        self.kpts = kpts
        self.desc_f16 = desc_f16
        self.scores_f16 = scores_f16
        self.image_size = image_size
        self.counts = counts
        self.tile_idx = tile_idx  # host (n, K) f32 or None (tiled only)


class AsyncFeatureWriter:
    def __init__(self, feature_path, maxsize: int = 32):
        self.feature_path = feature_path
        self._q: "queue.Queue" = queue.Queue(maxsize=maxsize)
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            try:
                if isinstance(item, _DeviceBatch):
                    self._write_device_batch(item)
                else:
                    save_features(self.feature_path, **item)
            except BaseException as e:  # surfaced at close()
                self._error = e
                logger.error(f"Async feature write failed: {e}")
            finally:
                self._q.task_done()

    def _write_device_batch(self, b: _DeviceBatch):
        """Materialize a whole extraction batch from DEVICE arrays.

        EVERY input goes through one batched ``device_get`` tuple — if any
        of kpts/image_size/counts is also a device array, per-image indexing
        in the write loop would otherwise issue len(names) blocking
        transfers from the writer thread. The f16 descriptor/score copies
        are exactly what ``save_features(as_half=True)`` would have stored,
        at half the bytes over the host link."""
        import jax

        kpts, desc_h, scores_h, image_size, counts = (
            np.asarray(x)
            for x in jax.device_get(
                (b.kpts, b.desc_f16, b.scores_f16, b.image_size, b.counts)
            )
        )
        for i, name in enumerate(b.names):
            save_features(
                self.feature_path,
                name,
                keypoints=kpts[i],
                descriptors=desc_h[i],
                scores=scores_h[i],
                tile_idx=None if b.tile_idx is None else b.tile_idx[i],
                image_size=image_size[i],
                n_valid=int(counts[i]),
            )

    def put(self, name: str, **arrays) -> None:
        if self._error is not None:
            raise RuntimeError("Async writer failed earlier") from self._error
        self._q.put({"name": name, **arrays})

    def put_device_batch(
        self, names, kpts, desc_f16, scores_f16, image_size, counts,
        tile_idx=None,
    ) -> None:
        """Enqueue one whole extraction batch (device arrays stay on device
        until the writer thread pulls them in a single transfer). Callers
        should enqueue at most a few of these — each pins its device buffers
        in HBM until drained."""
        if self._error is not None:
            raise RuntimeError("Async writer failed earlier") from self._error
        self._q.put(_DeviceBatch(
            names, kpts, desc_f16, scores_f16, image_size, counts, tile_idx
        ))

    def close(self) -> None:
        self._q.put(None)
        self._thread.join()
        if self._error is not None:
            raise RuntimeError("Async feature write failed") from self._error

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
