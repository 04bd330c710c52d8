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
from typing import Optional

from .h5 import save_features

logger = logging.getLogger("dim_tpu")


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
                save_features(self.feature_path, **item)
            except BaseException as e:  # surfaced at close()
                self._error = e
                logger.error(f"Async feature write failed: {e}")
            finally:
                self._q.task_done()

    def put(self, name: str, **arrays) -> None:
        if self._error is not None:
            raise RuntimeError("Async writer failed earlier") from self._error
        self._q.put({"name": name, **arrays})

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
