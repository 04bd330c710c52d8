"""LoFTR detector-free matcher wrapper.

Parity: reference ``matchers/loftr.py:16-289`` (pretrained outdoor/indoor,
detector-free semi-dense matching; keypoints appended to features.h5 during
matching). Images are quality-resized and cropped to a multiple of 8 (the
reference resizes to model resolutions); matching runs as one jitted program
per pair (``models/loftr.py``) with fixed match capacity.

Pretrained weights load from DIM_TPU_WEIGHTS_DIR/outdoor_ds.ckpt (or
loftr_outdoor.ckpt); deterministic random init otherwise.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Tuple

import numpy as np

from ..constants import Quality, get_size_by_quality
from ..utils.image import read_image, resize_image
from .matcher_base import DetectorFreeMatcher

logger = logging.getLogger("dim_tpu")

_PARAMS = None


def load_params(pretrained: str = "outdoor"):
    global _PARAMS
    if _PARAMS is not None:
        return _PARAMS
    from ..models import loftr as loftr_model

    wdir = os.environ.get("DIM_TPU_WEIGHTS_DIR")
    names = [f"{pretrained}_ds.ckpt", f"loftr_{pretrained}.ckpt", f"loftr_{pretrained}.pth"]
    bases = ([Path(wdir)] if wdir else []) + [Path.home() / ".cache/dim_tpu"]
    for base in bases:
        for name in names:
            cand = base / name
            if cand.exists():
                import torch

                ckpt = torch.load(str(cand), map_location="cpu")
                sd = ckpt.get("state_dict", ckpt)
                _PARAMS = loftr_model.params_from_torch(sd)
                logger.info(f"Loaded LoFTR weights from {cand}")
                return _PARAMS
    from ..utils.weights import missing_weights

    missing_weights("LoFTR", names)
    import jax

    _PARAMS = loftr_model.init_params(jax.random.PRNGKey(21))
    return _PARAMS


class LOFTRMatcher(DetectorFreeMatcher):
    default_conf = {
        "pretrained": "outdoor",
        "max_matches": 2048,
        "match_threshold": 0.2,
        "max_tile_size": 1200,
        # "blocked" streams the dual-softmax without materializing the
        # (L, S) confidence matrix (models/loftr.py:coarse_match_blocked)
        "coarse_impl": "dense",
    }

    def __init__(self, config: dict):
        super().__init__(config)
        self.params = load_params(str(self.conf.get("pretrained", "outdoor")))
        self.max_matches = int(self.conf.get("max_matches", 2048))
        self.match_threshold = float(self.conf.get("match_threshold", 0.2))

    def _load(self, path) -> np.ndarray:
        # stays uint8: the device program normalizes, and uint8
        # uploads/cache entries are 4x smaller than f32
        img = read_image(path, grayscale=True)
        h, w = img.shape
        # record the full-resolution shape from this decode so callers
        # don't re-read the file for two integers
        if not hasattr(self, "_full_shapes"):
            self._full_shapes = {}
        self._full_shapes.setdefault(str(path), (h, w))
        if self.quality is not Quality.HIGH:
            nw, nh = get_size_by_quality(self.quality, (w, h))
            img = resize_image(img, (max(nw, 8), max(nh, 8)))
        # cap resolution (reference loftr.py:44 limits tiles to 1200 px)
        cap = int(self.conf.get("max_tile_size", 1200))
        hh, ww = img.shape
        if max(hh, ww) > cap:
            s = cap / max(hh, ww)
            img = resize_image(img, (round(ww * s), round(hh * s)))
        hh, ww = img.shape
        return img[: hh - hh % 8, : ww - ww % 8]  # crop to /8 (avoid pad borders)

    def _device_image(self, path):
        """Per-image device cache: under bruteforce each image appears in
        O(N) pairs; caching the uploaded (uint8) array means one
        host->device copy per image instead of one per pair. FIFO-capped
        (``image_cache_mb``, default 512)."""
        import jax.numpy as jnp

        if not hasattr(self, "_img_cache"):
            self._img_cache: dict = {}
            self._img_cache_bytes = 0
        key = str(path)
        if key not in self._img_cache:
            arr = self._load(path)
            dev = jnp.asarray(arr[..., None])
            cap = int(self.conf.get("image_cache_mb", 512)) * (1 << 20)
            while self._img_cache and self._img_cache_bytes + arr.nbytes > cap:
                old, (olddev, oldbytes) = next(iter(self._img_cache.items()))
                del self._img_cache[old]
                self._img_cache_bytes -= oldbytes
            self._img_cache[key] = (dev, arr.nbytes)
            self._img_cache_bytes += arr.nbytes
        return self._img_cache[key][0]

    def _match_images(self, path0, path1):
        return self._match_images_batch([(path0, path1)])[0]

    def _dispatch_images_batch(self, paths):
        """Issue the (shape-bucketed) device programs for a pair chunk and
        return the still-lazy outputs; ``_finish_images_batch``
        materializes. The split lets ``DetectorFreeMatcher.match_all``
        overlap pair N's download + feature appends + host GV with pair
        N+1's device compute (measured: the synchronous loop spent ~85% of
        the 28-pair loftr bench in exactly that host tail)."""
        import jax.numpy as jnp

        from ..models import loftr as loftr_model

        loaded = {}
        for p0, p1 in paths:
            for p in (p0, p1):
                key = str(p)
                if key not in loaded:
                    # _device_image -> _load records the full-res shape
                    loaded[key] = self._device_image(p)
        fulls = self._full_shapes
        buckets: dict = {}
        for i, (p0, p1) in enumerate(paths):
            buckets.setdefault(
                (loaded[str(p0)].shape, loaded[str(p1)].shape), []
            ).append(i)
        jobs = []
        for idxs in buckets.values():
            # stack on device: the cached per-image arrays never re-cross
            # the host->device link
            img0 = jnp.stack([loaded[str(paths[i][0])] for i in idxs])
            img1 = jnp.stack([loaded[str(paths[i][1])] for i in idxs])
            out = loftr_model.match_pair(
                self.params,
                img0, img1,
                max_matches=self.max_matches,
                threshold=self.match_threshold,
                compute_dtype=str(self.conf.get("compute_dtype", "float32")),
                coarse_impl=str(self.conf.get("coarse_impl", "dense")),
                temperature=float(self.conf.get("dsmax_temperature", 0.1)),
            )
            # start the device->host copies now; they ride the transfer
            # stream while the next chunk computes
            for v in out.values():
                if hasattr(v, "copy_to_host_async"):
                    try:
                        v.copy_to_host_async()
                    except Exception:
                        pass
            meta = [
                (str(paths[i][0]), str(paths[i][1]),
                 loaded[str(paths[i][0])].shape[:2],
                 loaded[str(paths[i][1])].shape[:2])
                for i in idxs
            ]
            jobs.append((idxs, out, meta))
        return (len(paths), fulls, jobs)

    def _finish_images_batch(self, disp):
        """Materialize dispatched chunk outputs -> [(kpts0, kpts1)] in
        full-resolution pixels."""
        n, fulls, jobs = disp
        out_list = [None] * n
        for idxs, out, meta in jobs:
            out = {k: np.asarray(v) for k, v in out.items()}
            for b, i in enumerate(idxs):
                p0, p1, (h0, w0), (h1, w1) = meta[b]
                m = out["mask"][b]
                k0 = out["keypoints0"][b][m]
                k1 = out["keypoints1"][b][m]
                s0 = np.array([fulls[p0][1] / w0, fulls[p0][0] / h0], np.float32)
                s1 = np.array([fulls[p1][1] / w1, fulls[p1][0] / h1], np.float32)
                out_list[i] = (k0 * s0, k1 * s1)
        return out_list

    def _match_images_batch(self, paths):
        """Shape-bucketed pair batches: pairs whose processed images share
        shapes run as ONE jitted program (the per-pair loop of the reference
        becomes a batch axis; same-camera datasets land in one bucket).
        Synchronous form of dispatch+finish (the fallback path)."""
        return self._finish_images_batch(self._dispatch_images_batch(paths))
