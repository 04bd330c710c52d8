"""RoMa dense matcher wrapper (JAX).

Parity: reference ``matchers/roma.py:23-457`` — detector-free dense matching
at the model resolution (560), symmetric warp + certainty, threshold-balanced
sampling, keypoints appended into features.h5 per pair.

Weights: ``roma_outdoor.pth`` + ``dinov2_vitl14_pretrain.pth`` in
DIM_TPU_WEIGHTS_DIR (both convert at load); deterministic random init (with a
shallow ViT) otherwise. The reference's second 864-res upsample refinement
pass IS implemented (``models/roma.py`` upsample path) and defaults ON via
``upsample_preds: True`` below, matching the reference's
``upsample_res = 864`` (``matchers/roma.py:37-41``).
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Tuple

import numpy as np

from ..constants import Quality
from ..utils.image import read_image, resize_image
from .matcher_base import DetectorFreeMatcher

logger = logging.getLogger("dim_tpu")

_PARAMS = None


def load_params():
    global _PARAMS
    if _PARAMS is not None:
        return _PARAMS
    import jax

    from ..models import roma as roma_model

    wdir = os.environ.get("DIM_TPU_WEIGHTS_DIR")
    bases = ([Path(wdir)] if wdir else []) + [Path.home() / ".cache/dim_tpu"]
    for base in bases:
        for name in ("roma_outdoor.pth", "roma_indoor.pth"):
            cand = base / name
            if cand.exists():
                import torch

                sd = torch.load(str(cand), map_location="cpu")
                sd = sd.get("state_dict", sd)
                dino = None
                dcand = base / "dinov2_vitl14_pretrain.pth"
                if dcand.exists():
                    dino = torch.load(str(dcand), map_location="cpu")
                else:
                    logger.warning(
                        "roma weights found but dinov2_vitl14_pretrain.pth is "
                        "missing - coarse matching will be random"
                    )
                _PARAMS = roma_model.params_from_torch(sd, dino)
                if dino is None:
                    from ..models import dinov2 as dino_model

                    _PARAMS["dinov2"] = dino_model.init_params(
                        jax.random.PRNGKey(0), depth=2
                    )
                logger.info(f"Loaded RoMa weights from {cand}")
                return _PARAMS
    from ..utils.weights import missing_weights

    missing_weights(
        "RoMa",
        ["roma_outdoor.pth", "roma_indoor.pth", "dinov2_vitl14_pretrain.pth"],
    )
    _PARAMS = roma_model.init_params(jax.random.PRNGKey(29), dinov2_depth=2)
    return _PARAMS


class RomaMatcher(DetectorFreeMatcher):
    default_conf = {
        "pretrained": "outdoor",
        "coarse_res": 560,
        "upsample_res": 864,
        "upsample_preds": True,
        "num_sampled_points": 5000,
        "sample_thresh": 0.05,
    }

    def __init__(self, config: dict):
        super().__init__(config)
        self.params = load_params()
        self.res = int(self.conf.get("coarse_res", 560))
        if self.res % 56 != 0:
            raise ValueError("coarse_res must be a multiple of 56 (14 and 8)")
        self.upsample_res = int(self.conf.get("upsample_res", 864))
        self.upsample_preds = bool(self.conf.get("upsample_preds", True))
        if self.upsample_res % 8 != 0:
            raise ValueError("upsample_res must be a multiple of 8")
        self.num_points = int(self.conf.get("num_sampled_points", 5000))
        self.sample_thresh = float(self.conf.get("sample_thresh", 0.05))
        self._key = 0

    def _match_images(self, path0, path1) -> Tuple[np.ndarray, np.ndarray]:
        return self._match_images_batch([(path0, path1)])[0]

    def _full_shape(self, path):
        if not hasattr(self, "_full_shapes"):
            self._full_shapes = {}
        key = str(path)
        if key not in self._full_shapes:
            self._full_shapes[key] = read_image(path, grayscale=False).shape[:2]
        return self._full_shapes[key]

    def _dev_img(self, path, res: int):
        """Device-cached uint8 image at a fixed square resolution (each
        image appears in O(N) pairs under bruteforce; cache = one upload
        per image per resolution). FIFO-capped via matcher conf
        ``image_cache_mb`` (default 512)."""
        import jax.numpy as jnp

        if not hasattr(self, "_img_cache"):
            self._img_cache = {}
            self._img_cache_bytes = 0
        key = (str(path), res)
        if key not in self._img_cache:
            full = read_image(path, grayscale=False)
            if not hasattr(self, "_full_shapes"):
                self._full_shapes = {}
            self._full_shapes.setdefault(str(path), full.shape[:2])
            arr = resize_image(full, (res, res))
            cap = int(self.conf.get("image_cache_mb", 512)) * (1 << 20)
            while self._img_cache and self._img_cache_bytes + arr.nbytes > cap:
                old, (olddev, oldbytes) = next(iter(self._img_cache.items()))
                del self._img_cache[old]
                self._img_cache_bytes -= oldbytes
            self._img_cache[key] = (jnp.asarray(arr), arr.nbytes)
            self._img_cache_bytes += arr.nbytes
        return self._img_cache[key][0]

    def _dispatch_images_batch(self, paths):
        """All pairs share the fixed coarse/upsample resolutions, so every
        chunk is one bucket: the warps for B pairs compute as one jitted
        program (internally 2B with the symmetric pass). Returns lazy
        device jobs; ``_finish_images_batch`` materializes — the split lets
        ``DetectorFreeMatcher.match_all`` overlap a pair's download/GV/h5
        tail with the next pair's device compute. Match sampling runs ON
        DEVICE (``sample_matches_device``), so a pair downloads (num, 4)
        matches instead of full-resolution warp maps (~24 MB at 864px)."""
        import jax
        import jax.numpy as jnp

        from ..models import roma as roma_model

        # memory guard: 2B images at upsample_res through the VGG pyramid
        B_cap = int(self.tpu.get("roma_batch_size", 4))
        if len(paths) > B_cap:
            jobs = []
            for s in range(0, len(paths), B_cap):
                jobs.extend(self._dispatch_images_batch(paths[s : s + B_cap]))
            return jobs

        # device-cached uint8 images at the fixed coarse/upsample
        # resolutions: one upload per (image, res), not one per pair.
        # _dev_img seeds the full-shape cache from its own decode, so
        # build the batches first and read sizes afterwards (no extra
        # full-resolution decode just for the shapes).
        a = jnp.stack([self._dev_img(p0, self.res) for p0, _ in paths])
        b = jnp.stack([self._dev_img(p1, self.res) for _, p1 in paths])
        sizes = [
            (self._full_shape(p0), self._full_shape(p1)) for p0, p1 in paths
        ]
        # decoder dtype: bf16 measured only ~1.09x on v5e (the decode cost is
        # gather/resize-bound, not conv-bound) while flow drift through the
        # coarse-to-fine feedback loop is non-trivial -> keep f32 unless the
        # user opts in via matcher conf (the DINOv2 encoder stays bf16).
        cdt = str(self.conf.get("decoder_dtype", "float32"))
        # corr_dtype=bfloat16 halves the local-correlation gather payload
        # (the dominant refiner cost; ~84 GB/s gather ceiling on v5e) while
        # keeping flow arithmetic f32. Opt-in: bf16 feature rounding shifts
        # the correlation heatmaps slightly.
        corr_dt = self.conf.get("corr_dtype") or None
        # certainty attenuation: reference roma_outdoor default
        # (roma_models.py:165, applied at matcher.py:758-768,808-810)
        atten = bool(self.conf.get("attenuate_cert", True))
        out = roma_model.match_pair(
            self.params, a, b, decoder_dtype=cdt, corr_dtype=corr_dt,
            attenuate_cert=atten and not self.upsample_preds,
            with_cert16=atten and self.upsample_preds,
        )
        warp_ab, cert_ab, warp_ba, cert_ba = out[:4]
        if self.upsample_preds:
            r = self.upsample_res
            a_hr = jnp.stack([self._dev_img(p0, r) for p0, _ in paths])
            b_hr = jnp.stack([self._dev_img(p1, r) for _, p1 in paths])
            scale_factor = float(np.sqrt(r * r / (self.res * self.res)))
            warp_ab, cert_ab, warp_ba, cert_ba = roma_model.match_pair_upsample(
                self.params, a_hr, b_hr,
                warp_ab, cert_ab, warp_ba, cert_ba,
                scale_factor=scale_factor, compute_dtype=cdt,
                corr_dtype=corr_dt,
                cert16_ab=out[4] if atten else None,
                cert16_ba=out[5] if atten else None,
            )
        jobs = []
        for i, ((HA, WA), (HB, WB)) in enumerate(sizes):
            self._key += 1
            matches, _cert = roma_model.sample_matches_device(
                warp_ab[i], cert_ab[i], warp_ba[i], cert_ba[i],
                jax.random.PRNGKey(self._key),
                num=self.num_points, sample_thresh=self.sample_thresh,
            )
            if hasattr(matches, "copy_to_host_async"):
                try:
                    matches.copy_to_host_async()
                except Exception:
                    pass
            jobs.append((matches, (HA, WA), (HB, WB)))
        return jobs

    def _finish_images_batch(self, jobs):
        from ..models import roma as roma_model

        results = []
        for matches, (HA, WA), (HB, WB) in jobs:
            m = np.asarray(matches)
            kA, kB = roma_model.to_pixel_coordinates(m, HA, WA, HB, WB)
            results.append((kA.astype(np.float32), kB.astype(np.float32)))
        return results

    def _match_images_batch(self, paths):
        """Synchronous form of dispatch+finish (the fallback path)."""
        return self._finish_images_batch(self._dispatch_images_batch(paths))
