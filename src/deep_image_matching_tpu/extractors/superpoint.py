"""SuperPoint extractor wrapper (JAX, batched on device).

Parity: reference ``extractors/superpoint.py:64-146`` (nms_radius,
keypoint_threshold, max_keypoints config surface). Unlike the reference's
batch-size-1 per-image loop (``extractor_base.py:162-251``), whole image
batches are padded and extracted in one fused jitted program
(``models/superpoint.py``).
"""

from __future__ import annotations

import logging
from typing import List

import numpy as np

from ..constants import Quality, TileSelection, get_size_by_quality
from ..io.h5 import save_features
from ..models.superpoint import SuperPointRunner, load_default_params
from ..utils.image import Image, read_image, resize_image
from .extractor_base import ExtractorBase, FeaturesDict

logger = logging.getLogger("dim_tpu")


class SuperPointExtractor(ExtractorBase):
    default_conf = {
        "nms_radius": 4,
        "keypoint_threshold": 0.0005,
        "max_keypoints": 2048,
        "remove_borders": 4,
    }
    grayscale = True
    as_float = True
    descriptor_size = 256

    def __init__(self, config: dict):
        super().__init__(config)
        self._runner = SuperPointRunner(
            params=load_default_params(),
            max_keypoints=int(self.conf["max_keypoints"]),
            nms_radius=int(self.conf["nms_radius"]),
            keypoint_threshold=float(self.conf["keypoint_threshold"]),
            remove_borders=int(self.conf.get("remove_borders", 4)),
            batch_size=int(self.config.get("general", {}).get("tpu", {}).get(
                "extract_batch_size", 8
            )),
        )

    def extract_batch(self, images: List[Image], feature_path) -> None:
        if self.tile_selection is not TileSelection.NONE:
            # tiles cut on device from a once-uploaded image when possible;
            # otherwise the per-image template (tiles batched inside
            # _extract_by_tile via the runner)
            if self._try_extract_batch_tiled_device(images, feature_path):
                return
            return super().extract_batch(images, feature_path)
        prepped = None
        if self._device_handoff_allowed():
            # decode-prefetch: a thread pool decodes and uploads each image
            # (uint8, via the device image cache) while earlier uploads ride
            # the link — the 7.1 ms/img serial JPEG decode no longer
            # serializes with the transfer (docs/architecture.md round-4
            # extract budget)
            try:
                from ..utils.prefetch import prefetch_device_images

                futs = prefetch_device_images(
                    images, True, self._quality_resize, self.quality.name
                )
                prepped = [
                    (dev, 1.0, orig_wh)
                    for dev, _, orig_wh in (f.result() for f in futs)
                ]
            except Exception as e:
                logger.warning(
                    f"Decode prefetch unavailable "
                    f"({type(e).__name__}: {e}); decoding inline"
                )
                prepped = None
        if prepped is None:
            prepped = []
            for img in images:
                # uint8 end-to-end on host; the device program normalizes
                # (4x smaller uploads than f32)
                arr = read_image(img.path, grayscale=True)
                h, w = arr.shape
                if self.quality is not Quality.HIGH:
                    nw, nh = get_size_by_quality(self.quality, (w, h))
                    arr = resize_image(arr, (max(nw, 1), max(nh, 1)))
                # scale factors back to full res handled via orig size below
                prepped.append((arr, arr.shape[0] / h, (w, h)))
        if self._try_extract_batch_device(images, prepped, feature_path):
            return
        if any(not isinstance(p[0], np.ndarray) for p in prepped):
            # device handoff fell through after prefetch: re-read on host for
            # the host path (pixels are a re-decode away; rare path)
            prepped = [
                (np.asarray(p[0]), p[1], p[2]) for p in prepped
            ]
        # runner rescales keypoints by 1/scale; our scale is isotropic only
        # when quality resize preserves aspect (it does: both dims scaled by
        # the same quality factor modulo rounding). Use exact per-axis
        # rescale instead for safety:
        results = self._runner.extract_arrays(
            [(arr, 1.0, orig) for arr, _, orig in prepped]
        )
        from ..io.writer import AsyncFeatureWriter

        with AsyncFeatureWriter(feature_path) as writer:
            for img, (arr, _, (w, h)), feats in zip(images, prepped, results):
                ah, aw = arr.shape
                sx, sy = w / aw, h / ah
                kpts = feats["keypoints"] * np.array([sx, sy], np.float32)
                writer.put(
                    img.name,
                    keypoints=kpts,
                    descriptors=feats["descriptors"],
                    scores=feats["scores"],
                    image_size=np.array([w, h], np.int64),
                )
                self._cache_put(
                    img.name,
                    keypoints=kpts,
                    descriptors=feats["descriptors"],
                    scores=feats["scores"],
                    image_size=np.array([w, h], np.int64),
                )

    def _try_extract_batch_device(self, images, prepped, feature_path) -> bool:
        """Device-resident extract->match handoff (TPU fast path).

        Descriptors never leave HBM between extraction and matching: the
        matcher's device store is built straight from these arrays, while a
        background writer thread downloads and gzips features.h5 during the
        match stage (``ExtractorBase.flush()`` joins it). Values are
        f16-roundtripped on device, so a run that reloads the h5 instead is
        bit-identical. Only armed when ImageMatcher set ``feature_cache``
        (orchestrated pipeline), on an accelerator, on a 1-device mesh (the
        mesh path gathers pair batches on host).
        """
        if not self._device_handoff_allowed():
            return False
        try:
            chunks = self._runner.extract_arrays_device(
                [(arr, 1.0, orig) for arr, _, orig in prepped]
            )
            fac = np.array(
                [
                    (w / arr.shape[1], h / arr.shape[0])
                    for arr, _, (w, h) in prepped
                ],
                np.float32,
            )
            self._arm_device_handoff(
                names=[img.name for img in images],
                chunks=chunks, fac=fac,
                image_size=[wh for _, _, wh in prepped],
                feature_path=feature_path,
            )
            return True
        except Exception as e:
            logger.warning(
                f"Device feature handoff unavailable "
                f"({type(e).__name__}: {e}); using the host path"
            )
            self.device_handoff = None
            return False

    def _extract(self, image: np.ndarray) -> FeaturesDict:
        """Single image/tile path (used by the tiling template)."""
        return self._extract_many([image])[0]

    # tiles stay uint8 on host; the device program normalizes (the untiled
    # extract_batch path already does this)
    tile_uint8 = True

    def _extract_tiles_dev(self, tiles):
        """Device-tiling hook: run a (T, th, tw) HBM-resident grayscale tile
        batch through the fused extract program in runner-batch chunks;
        outputs stay on device for the merge + handoff."""
        import jax
        import jax.numpy as jnp

        from ..models.superpoint import extract as sp_extract

        r = self._runner
        if tiles.ndim == 4:  # (T, th, tw, C) -> grayscale mean
            tiles = jnp.mean(tiles.astype(jnp.float32) / 255.0, axis=-1)
        x = tiles[..., None]
        T, th, tw = x.shape[:3]
        # backbone downsamples /8: pad on device, report true extent via vhw
        ph, pw = -(-th // 8) * 8, -(-tw // 8) * 8
        if (ph, pw) != (th, tw):
            x = jnp.pad(x, ((0, 0), (0, ph - th), (0, pw - tw), (0, 0)))
        cdt = "bfloat16" if jax.default_backend() != "cpu" else "float32"
        outs = []
        for s in range(0, T, r.batch_size):
            chunk = x[s : s + r.batch_size]
            vhw = jnp.tile(
                jnp.array([[th, tw]], jnp.int32), (chunk.shape[0], 1)
            )
            outs.append(sp_extract(
                r.params, chunk, vhw, r.max_keypoints, r.nms_radius,
                r.keypoint_threshold, r.remove_borders, compute_dtype=cdt,
            ))
        if len(outs) == 1:
            return outs[0]
        return {
            k: jnp.concatenate([o[k] for o in outs], axis=0) for k in outs[0]
        }

    def _extract_many(self, images) -> list:
        """Tiles-as-batch: the runner buckets same-shape tiles into ONE
        padded batch program instead of one dispatch + upload per tile."""
        prepped = []
        for im in images:
            if im.ndim == 3:
                im = im.mean(axis=-1).astype(im.dtype)
            h, w = im.shape
            prepped.append((im, 1.0, (w, h)))
        feats = self._runner.extract_arrays(prepped)
        return [
            {
                "keypoints": f["keypoints"],
                "descriptors": f["descriptors"],
                "scores": f["scores"],
            }
            for f in feats
        ]
