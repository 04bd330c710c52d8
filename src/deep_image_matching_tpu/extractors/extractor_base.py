"""Extractor template: load -> resize -> (tiled) extract -> rescale -> h5.

Parity: reference ``extractors/extractor_base.py:102-487`` — the template
method ``extract()`` (image load, grayscale/float conversion, quality resize,
whole-image or per-tile extraction with origin offsetting / border filtering /
dedup, keypoint rescale back to full resolution, h5 write) and the
FeaturesDict schema (``:21-26``).

TPU-native shape: subclasses produce **fixed-capacity padded arrays**
(``keypoints (K,2)``, ``descriptors (K,D)``, ``scores (K,)``, plus a valid
count) so every device program has static shapes; the base trims padding just
before the h5 write. Device-backed extractors additionally override
``extract_batch`` to process several images per compiled call; the base
provides a sequential fallback so host extractors (SIFT/ORB) share the same
pipeline interface.
"""

from __future__ import annotations

import inspect
import logging
from pathlib import Path
from typing import Dict, List, Optional, Union

import numpy as np

from ..constants import Quality, TileSelection, get_size_by_quality, quality_factor
from ..io.h5 import save_features
from ..utils.image import Image, read_image, resize_image
from ..utils.tiling import Tiler

logger = logging.getLogger("dim_tpu")

FeaturesDict = Dict[str, np.ndarray]


class DeviceFeatureHandoff:
    """Extraction results that never left the accelerator.

    Between extract and match the descriptors only need to exist in HBM —
    the host copy is needed solely for the durable features.h5, which an
    async writer thread materializes in the background while matching runs.
    The matcher's padded feature store builds its device store directly from
    ``dev`` (f16-roundtripped values, so h5-reload runs are bit-identical)
    and keeps only the small host mirrors (keypoints, counts, image sizes)
    the verification/gating host code needs.
    """

    def __init__(self, names, counts, kpts, image_size, dev, tile_idx=None):
        self.names = list(names)
        self.index = {n: i for i, n in enumerate(self.names)}
        self.counts = counts          # (n,) int32, host
        self.kpts = kpts              # (n, K, 2) f32, host, full-res coords
        self.image_size = image_size  # (n, 2) int64, host
        self.dev = dev                # device dict: keypoints/descriptors/scores/mask
        self.tile_idx = tile_idx      # (n, K) f32 host, -1 padding (tiled only)

    def covers(self, names) -> bool:
        return all(n in self.index for n in names)


class ExtractorBase:
    default_conf: Dict = {}
    grayscale: bool = True
    as_float: bool = True
    descriptor_size: int = 0
    # Device extractors whose model normalizes uint8 on device set this so
    # the tiled path keeps tiles uint8 end-to-end (4x smaller uploads; the
    # untiled extract_batch overrides already do this)
    tile_uint8: bool = False

    def __init__(self, config: dict):
        self.config = config
        extractor_conf = config.get("extractor", {})
        self.conf = {**self.default_conf, **extractor_conf}
        general = config.get("general", {})
        self.quality: Quality = general.get("quality", Quality.HIGH)
        self.tile_selection: TileSelection = general.get(
            "tile_selection", TileSelection.NONE
        )
        self.tile_size = general.get("tile_size", (2400, 2000))
        self.tile_overlap = general.get("tile_overlap", 10)
        # In-memory extract->match handoff (set to {} by ImageMatcher):
        # features.h5 stays the durable stage artifact, but the matcher in
        # the same process reads from here instead of decompressing the file
        # it just wrote (gzip h5 re-read measured 0.8 s for 16 images on the
        # 1-core host — pure overhead the reference pays too via its
        # per-pair ``get_features`` h5 reads, ``matcher_base.py:221-222``).
        self.feature_cache: Optional[Dict[str, FeaturesDict]] = None
        # device-resident handoff (TPU fast path, set by extract_batch
        # overrides that support it) + its deferred h5 writer: features.h5
        # materializes on a background thread while matching runs; call
        # ``flush()`` before reading the file (ImageMatcher does after
        # match_pairs)
        self.device_handoff: Optional[DeviceFeatureHandoff] = None
        self._pending_writer = None

    def flush(self) -> None:
        """Join the deferred features.h5 writer (no-op when none pending).
        After this returns, features.h5 is complete on disk."""
        w, self._pending_writer = self._pending_writer, None
        if w is not None:
            w.close()

    def _device_handoff_allowed(self, tiled: bool = False) -> bool:
        """Device-resident handoff preconditions: orchestrated by
        ImageMatcher (feature_cache armed), an accelerator backend (or the
        test override), a 1-device mesh (the mesh path gathers pair batches
        on host). Tiling goes through the per-image host template unless the
        caller is the device-tiling path (``tiled=True``)."""
        import os

        if self.feature_cache is None:
            return False
        if self.tile_selection is not TileSelection.NONE and not tiled:
            return False
        import jax

        force = os.environ.get("DIM_TPU_FORCE_DEVICE_HANDOFF") == "1"
        if jax.default_backend() == "cpu" and not force:
            return False
        from ..parallel.mesh import get_default_mesh

        return get_default_mesh().n_devices == 1

    def _arm_device_handoff(
        self, names, chunks, fac, image_size, feature_path
    ) -> None:
        """Assemble a DeviceFeatureHandoff from per-chunk padded DEVICE
        outputs and defer the features.h5 write to a background thread.

        chunks: [(original_indices, out)] where out holds device arrays
        ``keypoints (B,K,2)`` in model-input coords, ``descriptors (B,K,D)``
        (f16 or f32), ``scores (B,K)``, ``mask (B,K)`` with valid rows as a
        prefix. fac: (n,2) f32 per-image (sx,sy) full-res rescale factors.
        image_size: (n,2) int64. Raises on failure — callers fall back to
        their host path.
        """
        import jax
        import jax.numpy as jnp

        from ..io.writer import AsyncFeatureWriter

        order = np.concatenate([np.asarray(c, np.int64) for c, _ in chunks])
        perm = jnp.asarray(np.argsort(order).astype(np.int32))
        keys = ("keypoints", "descriptors", "scores", "mask")
        if all("tile_idx" in out for _, out in chunks):
            keys = keys + ("tile_idx",)
        cat = {
            k: jnp.take(
                jnp.concatenate([out[k] for _, out in chunks], axis=0),
                perm, axis=0,
            )
            for k in keys
        }
        # full-res coords on device (f32 multiply is bitwise identical to
        # the host-path rescale) + the h5 storage-f16 roundtrip so a
        # reloaded run matches this one exactly
        desc_f16 = cat["descriptors"].astype(jnp.float16)
        scores_f16 = cat["scores"].astype(jnp.float16)
        dev = {
            "keypoints": cat["keypoints"] * jnp.asarray(fac)[:, None, :],
            "descriptors": desc_f16.astype(jnp.float32),
            "scores": scores_f16.astype(jnp.float32),
            "mask": cat["mask"],
        }
        # small host mirrors (verification/gating need keypoints + counts;
        # tiled matching needs per-keypoint tile indices)
        tile_h = None
        if "tile_idx" in cat:
            kpts_h, counts, tile_h = jax.device_get(
                (dev["keypoints"], cat["mask"].sum(axis=1), cat["tile_idx"])
            )
            tile_h = np.asarray(tile_h, np.float32)
        else:
            kpts_h, counts = jax.device_get(
                (dev["keypoints"], cat["mask"].sum(axis=1))
            )
        # start the f16 batch's device->host copy NOW (after the blocking
        # kpts fetch above, so it can't queue ahead of it on a serial
        # transfer stream): it rides the transfer stream while the match
        # stage computes, so the deferred writer's device_get (flush) finds
        # the bytes already on host instead of serializing a multi-MB
        # download after the last match chunk (measured 2.6 s of a 3.2 s
        # match stage through the dev tunnel)
        for arr in (desc_f16, scores_f16):
            if hasattr(arr, "copy_to_host_async"):
                try:
                    arr.copy_to_host_async()
                except Exception:
                    pass
        kpts_h = np.asarray(kpts_h)
        counts = np.asarray(counts).astype(np.int32)
        image_size = np.asarray(image_size, np.int64)
        self.device_handoff = DeviceFeatureHandoff(
            names=names, counts=counts, kpts=kpts_h,
            image_size=image_size, dev=dev, tile_idx=tile_h,
        )
        # deferred h5: the writer thread pulls the f16 batch in ONE
        # device_get (half the bytes of the f32 store, one round trip
        # instead of len(names)) and writes gzip f16 while matching runs
        writer = AsyncFeatureWriter(feature_path)
        try:
            writer.put_device_batch(
                names=names, kpts=kpts_h, desc_f16=desc_f16,
                scores_f16=scores_f16, image_size=image_size, counts=counts,
                tile_idx=tile_h,
            )
        except BaseException:
            writer.close()
            raise
        self._pending_writer = writer

    def _cache_put(
        self,
        name: str,
        keypoints: np.ndarray,
        descriptors: Optional[np.ndarray] = None,
        scores: Optional[np.ndarray] = None,
        tile_idx: Optional[np.ndarray] = None,
        image_size: Optional[np.ndarray] = None,
        n_valid: Optional[int] = None,
    ) -> None:
        """Mirror one image's features into ``feature_cache`` with EXACTLY
        the values an h5 round trip would produce (float16 descriptor/score
        storage, ``io/h5.py::save_features``) so cached and re-read runs are
        bitwise identical."""
        if self.feature_cache is None:
            return
        kpts = np.asarray(keypoints)
        n = len(kpts) if n_valid is None else n_valid
        entry: FeaturesDict = {"keypoints": kpts[:n].astype(np.float32)}
        if descriptors is not None:
            d = np.asarray(descriptors)
            d = d[:n] if d.shape[0] == kpts.shape[0] else d[:, :n].T
            entry["descriptors"] = d.astype(np.float16).astype(np.float32)
        if scores is not None:
            entry["scores"] = (
                np.asarray(scores)[:n].astype(np.float16).astype(np.float32)
            )
        if tile_idx is not None:
            entry["tile_idx"] = np.asarray(tile_idx)[:n].astype(np.float32)
        if image_size is not None:
            entry["image_size"] = np.asarray(image_size).astype(np.int64)
        self.feature_cache[name] = entry

    # ------------------------------------------------------------------ API
    def extract(self, img: Union[Image, Path, str]) -> FeaturesDict:
        """Extract features for one image at the configured quality and
        return them in full-resolution coordinates (not yet written to h5)."""
        if not isinstance(img, Image):
            img = Image(img)
        image = self._load(img)
        orig_hw = image.shape[:2]
        image = self._quality_resize(image)

        if self.tile_selection is TileSelection.NONE:
            feats = self._extract(image)
        else:
            feats = self._extract_by_tile(image)
        feats = self._trim(feats)
        feats = self._rescale_features(feats, image.shape[:2], orig_hw)
        feats["image_size"] = np.array([orig_hw[1], orig_hw[0]], dtype=np.int64)
        return feats

    def extract_and_save(self, img: Union[Image, Path, str], feature_path) -> None:
        if not isinstance(img, Image):
            img = Image(img)
        feats = self.extract(img)
        save_features(
            feature_path,
            img.name,
            keypoints=feats["keypoints"],
            descriptors=feats.get("descriptors"),
            scores=feats.get("scores"),
            tile_idx=feats.get("tile_idx"),
            image_size=feats["image_size"],
        )
        self._cache_put(
            img.name,
            keypoints=feats["keypoints"],
            descriptors=feats.get("descriptors"),
            scores=feats.get("scores"),
            tile_idx=feats.get("tile_idx"),
            image_size=feats["image_size"],
        )

    def extract_batch(self, images: List[Image], feature_path) -> None:
        """Extract features for a list of images. Host extractors loop;
        device extractors override with a padded batched program."""
        for img in images:
            self.extract_and_save(img, feature_path)

    # -------------------------------------------------------------- template
    def _extract(self, image: np.ndarray) -> FeaturesDict:
        """Subclass hook: image (H, W) or (H, W, 3) -> FeaturesDict with
        ``keypoints (N,2)``, optional ``descriptors (N,D)``, ``scores (N,)``.
        N may be a padded capacity if ``n_valid`` is also returned."""
        raise NotImplementedError

    def _load(self, img: Image) -> np.ndarray:
        image = read_image(img.path, grayscale=self.grayscale)
        if self.as_float and not (
            self.tile_uint8 and self.tile_selection is not TileSelection.NONE
        ):
            image = image.astype(np.float32) / 255.0
        return image

    def _quality_resize(self, image: np.ndarray) -> np.ndarray:
        if self.quality is Quality.HIGH:
            return image
        h, w = image.shape[:2]
        new_w, new_h = get_size_by_quality(self.quality, (w, h))
        return resize_image(image, (max(new_w, 1), max(new_h, 1)))

    def _extract_many(self, images: List[np.ndarray]) -> List[FeaturesDict]:
        """Hook: a list of same-image tiles (or arbitrary arrays) ->
        trimmed FeaturesDicts. Default loops ``_extract``; device extractors
        override to run tiles as ONE padded batch program (tiles-as-batch,
        SURVEY §7 step 7) — per-tile dispatch + upload round trips measured
        9.5 s of the 10 s tiled bench before batching."""
        return [self._trim(self._extract(im)) for im in images]

    # ------------------------------------------------------- device tiling
    def _extract_tiles_dev(self, tiles) -> Optional[Dict]:
        """Hook: (T, th, tw[, C]) DEVICE tile batch -> padded device dict
        ``keypoints (T,K,2)`` tile-local, ``descriptors (T,K,D)``,
        ``scores (T,K)``, ``mask (T,K)``. Device extractors override; the
        base returns None (no device tiling)."""
        return None

    def _supports_device_tiling(self) -> bool:
        return (
            type(self)._extract_tiles_dev
            is not ExtractorBase._extract_tiles_dev
        )

    def _try_extract_batch_tiled_device(self, images, feature_path) -> bool:
        """Tiled extraction with tiles cut ON DEVICE from a once-uploaded
        (and process-cached) uint8 image, merged on device, feeding the
        device-resident extract->match handoff.

        Replaces the host tiled template for device extractors: the
        reference path uploads every overlapping tile (~17 MB per 2048 px
        RGB image at 1200 px tiles) and downloads f32 features per tile;
        this path uploads the image once (0 bytes on a device-image-cache
        hit), keeps descriptors in HBM end-to-end, and returns only small
        keypoint/count/tile-index mirrors to host. Falls back to the host
        template (returns False) on any failure."""
        max_kpts = self._max_keypoints()
        if (
            not self._supports_device_tiling()
            or not self._device_handoff_allowed(tiled=True)
            or not max_kpts
        ):
            return False
        try:
            import jax.numpy as jnp

            from ..ops.tile_merge import cut_tiles, merge_tile_features
            from ..utils.tiling import Tiler

            tiler = Tiler()
            chunks, fac, sizes, names = [], [], [], []
            # decode-prefetch: image i+1 decodes and uploads while image i's
            # tile batch runs the extract program
            from ..utils.prefetch import prefetch_device_images

            futs = prefetch_device_images(
                images, self.grayscale, self._quality_resize,
                self.quality.name,
            )
            for i, img in enumerate(images):
                dev_img, (ch, cw), (w0, h0) = futs[i].result()
                origins, padding, (th, tw) = tiler.tile_origins(
                    (ch, cw), self.tile_size, self.tile_overlap
                )
                top, _, left, _ = padding
                starts = np.stack(
                    [origins[:, 1] + top, origins[:, 0] + left], axis=1
                ).astype(np.int32)
                tiles = cut_tiles(
                    dev_img, jnp.asarray(starts),
                    tile_hw=(th, tw), pad=tuple(padding),
                )
                out = self._extract_tiles_dev(tiles)
                merged = merge_tile_features(
                    out["keypoints"], out["scores"], out["descriptors"],
                    out["mask"], jnp.asarray(origins, jnp.float32),
                    jnp.asarray([cw, ch], jnp.float32), max_kpts,
                )
                chunks.append(([i], {k: v[None] for k, v in merged.items()}))
                fac.append((w0 / cw, h0 / ch))
                sizes.append((w0, h0))
                names.append(img.name)
            self._arm_device_handoff(
                names=names, chunks=chunks,
                fac=np.asarray(fac, np.float32), image_size=sizes,
                feature_path=feature_path,
            )
            return True
        except Exception as e:
            logger.warning(
                f"Device tiled extraction unavailable "
                f"({type(e).__name__}: {e}); using the host tiled path"
            )
            self.device_handoff = None
            return False

    def _device_image_tiled(self, img: Image):
        """The (quality-resized, uint8) image as a device array, via the
        process-wide device image cache: decoded + uploaded at most once per
        (file, view) — the view key is shared with the untiled prefetch
        path, so a tiled re-run after an untiled probe re-uses the upload.
        Returns (device_array, (cur_h, cur_w), (w0, h0))."""
        from ..utils.prefetch import fetch_device_image

        return fetch_device_image(
            img, self.grayscale, self._quality_resize, self.quality.name
        )

    def _extract_by_tile(self, image: np.ndarray) -> FeaturesDict:
        """Tile the image, extract per tile, offset to image coordinates,
        drop padding-border keypoints, dedup (reference
        ``extractor_base.py:279-390``)."""
        tiler = Tiler()
        tiles, origins, _ = tiler.compute_tiles_array(
            image, self.tile_size, self.tile_overlap
        )
        h, w = image.shape[:2]
        all_kpts, all_desc, all_scores, all_tile = [], [], [], []
        feats_per_tile = self._extract_many(
            [tiles[idx] for idx in range(len(tiles))]
        )
        for idx in range(len(tiles)):
            feats = feats_per_tile[idx]
            kpts = feats["keypoints"] + origins[idx][None, :].astype(np.float32)
            keep = (
                (kpts[:, 0] >= 0) & (kpts[:, 0] < w)
                & (kpts[:, 1] >= 0) & (kpts[:, 1] < h)
            )
            all_kpts.append(kpts[keep])
            if "descriptors" in feats:
                all_desc.append(feats["descriptors"][keep])
            if "scores" in feats:
                all_scores.append(feats["scores"][keep])
            all_tile.append(np.full(int(keep.sum()), idx, dtype=np.float32))
        kpts = np.concatenate(all_kpts, axis=0) if all_kpts else np.zeros((0, 2), np.float32)
        out: FeaturesDict = {"keypoints": kpts, "tile_idx": np.concatenate(all_tile)}
        if all_desc:
            out["descriptors"] = np.concatenate(all_desc, axis=0)
        if all_scores:
            out["scores"] = np.concatenate(all_scores, axis=0)
        # dedup on rounded coordinates (overlap regions produce duplicates)
        _, unique_idx = np.unique(np.round(kpts).astype(np.int64), axis=0, return_index=True)
        unique_idx = np.sort(unique_idx)
        for k in ("keypoints", "descriptors", "scores", "tile_idx"):
            if k in out:
                out[k] = out[k][unique_idx]
        # cap at max keypoints by score if the union exceeds the budget
        max_kpts = self._max_keypoints()
        if max_kpts and len(out["keypoints"]) > max_kpts and "scores" in out:
            top = np.argsort(-out["scores"])[:max_kpts]
            top = np.sort(top)
            for k in ("keypoints", "descriptors", "scores", "tile_idx"):
                if k in out:
                    out[k] = out[k][top]
        return out

    def _max_keypoints(self) -> Optional[int]:
        for key in ("max_keypoints", "max_num_keypoints", "n_features"):
            if key in self.conf:
                return int(self.conf[key])
        return None

    @staticmethod
    def _trim(feats: FeaturesDict) -> FeaturesDict:
        """Trim capacity padding using ``n_valid`` if present."""
        n = feats.pop("n_valid", None)
        if n is None:
            return feats
        n = int(n)
        out = {}
        for k, v in feats.items():
            if k in ("keypoints", "descriptors", "scores", "tile_idx"):
                out[k] = v[:n]
            else:
                out[k] = v
        return out

    def _rescale_features(
        self, feats: FeaturesDict, cur_hw, orig_hw
    ) -> FeaturesDict:
        if cur_hw == tuple(orig_hw):
            return feats
        sx = orig_hw[1] / cur_hw[1]
        sy = orig_hw[0] / cur_hw[0]
        feats = dict(feats)
        feats["keypoints"] = feats["keypoints"] * np.array([sx, sy], np.float32)
        return feats


# ---------------------------------------------------------------------------
# Reflection loader (reference ``extractors/extractor_base.py:29-54``)
# ---------------------------------------------------------------------------

def extractor_loader(root_module, name: str):
    """Find the ExtractorBase subclass defined in ``root_module.<name>``."""
    import importlib

    module = importlib.import_module(f"{root_module.__name__}.{name}")
    classes = [
        c for _, c in inspect.getmembers(module, inspect.isclass)
        if issubclass(c, ExtractorBase) and c is not ExtractorBase
        and c.__module__ == module.__name__
    ]
    if not classes:
        raise ImportError(f"No extractor class found in module '{name}'")
    return classes[0]
