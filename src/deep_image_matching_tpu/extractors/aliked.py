"""ALIKED extractor wrapper (JAX, batched on device, pretrained weights).

Parity: reference ``extractors/aliked.py:10-89`` (model_name,
max_num_keypoints, detection_threshold, nms_radius config surface).
Checkpoints are the reference's bundled ALIKED weights (same state_dict
layout as github.com/Shiaoming/ALIKED); converted via
``models/aliked.params_from_torch``.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..constants import Quality, TileSelection, get_size_by_quality
from ..io.h5 import save_features
from ..models import aliked as aliked_model
from ..utils.image import Image, read_image, resize_image
from .extractor_base import ExtractorBase, FeaturesDict

logger = logging.getLogger("dim_tpu")

_WEIGHT_CANDIDATES = [
    "{wdir}/{name}.pth",
    str(Path.home() / ".cache/dim_tpu/{name}.pth"),
    "/root/reference/src/deep_image_matching/thirdparty/ALIKED/models/{name}.pth",
]

_PARAM_CACHE: Dict[str, dict] = {}


def load_params(model_name: str) -> dict:
    if model_name in _PARAM_CACHE:
        return _PARAM_CACHE[model_name]
    wdir = os.environ.get("DIM_TPU_WEIGHTS_DIR", "")
    for tmpl in _WEIGHT_CANDIDATES:
        cand = Path(tmpl.format(wdir=wdir, name=model_name))
        if wdir == "" and "{wdir}" in tmpl:
            continue
        if cand.exists():
            import torch

            sd = torch.load(str(cand), map_location="cpu")
            params = aliked_model.params_from_torch(sd, model_name)
            logger.info(f"Loaded ALIKED weights from {cand}")
            _PARAM_CACHE[model_name] = params
            return params
    raise FileNotFoundError(
        f"No ALIKED checkpoint '{model_name}.pth' found "
        "(set DIM_TPU_WEIGHTS_DIR)"
    )


class ALIKEDExtractor(ExtractorBase):
    default_conf = {
        "model_name": "aliked-n16rot",
        "max_num_keypoints": 4000,
        "detection_threshold": 0.2,
        "nms_radius": 3,
    }
    grayscale = False
    as_float = True
    descriptor_size = 128

    def __init__(self, config: dict):
        super().__init__(config)
        self.model_name = str(self.conf["model_name"])
        self.params = load_params(self.model_name)
        self.max_keypoints = int(self.conf.get("max_num_keypoints", 4000))
        self.detection_threshold = float(self.conf.get("detection_threshold", 0.2))
        self.nms_radius = int(self.conf.get("nms_radius", 3))
        self.batch_size = int(
            self.config.get("general", {}).get("tpu", {}).get("extract_batch_size", 4)
        )
        self.pixel_budget = int(
            self.conf.get("pixel_budget", type(self).pixel_budget)
        )

    def extract_batch(self, images: List[Image], feature_path) -> None:
        if self.tile_selection is not TileSelection.NONE:
            # tiles cut on device from a once-uploaded image when possible;
            # host per-image template otherwise
            if self._try_extract_batch_tiled_device(images, feature_path):
                return
            return super().extract_batch(images, feature_path)
        prepped = None
        if self._device_handoff_allowed():
            # decode-prefetch: thread-pool decode + per-image uint8 upload
            # (device image cache) overlapped with the link; batch assembly
            # then happens on device (ops/assemble.py)
            try:
                from ..utils.prefetch import prefetch_device_images

                futs = prefetch_device_images(
                    images, False, self._quality_resize, self.quality.name
                )
                prepped = [
                    (dev, orig_wh)
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
                arr = read_image(img.path, grayscale=False)
                h, w = arr.shape[:2]
                if self.quality is not Quality.HIGH:
                    nw, nh = get_size_by_quality(self.quality, (w, h))
                    arr = resize_image(arr, (max(nw, 1), max(nh, 1)))
                prepped.append((arr, (w, h)))
        if self._device_handoff_allowed():
            dev_chunks: list = []
            try:
                self._run(prepped, dev_sink=dev_chunks)
                fac = np.array(
                    [(w / a.shape[1], h / a.shape[0]) for a, (w, h) in prepped],
                    np.float32,
                )
                self._arm_device_handoff(
                    names=[img.name for img in images],
                    chunks=dev_chunks, fac=fac,
                    image_size=[wh for _, wh in prepped],
                    feature_path=feature_path,
                )
                return
            except Exception as e:
                logger.warning(
                    f"Device feature handoff unavailable "
                    f"({type(e).__name__}: {e}); using the host path"
                )
                self.device_handoff = None
        results = self._run(prepped)
        for img, (arr, (w, h)), feats in zip(images, prepped, results):
            ah, aw = arr.shape[:2]
            kpts = feats["keypoints"] * np.array([w / aw, h / ah], np.float32)
            save_features(
                feature_path, img.name,
                keypoints=kpts,
                descriptors=feats["descriptors"],
                scores=feats["scores"],
                image_size=np.array([w, h], np.int64),
            )
            self._cache_put(
                img.name, keypoints=kpts,
                descriptors=feats["descriptors"], scores=feats["scores"],
                image_size=np.array([w, h], np.int64),
            )

    # ALIKED's SMH/SDDH head upsamples block features to full input
    # resolution, so HBM scales with batch * pixels: cap the device batch by
    # a pixel budget (4 x 1 MP fits comfortably on v5e at C<=128) and bisect
    # on OOM (reference handles CUDA OOM by falling back to tiling,
    # matcher_base.py:246-256; for extraction a smaller batch suffices).
    # Tunable via extractor conf ``pixel_budget`` (the OOM bisection makes
    # a too-large value safe, just slower on the retry).
    pixel_budget = 4_200_000

    def _run(self, prepped, dev_sink: list | None = None) -> list:
        # a failed earlier _run may have left a pending chunk whose results
        # list is gone; never materialize it into THIS call's results
        self._pending_chunk = None
        pad_to = 32
        buckets: Dict[tuple, list] = {}
        for i, (arr, _) in enumerate(prepped):
            h, w = arr.shape[:2]
            key = (-(-h // pad_to) * pad_to, -(-w // pad_to) * pad_to)
            buckets.setdefault(key, []).append(i)
        results = [None] * len(prepped)
        batch_dtype = (
            np.uint8
            if all(p[0].dtype == np.uint8 for p in prepped)
            else np.float32
        )
        for (ph, pw), idxs in buckets.items():
            bsz = max(1, min(self.batch_size, self.pixel_budget // (ph * pw)))
            start = 0
            while start < len(idxs):
                chunk = idxs[start : start + bsz]
                try:
                    self._run_chunk(
                        chunk, prepped, (ph, pw), batch_dtype, results,
                        dev_sink=dev_sink,
                    )
                    start += len(chunk)
                except Exception as e:
                    if "RESOURCE_EXHAUSTED" not in str(e) and "exit code" not in str(e):
                        raise
                    if bsz == 1:
                        raise
                    bsz = max(1, bsz // 2)
                    logger.warning(
                        f"ALIKED extraction OOM at {ph}x{pw}; retrying with "
                        f"batch {bsz}"
                    )
        # drain the 1-deep host-results pipeline (see _run_chunk)
        pending, self._pending_chunk = self._pending_chunk, None
        if pending is not None:
            self._materialize_chunk(*pending, results)
        return results

    def _run_chunk(self, chunk, prepped, phw, batch_dtype, results,
                   dev_sink: list | None = None) -> None:
        import jax
        import jax.numpy as jnp

        from ..ops.assemble import assemble_batch, is_device_array

        ph, pw = phw
        imgs = [prepped[i][0] for i in chunk]
        vhw = np.asarray(
            [[im.shape[0], im.shape[1]] for im in imgs], np.int32
        )
        if any(is_device_array(im) for im in imgs):
            # decode-prefetched images are already in HBM: pad + stack on
            # device instead of re-crossing the link
            batch = assemble_batch(imgs, (ph, pw), channels=3)
        else:
            batch = np.zeros((len(chunk), ph, pw, 3), batch_dtype)
            for j, arr in enumerate(imgs):
                if batch_dtype == np.float32 and arr.dtype == np.uint8:
                    arr = arr.astype(np.float32) / 255.0
                h, w = arr.shape[:2]
                if arr.ndim == 2:
                    arr = np.repeat(arr[..., None], 3, axis=-1)
                batch[j, :h, :w] = arr
        out = aliked_model.extract(
            self.params, jnp.asarray(batch), jnp.asarray(vhw),
            max_keypoints=self.max_keypoints,
            detection_threshold=self.detection_threshold,
            nms_radius=self.nms_radius,
            model_name=self.model_name,
            compute_dtype=str(self.conf.get(
                "compute_dtype",
                "bfloat16" if jax.default_backend() != "cpu" else "float32",
            )),
        )
        if dev_sink is not None:
            # device-handoff mode: keep outputs on device; force execution
            # with a tiny download so the OOM-bisection retry in _run still
            # sees RESOURCE_EXHAUSTED at this chunk
            np.asarray(out["mask"].sum())
            dev_sink.append((chunk, out))
            return
        # host-results mode, 1-deep pipeline: force THIS chunk's execution
        # with a scalar fetch (so an OOM surfaces here, in the chunk the
        # bisection retry will split), start its bulk device->host copies,
        # then materialize the PREVIOUS chunk — its downloads rode the
        # transfer stream while this chunk computed.
        np.asarray(out["mask"].sum())
        for v in out.values():
            if hasattr(v, "copy_to_host_async"):
                try:
                    v.copy_to_host_async()
                except Exception:
                    pass
        pending = self._pending_chunk
        self._pending_chunk = (chunk, out)
        if pending is not None:
            self._materialize_chunk(*pending, results)

    _pending_chunk = None

    def _materialize_chunk(self, chunk, out, results) -> None:
        out = {k: np.asarray(v) for k, v in out.items()}
        for j, i in enumerate(chunk):
            m = out["mask"][j]
            results[i] = {
                "keypoints": out["keypoints"][j][m],
                "scores": out["scores"][j][m],
                "descriptors": out["descriptors"][j][m],
            }

    def _extract(self, image: np.ndarray) -> FeaturesDict:
        if image.ndim == 2:
            image = np.repeat(image[..., None], 3, axis=-1)
        h, w = image.shape[:2]
        feats = self._run([(image, (w, h))])[0]
        return feats

    # tiles stay uint8 on host; aliked_model.extract normalizes on device
    # (the untiled extract_batch path already does this)
    tile_uint8 = True

    def _extract_many(self, images) -> list:
        """Tiles-as-batch: one padded device program per shape bucket via
        ``_run`` (which also keeps the OOM bisection), instead of one
        dispatch + upload round trip per tile."""
        prepped = [
            (im if im.ndim == 3 else np.repeat(im[..., None], 3, axis=-1),
             None)
            for im in images
        ]
        return self._run(prepped)

    def _extract_tiles_dev(self, tiles):
        """Device-tiling hook: run a (T, th, tw, 3) HBM-resident tile batch
        through the fused extract program in pixel-budget chunks; outputs
        stay on device for the merge + handoff."""
        import jax
        import jax.numpy as jnp

        T, th, tw = tiles.shape[:3]
        # the backbone needs 32-multiple inputs (the host path buckets to
        # 32-multiples too); pad on device, report the true extent via vhw
        ph, pw = -(-th // 32) * 32, -(-tw // 32) * 32
        if (ph, pw) != (th, tw):
            tiles = jnp.pad(
                tiles, ((0, 0), (0, ph - th), (0, pw - tw), (0, 0))
            )
        bsz = max(1, min(self.batch_size, self.pixel_budget // (ph * pw)))
        outs = []
        for s in range(0, T, bsz):
            chunk = tiles[s : s + bsz]
            vhw = jnp.tile(
                jnp.array([[th, tw]], jnp.int32), (chunk.shape[0], 1)
            )
            outs.append(aliked_model.extract(
                self.params, chunk, vhw,
                max_keypoints=self.max_keypoints,
                detection_threshold=self.detection_threshold,
                nms_radius=self.nms_radius,
                model_name=self.model_name,
                compute_dtype=str(self.conf.get(
                    "compute_dtype",
                    "bfloat16" if jax.default_backend() != "cpu"
                    else "float32",
                )),
            ))
        if len(outs) == 1:
            return outs[0]
        return {
            k: jnp.concatenate([o[k] for o in outs], axis=0) for k in outs[0]
        }
