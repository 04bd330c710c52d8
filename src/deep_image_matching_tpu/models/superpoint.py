"""SuperPoint detector/descriptor as a pure-functional JAX model.

Architecture parity with the published SuperPoint (DeTone et al., CVPRW'18)
as vendored by the reference
(``thirdparty/SuperGluePretrainedNetwork/models/superpoint.py:101-200``):
VGG-style shared encoder (8 conv layers, 3 max-pools), 65-channel detection
head with per-cell softmax + depth-to-space, 256-d descriptor head with
bilinear keypoint sampling.

TPU-native design: NHWC layout, batch-first; detection (softmax ->
depth-to-space -> NMS -> masked top-k) and descriptor sampling run fused in
the same jitted program as the conv backbone — no host round-trip between
"dense forward" and "keypoint selection" like the reference's
per-image ``torch.nonzero`` path. Outputs are fixed-capacity (B, K, ...)
arrays with validity masks. Weights load from a torch state_dict via
``params_from_torch`` (OIHW -> HWIO transpose).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.assemble import assemble_batch, is_device_array
from ..ops.detect import sample_descriptors_sp, select_topk, simple_nms

Params = Dict[str, Dict[str, jnp.ndarray]]

_CONV_LAYERS = [
    # name, in, out, kernel
    ("conv1a", 1, 64, 3),
    ("conv1b", 64, 64, 3),
    ("conv2a", 64, 64, 3),
    ("conv2b", 64, 64, 3),
    ("conv3a", 64, 128, 3),
    ("conv3b", 128, 128, 3),
    ("conv4a", 128, 128, 3),
    ("conv4b", 128, 128, 3),
    ("convPa", 128, 256, 3),
    ("convPb", 256, 65, 1),
    ("convDa", 128, 256, 3),
    ("convDb", 256, 256, 1),
]


def init_params(key: jax.Array) -> Params:
    """He-normal random init (for tests / training from scratch)."""
    params: Params = {}
    for name, cin, cout, k in _CONV_LAYERS:
        key, sub = jax.random.split(key)
        fan_in = cin * k * k
        w = jax.random.normal(sub, (k, k, cin, cout), jnp.float32) * jnp.sqrt(
            2.0 / fan_in
        )
        params[name] = {"w": w, "b": jnp.zeros((cout,), jnp.float32)}
    return params


def params_from_torch(state_dict) -> Params:
    """Convert a torch SuperPoint state_dict (convX.weight OIHW, convX.bias)."""
    params: Params = {}
    for name, _, _, _ in _CONV_LAYERS:
        w = np.asarray(state_dict[f"{name}.weight"])
        b = np.asarray(state_dict[f"{name}.bias"])
        params[name] = {
            "w": jnp.asarray(w.transpose(2, 3, 1, 0), jnp.float32),  # OIHW->HWIO
            "b": jnp.asarray(b, jnp.float32),
        }
    return params


def _conv(x: jnp.ndarray, p: Dict[str, jnp.ndarray], relu: bool = True) -> jnp.ndarray:
    pad = (p["w"].shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"]
    return jax.nn.relu(y) if relu else y


def _pool2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def dense_forward(
    params: Params, images: jnp.ndarray, compute_dtype: str = "float32"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """images: (B, H, W, 1) in [0,1], H and W multiples of 8.

    Returns (scores (B, H, W), desc_map (B, H/8, W/8, 256) not yet
    normalized). ``compute_dtype='bfloat16'`` runs the conv stack in bf16;
    the detection softmax and descriptor normalization stay f32."""
    cdt = jnp.dtype(compute_dtype)
    if images.dtype == jnp.uint8:
        # uint8 device upload (4x less host->device traffic than f32);
        # normalize on device in f32 so results match the old host-side
        # f32/255 bitwise, then fall through to the compute-dtype cast
        images = images.astype(jnp.float32) / 255.0
    if cdt != jnp.float32:
        params = jax.tree.map(
            lambda v: v.astype(cdt) if v.dtype == jnp.float32 else v, params
        )
        images = images.astype(cdt)
    x = images
    x = _conv(x, params["conv1a"])
    x = _conv(x, params["conv1b"])
    x = _pool2(x)
    x = _conv(x, params["conv2a"])
    x = _conv(x, params["conv2b"])
    x = _pool2(x)
    x = _conv(x, params["conv3a"])
    x = _conv(x, params["conv3b"])
    x = _pool2(x)
    x = _conv(x, params["conv4a"])
    x = _conv(x, params["conv4b"])

    # detection head: 65-ch per-cell softmax, drop dustbin, depth-to-space
    cpa = _conv(x, params["convPa"])
    heat = _conv(cpa, params["convPb"], relu=False).astype(jnp.float32)
    heat = jax.nn.softmax(heat, axis=-1)[..., :-1]  # (B, Hc, Wc, 64)
    B, Hc, Wc, _ = heat.shape
    heat = heat.reshape(B, Hc, Wc, 8, 8)
    scores = heat.transpose(0, 1, 3, 2, 4).reshape(B, Hc * 8, Wc * 8)

    # descriptor head
    cda = _conv(x, params["convDa"])
    desc = _conv(cda, params["convDb"], relu=False)  # (B, Hc, Wc, 256)
    return scores, desc.astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("max_keypoints", "nms_radius", "remove_borders",
                     "compute_dtype"),
)
def extract(
    params: Params,
    images: jnp.ndarray,                  # (B, H, W, 1)
    valid_hw: jnp.ndarray,                # (B, 2) unpadded (h, w) per image
    max_keypoints: int = 2048,
    nms_radius: int = 4,
    keypoint_threshold: float = 0.0005,
    remove_borders: int = 4,
    compute_dtype: str = "float32",
) -> Dict[str, jnp.ndarray]:
    """Fused batched extraction: backbone + NMS + top-k + descriptor sampling
    in one XLA program.

    Returns dict with ``keypoints (B,K,2)`` (x,y), ``scores (B,K)``,
    ``descriptors (B,K,256)`` L2-normalized, ``mask (B,K)``.
    """
    scores, desc_map = dense_forward(params, images, compute_dtype)
    # the dense map is L2-normalized before sampling (and the sampled vectors
    # re-normalized after interpolation), matching the reference pipeline
    desc_map = desc_map / jnp.maximum(
        jnp.linalg.norm(desc_map, axis=-1, keepdims=True), 1e-12
    )
    scores = simple_nms(scores, nms_radius)
    kpts, kscores, valid = select_topk(
        scores,
        max_keypoints,
        threshold=keypoint_threshold,
        border=remove_borders,
        valid_hw=(valid_hw[:, 0], valid_hw[:, 1]),
    )
    descs = jax.vmap(sample_descriptors_sp, in_axes=(0, 0))(kpts, desc_map)
    descs = descs * valid[..., None]
    return {
        "keypoints": kpts,
        "scores": kscores,
        "descriptors": descs,
        "mask": valid,
    }


class SuperPointRunner:
    """Host-side convenience: batched padded extraction over image files.

    Buckets images by padded shape, runs ``extract`` per bucket, returns
    per-image trimmed features. Used by the low-res pair probe and the
    SuperPoint extractor wrapper.
    """

    def __init__(
        self,
        params: Params | None = None,
        max_keypoints: int = 2048,
        nms_radius: int = 4,
        keypoint_threshold: float = 0.0005,
        remove_borders: int = 4,
        resize_max: int | None = None,
        batch_size: int = 8,
    ):
        if params is None:
            params = load_default_params()
        self.params = params
        self.max_keypoints = max_keypoints
        self.nms_radius = nms_radius
        self.keypoint_threshold = keypoint_threshold
        self.remove_borders = remove_borders
        self.resize_max = resize_max
        self.batch_size = batch_size

    def extract_images(self, paths) -> list:
        import cv2

        from ..utils.image import read_image

        prepped = []
        for p in paths:
            # stay uint8 on host: the device program normalizes, and uint8
            # uploads are 4x smaller than f32
            img = read_image(p, grayscale=True)
            h, w = img.shape
            scale = 1.0
            if self.resize_max and max(h, w) > self.resize_max:
                scale = self.resize_max / max(h, w)
                img = cv2.resize(
                    img, (round(w * scale), round(h * scale)),
                    interpolation=cv2.INTER_AREA,
                )
            prepped.append((img, scale, (w, h)))
        return self.extract_arrays(prepped)

    def _iter_dispatch(self, prepped):
        """Yield (chunk_indices, device_out) per dispatched batch; outputs
        stay on device (descriptors pre-cast to f16 — the h5 storage dtype —
        so any download moves half the bytes)."""
        pad_to = 64  # shape-bucket granularity (multiple of 8)
        buckets: Dict[Tuple[int, int], list] = {}
        for i, (img, _, _) in enumerate(prepped):
            h, w = img.shape
            key = (-(-h // pad_to) * pad_to, -(-w // pad_to) * pad_to)
            buckets.setdefault(key, []).append(i)
        batch_dtype = (
            np.uint8
            if all(p[0].dtype == np.uint8 for p in prepped)
            else np.float32
        )
        def _dispatch(chunk):
            imgs = [prepped[i][0] for i in chunk]
            vhw = np.asarray(
                [[im.shape[0], im.shape[1]] for im in imgs], np.int32
            )
            if any(is_device_array(im) for im in imgs):
                # decode-prefetched images are already in HBM (uploaded one
                # uint8 transfer per image, overlapped with decode): pad +
                # stack on device, never re-crossing the link
                batch = assemble_batch(imgs, (ph, pw), channels=1)
            else:
                batch = np.zeros((len(chunk), ph, pw, 1), batch_dtype)
                for j, im in enumerate(imgs):
                    if batch_dtype == np.float32 and im.dtype == np.uint8:
                        im = im.astype(np.float32) / 255.0
                    h, w = im.shape
                    batch[j, :h, :w, 0] = im
            out = dict(extract(
                self.params, jnp.asarray(batch), jnp.asarray(vhw),
                self.max_keypoints, self.nms_radius,
                self.keypoint_threshold, self.remove_borders,
                compute_dtype=(
                    "bfloat16" if jax.default_backend() != "cpu"
                    else "float32"
                ),
            ))
            # descriptors are stored float16 in features.h5 anyway — cast on
            # device so the download moves half the bytes
            out["descriptors"] = out["descriptors"].astype(jnp.float16)
            return out

        for (ph, pw), idxs in buckets.items():
            for start in range(0, len(idxs), self.batch_size):
                chunk = idxs[start : start + self.batch_size]
                yield chunk, _dispatch(chunk)

    def extract_arrays_device(self, prepped) -> list:
        """Device-resident variant: returns [(chunk_indices, out)], where
        ``out`` holds padded DEVICE arrays — keypoints (B,K,2) in
        resized-image coords, scores (B,K), descriptors (B,K,D) f16,
        mask (B,K) (prefix-valid: top-k sorts real scores above the -1
        sentinels, ``ops/detect.py::select_topk``). Nothing is downloaded;
        the caller owns materialization."""
        return list(self._iter_dispatch(prepped))

    def extract_arrays(self, prepped) -> list:
        """prepped: list of (image (h,w) uint8 or float in [0,1], scale,
        orig (w,h))."""
        results = [None] * len(prepped)

        def _finish(chunk, out):
            out = jax.device_get(out)  # one materialization per chunk
            for j, i in enumerate(chunk):
                m = out["mask"][j]
                scale = prepped[i][1]
                results[i] = {
                    "keypoints": out["keypoints"][j][m] / scale,
                    "scores": out["scores"][j][m],
                    "descriptors": out["descriptors"][j][m],
                    "image_size": np.asarray(prepped[i][2], np.int64),
                }

        # software pipelining (window of 4 in-flight chunks): batch N's
        # download overlaps batch N+1..N+3's upload + compute instead of
        # serializing dispatch -> blocking download per chunk
        window: list = []
        for chunk, out in self._iter_dispatch(prepped):
            for v in out.values():
                if hasattr(v, "copy_to_host_async"):
                    try:
                        v.copy_to_host_async()
                    except Exception:
                        pass
            window.append((chunk, out))
            if len(window) >= 4:
                _finish(*window.pop(0))
        for job in window:
            _finish(*job)
        return results


_DEFAULT_PARAMS = None
_DEFAULT_PARAMS_RANDOM = False


def load_default_params() -> Params:
    """Load pretrained SuperPoint weights if available, else deterministic
    random init (documented: pretrained weights require a torch checkpoint;
    set DIM_TPU_WEIGHTS_DIR to a directory containing superpoint_v1.pth).

    Cached RANDOM params re-consult the weights policy on every call: a
    strict() probe (e.g. the upright stage deciding between a real-weight
    SuperPoint and the bundled-ALIKED fallback) must NOT silently receive
    random params another caller cached under allow-random — that leak made
    the upright probe run random-init in test suites and degraded rotated
    scenes."""
    global _DEFAULT_PARAMS, _DEFAULT_PARAMS_RANDOM
    if _DEFAULT_PARAMS is not None:
        if _DEFAULT_PARAMS_RANDOM:
            from ..utils.weights import reject_cached_random

            reject_cached_random("SuperPoint", ["superpoint_v1.pth"])
        return _DEFAULT_PARAMS
    import logging
    import os
    from pathlib import Path

    logger = logging.getLogger("dim_tpu")
    wdir = os.environ.get("DIM_TPU_WEIGHTS_DIR")
    candidates = []
    if wdir:
        candidates.append(Path(wdir) / "superpoint_v1.pth")
    candidates.append(Path.home() / ".cache/dim_tpu/superpoint_v1.pth")
    for cand in candidates:
        if cand.exists():
            import torch

            sd = torch.load(str(cand), map_location="cpu")
            _DEFAULT_PARAMS = params_from_torch(sd)
            logger.info(f"Loaded SuperPoint weights from {cand}")
            return _DEFAULT_PARAMS
    from ..utils.weights import missing_weights

    missing_weights("SuperPoint", ["superpoint_v1.pth"])
    _DEFAULT_PARAMS = init_params(jax.random.PRNGKey(0))
    _DEFAULT_PARAMS_RANDOM = True
    return _DEFAULT_PARAMS
