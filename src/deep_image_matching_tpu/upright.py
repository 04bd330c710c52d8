"""Upright rotation: make all images approximately upright before matching.

Parity: reference ``image_matching.py:69-188,496-765`` — per-image rotation
in {0, 90, 180, 270} degrees found by (a) ``exif`` orientation tags,
(b) ``custom`` rotations.txt, or (c) ``2clusters`` greedy cluster growth
using a small low-res matching probe per candidate rotation; rotated copies
are written for extraction and keypoints are rotated back into original
image coordinates afterwards (``rotate_back_features``).

TPU-native difference: the rotation probe tests *all four rotations of a
pair in one padded batch* (rotation = batch axis) instead of a Python loop
with a per-rotation forward (reference ``find_matches_per_rotation``).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, List

import cv2
import h5py
import numpy as np

logger = logging.getLogger("dim_tpu")

ROTATIONS = (0, 90, 180, 270)


def rotate_image(img: np.ndarray, deg: int) -> np.ndarray:
    if deg == 0:
        return img
    code = {
        90: cv2.ROTATE_90_CLOCKWISE,
        180: cv2.ROTATE_180,
        270: cv2.ROTATE_90_COUNTERCLOCKWISE,
    }[deg % 360]
    return cv2.rotate(img, code)


def rotate_keypoints_back(
    kpts: np.ndarray, deg: int, rotated_wh
) -> np.ndarray:
    """Map keypoints found on an image rotated by ``deg`` (CW) back into the
    original image's coordinates. ``rotated_wh`` = (w, h) of the rotated
    image."""
    w, h = rotated_wh
    x, y = kpts[:, 0], kpts[:, 1]
    if deg % 360 == 0:
        return kpts
    if deg % 360 == 90:  # original -> rotated was 90 CW; invert
        return np.stack([y, (w - 1) - x], axis=1)
    if deg % 360 == 180:
        return np.stack([(w - 1) - x, (h - 1) - y], axis=1)
    if deg % 360 == 270:
        return np.stack([(h - 1) - y, x], axis=1)
    raise ValueError(f"Unsupported rotation {deg}")


def _exif_rotation(img) -> int:
    """EXIF Orientation -> degrees the image must be rotated CW to be
    upright (subset: 1, 3, 6, 8)."""
    ori = img.exif.get("Orientation", 1)
    return {1: 0, 3: 180, 6: 90, 8: 270}.get(int(ori) if ori else 1, 0)


def _custom_rotations(image_dir: Path) -> Dict[str, int]:
    path = Path(image_dir) / "rotations.txt"
    if not path.exists():
        raise FileNotFoundError(
            f"upright_strategy 'custom' needs {path} ('name degrees' lines)"
        )
    out = {}
    for line in path.read_text().splitlines():
        parts = line.split()
        if len(parts) >= 2:
            out[parts[0]] = int(float(parts[1])) % 360
    return out


class _AlikedProbe:
    """Probe extractor backed by the bundled ALIKED weights (same
    ``extract_images`` / ``extract_arrays`` surface as SuperPointRunner) —
    used when no SuperPoint checkpoint exists, so the upright stage still
    runs on real weights."""

    def __init__(self, max_keypoints: int = 512, resize_max: int = 512):
        from .extractors.aliked import load_params

        self.params = load_params("aliked-n16rot")
        self.max_keypoints = max_keypoints
        self.resize_max = resize_max

    def extract_images(self, paths) -> list:
        prepped = []
        for p in paths:
            img = cv2.imread(str(p), cv2.IMREAD_GRAYSCALE)
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

    def extract_arrays(self, prepped) -> list:
        import jax.numpy as jnp

        from .models import aliked as aliked_model

        results = [None] * len(prepped)
        # ONE static padded shape for every probe dispatch: heterogeneous
        # image sizes (and the h/w swap of each rotation candidate) would
        # otherwise compile a separate ALIKED program per shape — measured
        # 540 s of XLA compiles on the 4-image mixed-size temple_baal scene.
        # Probe inputs are <= resize_max on the long side, so a square of
        # ceil(resize_max/32)*32 fits them all; vhw masks the padding.
        pad_to = 32
        side = -(-self.resize_max // pad_to) * pad_to
        for img, _, _ in prepped:  # direct callers may exceed resize_max
            h, w = img.shape[:2]
            side = max(side, -(-h // pad_to) * pad_to, -(-w // pad_to) * pad_to)
        ph = pw = side
        # bound the per-dispatch batch: one program per (shape, chunk) keeps
        # VMEM in budget at scale (a 60-image scene in one bucket otherwise
        # compiles a single batch-60 program and OOMs scoped vmem); on a
        # device OOM the chunk bisects, same containment as the matcher's
        # ``_match_chunk_resilient``. The deform-gather working set scales
        # with resolution, so large probe sizes start at a smaller chunk.
        chunk = 8 if side <= 768 else 4

        def run_chunk(sub, bs):
            batch = np.zeros((bs, ph, pw, 3), np.float32)
            vhw = np.ones((bs, 2), np.int32)
            for j, i in enumerate(sub):
                img = prepped[i][0]
                if img.dtype == np.uint8:
                    img = img.astype(np.float32) / 255.0
                h, w = img.shape[:2]
                batch[j, :h, :w] = img[..., None]
                vhw[j] = (h, w)
            out = aliked_model.extract(
                self.params, jnp.asarray(batch), jnp.asarray(vhw),
                max_keypoints=self.max_keypoints,
                detection_threshold=0.2, nms_radius=3,
            )
            out = {k: np.asarray(v) for k, v in out.items()}
            for j, i in enumerate(sub):
                m = out["mask"][j]
                scale = prepped[i][1]
                results[i] = {
                    "keypoints": out["keypoints"][j][m] / scale,
                    "descriptors": out["descriptors"][j][m],
                    "scores": out["scores"][j][m],
                }

        def run_resilient(sub, bs):
            try:
                run_chunk(sub, bs)
            except Exception as e:
                if len(sub) <= 1:
                    raise
                logger.warning(
                    f"ALIKED probe batch of {len(sub)} at {ph}x{pw} failed "
                    f"({type(e).__name__}); bisecting"
                )
                mid = len(sub) // 2
                run_resilient(sub[:mid], mid)
                run_resilient(sub[mid:], len(sub) - mid)

        idxs = list(range(len(prepped)))
        for s in range(0, len(idxs), chunk):
            sub = idxs[s:s + chunk]
            # pad the tail chunk to the full batch: one compiled program
            # per (side, chunk) total, shared across calls
            run_resilient(sub, chunk)
        return results


def _make_probe(max_size: int = 512):
    """Real-weight probe selection: SuperPoint checkpoint if present, else the
    bundled ALIKED weights, else (only when random weights are explicitly
    allowed) random-init SuperPoint."""
    from .models.superpoint import SuperPointRunner, load_default_params
    from .utils import weights as W

    with W.strict():
        try:
            return SuperPointRunner(
                params=load_default_params(), max_keypoints=512,
                resize_max=max_size,
            )
        except W.MissingWeightsError:
            pass
        try:
            return _AlikedProbe(max_keypoints=512, resize_max=max_size)
        except FileNotFoundError:
            pass
    logger.warning(
        "upright probe: no SuperPoint or ALIKED checkpoints found; "
        "falling back to random-init SuperPoint (policy-gated)."
    )
    return SuperPointRunner(max_keypoints=512, resize_max=max_size)


def _probe_rotations(image_list, max_size: int = 512) -> Dict[str, int]:
    """Greedy 2-cluster growth: start from the first image at 0 deg, then for
    each remaining image test all 4 rotations against an already-oriented
    image and keep the rotation with most verified matches (reference
    ``image_matching.py:535-636``)."""
    from .ops.nn_match import nn_match_batch
    from .utils.geometric_verification import geometric_verification
    from .constants import GeometricVerification
    import jax.numpy as jnp

    sp = _make_probe(max_size)
    names = image_list.img_names
    rotations = {names[0]: 0}
    ref_feats = sp.extract_images([image_list[0].path])[0]

    cap = 512
    def pad(f):
        k = np.zeros((cap, 2), np.float32)
        d = np.zeros((cap, f["descriptors"].shape[-1]), np.float32)
        m = np.zeros((cap,), bool)
        n = len(f["keypoints"])
        k[:n] = f["keypoints"]; d[:n] = f["descriptors"]; m[:n] = True
        return k, d, m

    rk, rd, rm = pad(ref_feats)
    for img in image_list[1:]:
        gray = cv2.imread(str(img.path), cv2.IMREAD_GRAYSCALE)
        scale = max_size / max(gray.shape)
        if scale < 1:
            gray = cv2.resize(gray, None, fx=scale, fy=scale, interpolation=cv2.INTER_AREA)
        arrs = []
        for deg in ROTATIONS:
            rot = rotate_image(gray, deg).astype(np.float32) / 255.0
            arrs.append((rot, 1.0, (rot.shape[1], rot.shape[0])))
        feats4 = sp.extract_arrays(arrs)
        # batch the 4 rotations against the reference features
        k4 = np.zeros((4, cap, 2), np.float32)
        d4 = np.zeros((4, cap, rd.shape[-1]), np.float32)
        m4 = np.zeros((4, cap), bool)
        for i, f in enumerate(feats4):
            k4[i], d4[i], m4[i] = pad(f)
        matches0, valid = nn_match_batch(
            jnp.asarray(np.tile(rd[None], (4, 1, 1))), jnp.asarray(d4),
            jnp.asarray(np.tile(rm[None], (4, 1))), jnp.asarray(m4),
            mode="smnn", ratio_th=0.95,
        )
        matches0 = np.asarray(matches0)
        valid = np.asarray(valid)
        best_deg, best_inl = 0, -1
        for i, deg in enumerate(ROTATIONS):
            rows = np.nonzero(valid[i])[0]
            if len(rows) < 8:
                inl = len(rows)
            else:
                _, mask = geometric_verification(
                    rk[rows], k4[i][matches0[i][rows]],
                    method=GeometricVerification.MAGSAC, threshold=4.0,
                    quiet=True,
                )
                inl = int(mask.sum())
            if inl > best_inl:
                best_deg, best_inl = deg, inl
        rotations[img.name] = best_deg
        logger.debug(f"upright: {img.name} -> {best_deg} deg ({best_inl} inliers)")
    return rotations


def rotate_upright_images(image_list, output_dir, config) -> Dict[str, dict]:
    """Determine rotations, write rotated copies, and repoint the image list.

    Returns {name: {"deg": d, "rotated_wh": (w, h)}} for rotate_back."""
    strategy = "2clusters"
    if hasattr(config, "general"):
        strategy = config.general.get("upright_strategy", "2clusters")
    if strategy == "exif":
        rotations = {im.name: _exif_rotation(im) for im in image_list}
    elif strategy == "custom":
        rotations = _custom_rotations(image_list[0].path.parent)
    else:
        rotations = _probe_rotations(image_list)

    up_dir = Path(output_dir) / "upright_images"
    up_dir.mkdir(parents=True, exist_ok=True)
    info: Dict[str, dict] = {}
    for im in image_list:
        deg = rotations.get(im.name, 0)
        img = cv2.imread(str(im.path), cv2.IMREAD_UNCHANGED)
        rot = rotate_image(img, deg)
        out_path = up_dir / im.name
        cv2.imwrite(str(out_path), rot)
        im._path = out_path  # extraction now reads the upright copy
        info[im.name] = {"deg": deg, "rotated_wh": (rot.shape[1], rot.shape[0])}
    n_rot = sum(1 for v in info.values() if v["deg"] != 0)
    logger.info(f"Upright rotation: {n_rot}/{len(info)} images rotated")
    return info


def rotate_back_features(feature_path, rotated: Dict[str, dict]) -> None:
    """Rewrite keypoints in features.h5 back into original image coordinates
    (reference ``rotate_back_features`` ``image_matching.py:703-765``)."""
    with h5py.File(str(feature_path), "r+", libver="latest") as fd:
        for name, meta in rotated.items():
            if meta["deg"] == 0 or name not in fd:
                continue
            kpts = np.asarray(fd[name]["keypoints"], np.float32)
            back = rotate_keypoints_back(kpts, meta["deg"], meta["rotated_wh"])
            fd[name]["keypoints"][...] = back
            if "image_size" in fd[name] and meta["deg"] % 180 == 90:
                w, h = np.asarray(fd[name]["image_size"])
                del fd[name]["image_size"]
                fd[name].create_dataset(
                    "image_size", data=np.array([h, w], np.int64)
                )
