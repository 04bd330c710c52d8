"""Low-resolution matching probe used for pair selection.

Parity: reference ``low_resolution.py:96-213`` and
``pairs_generator.py:41-235`` (``pairs_from_lowres``): run SuperPoint at a
max-1000px resolution on every image, LightGlue every brute-force pair, and
keep pairs with more than ``min_matches`` raw matches.

TPU-native shape: all images are resized into ONE padded batch and extracted
in a single jitted program; all O(N^2) candidate pairs are matched in padded
pair batches — no per-pair Python loop (the reference's second hot loop).
"""

from __future__ import annotations

import itertools
import logging
from typing import List, Tuple

import numpy as np

from .utils.image import ImageList

logger = logging.getLogger("dim_tpu")


def lowres_pair_probe(
    image_list: ImageList,
    resize_max: int = 1000,
    min_matches: int = 20,
    max_keypoints: int = 1024,
    config=None,
) -> List[Tuple[str, str]]:
    from .models.superpoint import SuperPointRunner
    from .models.lightglue import LightGlueRunner

    names = image_list.img_names
    brute = list(itertools.combinations(range(len(names)), 2))

    sp = SuperPointRunner(max_keypoints=max_keypoints, resize_max=resize_max)
    feats = sp.extract_images([im.path for im in image_list])

    lg = LightGlueRunner(features="superpoint")
    counts = lg.count_matches_pairs(feats, brute)

    pairs = [
        (names[i], names[j])
        for (i, j), c in zip(brute, counts)
        if c > min_matches
    ]
    logger.info(
        f"Low-res probe kept {len(pairs)}/{len(brute)} pairs (>{min_matches} matches)"
    )
    if not pairs:
        logger.warning("Low-res probe found no pairs; falling back to bruteforce")
        pairs = [(names[i], names[j]) for i, j in brute]
    return pairs


def match_low_resolution(
    image_list: ImageList,
    output_dir,
    resize_max: int = 1000,
    min_matches: int = 20,
    max_keypoints: int = 1024,
):
    """Standalone quick-look pipeline (reference ``low_resolution.py:96-213``):
    low-res SuperPoint+LightGlue over all brute-force pairs, written to
    ``features_lowres.h5`` / ``matches_lowres.h5`` for fast inspection.
    Returns (feature_path, match_path, kept_pairs)."""
    from pathlib import Path

    from .io.h5 import save_features, save_matches
    from .models.lightglue import LightGlueRunner
    from .models.superpoint import SuperPointRunner

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    feature_path = output_dir / "features_lowres.h5"
    match_path = output_dir / "matches_lowres.h5"
    for p in (feature_path, match_path):
        if p.exists():
            p.unlink()

    names = image_list.img_names
    sp = SuperPointRunner(max_keypoints=max_keypoints, resize_max=resize_max)
    feats = sp.extract_images([im.path for im in image_list])
    for name, f in zip(names, feats):
        save_features(
            feature_path, name,
            keypoints=f["keypoints"], descriptors=f["descriptors"],
            scores=f["scores"], image_size=f["image_size"],
        )
    brute = list(itertools.combinations(range(len(names)), 2))
    lg = LightGlueRunner(features="superpoint")
    matches = lg.match_pairs(feats, brute)
    kept = []
    for (i, j), m in zip(brute, matches):
        if len(m) > min_matches:
            save_matches(match_path, names[i], names[j], m)
            kept.append((names[i], names[j]))
    logger.info(
        f"Low-res quick-look: {len(kept)}/{len(brute)} pairs -> {match_path}"
    )
    return feature_path, match_path, kept
