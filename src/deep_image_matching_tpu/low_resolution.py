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
