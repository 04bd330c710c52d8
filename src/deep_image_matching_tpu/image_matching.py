"""Pipeline orchestrator: pairs -> extract -> match.

Parity: reference ``image_matching.py:199-765`` ``ImageMatcher`` — scans the
image dir, reflection-loads the configured extractor + matcher, generates
pairs, extracts features into features.h5 and matches pairs into
raw_matches.h5 / matches.h5 (with geometric verification and gating inside
the matcher). Optional upright rotation handled in ``upright.py``.

TPU-native shape: extraction and matching are *batched jitted programs* fed
by the padded feature store; the reference's per-image/per-pair Python loops
(``image_matching.py:429, 467``) exist here only as the host fallback for
CPU extractors. Device-side work is sharded data-parallel across the mesh
(see ``parallel/mesh.py``).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, List, Optional, Tuple

from . import extractors as extractors_pkg
from . import matchers as matchers_pkg
from .config import Config
from .extractors.extractor_base import extractor_loader
from .matchers.matcher_base import matcher_loader
from .pairs_generator import PairsGenerator
from .utils.image import ImageList
from .utils.timer import Timer

logger = logging.getLogger("dim_tpu")


class ImageMatcher:
    def __init__(self, config: Config):
        self.config = config
        self.image_dir = Path(config.image_dir)
        self.output_dir = Path(config.output_dir)
        self.image_list = ImageList(self.image_dir)
        logger.info(f"Found {len(self.image_list)} images in {self.image_dir}")

        cfg_dict = {
            "general": config.general,
            "extractor": config.extractor,
            "matcher": config.matcher,
        }
        # LightGlue-family matchers pick weight sets by feature type
        if "features" not in config.matcher:
            cfg_dict["matcher"]["features"] = config.extractor["name"]
        extractor_cls = extractor_loader(extractors_pkg, config.extractor["name"])
        matcher_cls = matcher_loader(matchers_pkg, config.matcher["name"])
        self.extractor = extractor_cls(cfg_dict)
        self.matcher = matcher_cls(cfg_dict)
        logger.info(
            f"Pipeline: extractor={config.extractor['name']} "
            f"matcher={config.matcher['name']}"
        )

    # ------------------------------------------------------------------ run
    def run(self) -> Tuple[Path, Path]:
        """Full matching pipeline; returns (feature_path, match_path)."""
        timer = Timer(logger=logger, cumulate_by_key=True)
        pairs = self.generate_pairs()
        timer.update("generate_pairs")

        if self.config.general.get("upright"):
            from .upright import rotate_upright_images

            self.rotated = rotate_upright_images(
                self.image_list, self.output_dir, self.config
            )
            timer.update("upright")

        feature_path = self.extract_features()
        timer.update("extract_features")
        match_path = self.match_pairs(pairs, feature_path)
        timer.update("match_pairs")

        if self.config.general.get("upright"):
            from .upright import rotate_back_features

            rotate_back_features(feature_path, self.rotated)
            timer.update("rotate_back")
        timer.print("ImageMatcher")
        return feature_path, match_path

    def generate_pairs(self) -> List[Tuple[str, str]]:
        general = self.config.general
        gen = PairsGenerator(
            self.image_list,
            general.get("matching_strategy", "bruteforce"),
            self.output_dir,
            overlap=general.get("overlap"),
            pair_file=general.get("pair_file"),
            retrieval=general.get("retrieval"),
            db_path=general.get("db_path"),
            config=self.config,
        )
        self.pairs = gen.run()
        return self.pairs

    def extract_features(self) -> Path:
        """Extract features; with general['resume'] the existing features.h5
        is reused when it covers all images (checkpoint/resume — the durable
        h5 artifacts are the stage boundaries; the reference lacks this,
        see its ``config.py:545-559``)."""
        feature_path = self.output_dir / "features.h5"
        # arm the in-memory extract->match handoff (h5 remains the durable
        # artifact; the matcher falls back to it per-image when not cached)
        self.extractor.feature_cache = {}
        if feature_path.exists():
            if self.config.general.get("resume"):
                from .io.h5 import list_h5_names

                have = set(list_h5_names(feature_path))
                missing = [
                    im for im in self.image_list if im.name not in have
                ]
                if not missing:
                    logger.info(f"Resume: reusing features for all "
                                f"{len(self.image_list)} images")
                    return feature_path
                logger.info(f"Resume: extracting {len(missing)} missing images")
                self.extractor.extract_batch(missing, feature_path)
                return feature_path
            feature_path.unlink()
        self.extractor.extract_batch(list(self.image_list), feature_path)
        logger.info(f"Features saved to {feature_path}")
        return feature_path

    def match_pairs(self, pairs, feature_path: Path) -> Path:
        match_path = self.output_dir / "matches.h5"
        raw_path = self.output_dir / "raw_matches.h5"
        if self.config.general.get("resume") and raw_path.exists():
            from .io.h5 import list_pairs

            done = set(list_pairs(raw_path))
            todo = [p for p in pairs if tuple(p) not in done]
            logger.info(
                f"Resume: {len(pairs) - len(todo)} pairs already matched, "
                f"{len(todo)} to go"
            )
            pairs = todo
        else:
            for p in (match_path, raw_path):
                if p.exists():
                    p.unlink()
        self.matcher.feature_cache = getattr(
            self.extractor, "feature_cache", None
        )
        handoff = getattr(self.extractor, "device_handoff", None)
        names = {n for p in pairs for n in p}
        if handoff is not None and not handoff.covers(names):
            # partial handoff (e.g. resume extracted only missing images):
            # matching will read features.h5, so the deferred writer must
            # finish first
            self.extractor.flush()
            handoff = None
        self.matcher.device_handoff = handoff
        try:
            results = self.matcher.match_all(pairs, feature_path, match_path)
        finally:
            # features.h5 is complete on disk from here on (exports,
            # rotate_back, and any user read rely on it)
            self.extractor.flush()
        kept = sum(1 for v in results.values() if v > 0)
        logger.info(
            f"Matched {kept}/{len(pairs)} pairs passed verification "
            f"-> {match_path}"
        )
        if self.config.general.get("verbose") and kept:
            self._dump_debug_viz(feature_path, match_path, results)
        return match_path

    def _dump_debug_viz(self, feature_path, match_path, results) -> None:
        """Debug artifact: a side-by-side plot of the best-matched pair
        (reference dumps keypoint/match images when debugging,
        ``matcher_base.py:347-358``)."""
        try:
            from .io.h5 import get_features, get_matches
            from .utils.image import read_image
            from .visualization import viz_matches_cv2

            (name0, name1), _ = max(results.items(), key=lambda kv: kv[1])
            m = get_matches(match_path, name0, name1)
            f0 = get_features(feature_path, name0)
            f1 = get_features(feature_path, name1)
            img0 = read_image(self.image_dir / name0, grayscale=False)[:, :, ::-1]
            img1 = read_image(self.image_dir / name1, grayscale=False)[:, :, ::-1]
            out = self.output_dir / "debug"
            out.mkdir(exist_ok=True)
            viz_matches_cv2(
                img0, img1,
                f0["keypoints"][m[:, 0]], f1["keypoints"][m[:, 1]],
                output_path=out / f"matches_{name0}_{name1}.jpg",
            )
            logger.debug(f"Debug match visualization written to {out}")
        except Exception as e:  # viz must never break the pipeline
            logger.debug(f"Debug viz failed: {e}")
