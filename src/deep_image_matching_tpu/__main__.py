"""CLI entry: full pipeline from images to reconstruction.

Parity: reference ``__main__.py:11-119`` ``run_matching()`` — Config ->
ImageMatcher -> COLMAP export -> (dense-to-multiview for detector-free
pipelines) -> view graph -> pycolmap reconstruction -> optional OpenMVG.
"""

from __future__ import annotations

import logging
from pathlib import Path


def run_matching(args: dict):
    from .config import Config
    from .image_matching import ImageMatcher
    from .io.h5_to_db import export_to_colmap
    from .utils.logger import change_logger_level

    config = Config(args=args)
    if config.general.get("verbose"):
        change_logger_level("dim_tpu", "debug")
    config.save()

    matcher = ImageMatcher(config)
    feature_path, match_path = matcher.run()

    logger = logging.getLogger("dim_tpu")
    database_path = config.output_dir / "database.db"
    export_to_colmap(
        img_dir=config.image_dir,
        feature_path=feature_path,
        match_path=match_path,
        database_path=database_path,
        camera_config_path=config.general.get("camera_options"),
    )

    # dense pipelines: merge per-pair keypoints into multiview tracks
    if config.matcher["name"] in ("loftr", "se2loftr", "roma", "srif"):
        from .utils.dense_to_multiview import dense_to_multiview

        dense_to_multiview(
            feature_path, match_path, database_path, config.image_dir,
            camera_config_path=config.general.get("camera_options"),
        )

    if config.general.get("graph", True):
        try:
            from .graph import view_graph

            view_graph(database_path, config.output_dir, config.image_dir)
        except Exception as e:
            logger.warning(f"View-graph export failed: {e}")

    reconstruction = None
    if not config.general.get("skip_reconstruction"):
        from .reconstruction import incremental_reconstruction

        try:
            reconstruction = incremental_reconstruction(
                database_path, config.image_dir, config.output_dir,
                options=config.general.get("sfm_options"),
                backend=config.general.get("sfm_backend", "auto"),
            )
        except Exception as e:
            logger.error(f"Reconstruction failed: {e}")

    if config.general.get("openmvg_conf"):
        from .io.h5_to_openmvg import export_to_openmvg
        from .openmvg import openmvg_reconstruction

        openmvg_dir = config.output_dir / "openmvg"
        export_to_openmvg(
            img_dir=config.image_dir,
            feature_path=feature_path,
            match_path=match_path,
            openmvg_out_path=openmvg_dir,
            camera_config_path=config.general.get("camera_options"),
        )
        openmvg_reconstruction(
            openmvg_out_path=openmvg_dir,
            openmvg_conf=config.general.get("openmvg_conf"),
        )

    return feature_path, match_path, reconstruction


def main():
    from .parser import parse_cli

    args = parse_cli()
    run_matching(args)


if __name__ == "__main__":
    main()
