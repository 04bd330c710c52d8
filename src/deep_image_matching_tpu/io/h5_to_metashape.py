"""Export for Agisoft Metashape.

Parity: reference ``io/h5_to_metashape.py`` — the practical Metashape import
path is the Bundler file + image list (loaded in Metashape via
"Import Cameras" / tie-point import scripts, see reference
``scripts/metashape/``). This module wraps the Bundler exporter with
Metashape-friendly naming and writes a small README with import steps.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

from .h5_to_bundler import export_to_bundler

logger = logging.getLogger("dim_tpu")

_README = """Metashape import
================
1. Add the photos listed in metashape_list.txt to a new chunk.
2. Use a tie-point import script (see the project docs) to load
   metashape.out (Bundler v0.3 format: tracks with per-image keypoint
   observations, origin at image center, y up).
3. Align photos with "Source" preselection to triangulate from the
   imported tie points.
"""


def export_to_metashape(
    img_dir: Path,
    feature_path: Path,
    match_path: Path,
    out_dir: Path,
    min_track_length: int = 2,
) -> Optional[Path]:
    out_dir = Path(out_dir)
    path = export_to_bundler(
        img_dir, feature_path, match_path, out_dir,
        out_name="metashape", min_track_length=min_track_length,
    )
    if path is not None:
        (out_dir / "README_metashape.txt").write_text(_README)
    return path
