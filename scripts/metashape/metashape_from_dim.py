"""Import a deep-image-matching-tpu export into Agisoft Metashape.

Parity: reference scripts/metashape/metashape_from_dim.py. Run inside the
Metashape Pro Python console (Tools > Run Script). Loads the images, then
imports the Bundler-format cameras/tie-points written by
scripts/export_to_metashape.py.
"""

from pathlib import Path

try:
    import Metashape  # available only inside Metashape Pro
except ImportError as e:  # pragma: no cover
    raise SystemExit(
        "This script must run inside Agisoft Metashape Pro (Tools > Run Script)"
    ) from e

# --- edit these two paths -------------------------------------------------
EXPORT_DIR = Path("path/to/results_dir/metashape")
IMAGE_DIR = Path("path/to/project/images")
# --------------------------------------------------------------------------

def project_from_bundler(
    project_path: Path,
    images_dir: Path,
    bundler_file_path: Path,
    bundler_im_list: Path = None,
    marker_image_path: Path = None,
    marker_world_path: Path = None,
    marker_file_columns: str = "noxyz",
    prm_to_optimize: dict = None,
):
    """Full import flow (reference scripts/metashape/metashape_from_dim.py):
    new project -> photos -> Bundler cameras/tie points -> optional marker
    image/world references -> optional camera optimization."""
    from ms_utils import cameras_from_bundler, create_new_project, import_markers

    images = sorted(
        str(p) for p in Path(images_dir).iterdir()
        if p.suffix.lower() in {".jpg", ".jpeg", ".png", ".tif", ".tiff"}
    )
    doc = create_new_project(str(project_path), read_only=False)
    chunk = doc.chunk
    chunk.addPhotos(images)
    cameras_from_bundler(chunk, bundler_file_path, bundler_im_list)
    doc.read_only = False
    doc.save()
    if marker_image_path is not None:
        import_markers(marker_image_path, chunk)
    if marker_world_path is not None:
        chunk.importReference(
            path=str(marker_world_path),
            format=Metashape.ReferenceFormatCSV,
            delimiter=",", skip_rows=1, columns=marker_file_columns,
        )
    if prm_to_optimize:
        chunk.optimizeCameras(
            fit_f=prm_to_optimize.get("f", True),
            fit_cx=prm_to_optimize.get("cx", True),
            fit_cy=prm_to_optimize.get("cy", True),
            fit_k1=prm_to_optimize.get("k1", True),
            fit_k2=prm_to_optimize.get("k2", True),
            fit_k3=prm_to_optimize.get("k3", False),
            fit_p1=prm_to_optimize.get("p1", False),
            fit_p2=prm_to_optimize.get("p2", False),
            tiepoint_covariance=prm_to_optimize.get("tiepoint_covariance", True),
        )
        doc.save()
    return doc


if __name__ == "__main__":
    project_from_bundler(
        EXPORT_DIR / "project.psx", IMAGE_DIR,
        EXPORT_DIR / "metashape.out", EXPORT_DIR / "metashape_list.txt",
    )
    print(f"Imported photos + Bundler tie points from {EXPORT_DIR}")
