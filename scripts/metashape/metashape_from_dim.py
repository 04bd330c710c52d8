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

doc = Metashape.app.document
chunk = doc.addChunk()
images = sorted(
    str(p) for p in IMAGE_DIR.iterdir()
    if p.suffix.lower() in {".jpg", ".jpeg", ".png", ".tif", ".tiff"}
)
chunk.addPhotos(images)
chunk.importCameras(
    str(EXPORT_DIR / "bundler.out"), format=Metashape.CamerasFormatBundler
)
print(f"Imported {len(images)} photos + Bundler tie points from {EXPORT_DIR}")
