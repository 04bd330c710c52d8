"""Metashape Python API helpers (run inside Metashape Pro).

Parity: reference ``scripts/metashape/ms_utils.py`` function set — license
check, project/chunk management, Bundler camera import, marker import/export
(image + world coordinates), OpenCV calibration reading, tie-point world
export, and sensor creation from a calibration file. Re-derived against the
public Metashape 2.x Python API; requires a Metashape Pro license.
"""

from pathlib import Path
from typing import List, Optional, Union

try:
    import Metashape
except ImportError as e:  # pragma: no cover - only inside Metashape Pro
    raise ImportError(
        "ms_utils must run inside Agisoft Metashape Pro (Tools > Run Script)"
    ) from e

import numpy as np


# --- license / project management ------------------------------------------

def check_license() -> None:
    if not Metashape.app.activated:
        raise RuntimeError("Metashape license not activated")
    ver = Metashape.app.version.split(".")
    if int(ver[0]) < 2:
        print(f"Warning: tested with Metashape 2.x, found {Metashape.app.version}")


def create_new_project(
    project_path: Union[str, Path], chunk_name: Optional[str] = None,
    read_only: bool = False,
) -> "Metashape.Document":
    doc = Metashape.Document()
    doc.read_only = read_only
    create_new_chunk(doc, chunk_name)
    doc.save(str(project_path))
    return doc


def create_new_chunk(doc, chunk_name: Optional[str] = None) -> None:
    chunk = doc.addChunk()
    if chunk_name is not None:
        chunk.label = str(chunk_name)


def save_project(doc, project_path: Optional[Union[str, Path]] = None) -> None:
    doc.read_only = False
    if project_path is not None:
        doc.save(str(project_path))
    else:
        doc.save()


def clear_all_sensors(chunk) -> None:
    for sensor in list(chunk.sensors):
        chunk.remove(sensor)


# --- object lookup -----------------------------------------------------------

def get_marker(chunk, label: str):
    for marker in chunk.markers:
        if marker.label == label:
            return marker
    return None


def get_camera(chunk, label: str):
    for camera in chunk.cameras:
        if camera.label.lower() == str(label).lower():
            return camera
    return None


# --- imports ------------------------------------------------------------------

def cameras_from_bundler(
    chunk, fname: Union[str, Path], image_list: Union[str, Path, None] = None
) -> None:
    """Import a deep-image-matching Bundler .out (tie points + cameras)."""
    kwargs = {"format": Metashape.CamerasFormat.CamerasFormatBundler}
    if image_list:
        kwargs.update(load_image_list=True, image_list=str(image_list))
    chunk.importCameras(str(fname), **kwargs)
    print(f"Cameras loaded from Bundler file {fname}")


def import_markers(
    marker_image_file: Union[str, Path],
    chunk=None,
) -> None:
    """Add marker projections from a CSV of `camera,marker,x,y` lines."""
    marker_image_file = Path(marker_image_file)
    if not marker_image_file.exists():
        raise FileNotFoundError(f"{marker_image_file} not found")
    if chunk is None:
        chunk = Metashape.app.document.chunk
    for line in marker_image_file.read_text().splitlines():
        if not line.strip():
            continue
        c_label, m_label, x_proj, y_proj = [s.strip() for s in line.split(",")]
        camera = get_camera(chunk, Path(c_label).stem)
        if camera is None:
            print(f"camera {c_label} not in project; skipping")
            continue
        marker = get_marker(chunk, m_label)
        if marker is None:
            marker = chunk.addMarker()
            marker.label = m_label
        marker.projections[camera] = Metashape.Marker.Projection(
            Metashape.Vector([float(x_proj), float(y_proj)]), True
        )


def read_opencv_calibration(path: Union[str, Path], format: str = "xml"):
    """Read an OpenCV camera calibration (XML via cv2.FileStorage or a plain
    text `w h fx fy cx cy k1 k2 p1 p2 [k3]` line) -> (K, dist, (w, h))."""
    path = Path(path)
    if format == "xml":
        import cv2

        fs = cv2.FileStorage(str(path), cv2.FILE_STORAGE_READ)
        K = fs.getNode("cameraMatrix").mat()
        dist = fs.getNode("distCoeffs").mat().ravel()
        w = int(fs.getNode("imageWidth").real())
        h = int(fs.getNode("imageHeight").real())
        fs.release()
        return K, dist, (w, h)
    vals = [float(v) for v in path.read_text().split()]
    w, h, fx, fy, cx, cy = vals[:6]
    dist = np.array(vals[6:], float)
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    return K, dist, (int(w), int(h))


def read_sensor_from_file(chunk, calib_path: Union[str, Path], label="sensor"):
    """Create a calibrated sensor from an OpenCV calibration file and assign
    it to all cameras in the chunk."""
    K, dist, (w, h) = read_opencv_calibration(calib_path)
    sensor = chunk.addSensor()
    sensor.label = label
    sensor.type = Metashape.Sensor.Type.Frame
    sensor.width, sensor.height = w, h
    calib = Metashape.Calibration()
    calib.width, calib.height = w, h
    calib.f = float(K[0, 0])
    calib.cx = float(K[0, 2] - w / 2)
    calib.cy = float(K[1, 2] - h / 2)
    if len(dist) > 0:
        calib.k1 = float(dist[0])
    if len(dist) > 1:
        calib.k2 = float(dist[1])
    if len(dist) > 3:
        calib.p1, calib.p2 = float(dist[2]), float(dist[3])
    if len(dist) > 4:
        calib.k3 = float(dist[4])
    sensor.user_calib = calib
    sensor.fixed = True
    for camera in chunk.cameras:
        camera.sensor = sensor
    return sensor


def add_markers(
    chunk,
    X: np.ndarray,
    projections: dict,
    label: str = "marker",
    accuracy: float = 0.001,
):
    """Add one world-referenced marker with per-camera pixel projections."""
    marker = chunk.addMarker()
    marker.label = label
    for cam_label, xy in projections.items():
        camera = get_camera(chunk, cam_label)
        if camera is None:
            continue
        marker.projections[camera] = Metashape.Marker.Projection(
            Metashape.Vector([float(xy[0]), float(xy[1])]), True
        )
    marker.reference.location = Metashape.Vector([float(v) for v in X])
    marker.reference.accuracy = Metashape.Vector([accuracy] * 3)
    marker.reference.enabled = True
    return marker


# --- exports -------------------------------------------------------------------

def export_tie_points_world(chunk, out_file: Union[str, Path]) -> None:
    """Write triangulated tie points as `x y z r g b` text (world frame)."""
    T = chunk.transform.matrix
    with open(out_file, "w") as f:
        for point in chunk.tie_points.points:
            if not point.valid:
                continue
            pw = T.mulp(point.coord[:3])
            c = point.color if hasattr(point, "color") else (128, 128, 128)
            f.write(f"{pw.x} {pw.y} {pw.z} {c[0]} {c[1]} {c[2]}\n")


def write_markers_by_camera(
    chunk, out_file: Union[str, Path], convert_to_micmac: bool = False
) -> None:
    """Per-camera marker projections: `camera,marker,x,y` (or MicMac 2D
    measures when convert_to_micmac)."""
    lines: List[str] = []
    for camera in chunk.cameras:
        for marker in chunk.markers:
            proj = marker.projections[camera]
            if proj is None:
                continue
            x, y = proj.coord.x, proj.coord.y
            if convert_to_micmac:
                lines.append(f"{camera.label} {marker.label} {x} {y}")
            else:
                lines.append(f"{camera.label},{marker.label},{x},{y}")
    Path(out_file).write_text("\n".join(lines) + "\n")


def write_markers_by_marker(chunk, out_file: Union[str, Path]) -> None:
    """Per-marker estimated world coordinates: `marker,x,y,z`."""
    T = chunk.transform.matrix
    lines = []
    for marker in chunk.markers:
        if marker.position is None:
            continue
        pw = T.mulp(marker.position)
        lines.append(f"{marker.label},{pw.x},{pw.y},{pw.z}")
    Path(out_file).write_text("\n".join(lines) + "\n")


def write_marker_world_coordinates(chunk, out_file: Union[str, Path]) -> None:
    """Reference (a-priori) marker world coordinates: `marker,x,y,z`."""
    lines = []
    for marker in chunk.markers:
        loc = marker.reference.location
        if loc is None:
            continue
        lines.append(f"{marker.label},{loc.x},{loc.y},{loc.z}")
    Path(out_file).write_text("\n".join(lines) + "\n")


def export_to_bundler(chunk, file_name: Union[str, Path]) -> None:
    """Export the chunk back out as a Bundler file."""
    chunk.exportCameras(
        str(file_name), format=Metashape.CamerasFormat.CamerasFormatBundler
    )
