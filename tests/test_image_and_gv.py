"""Image/ImageList EXIF and geometric-verification dispatcher unit tests
(mirrors the reference's tests/test_image.py and test_geom_verification.py)."""

import numpy as np
import pytest
from PIL import Image as PILImage
from PIL import ExifTags

from deep_image_matching_tpu.constants import GeometricVerification as GV
from deep_image_matching_tpu.utils.geometric_verification import (
    geometric_verification,
)
from deep_image_matching_tpu.utils.image import Image, ImageList


# ---------------------------------------------------------------------------
# Image / ImageList
# ---------------------------------------------------------------------------

def _write_jpg(path, w=64, h=48, exif=None):
    arr = (np.random.default_rng(0).random((h, w, 3)) * 255).astype(np.uint8)
    im = PILImage.fromarray(arr)
    kwargs = {}
    if exif is not None:
        e = PILImage.Exif()
        for tag, val in exif.items():
            e[tag] = val
        kwargs["exif"] = e
    im.save(path, **kwargs)


def test_imagelist_filters_and_sorts(tmp_path):
    for name in ("b.jpg", "a.jpg", "c.png", "notes.txt", "d.tiff"):
        if name.endswith(".txt"):
            (tmp_path / name).write_text("not an image")
        else:
            _write_jpg(tmp_path / name)
    il = ImageList(tmp_path)
    assert il.img_names == ["a.jpg", "b.jpg", "c.png", "d.tiff"]
    assert len(il) == 4
    assert il[0].name == "a.jpg"
    assert [im.id for im in il] == [0, 1, 2, 3]


def test_imagelist_empty_dir_raises(tmp_path):
    with pytest.raises(ValueError):
        ImageList(tmp_path)
    with pytest.raises(FileNotFoundError):
        ImageList(tmp_path / "missing")


def test_image_size_and_no_exif(tmp_path):
    p = tmp_path / "img.jpg"
    _write_jpg(p, w=80, h=60)
    im = Image(p, image_id=7)
    assert im.size == (80, 60)
    assert im.width == 80 and im.height == 60
    assert im.id == 7
    assert im.focal_length is None
    assert im.date_time is None
    # intrinsics fall back to the 1.2*max(w,h) prior at the image center
    K = im.get_intrinsics_from_exif()
    assert K[0, 0] == pytest.approx(1.2 * 80)
    assert K[0, 2] == pytest.approx(40.0) and K[1, 2] == pytest.approx(30.0)


def test_image_reads_exif_focal_and_datetime(tmp_path):
    p = tmp_path / "exif.jpg"
    _write_jpg(
        p, w=100, h=75,
        exif={
            ExifTags.Base.Make: "TestMake",
            ExifTags.Base.Model: "TestModel",
            ExifTags.Base.DateTime: "2023:05:17 12:34:56",
            ExifTags.Base.FocalLength: 35.0,
        },
    )
    im = Image(p)
    assert im.focal_length == pytest.approx(35.0)
    assert im.date_time is not None and im.date_time.year == 2023
    assert im.exif.get("Model") == "TestModel"


# ---------------------------------------------------------------------------
# Geometric verification dispatcher
# ---------------------------------------------------------------------------

def _synthetic_pair(n_inliers=200, n_outliers=40, seed=0):
    """Two views of a random 3D cloud with known relative pose; appended
    uniform outliers. Returns (pts0, pts1, inlier_truth_mask)."""
    rng = np.random.default_rng(seed)
    X = rng.uniform([-1, -1, 4], [1, 1, 8], (n_inliers, 3))
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    R = np.array([
        [np.cos(0.1), 0, np.sin(0.1)],
        [0, 1, 0],
        [-np.sin(0.1), 0, np.cos(0.1)],
    ])
    t = np.array([0.5, 0.05, 0.02])
    p0 = (K @ X.T).T
    p0 = p0[:, :2] / p0[:, 2:]
    Xc = (R @ X.T).T + t
    p1 = (K @ Xc.T).T
    p1 = p1[:, :2] / p1[:, 2:]
    o0 = rng.uniform(0, [640, 480], (n_outliers, 2))
    o1 = rng.uniform(0, [640, 480], (n_outliers, 2))
    pts0 = np.vstack([p0, o0])
    pts1 = np.vstack([p1, o1])
    truth = np.zeros(len(pts0), bool)
    truth[:n_inliers] = True
    return pts0, pts1, truth


def test_gv_none_keeps_everything():
    pts0, pts1, _ = _synthetic_pair()
    F, mask = geometric_verification(pts0, pts1, method=GV.NONE)
    assert F is None and mask.all()


def test_gv_too_few_points():
    pts = np.random.default_rng(0).random((5, 2)) * 100
    F, mask = geometric_verification(pts, pts, method=GV.MAGSAC)
    assert F is None and not mask.any() and len(mask) == 5


@pytest.mark.parametrize("method", [GV.MAGSAC, GV.RANSAC, GV.USAC_ACCURATE,
                                    GV.PYDEGENSAC, GV.RHO])
def test_gv_recovers_inliers(method):
    """Each dispatcher branch (incl. the pydegensac->MAGSAC fallback and the
    homography-only RHO remap) separates inliers from gross outliers."""
    pts0, pts1, truth = _synthetic_pair()
    F, mask = geometric_verification(
        pts0, pts1, method=method, threshold=2.0, confidence=0.9999
    )
    assert F is not None and F.shape == (3, 3)
    assert mask.dtype == bool and mask.shape == truth.shape
    # >=80% of true inliers kept, <=20% of outliers admitted
    assert mask[truth].mean() > 0.8
    assert mask[~truth].mean() < 0.2


def test_gv_jax_ransac_device_path():
    pts0, pts1, truth = _synthetic_pair(seed=1)
    F, mask = geometric_verification(
        pts0, pts1, method=GV.JAX_RANSAC, threshold=2.0
    )
    assert F is not None
    assert mask[truth].mean() > 0.8
    assert mask[~truth].mean() < 0.25


def test_corrupt_image_raises_clear_error(tmp_path):
    """A non-decodable file raises a clear ValueError naming the path
    (the reference's bare cv2.imread at ``extractor_base.py:241`` crashes
    later with an AttributeError on None). Failing the run is intentional:
    silently dropping an image would dangle its pairs."""
    import cv2
    import numpy as np
    import pytest

    from deep_image_matching_tpu.utils.image import read_image

    p = tmp_path / "bad.jpg"
    p.write_bytes(b"not an image at all")
    with pytest.raises(ValueError, match="bad.jpg"):
        read_image(p)
    # and a good image still reads
    g = tmp_path / "good.png"
    cv2.imwrite(str(g), np.zeros((8, 8, 3), np.uint8))
    assert read_image(g).shape[:2] == (8, 8)


def test_single_image_project_runs_with_zero_pairs(tmp_path):
    """One image -> zero pairs -> empty (but present) artifacts, no crash."""
    import cv2
    import numpy as np

    import deep_image_matching_tpu as dim

    (tmp_path / "images").mkdir()
    rng = np.random.default_rng(0)
    cv2.imwrite(
        str(tmp_path / "images" / "only.png"),
        rng.integers(0, 255, (80, 100, 3), np.uint8),
    )
    cfg = dim.Config(
        args={
            "dir": str(tmp_path), "pipeline": "sift+kornia_matcher",
            "strategy": "bruteforce", "skip_reconstruction": True,
            "force": True,
        }
    )
    im = dim.ImageMatcher(cfg)
    pairs = im.generate_pairs()
    assert pairs == []
    fpath = im.extract_features()
    assert fpath.exists()
    import h5py

    with h5py.File(str(fpath), "r") as f:
        assert "only.png" in f
