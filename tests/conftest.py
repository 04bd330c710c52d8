"""Test fixtures.

Tests run on CPU with 8 virtual devices so multi-chip sharding is exercised
without TPU hardware (the driver separately dry-runs the multi-chip path).
Sample images come from the reference checkout's bundled assets (read-only,
used as runtime test data only) when available, otherwise synthetic images
are generated.
"""

import os

# Tests intentionally exercise random-init model paths (parity tests build
# their own params; pipeline smoke tests have no checkpoints in CI). The
# strict default — learned models abort without pretrained weights — has its
# own dedicated test (tests/test_weights_policy.py).
os.environ.setdefault("DIM_TPU_ALLOW_RANDOM_WEIGHTS", "1")

# Must be set before the first jax backend use. The environment's TPU
# platform plugin overrides JAX_PLATFORMS, so force via jax.config too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import shutil
from pathlib import Path

import cv2
import numpy as np
import pytest

REFERENCE_ASSETS = Path("/root/reference/assets")


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (full model-parity/pipeline tier)",
    )


def pytest_collection_modifyitems(config, items):
    """Two test tiers: the default run skips @pytest.mark.slow files so a
    plain ``pytest tests/`` finishes in a few minutes; ``--runslow`` runs
    everything (CI runs both tiers as separate jobs)."""
    if config.getoption("--runslow"):
        return
    skip_slow = pytest.mark.skip(reason="slow tier; pass --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


def _synthetic_scene(tmp: Path, n: int = 3, size=(480, 640)) -> Path:
    """Render a textured synthetic scene from shifted viewpoints so real
    features match across frames."""
    img_dir = tmp / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    h, w = size
    base = rng.integers(0, 255, (h * 2, w * 2), dtype=np.uint8)
    base = cv2.GaussianBlur(base, (0, 0), 3)
    base = cv2.normalize(base, None, 0, 255, cv2.NORM_MINMAX)
    for i in range(n):
        ox, oy = 40 * i, 25 * i
        crop = base[oy : oy + h, ox : ox + w]
        cv2.imwrite(str(img_dir / f"img_{i:02d}.jpg"), crop)
    return img_dir


@pytest.fixture
def image_dir(tmp_path) -> Path:
    src = REFERENCE_ASSETS / "pytest" / "images"
    img_dir = tmp_path / "images"
    if src.exists():
        shutil.copytree(src, img_dir)
    else:
        _synthetic_scene(tmp_path)
    return img_dir


@pytest.fixture
def project_dir(tmp_path, image_dir) -> Path:
    return tmp_path
