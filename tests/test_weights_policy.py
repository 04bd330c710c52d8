"""Strict weight handling: learned models ABORT on missing checkpoints.

Reference parity: the reference downloads weights at runtime
(``thirdparty/LightGlue/lightglue/lightglue.py:389-396``) and a download
failure is a hard error — it never silently matches with random weights.
"""

import importlib

import pytest

from deep_image_matching_tpu.utils import weights as W


@pytest.fixture
def strict():
    """Force the strict policy regardless of the conftest env default."""
    W.set_allow_random_weights(False)
    yield
    W.set_allow_random_weights(None)


def test_missing_weights_raises_with_filename_table(strict):
    with pytest.raises(W.MissingWeightsError) as e:
        W.missing_weights("LightGlue (superpoint)", ["superpoint_lightglue.pth"])
    msg = str(e.value)
    assert "superpoint_lightglue.pth" in msg
    assert "DIM_TPU_WEIGHTS_DIR" in msg
    assert "allow_random_weights" in msg


def test_allowed_by_flag(strict):
    W.set_allow_random_weights(True)
    W.missing_weights("LightGlue (superpoint)", ["superpoint_lightglue.pth"])


def test_allowed_by_env(strict, monkeypatch):
    W.set_allow_random_weights(None)
    monkeypatch.setenv("DIM_TPU_ALLOW_RANDOM_WEIGHTS", "1")
    W.missing_weights("X", ["x.pth"])
    monkeypatch.setenv("DIM_TPU_ALLOW_RANDOM_WEIGHTS", "0")
    with pytest.raises(W.MissingWeightsError):
        W.missing_weights("X", ["x.pth"])


def test_lightglue_loader_aborts_without_checkpoint(strict, monkeypatch, tmp_path):
    """The real LightGlue loader must refuse random init under strict policy."""
    monkeypatch.setenv("DIM_TPU_WEIGHTS_DIR", str(tmp_path))  # empty dir
    from deep_image_matching_tpu.models import lightglue as lg

    lg._DEFAULT_PARAMS.clear()
    try:
        with pytest.raises(W.MissingWeightsError):
            lg.load_default_params("superpoint")
    finally:
        lg._DEFAULT_PARAMS.clear()


def test_config_flag_enables_random(strict, tmp_path, monkeypatch):
    from deep_image_matching_tpu.config import Config

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    Config(
        args={
            "dir": str(tmp_path),
            "images": str(img_dir),
            "pipeline": "superpoint+lightglue",
            "force": True,
        },
        general={"allow_random_weights": True},
    )
    assert W.random_weights_allowed()
