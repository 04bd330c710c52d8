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


def test_cached_random_params_do_not_leak_into_strict_probes():
    """Regression: loading random-init params under allow-random must not
    poison later strict() probes through the module-level param caches —
    this leak made the upright probe silently run a random SuperPoint after
    any earlier allow-random test, degrading rotated-scene registration."""
    from deep_image_matching_tpu.models import lightglue as lg
    from deep_image_matching_tpu.models import superpoint as sp

    sp_prev = (sp._DEFAULT_PARAMS, sp._DEFAULT_PARAMS_RANDOM)
    lg_prev = (dict(lg._DEFAULT_PARAMS), set(lg._DEFAULT_PARAMS_RANDOM))
    sp._DEFAULT_PARAMS, sp._DEFAULT_PARAMS_RANDOM = None, False
    lg._DEFAULT_PARAMS.clear()
    lg._DEFAULT_PARAMS_RANDOM.clear()
    try:
        W.set_allow_random_weights(True)
        sp.load_default_params()   # caches RANDOM params
        lg.load_default_params("superpoint")
        W.set_allow_random_weights(False)
        with pytest.raises(W.MissingWeightsError):
            sp.load_default_params()
        with pytest.raises(W.MissingWeightsError):
            lg.load_default_params("superpoint")
        # the upright probe must therefore not pick the random SuperPoint:
        # with the bundled ALIKED checkpoint present it selects _AlikedProbe
        from deep_image_matching_tpu import upright

        try:
            from deep_image_matching_tpu.extractors.aliked import load_params

            load_params("aliked-n16rot")
            have_aliked = True
        except Exception:
            have_aliked = False
        if have_aliked:
            W.set_allow_random_weights(None)
            probe = upright._make_probe()
            assert isinstance(probe, upright._AlikedProbe)
    finally:
        W.set_allow_random_weights(None)
        sp._DEFAULT_PARAMS, sp._DEFAULT_PARAMS_RANDOM = sp_prev
        lg._DEFAULT_PARAMS.clear()
        lg._DEFAULT_PARAMS.update(lg_prev[0])
        lg._DEFAULT_PARAMS_RANDOM.clear()
        lg._DEFAULT_PARAMS_RANDOM.update(lg_prev[1])
