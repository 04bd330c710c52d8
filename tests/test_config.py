from pathlib import Path

import pytest
import yaml

from deep_image_matching_tpu.config import Config, confs
from deep_image_matching_tpu.constants import (
    GeometricVerification,
    Quality,
    TileSelection,
)


def _base_args(project_dir, pipeline="superpoint+lightglue", **kw):
    args = {
        "dir": str(project_dir),
        "pipeline": pipeline,
        "strategy": "bruteforce",
        "skip_reconstruction": True,
    }
    args.update(kw)
    return args


def test_config_requires_pipeline(project_dir):
    with pytest.raises(ValueError):
        Config(args={"dir": str(project_dir)})


def test_config_preset_merge(project_dir):
    cfg = Config(args=_base_args(project_dir))
    assert cfg.extractor["name"] == "superpoint"
    assert cfg.extractor["max_keypoints"] == 2048
    assert cfg.matcher["name"] == "lightglue"
    assert cfg.general["quality"] is Quality.HIGH
    assert cfg.general["geom_verification"] is GeometricVerification.MAGSAC
    assert cfg.output_dir.exists()


def test_config_quality_and_tiling_args(project_dir):
    cfg = Config(args=_base_args(project_dir, quality="medium", tiling="grid"))
    assert cfg.general["quality"] is Quality.MEDIUM
    assert cfg.general["tile_selection"] is TileSelection.GRID


def test_config_sequential_requires_overlap(project_dir):
    with pytest.raises(ValueError):
        Config(args=_base_args(project_dir, strategy="sequential"))
    cfg = Config(args=_base_args(project_dir, strategy="sequential", overlap=2))
    assert cfg.general["overlap"] == 2


def test_all_presets_construct(project_dir):
    for name in confs:
        cfg = Config(args=_base_args(project_dir, pipeline=name, force=True))
        assert cfg.extractor["name"]
        assert cfg.matcher["name"]


def test_yaml_override(project_dir, tmp_path):
    yaml_path = tmp_path / "override.yaml"
    yaml_path.write_text(
        yaml.safe_dump(
            {
                "general": {"quality": "low", "gv_threshold": 2},
                "extractor": {"max_keypoints": 512},
                "matcher": {"filter_threshold": 0.2},
            }
        )
    )
    cfg = Config(args=_base_args(project_dir, config_file=str(yaml_path)))
    assert cfg.general["quality"] is Quality.LOW
    assert cfg.general["gv_threshold"] == 2
    assert cfg.extractor["max_keypoints"] == 512
    assert cfg.matcher["filter_threshold"] == 0.2


def test_yaml_name_mismatch_swaps_component(project_dir, tmp_path):
    # reference behavior (config.py:713-740): a mismatched name warns and
    # switches the component rather than raising
    yaml_path = tmp_path / "swap.yaml"
    yaml_path.write_text(
        yaml.safe_dump({"matcher": {"name": "superglue", "sinkhorn_iterations": 50}})
    )
    cfg = Config(args=_base_args(project_dir, config_file=str(yaml_path)))
    assert cfg.matcher["name"] == "superglue"
    assert cfg.matcher["sinkhorn_iterations"] == 50


def test_config_save_json(project_dir):
    cfg = Config(args=_base_args(project_dir))
    path = cfg.save()
    assert Path(path).exists()


def test_all_sample_configs_parse(project_dir):
    """Every YAML in config/ loads through Config with its pipeline."""
    from pathlib import Path

    cfg_dir = Path(__file__).resolve().parents[1] / "config"
    pipeline_for = {
        "superpoint+lightglue.yaml": "superpoint+lightglue",
        "aliked+lightglue.yaml": "aliked+lightglue",
        "aliked.yaml": "aliked+lightglue",
        "superpoint+superglue.yaml": "superpoint+superglue",
        "disk+lightglue.yaml": "disk+lightglue",
        "dedode.yaml": "dedode+kornia_matcher",
        "dedode+kornia_matcher.yaml": "dedode+kornia_matcher",
        "keynet.yaml": "keynetaffnethardnet+kornia_matcher",
        "loftr.yaml": "loftr",
        "roma.yaml": "roma",
        "sift.yaml": "sift+kornia_matcher",
    }
    for fname, pipe in pipeline_for.items():
        path = cfg_dir / fname
        assert path.exists(), fname
        cfg = Config(args={
            "dir": str(project_dir), "pipeline": pipe,
            "config_file": str(path), "skip_reconstruction": True,
            "force": True,
        })
        assert cfg.extractor["name"]
