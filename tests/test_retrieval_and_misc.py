"""Retrieval pair selection, AdaLAM filter, covisibility pairs."""

import numpy as np
import pytest

import jax.numpy as jnp


def test_tiny_descriptor_retrieval(image_dir):
    from deep_image_matching_tpu.image_retrieval import retrieval_pairs
    from deep_image_matching_tpu.utils.image import ImageList

    il = ImageList(image_dir)
    pairs = retrieval_pairs(il, "cosplace", num_matched=2)
    assert len(pairs) >= len(il) - 1
    names = set(il.img_names)
    for a, b in pairs:
        assert a in names and b in names and a != b


def test_netvlad_layer_properties():
    from deep_image_matching_tpu.models.retrieval import netvlad_aggregate

    rng = np.random.default_rng(0)
    B, H, W, D, K = 2, 4, 5, 32, 8
    feats = rng.normal(size=(B, H, W, D)).astype(np.float32)
    centers = rng.normal(size=(K, D)).astype(np.float32)
    assign = rng.normal(size=(D, K)).astype(np.float32)
    v = np.asarray(
        netvlad_aggregate(jnp.asarray(feats), jnp.asarray(centers), jnp.asarray(assign))
    )
    assert v.shape == (B, K * D)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)


def test_adalam_motion_filter():
    from deep_image_matching_tpu.matchers.adalam import motion_consistency_filter

    rng = np.random.default_rng(1)
    K = 128
    kpts0 = rng.uniform(0, 500, (K, 2)).astype(np.float32)
    # consistent global translation for the first 100, garbage for the rest
    kpts1 = kpts0 + np.array([30.0, -10.0], np.float32)
    kpts1[100:] = rng.uniform(0, 500, (28, 2)).astype(np.float32)
    matches0 = np.arange(K, dtype=np.int32)
    valid = np.ones(K, bool)
    keep = np.asarray(
        motion_consistency_filter(
            jnp.asarray(kpts0), jnp.asarray(kpts1), jnp.asarray(matches0),
            jnp.asarray(valid), radius_frac=0.3, tolerance=0.2, min_votes=4,
        )
    )
    assert keep[:100].mean() > 0.9       # coherent motion survives
    assert keep[100:].mean() < 0.3       # outliers rejected


def test_covisibility_pairs(tmp_path):
    from deep_image_matching_tpu.io.colmap_read_write_model import (
        Camera, Image, Point3D, write_model,
    )
    from deep_image_matching_tpu.pairs_generator import pairs_from_covisibility

    cameras = {1: Camera(1, "PINHOLE", 100, 100, np.array([100.0, 100, 50, 50]))}
    images = {
        i: Image(i, np.array([1.0, 0, 0, 0]), np.zeros(3), 1, f"im{i}.jpg",
                 np.zeros((0, 2)), np.zeros(0, np.int64))
        for i in (1, 2, 3)
    }
    # points observed by (1,2) x3 and (2,3) x1
    points = {}
    pid = 1
    for _ in range(3):
        points[pid] = Point3D(pid, np.zeros(3), np.zeros(3), 0.1,
                              np.array([1, 2]), np.array([0, 0]))
        pid += 1
    points[pid] = Point3D(pid, np.zeros(3), np.zeros(3), 0.1,
                          np.array([2, 3]), np.array([0, 0]))
    model_dir = tmp_path / "model"
    write_model(cameras, images, points, model_dir)
    pairs = pairs_from_covisibility(
        model_dir, ["im1.jpg", "im2.jpg", "im3.jpg"], top_k=1
    )
    assert ("im1.jpg", "im2.jpg") in pairs
