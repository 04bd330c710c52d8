"""Multi-device data-parallel sharding tests (8 virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_image_matching_tpu.parallel.mesh import MeshRunner


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_pad_batch_and_shard_roundtrip():
    mesh = MeshRunner()
    batch = {"x": np.arange(5 * 3, dtype=np.float32).reshape(5, 3)}
    padded = mesh.pad_batch(batch)
    assert padded["x"].shape[0] == 8
    np.testing.assert_array_equal(padded["x"][:5], batch["x"])
    sharded = mesh.shard_batch(padded)
    assert sharded["x"].sharding.num_devices == 8
    np.testing.assert_array_equal(np.asarray(sharded["x"])[:5], batch["x"])


def test_nn_match_sharded_equals_unsharded():
    from deep_image_matching_tpu.ops.nn_match import nn_match_batch

    rng = np.random.default_rng(0)
    B, N, D = 8, 128, 64
    d0 = rng.normal(size=(B, N, D)).astype(np.float32)
    d1 = rng.normal(size=(B, N, D)).astype(np.float32)
    m = np.ones((B, N), bool)

    ref = nn_match_batch(
        jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(m), jnp.asarray(m)
    )
    mesh = MeshRunner()
    sharded = nn_match_batch(
        mesh.shard_array(d0), mesh.shard_array(d1),
        mesh.shard_array(m), mesh.shard_array(m),
    )
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(sharded[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(sharded[1]))


def test_lightglue_sharded_equals_unsharded():
    from deep_image_matching_tpu.models.lightglue import forward, init_params

    params = init_params(jax.random.PRNGKey(0), n_layers=2)
    rng = np.random.default_rng(1)
    B, N, D = 8, 64, 256
    kpts = rng.uniform([0, 0], [640, 480], size=(B, N, 2)).astype(np.float32)
    desc = rng.normal(size=(B, N, D)).astype(np.float32)
    mask = np.ones((B, N), bool)
    size = np.tile(np.array([[640, 480]], np.float32), (B, 1))

    args = (jnp.asarray(kpts), jnp.asarray(kpts), jnp.asarray(desc),
            jnp.asarray(desc), jnp.asarray(mask), jnp.asarray(mask),
            jnp.asarray(size), jnp.asarray(size))
    ref = forward(params, *args)

    mesh = MeshRunner()
    params_r = mesh.replicate_tree(params)
    sargs = tuple(mesh.shard_array(np.asarray(a)) for a in args)
    out = forward(params_r, *sargs)
    np.testing.assert_array_equal(
        np.asarray(ref["matches0"]), np.asarray(out["matches0"])
    )
    np.testing.assert_allclose(
        np.asarray(ref["matching_scores0"]),
        np.asarray(out["matching_scores0"]),
        atol=1e-5,
    )


def test_batched_ransac_sharded():
    from deep_image_matching_tpu.ops.ransac import ransac_fundamental_batch

    rng = np.random.default_rng(2)
    B, M = 8, 128
    k0 = rng.uniform(0, 500, (B, M, 2)).astype(np.float32)
    # planar scene: k1 = k0 shifted -> all inliers under F
    k1 = k0 + np.array([5.0, 0.0], np.float32)
    msk = np.ones((B, M), bool)
    mesh = MeshRunner()
    F, inl, n = ransac_fundamental_batch(
        mesh.shard_array(k0), mesh.shard_array(k1), mesh.shard_array(msk),
        jax.random.PRNGKey(0), 3.0, 128,
    )
    assert np.asarray(n).shape == (B,)
    assert (np.asarray(n) > 50).all()
