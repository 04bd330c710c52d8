"""Numeric golden tests for device ops against naive numpy references."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from deep_image_matching_tpu.ops.nn_match import nn_match
from deep_image_matching_tpu.ops.ransac import (
    ransac_fundamental_batch,
    ransac_fundamental_np,
)


def _naive_smnn(d0, d1, ratio):
    """Loop-based mutual NN + ratio test."""
    out = {}
    dist = ((d0[:, None, :] - d1[None, :, :]) ** 2).sum(-1)
    nn01 = dist.argmin(1)
    nn10 = dist.argmin(0)
    for i in range(len(d0)):
        j = nn01[i]
        srt = np.sort(dist[i])
        if len(srt) > 1 and np.sqrt(srt[0]) / max(np.sqrt(srt[1]), 1e-12) > ratio:
            continue
        if nn10[j] == i:
            out[i] = j
    return out


def test_nn_match_matches_naive():
    rng = np.random.default_rng(0)
    n0, n1, d = 37, 53, 16
    d0 = rng.normal(size=(n0, d)).astype(np.float32)
    d1 = rng.normal(size=(n1, d)).astype(np.float32)
    # plant exact correspondences
    d1[:20] = d0[:20] + rng.normal(scale=1e-3, size=(20, d)).astype(np.float32)

    cap = 64
    p0 = np.zeros((cap, d), np.float32)
    p1 = np.zeros((cap, d), np.float32)
    m0 = np.zeros(cap, bool)
    m1 = np.zeros(cap, bool)
    p0[:n0], p1[:n1], m0[:n0], m1[:n1] = d0, d1, True, True

    matches0, valid = nn_match(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(m0), jnp.asarray(m1),
        mode="smnn", ratio_th=0.9,
    )
    matches0 = np.asarray(matches0)
    valid = np.asarray(valid)
    got = {i: matches0[i] for i in range(n0) if valid[i]}
    want = _naive_smnn(d0, d1, 0.9)
    assert got == want
    # planted correspondences must be found
    for i in range(20):
        assert got.get(i) == i
    # nothing valid outside the real rows
    assert not valid[n0:].any()


def test_nn_match_modes():
    rng = np.random.default_rng(1)
    d0 = rng.normal(size=(16, 8)).astype(np.float32)
    d1 = d0.copy()
    cap = 16
    m = np.ones(cap, bool)
    for mode in ("nn", "mnn", "snn", "smnn"):
        matches0, valid = nn_match(
            jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(m), jnp.asarray(m),
            mode=mode, ratio_th=0.99,
        )
        matches0, valid = np.asarray(matches0), np.asarray(valid)
        assert valid.all()
        assert (matches0 == np.arange(16)).all()


def _synthetic_epipolar(rng, n=200, noise=0.0, outliers=0.0):
    """Two views of random 3D points with known geometry."""
    K = np.array([[800.0, 0, 320], [0, 800.0, 240], [0, 0, 1]])
    R = _rot(rng.normal(scale=0.2, size=3))
    t = np.array([1.0, 0.1, 0.05])
    X = rng.uniform([-2, -2, 4], [2, 2, 10], size=(n, 3))
    x0 = (K @ X.T).T
    x0 = x0[:, :2] / x0[:, 2:]
    X1 = (R @ X.T).T + t
    x1 = (K @ X1.T).T
    x1 = x1[:, :2] / x1[:, 2:]
    if noise:
        x0 += rng.normal(scale=noise, size=x0.shape)
        x1 += rng.normal(scale=noise, size=x1.shape)
    n_out = int(n * outliers)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        x1[idx] += rng.uniform(30, 120, size=(n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    F = np.linalg.inv(K).T @ E @ np.linalg.inv(K)
    inlier_mask = np.ones(n, bool)
    if n_out:
        inlier_mask[idx] = False
    return x0.astype(np.float32), x1.astype(np.float32), F, inlier_mask


def _rot(w):
    theta = np.linalg.norm(w)
    if theta < 1e-12:
        return np.eye(3)
    k = w / theta
    Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * Kx + (1 - np.cos(theta)) * Kx @ Kx


def test_ransac_recovers_inliers():
    rng = np.random.default_rng(2)
    x0, x1, F_true, inliers_true = _synthetic_epipolar(
        rng, n=300, noise=0.3, outliers=0.3
    )
    F, mask = ransac_fundamental_np(x0, x1, threshold=2.0, iters=1024)
    # recall and precision on the known inlier set
    tp = (mask & inliers_true).sum()
    assert tp / inliers_true.sum() > 0.9
    assert tp / max(mask.sum(), 1) > 0.9


def test_ransac_batch_shapes():
    rng = np.random.default_rng(3)
    B, M = 3, 256
    k0 = np.zeros((B, M, 2), np.float32)
    k1 = np.zeros((B, M, 2), np.float32)
    msk = np.zeros((B, M), bool)
    for b in range(B):
        x0, x1, _, _ = _synthetic_epipolar(rng, n=200, noise=0.2, outliers=0.2)
        k0[b, :200], k1[b, :200], msk[b, :200] = x0, x1, True
    F, inl, n_inl = ransac_fundamental_batch(
        jnp.asarray(k0), jnp.asarray(k1), jnp.asarray(msk),
        jax.random.PRNGKey(0), 2.0, 512,
    )
    assert F.shape == (B, 3, 3)
    assert inl.shape == (B, M)
    assert (np.asarray(n_inl) > 100).all()
    # padding never counted as inlier
    assert not np.asarray(inl)[:, 200:].any()


def test_ransac_degenerate_too_few_points():
    x0 = np.random.rand(5, 2).astype(np.float32) * 100
    F, mask = ransac_fundamental_np(x0, x0, threshold=2.0)
    assert not mask.any()


def test_topk_flat_exact_large_n():
    """topk_flat must be exactly top-k for the (N, k) combinations that crash
    the TPU compiler's plain lax.top_k lowering (N=307200, k=4000)."""
    import jax.numpy as jnp

    from deep_image_matching_tpu.ops.detect import topk_flat

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 307200)).astype(np.float32)
    vals, idx = topk_flat(jnp.asarray(x), 4000)
    vals, idx = np.asarray(vals), np.asarray(idx)
    for b in range(2):
        ref = np.sort(x[b])[::-1][:4000]
        np.testing.assert_allclose(np.sort(vals[b])[::-1], ref)
        # indices point at the right values
        np.testing.assert_allclose(x[b][idx[b]], vals[b])


def test_topk_flat_recursive_reduction():
    """The chunked reduction must recurse: at k=4096 over a 1440x1920 score
    map (N=2764800) the candidate set is 85*4096=348160 wide, which SIGABRTs
    the TPU compiler if reduced with one plain lax.top_k (pipeline_emitter
    span_size check; reproduced on v5e). Exactness check at that shape."""
    import jax.numpy as jnp

    from deep_image_matching_tpu.ops.detect import topk_flat

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 2764800)).astype(np.float32)
    vals, idx = topk_flat(jnp.asarray(x), 4096)
    vals, idx = np.asarray(vals), np.asarray(idx)
    ref = np.sort(x[0])[::-1][:4096]
    np.testing.assert_allclose(np.sort(vals[0])[::-1], ref)
    np.testing.assert_allclose(x[0][idx[0]], vals[0])


def test_topk_flat_small_n_passthrough():
    import jax.numpy as jnp

    from deep_image_matching_tpu.ops.detect import topk_flat

    x = np.random.default_rng(1).normal(size=(3, 1000)).astype(np.float32)
    vals, idx = topk_flat(jnp.asarray(x), 10)
    for b in range(3):
        np.testing.assert_allclose(
            np.sort(np.asarray(vals)[b])[::-1], np.sort(x[b])[::-1][:10]
        )


def test_nullspace_8x9_matches_qr():
    """Pallas lane-vectorized Householder null space == complete-QR null
    space (up to sign), including the pure-translation degeneracy where
    f_33 = 0."""
    from deep_image_matching_tpu.ops.pallas_nullspace import nullspace_8x9
    from deep_image_matching_tpu.ops.ransac import (
        _build_constraints,
        _solve_f_minimal,
    )

    rng = np.random.default_rng(3)
    N = 256
    p0 = rng.uniform(-1, 1, size=(N, 8, 2)).astype(np.float32)
    # half generic motion, half pure translation (F has f_33 = 0 there)
    shift = rng.uniform(-0.5, 0.5, size=(N, 1, 2)).astype(np.float32)
    p1 = np.where(
        (np.arange(N) % 2 == 0)[:, None, None],
        p0 + shift,
        rng.uniform(-1, 1, size=(N, 8, 2)).astype(np.float32),
    )
    A = np.asarray(_build_constraints(jnp.asarray(p0), jnp.asarray(p1)))

    f = np.asarray(nullspace_8x9(jnp.asarray(A), interpret=True))
    # unit norm
    np.testing.assert_allclose(np.linalg.norm(f, axis=-1), 1.0, atol=1e-5)
    # true null vectors: residual of the constraint system ~ 0
    res = np.abs(np.einsum("nij,nj->ni", A, f)).max()
    assert res < 1e-4, res

    # agrees with the QR reference direction (sign-invariant) on the
    # GENERIC systems. The pure-translation half is homography-degenerate
    # (all 8 points satisfy x1 = x0 + t, so any F = [e]_x T solves the
    # system — a >=3-dim null space); there both solvers return valid but
    # different members, which the residual check above already covers.
    F_ref = np.asarray(_solve_f_minimal(jnp.asarray(A))).reshape(N, 9)
    F_ref = F_ref / np.linalg.norm(F_ref, axis=-1, keepdims=True)
    dots = np.abs(np.einsum("ni,ni->n", f, F_ref))
    np.testing.assert_allclose(dots[1::2], 1.0, atol=1e-4)


def test_ransac_batch_pallas_solve_equals_qr():
    """The full batched RANSAC with the Pallas solve returns the same
    inlier sets as with the QR solve (same keys, same hypotheses)."""
    rng = np.random.default_rng(11)
    B, M = 2, 256
    p0 = rng.uniform(0, 1000, size=(B, M, 2)).astype(np.float32)
    # a known homography-free epipolar relation: shift + noise inliers,
    # random outliers for the last quarter
    p1 = p0 + np.array([30.0, -12.0], np.float32)
    out = slice(3 * M // 4, None)
    p1[:, out] = rng.uniform(0, 1000, size=(B, M // 4, 2)).astype(np.float32)
    mask = np.ones((B, M), bool)

    key = jax.random.PRNGKey(5)
    Fq, inq, nq = ransac_fundamental_batch(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(mask), key,
        threshold=2.0, iters=512, solve_impl="qr",
    )
    Fp, inp_, np_ = ransac_fundamental_batch(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(mask), key,
        threshold=2.0, iters=512, solve_impl="pallas",
    )
    # both recover the inlier structure; counts agree closely (solves are
    # the same math modulo fp rounding, selection may tie-break differently)
    assert np.asarray(nq).min() > 0.9 * (3 * M // 4)
    assert np.asarray(np_).min() > 0.9 * (3 * M // 4)
    agree = (np.asarray(inq) == np.asarray(inp_)).mean()
    assert agree > 0.98, agree
