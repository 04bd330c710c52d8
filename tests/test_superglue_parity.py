"""SuperGlue JAX vs torch reference parity (random weights, incl. BN folding
and masked-Sinkhorn padding equivalence)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

REF_SG_DIR = "/root/reference/src/deep_image_matching/thirdparty/SuperGluePretrainedNetwork"


@pytest.fixture(scope="module")
def ref_superglue():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_superglue_mod", f"{REF_SG_DIR}/models/superglue.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _build_ref_net(ref_superglue, iters=20):
    cls = ref_superglue.SuperGlue
    orig_lsd = cls.load_state_dict
    orig_load = torch.load
    cls.load_state_dict = lambda self, *a, **k: None  # skip bundled weights
    torch.load = lambda *a, **k: {}
    try:
        net = cls({"sinkhorn_iterations": iters, "match_threshold": 0.1}).eval()
    finally:
        cls.load_state_dict = orig_lsd
        torch.load = orig_load
    # randomize all params + BN buffers deterministically
    # modest weight scale: 18 random layers amplify fp noise chaotically
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.05)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    return net


def test_superglue_forward_parity(ref_superglue):
    from deep_image_matching_tpu.models.superglue import forward, params_from_torch

    iters = 20
    net = _build_ref_net(ref_superglue, iters)
    sd = net.state_dict()

    rng = np.random.default_rng(0)
    B, M, N, D = 1, 40, 52, 256
    H, W = 480, 640
    kpts0 = rng.uniform([0, 0], [W, H], size=(B, M, 2)).astype(np.float32)
    kpts1 = rng.uniform([0, 0], [W, H], size=(B, N, 2)).astype(np.float32)
    sc0 = rng.random((B, M)).astype(np.float32)
    sc1 = rng.random((B, N)).astype(np.float32)
    d0 = rng.normal(size=(B, M, D)).astype(np.float32)
    d1 = rng.normal(size=(B, N, D)).astype(np.float32)

    with torch.no_grad():
        ref = net(
            {
                "descriptors0": torch.from_numpy(d0.transpose(0, 2, 1)),
                "descriptors1": torch.from_numpy(d1.transpose(0, 2, 1)),
                "keypoints0": torch.from_numpy(kpts0),
                "keypoints1": torch.from_numpy(kpts1),
                "scores0": torch.from_numpy(sc0),
                "scores1": torch.from_numpy(sc1),
                "image0": torch.zeros(B, 1, H, W),
                "image1": torch.zeros(B, 1, H, W),
            }
        )
    ref_m0 = ref["matches0"].numpy()
    ref_s0 = ref["matching_scores0"].numpy()

    params = params_from_torch(sd)
    size = np.array([[W, H]], np.float32)

    # padded: M, N -> 64 capacity; result must be identical on valid slots
    cap = 64
    def pad(x, n, fill=0.0):
        out = np.full((B, cap) + x.shape[2:], fill, x.dtype)
        out[:, :n] = x
        return out

    mask0 = np.zeros((B, cap), bool); mask0[:, :M] = True
    mask1 = np.zeros((B, cap), bool); mask1[:, :N] = True
    out = forward(
        params,
        jnp.asarray(pad(kpts0, M)), jnp.asarray(pad(kpts1, N)),
        jnp.asarray(pad(sc0, M)), jnp.asarray(pad(sc1, N)),
        jnp.asarray(pad(d0, M)), jnp.asarray(pad(d1, N)),
        jnp.asarray(mask0), jnp.asarray(mask1),
        jnp.asarray(size), jnp.asarray(size),
        sinkhorn_iterations=iters,
        match_threshold=0.1,
    )
    got_m0 = np.asarray(out["matches0"])[:, :M]
    got_s0 = np.asarray(out["matching_scores0"])[:, :M]
    # 18 random layers amplify fp noise; only threshold-straddling entries
    # may flip. Confident matches must agree exactly.
    assert (got_m0 == ref_m0).mean() > 0.9
    confident = ref_s0 > 0.15
    assert (got_m0 == ref_m0)[confident].all()
    np.testing.assert_allclose(got_s0, ref_s0, atol=0.05)
    # padding never matches
    assert (np.asarray(out["matches0"])[:, M:] == -1).all()


def test_masked_sinkhorn_marginals():
    """Valid transport plan: rows/cols sum to their marginals; padding mass 0."""
    from deep_image_matching_tpu.models.superglue import (
        masked_log_optimal_transport,
    )

    rng = np.random.default_rng(1)
    B, M, N = 2, 24, 24
    m_true, n_true = 16, 20
    scores = rng.normal(size=(B, M, N)).astype(np.float32)
    mask0 = np.zeros((B, M), bool); mask0[:, :m_true] = True
    mask1 = np.zeros((B, N), bool); mask1[:, :n_true] = True
    Z = np.asarray(
        masked_log_optimal_transport(
            jnp.asarray(scores), jnp.asarray(mask0), jnp.asarray(mask1),
            jnp.asarray(1.0), 200,
        )
    )
    P = np.exp(Z)  # scaled by (m+n)
    # each valid row sums to ~1 (x m+n scaling / norm cancels)
    row_sums = P[0, :m_true].sum(axis=1)
    np.testing.assert_allclose(row_sums, 1.0, atol=1e-3)
    col_sums = P[0, :, :n_true].sum(axis=0)[: n_true]
    np.testing.assert_allclose(col_sums, 1.0, atol=1e-3)
    # padded rows carry no mass
    assert P[0, m_true:-1].sum() < 1e-6
