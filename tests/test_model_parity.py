"""Architecture-parity golden tests: JAX models vs the reference torch nets.

The reference's torch modules are imported read-only from /root/reference and
instantiated with RANDOM weights (the pretrained checkpoints need network
access). The random state_dict is converted with our torch->JAX converters
and both forwards are compared numerically. This validates that the JAX
reimplementation computes the *same function*, so ported pretrained weights
reproduce reference outputs.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

REF_LG_DIR = "/root/reference/src/deep_image_matching/thirdparty/LightGlue"
REF_SP_DIR = "/root/reference/src/deep_image_matching/thirdparty/SuperGluePretrainedNetwork"


def _random_superpoint_sd(seed=0):
    from deep_image_matching_tpu.models.superpoint import _CONV_LAYERS

    g = torch.Generator().manual_seed(seed)
    sd = {}
    for name, cin, cout, k in _CONV_LAYERS:
        fan_in = cin * k * k
        sd[f"{name}.weight"] = torch.randn(cout, cin, k, k, generator=g) * (
            2.0 / fan_in
        ) ** 0.5
        sd[f"{name}.bias"] = torch.randn(cout, generator=g) * 0.05
    return sd


@pytest.fixture(scope="module")
def ref_superpoint():
    if REF_SP_DIR not in sys.path:
        sys.path.insert(0, REF_SP_DIR)
    from models import superpoint as ref_sp  # noqa

    return ref_sp


@pytest.fixture(scope="module")
def ref_lightglue():
    # import the module file directly (the package __init__ pulls torchvision)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_lightglue_mod", f"{REF_LG_DIR}/lightglue/lightglue.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_superpoint_dense_parity(ref_superpoint, monkeypatch):
    from deep_image_matching_tpu.models.superpoint import (
        dense_forward,
        params_from_torch,
    )

    sd = _random_superpoint_sd()
    monkeypatch.setattr(
        torch.hub, "load_state_dict_from_url", lambda *a, **k: sd
    )
    net = ref_superpoint.SuperPoint({"max_keypoints": 512}).eval()

    rng = np.random.default_rng(0)
    img = rng.random((1, 1, 64, 96), dtype=np.float64).astype(np.float32)

    with torch.no_grad():
        x = torch.from_numpy(img)
        # reference dense path (forward up to NMS input)
        t = net.relu(net.conv1a(x))
        t = net.relu(net.conv1b(t))
        t = net.pool(t)
        t = net.relu(net.conv2a(t))
        t = net.relu(net.conv2b(t))
        t = net.pool(t)
        t = net.relu(net.conv3a(t))
        t = net.relu(net.conv3b(t))
        t = net.pool(t)
        t = net.relu(net.conv4a(t))
        t = net.relu(net.conv4b(t))
        cpa = net.relu(net.convPa(t))
        heat = net.convPb(cpa)
        heat = torch.nn.functional.softmax(heat, 1)[:, :-1]
        b, _, h, w = heat.shape
        heat = heat.permute(0, 2, 3, 1).reshape(b, h, w, 8, 8)
        ref_scores = heat.permute(0, 1, 3, 2, 4).reshape(b, h * 8, w * 8).numpy()
        cda = net.relu(net.convDa(t))
        ref_desc = net.convDb(cda).numpy()  # (1, 256, Hc, Wc)

    params = params_from_torch(sd)
    scores, desc = dense_forward(params, jnp.asarray(img.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(scores), ref_scores, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(desc).transpose(0, 3, 1, 2), ref_desc, atol=2e-5
    )


def test_superpoint_nms_and_sampling_parity(ref_superpoint):
    from deep_image_matching_tpu.ops.detect import sample_descriptors_sp, simple_nms

    rng = np.random.default_rng(1)
    scores = rng.random((2, 48, 64), dtype=np.float64).astype(np.float32)
    ref = ref_superpoint.simple_nms(torch.from_numpy(scores), 4).numpy()
    got = np.asarray(simple_nms(jnp.asarray(scores), 4))
    np.testing.assert_allclose(got, ref, atol=1e-6)

    desc_map = rng.normal(size=(1, 32, 6, 8)).astype(np.float32)  # (B,C,Hc,Wc)
    kpts = rng.uniform([0, 0], [8 * 8 - 1, 6 * 8 - 1], size=(40, 2)).astype(np.float32)
    ref_d = ref_superpoint.sample_descriptors(
        torch.from_numpy(kpts)[None], torch.from_numpy(desc_map), 8
    ).numpy()[0].T  # (K, C)
    got_d = np.asarray(
        sample_descriptors_sp(jnp.asarray(kpts), jnp.asarray(desc_map[0].transpose(1, 2, 0)))
    )
    np.testing.assert_allclose(got_d, ref_d, atol=1e-5)


def test_superpoint_full_extract_parity(ref_superpoint, monkeypatch):
    """End-to-end keypoints/scores/descriptors match the torch pipeline."""
    from deep_image_matching_tpu.models.superpoint import extract, params_from_torch

    sd = _random_superpoint_sd(seed=3)
    monkeypatch.setattr(torch.hub, "load_state_dict_from_url", lambda *a, **k: sd)
    net = ref_superpoint.SuperPoint(
        {"max_keypoints": 256, "keypoint_threshold": 0.014, "nms_radius": 4}
    ).eval()
    rng = np.random.default_rng(2)
    img = rng.random((1, 1, 80, 96), dtype=np.float64).astype(np.float32)
    with torch.no_grad():
        ref_out = net({"image": torch.from_numpy(img)})
    ref_kpts = ref_out["keypoints"][0].numpy()
    ref_scores = ref_out["scores"][0].numpy()
    ref_desc = ref_out["descriptors"][0].numpy().T  # (K, 256)

    params = params_from_torch(sd)
    out = extract(
        params,
        jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray([[80, 96]], dtype=jnp.int32),
        max_keypoints=256,
        nms_radius=4,
        keypoint_threshold=0.014,
        remove_borders=4,
    )
    mask = np.asarray(out["mask"][0])
    got_kpts = np.asarray(out["keypoints"][0])[mask]
    got_scores = np.asarray(out["scores"][0])[mask]
    got_desc = np.asarray(out["descriptors"][0])[mask]

    assert len(got_kpts) == len(ref_kpts)
    # order by (y, x) on both sides (torch uses nonzero order, ours top-k)
    def order(k):
        return np.lexsort((k[:, 0], k[:, 1]))

    oi, oj = order(got_kpts), order(ref_kpts)
    np.testing.assert_allclose(got_kpts[oi], ref_kpts[oj], atol=1e-4)
    np.testing.assert_allclose(got_scores[oi], ref_scores[oj], atol=1e-5)
    np.testing.assert_allclose(got_desc[oi], ref_desc[oj], atol=1e-4)


def test_lightglue_forward_parity(ref_lightglue, monkeypatch):
    from deep_image_matching_tpu.models.lightglue import forward, params_from_torch

    torch.manual_seed(0)
    n_layers = 3
    net = ref_lightglue.LightGlue(
        features=None,
        n_layers=n_layers,
        depth_confidence=-1,
        width_confidence=-1,
        flash=False,
        filter_threshold=0.01,
    ).eval()
    sd = net.state_dict()

    rng = np.random.default_rng(4)
    B, M, N, D = 2, 48, 56, 256
    kpts0 = rng.uniform([0, 0], [640, 480], size=(B, M, 2)).astype(np.float32)
    kpts1 = rng.uniform([0, 0], [640, 480], size=(B, N, 2)).astype(np.float32)
    desc0 = rng.normal(size=(B, M, D)).astype(np.float32)
    desc1 = rng.normal(size=(B, N, D)).astype(np.float32)
    size = np.array([[640, 480]] * B, np.float32)

    with torch.no_grad():
        ref_out = net(
            {
                "image0": {
                    "keypoints": torch.from_numpy(kpts0),
                    "descriptors": torch.from_numpy(desc0),
                    "image_size": torch.from_numpy(size),
                },
                "image1": {
                    "keypoints": torch.from_numpy(kpts1),
                    "descriptors": torch.from_numpy(desc1),
                    "image_size": torch.from_numpy(size),
                },
            }
        )
    ref_m0 = ref_out["matches0"].numpy()
    ref_s0 = ref_out["matching_scores0"].numpy()

    params = params_from_torch(sd, n_layers=n_layers)
    out = forward(
        params,
        jnp.asarray(kpts0), jnp.asarray(kpts1),
        jnp.asarray(desc0), jnp.asarray(desc1),
        jnp.ones((B, M), bool), jnp.ones((B, N), bool),
        jnp.asarray(size), jnp.asarray(size),
        filter_threshold=0.01,
    )
    got_m0 = np.asarray(out["matches0"])
    got_s0 = np.asarray(out["matching_scores0"])
    assert (got_m0 == ref_m0).mean() > 0.99  # allow fp tie-breaking wiggle
    np.testing.assert_allclose(got_s0, ref_s0, atol=2e-4)


@pytest.mark.parametrize("wc", [0.99, 0.2])
def test_lightglue_adaptive_parity(ref_lightglue, wc):
    """Adaptive depth + width pruning vs the reference per-pair path (B=1 so
    batch-level exit == per-pair exit). pruning_min_kpts=-1 mirrors torch's
    CPU threshold (lightglue.py pruning_keypoint_thresholds['cpu']).
    wc=0.2 actually prunes points with these random weights (verified: 4+5
    of 64+72 points dropped before the final layer); wc=0.99 is the preset
    operating point where random-weight matchability keeps everything."""
    from deep_image_matching_tpu.models.lightglue import forward, params_from_torch

    torch.manual_seed(1)
    n_layers = 5
    net = ref_lightglue.LightGlue(
        features=None,
        n_layers=n_layers,
        depth_confidence=0.95,
        width_confidence=wc,
        flash=False,
        filter_threshold=0.01,
    ).eval()
    sd = net.state_dict()

    rng = np.random.default_rng(7)
    M, N, D = 64, 72, 256
    kpts0 = rng.uniform([0, 0], [640, 480], size=(1, M, 2)).astype(np.float32)
    kpts1 = rng.uniform([0, 0], [640, 480], size=(1, N, 2)).astype(np.float32)
    desc0 = rng.normal(size=(1, M, D)).astype(np.float32)
    desc1 = rng.normal(size=(1, N, D)).astype(np.float32)
    size = np.array([[640, 480]], np.float32)

    with torch.no_grad():
        ref_out = net(
            {
                "image0": {
                    "keypoints": torch.from_numpy(kpts0),
                    "descriptors": torch.from_numpy(desc0),
                    "image_size": torch.from_numpy(size),
                },
                "image1": {
                    "keypoints": torch.from_numpy(kpts1),
                    "descriptors": torch.from_numpy(desc1),
                    "image_size": torch.from_numpy(size),
                },
            }
        )

    params = params_from_torch(sd, n_layers=n_layers)
    out = forward(
        params,
        jnp.asarray(kpts0), jnp.asarray(kpts1),
        jnp.asarray(desc0), jnp.asarray(desc1),
        jnp.ones((1, M), bool), jnp.ones((1, N), bool),
        jnp.asarray(size), jnp.asarray(size),
        filter_threshold=0.01,
        depth_confidence=0.95,
        width_confidence=wc,
        pruning_min_kpts=-1,
    )
    assert int(out["layers_run"]) == int(ref_out["stop"])
    ref_m0 = ref_out["matches0"].numpy()
    got_m0 = np.asarray(out["matches0"])
    assert (got_m0 == ref_m0).mean() > 0.99
    np.testing.assert_allclose(
        np.asarray(out["matching_scores0"]),
        ref_out["matching_scores0"].numpy(), atol=2e-4)


def test_lightglue_padding_invariance():
    """Padding extra invalid slots must not change valid matches."""
    from deep_image_matching_tpu.models.lightglue import forward, init_params

    params = init_params(jax.random.PRNGKey(1), n_layers=2)
    rng = np.random.default_rng(5)
    B, M, D = 1, 32, 256
    kpts = rng.uniform([0, 0], [640, 480], size=(B, M, 2)).astype(np.float32)
    desc = rng.normal(size=(B, M, D)).astype(np.float32)
    size = np.array([[640, 480]], np.float32)

    out_a = forward(
        params,
        jnp.asarray(kpts), jnp.asarray(kpts),
        jnp.asarray(desc), jnp.asarray(desc),
        jnp.ones((B, M), bool), jnp.ones((B, M), bool),
        jnp.asarray(size), jnp.asarray(size),
        filter_threshold=0.0,
    )
    P = 64
    kpts_p = np.concatenate([kpts, np.zeros((B, P - M, 2), np.float32)], 1)
    desc_p = np.concatenate([desc, rng.normal(size=(B, P - M, D)).astype(np.float32)], 1)
    mask_p = np.zeros((B, P), bool)
    mask_p[:, :M] = True
    out_b = forward(
        params,
        jnp.asarray(kpts_p), jnp.asarray(kpts_p),
        jnp.asarray(desc_p), jnp.asarray(desc_p),
        jnp.asarray(mask_p), jnp.asarray(mask_p),
        jnp.asarray(size), jnp.asarray(size),
        filter_threshold=0.0,
    )
    np.testing.assert_array_equal(
        np.asarray(out_a["matches0"])[0], np.asarray(out_b["matches0"])[0, :M]
    )
    np.testing.assert_allclose(
        np.asarray(out_a["matching_scores0"])[0],
        np.asarray(out_b["matching_scores0"])[0, :M],
        atol=5e-3,
    )
    # padded slots never match
    assert not np.asarray(out_b["valid0"])[0, M:].any()
