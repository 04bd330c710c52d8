"""AffNet/OriNet learned local-frame parity and property tests."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deep_image_matching_tpu.models import affnet as an  # noqa: E402

# (cin, cout, kernel, stride, pad) trunk shared by both nets
_TRUNK = [
    (1, 16, 3, 1, 1),
    (16, 16, 3, 1, 1),
    (16, 32, 3, 2, 1),
    (32, 32, 3, 1, 1),
    (32, 64, 3, 2, 1),
    (64, 64, 3, 1, 1),
]


def _make_state_dict(head_out, head_pad, seed=0):
    """Synthetic checkpoint in the upstream features.N naming: convs at
    0/3/6/9/12/15 (bias-free, BN affine=False at +1), head conv at 19."""
    g = torch.Generator().manual_seed(seed)
    sd = {}
    for i, (ci, co, k, _s, _p) in zip((0, 3, 6, 9, 12, 15), _TRUNK):
        sd[f"features.{i}.weight"] = torch.randn(co, ci, k, k, generator=g) * 0.2
        sd[f"features.{i + 1}.running_mean"] = torch.randn(co, generator=g) * 0.1
        sd[f"features.{i + 1}.running_var"] = torch.rand(co, generator=g) + 0.5
    sd["features.19.weight"] = torch.randn(head_out, 64, 8, 8, generator=g) * 0.05
    sd["features.19.bias"] = torch.randn(head_out, generator=g) * 0.1
    return sd


def _torch_features(sd, patches, head_pad):
    """Upstream AffNetFast/OriNetFast forward (input norm -> trunk -> tanh
    head -> adaptive average pool)."""
    x = patches[:, None]
    flat = x.reshape(x.shape[0], -1)
    mp = flat.mean(dim=1)
    sp = flat.std(dim=1) + 1e-7
    x = (x - mp.view(-1, 1, 1, 1)) / sp.view(-1, 1, 1, 1)
    for i, (_ci, _co, _k, s, p) in zip((0, 3, 6, 9, 12, 15), _TRUNK):
        x = F.conv2d(x, sd[f"features.{i}.weight"], None, stride=s, padding=p)
        x = F.batch_norm(
            x, sd[f"features.{i + 1}.running_mean"],
            sd[f"features.{i + 1}.running_var"], None, None, training=False,
        )
        x = F.relu(x)
    x = F.conv2d(x, sd["features.19.weight"], sd["features.19.bias"],
                 padding=head_pad)
    x = torch.tanh(x)
    return F.adaptive_avg_pool2d(x, 1).reshape(x.shape[0], -1)


def test_orinet_parity():
    sd = _make_state_dict(head_out=2, head_pad=1, seed=3)
    params = an.orinet_params_from_torch(sd)
    rng = np.random.default_rng(0)
    patches = rng.random((16, 32, 32)).astype(np.float32)
    with torch.no_grad():
        xy = _torch_features(sd, torch.from_numpy(patches), head_pad=1)
        ref = torch.atan2(xy[:, 0] + 1e-8, xy[:, 1] + 1e-8).numpy()
    got = np.asarray(an.orinet_angles(params, jnp.asarray(patches)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_affnet_parity():
    sd = _make_state_dict(head_out=3, head_pad=0, seed=4)
    params = an.affnet_params_from_torch(sd)
    rng = np.random.default_rng(1)
    patches = rng.random((16, 32, 32)).astype(np.float32)
    with torch.no_grad():
        xy = _torch_features(sd, torch.from_numpy(patches), head_pad=0)
        # upstream AffNetFast read-out + rectifyAffineTransformationUpToScale
        A = torch.zeros(16, 2, 2)
        A[:, 0, 0] = 1.0 + xy[:, 0]
        A[:, 1, 0] = xy[:, 1]
        A[:, 1, 1] = 1.0 + xy[:, 2]
        det = torch.sqrt(torch.abs(A[:, 0, 0] * A[:, 1, 1]
                                   - A[:, 1, 0] * A[:, 0, 1]) + 1e-10)
        b2a2 = torch.sqrt(A[:, 0, 1] ** 2 + A[:, 0, 0] ** 2) + 1e-10
        ref = torch.zeros(16, 2, 2)
        ref[:, 0, 0] = b2a2 / det
        ref[:, 1, 0] = (A[:, 1, 1] * A[:, 0, 1]
                        + A[:, 1, 0] * A[:, 0, 0]) / (b2a2 * det)
        ref[:, 1, 1] = det / b2a2
    got = np.asarray(an.affnet_shapes(params, jnp.asarray(patches)))
    np.testing.assert_allclose(got, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_rectify_upright_properties():
    """rectify(A) is det-1 lower-triangular and maps the same ellipse:
    R R^T == A A^T / |det A|."""
    rng = np.random.default_rng(2)
    A = rng.normal(0, 1, (64, 2, 2)).astype(np.float32)
    A += np.eye(2, dtype=np.float32)[None] * 2.0  # keep well-conditioned
    R = np.asarray(an.rectify_upright(jnp.asarray(A)))
    np.testing.assert_allclose(
        R[:, 0, 0] * R[:, 1, 1] - R[:, 0, 1] * R[:, 1, 0], 1.0, atol=1e-4
    )
    np.testing.assert_allclose(R[:, 0, 1], 0.0, atol=1e-7)
    det = np.abs(A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0])
    np.testing.assert_allclose(
        R @ np.swapaxes(R, -1, -2),
        A @ np.swapaxes(A, -1, -2) / det[:, None, None],
        rtol=1e-3, atol=1e-4,
    )


def test_learned_frames_in_extract_program():
    """keynet_hardnet_extract runs end-to-end with AffNet+OriNet params and
    produces finite descriptors; identity-shape AffNet output matches the
    shapeless path."""
    from deep_image_matching_tpu.models import hardnet as hn

    rng = np.random.default_rng(3)
    img = rng.random((1, 96, 128)).astype(np.float32)
    vhw = jnp.asarray([[96, 128]], np.int32)
    hn_params = hn.init_hardnet_params(jax.random.PRNGKey(0))
    out = hn.keynet_hardnet_extract(
        hn_params, jnp.asarray(img), vhw, max_keypoints=128,
        affnet_params=an.init_affnet_params(jax.random.PRNGKey(1)),
        orinet_params=an.init_orinet_params(jax.random.PRNGKey(2)),
    )
    descs = np.asarray(out["descriptors"])
    m = np.asarray(out["mask"])[0]
    assert m.sum() > 0
    assert np.isfinite(descs).all()
    norms = np.linalg.norm(descs[0][m], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
