"""RoMa FULL-MODEL conversion parity vs the vendored torch reference.

Block-level parity (``tests/test_roma.py``) golden-tests GP posterior,
cls_to_flow, local correlation, refiners, and attenuation in isolation; this
test catches *wiring* bugs between those blocks: it constructs the COMPLETE
vendored torch RoMa (``thirdparty/RoMa/roma/models/model_zoo/roma_models.py:
roma_model`` — VGG19-BN + DINOv2 ViT-L encoder, GP + transformer embedding
decoder, 5-scale ConvRefiner cascade, symmetric forward, certainty
attenuation) with random weights, converts the state dict through
``models/roma.py::params_from_torch``, and compares the final warp +
certainty fields elementwise.

torchvision is absent offline; ``scripts/torch_shims/torchvision`` provides
the exact ``vgg19_bn().features`` topology. DINOv2 ViT-L is vendored inside
RoMa itself (``roma/models/transformer/dinov2.py``) and gets a random
state dict, so no hub access is needed.
"""

import importlib
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

ROMA_DIR = "/root/reference/src/deep_image_matching/thirdparty/RoMa"
SHIMS = str(Path(__file__).resolve().parents[1] / "scripts" / "torch_shims")


def _import_roma():
    if not Path(ROMA_DIR).is_dir():
        pytest.skip("reference RoMa checkout not available")
    # the real-shim torchvision must win over test stubs other modules set;
    # cached reference-roma modules hold references to whichever torchvision
    # they imported under (test_roma.py's minimal stub lacks vgg19_bn), so
    # purge them too and re-import under the real shim
    for mod in [
        m for m in list(sys.modules)
        if m.startswith("torchvision") or m == "roma" or m.startswith("roma.")
    ]:
        del sys.modules[mod]
    for p in (SHIMS, ROMA_DIR):
        if p not in sys.path:
            sys.path.insert(0, p)
    import torchvision  # noqa: F401  (shim)

    return importlib.import_module("roma.models.model_zoo.roma_models")


def _build_torch_roma(res=224):
    rmz = _import_roma()
    from roma.models.transformer import vit_large

    torch.manual_seed(7)
    vit = vit_large(
        img_size=518, patch_size=14, init_values=1.0, ffn_layer="mlp",
        block_chunks=0,
    ).eval()
    vit_sd = {k: v.clone() for k, v in vit.state_dict().items()}

    orig_cls = rmz.RegressionMatcher

    class _NoLoad(orig_cls):
        def load_state_dict(self, *a, **k):  # weights stay at random init
            return None

    rmz.RegressionMatcher = _NoLoad
    try:
        torch.manual_seed(11)
        matcher = rmz.roma_model(
            resolution=(res, res), upsample_preds=False, weights=None,
            dinov2_weights=vit_sd, device="cpu",
        )
    finally:
        rmz.RegressionMatcher = orig_cls
    matcher.eval()
    # run everything f32 on CPU: the reference's fp16 ViT cast is a CUDA
    # speed mode, not semantics (encoders.py:124-141)
    enc = matcher.encoder
    enc.amp = False
    enc.amp_dtype = torch.float32
    enc.cnn.amp = False
    enc.dinov2_vitl14[0] = enc.dinov2_vitl14[0].float().eval()
    # non-trivial BN folding: randomize running stats
    gen = torch.Generator().manual_seed(5)
    for m in matcher.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2, generator=gen)
            m.running_var.uniform_(0.5, 1.5, generator=gen)
    return matcher, vit_sd


def test_roma_full_model_parity():
    from deep_image_matching_tpu.models import roma as jroma

    RES = 224
    matcher, vit_sd = _build_torch_roma(RES)

    torch.manual_seed(3)
    imA = torch.rand(1, 3, RES, RES)
    imB = torch.rand(1, 3, RES, RES)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    with torch.no_grad():
        warp_t, cert_t = matcher.match(
            (imA - mean) / std, (imB - mean) / std, batched=True, device="cpu"
        )
    warp_t = warp_t.numpy()  # (B, H, 2W, 4)
    cert_t = cert_t.numpy()  # (B, H, 2W), sigmoid probabilities
    flow_ab_t = warp_t[0, :, :RES, 2:]
    flow_ba_t = warp_t[0, :, RES:, :2]
    cert_a_t = cert_t[0, :, :RES]
    cert_b_t = cert_t[0, :, RES:]

    params = jroma.params_from_torch(
        matcher.state_dict(), dinov2_state_dict=vit_sd
    )
    jA = jnp.asarray(imA.numpy().transpose(0, 2, 3, 1))
    jB = jnp.asarray(imB.numpy().transpose(0, 2, 3, 1))
    flow_ab, cert_a, flow_ba, cert_b = jroma.match_pair_impl(
        params, jA, jB, compute_dtype="float32", decoder_dtype="float32",
        attenuate_cert=True,
    )

    def _post(flow, cert):
        """Reference output conditioning (matcher.py:830-838): zero the
        certainty where the flow leaves [-1,1], clamp, sigmoid."""
        flow = np.asarray(flow[0], np.float32)
        cert = np.asarray(cert[0], np.float32)
        if cert.ndim == 3:  # (H, W, 1) channel-last logits
            cert = cert[..., 0]
        oob = (np.abs(flow) > 1).any(-1)
        prob = 1.0 / (1.0 + np.exp(-cert))
        prob = np.where(oob, 0.0, prob)
        return np.clip(flow, -1, 1), prob

    flow_ab_j, cert_a_j = _post(flow_ab, cert_a)
    flow_ba_j, cert_b_j = _post(flow_ba, cert_b)

    assert flow_ab_j.shape == flow_ab_t.shape
    # one assertion over the full forward, both directions: normalized-coord
    # warp fields and certainty probabilities agree elementwise
    np.testing.assert_allclose(flow_ab_j, flow_ab_t, atol=2e-2)
    np.testing.assert_allclose(flow_ba_j, flow_ba_t, atol=2e-2)
    np.testing.assert_allclose(cert_a_j, cert_a_t, atol=2e-2)
    np.testing.assert_allclose(cert_b_j, cert_b_t, atol=2e-2)
    # and tightly on median error (guards against a systematic offset that a
    # loose atol would let through)
    assert np.median(np.abs(flow_ab_j - flow_ab_t)) < 2e-3
    assert np.median(np.abs(cert_a_j - cert_a_t)) < 2e-3
