"""DeDoDe descriptor-G FULL-MODEL conversion parity vs the vendored torch
reference.

Block-level parity (``tests/test_dedode.py``) golden-tests the shared
ConvRefiner; this test catches *wiring* bugs: it constructs the COMPLETE
vendored descriptor-G (``thirdparty/DeDoDe/DeDoDe/model_zoo/dedode_models.py:
177-241`` — VGG19-BN + frozen DINOv2 ViT-L dual encoder, 5-scale
residual-ConvRefiner decoder with context chaining, grid-sampled keypoint
descriptors) with random weights, converts the state dict through
``models/dedode.py::descriptor_g_params_from_torch``, and compares the
sampled descriptors elementwise.

The vendored package uses ``from ...DeDoDe.utils import ...`` (it expects to
live nested inside a parent package), so the test materializes a one-level
wrapper package in tmp_path with a symlink to the read-only checkout.
torchvision is absent offline; ``scripts/torch_shims/torchvision`` provides
``models.vgg19_bn`` and the ``transforms`` subset the package imports.
"""

import importlib
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax.numpy as jnp

pytestmark = pytest.mark.slow

DEDODE_DIR = Path(
    "/root/reference/src/deep_image_matching/thirdparty/DeDoDe/DeDoDe"
)
SHIMS = str(Path(__file__).resolve().parents[1] / "scripts" / "torch_shims")


def _import_dedode(tmp_path):
    if not DEDODE_DIR.is_dir():
        pytest.skip("reference DeDoDe checkout not available")
    # the real-shim torchvision must win over test stubs other modules set
    for mod in [m for m in list(sys.modules) if m.startswith("torchvision")]:
        del sys.modules[mod]
    wrap = tmp_path / "ddwrap"
    wrap.mkdir(exist_ok=True)
    (wrap / "__init__.py").write_text("")
    link = wrap / "DeDoDe"
    if not link.exists():
        link.symlink_to(DEDODE_DIR)
    for p in (SHIMS, str(tmp_path)):
        if p not in sys.path:
            sys.path.insert(0, p)
    import torchvision  # noqa: F401  (shim)

    return importlib.import_module("ddwrap.DeDoDe")


def test_dedode_descriptor_g_full_model_parity(tmp_path):
    from deep_image_matching_tpu.models import dedode as jdedode

    DD = _import_dedode(tmp_path)
    vit_large = importlib.import_module(
        "ddwrap.DeDoDe.transformer"
    ).vit_large

    torch.manual_seed(7)
    vit = vit_large(
        img_size=518, patch_size=14, init_values=1.0, ffn_layer="mlp",
        block_chunks=0,
    ).eval()
    vit_sd = {k: v.clone() for k, v in vit.state_dict().items()}

    torch.manual_seed(11)
    model = DD.dedode_descriptor_G(
        device="cpu", weights=None, dinov2_weights=vit_sd
    ).eval()
    # run everything f32 on CPU: the fp16 ViT cast is a CUDA speed mode, not
    # semantics (encoder.py:79-81); reload the f32 weights after un-casting
    fro = model.encoder.frozen_dinov2
    fro.amp = False
    fro.amp_dtype = torch.float32
    fro.dinov2_vitl14[0] = fro.dinov2_vitl14[0].float().eval()
    fro.dinov2_vitl14[0].load_state_dict(vit_sd)
    model.encoder.vgg.amp = False
    for m in model.decoder.modules():
        if hasattr(m, "amp"):
            m.amp = False
    # non-trivial BN folding: randomize running stats
    gen = torch.Generator().manual_seed(5)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2, generator=gen)
            m.running_var.uniform_(0.5, 1.5, generator=gen)

    H = W = 168  # multiple of 14 (ViT patches) and 8 (VGG pools)
    K = 100
    torch.manual_seed(3)
    img = torch.rand(1, 3, H, W)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    # normalized grid_sample coords; the jax path takes pixels mapped through
    # the repo's align_corners=True pixel->normalized convention, so choose
    # pixels that round-trip to exactly these normalized coords
    kn = torch.rand(1, K, 2) * 1.9 - 0.95
    with torch.no_grad():
        desc_t = model.describe_keypoints(
            {"image": (img - mean) / std}, kn
        )["descriptions"][0].numpy()
    desc_t = desc_t / np.maximum(
        np.linalg.norm(desc_t, axis=-1, keepdims=True), 1e-12
    )

    params = jdedode.descriptor_g_params_from_torch(
        model.state_dict(), dinov2_state_dict=vit_sd
    )
    kpx = np.stack(
        [
            (kn[0, :, 0].numpy() + 1.0) * (W - 1) / 2.0,
            (kn[0, :, 1].numpy() + 1.0) * (H - 1) / 2.0,
        ],
        axis=-1,
    )[None]
    desc_j = np.asarray(
        jdedode.describe_g(
            params,
            jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
            jnp.asarray(kpx),
            dino_dtype="float32",
        )[0]
    )

    assert desc_j.shape == desc_t.shape == (K, 256)
    # one assertion over the full forward: unit descriptors agree elementwise
    np.testing.assert_allclose(desc_j, desc_t, atol=2e-3)
    cos = (desc_j * desc_t).sum(-1)
    assert cos.min() > 0.9999
