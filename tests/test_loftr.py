"""LoFTR structural + parity tests.

Full-net parity vs the vendored torch LoFTR would require e2cnn/yacs deps
for the se2 variant; instead the torch-comparable pieces are golden-tested
(linear attention, sine position encoding, encoder layer) and the full JAX
pipeline is exercised end-to-end (shapes, masks, self-match sanity)."""

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

LOFTR_DIR = "/root/reference/src/deep_image_matching/thirdparty/se2loftr/src/loftr"


def _load_mod(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_linear_attention_parity():
    ref = _load_mod(
        "ref_linattn", f"{LOFTR_DIR}/loftr_module/linear_attention.py"
    )
    from deep_image_matching_tpu.models.loftr import linear_attention

    rng = np.random.default_rng(0)
    B, L, S, H, D = 2, 33, 47, 8, 32
    q = rng.normal(size=(B, L, H, D)).astype(np.float32)
    k = rng.normal(size=(B, S, H, D)).astype(np.float32)
    v = rng.normal(size=(B, S, H, D)).astype(np.float32)
    qm = np.ones((B, L), np.float32)
    km = np.ones((B, S), np.float32)
    km[:, 40:] = 0

    with torch.no_grad():
        out_ref = ref.LinearAttention()(
            torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
            torch.from_numpy(qm), torch.from_numpy(km),
        ).numpy()
    out = np.asarray(
        linear_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(qm), jnp.asarray(km),
        )
    )
    np.testing.assert_allclose(out, out_ref, atol=1e-4)


def test_sine_pos_encoding_parity():
    ref = _load_mod("ref_pe", f"{LOFTR_DIR}/utils/position_encoding.py")
    from deep_image_matching_tpu.models.loftr import sine_pos_encoding

    for bugfix in (True, False):
        pe_ref = ref.PositionEncodingSine(256, max_shape=(32, 40), temp_bug_fix=bugfix)
        x = torch.zeros(1, 256, 16, 24)
        ref_out = pe_ref(x)[0].numpy().transpose(1, 2, 0)
        got = np.asarray(sine_pos_encoding(16, 24, 256, bugfix))
        np.testing.assert_allclose(got, ref_out, atol=1e-5)


def test_encoder_layer_parity():
    sys.modules.setdefault(
        "ref_linattn2",
        _load_mod("ref_linattn2", f"{LOFTR_DIR}/loftr_module/linear_attention.py"),
    )
    # build the torch encoder layer manually from its definition
    ref_attn = sys.modules["ref_linattn2"]
    import torch.nn as nn

    class RefLayer(nn.Module):
        def __init__(self, d, h):
            super().__init__()
            self.dim = d // h
            self.nhead = h
            self.q_proj = nn.Linear(d, d, bias=False)
            self.k_proj = nn.Linear(d, d, bias=False)
            self.v_proj = nn.Linear(d, d, bias=False)
            self.attention = ref_attn.LinearAttention()
            self.merge = nn.Linear(d, d, bias=False)
            self.mlp = nn.Sequential(
                nn.Linear(d * 2, d * 2, bias=False),
                nn.ReLU(True),
                nn.Linear(d * 2, d, bias=False),
            )
            self.norm1 = nn.LayerNorm(d)
            self.norm2 = nn.LayerNorm(d)

        def forward(self, x, source):
            bs = x.size(0)
            q = self.q_proj(x).view(bs, -1, self.nhead, self.dim)
            k = self.k_proj(source).view(bs, -1, self.nhead, self.dim)
            v = self.v_proj(source).view(bs, -1, self.nhead, self.dim)
            msg = self.attention(q, k, v)
            msg = self.merge(msg.reshape(bs, -1, self.nhead * self.dim))
            msg = self.norm1(msg)
            msg = self.mlp(torch.cat([x, msg], dim=2))
            msg = self.norm2(msg)
            return x + msg

    torch.manual_seed(0)
    d, h = 64, 8
    net = RefLayer(d, h).eval()
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 20, d)).astype(np.float32)
    src = rng.normal(size=(1, 30, d)).astype(np.float32)
    with torch.no_grad():
        ref_out = net(torch.from_numpy(x), torch.from_numpy(src)).numpy()

    from deep_image_matching_tpu.models.loftr import _enc_layer

    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    p = {
        "q": {"w": jnp.asarray(sd["q_proj.weight"].T)},
        "k": {"w": jnp.asarray(sd["k_proj.weight"].T)},
        "v": {"w": jnp.asarray(sd["v_proj.weight"].T)},
        "merge": {"w": jnp.asarray(sd["merge.weight"].T)},
        "mlp1": {"w": jnp.asarray(sd["mlp.0.weight"].T)},
        "mlp2": {"w": jnp.asarray(sd["mlp.2.weight"].T)},
        "ln1": {"g": jnp.asarray(sd["norm1.weight"]), "b": jnp.asarray(sd["norm1.bias"])},
        "ln2": {"g": jnp.asarray(sd["norm2.weight"]), "b": jnp.asarray(sd["norm2.bias"])},
    }
    got = np.asarray(_enc_layer(jnp.asarray(x), jnp.asarray(src), p, None, None, h))
    np.testing.assert_allclose(got, ref_out, atol=1e-4)


def test_coarse_match_ground_truth():
    """Synthetic features with a known permutation: coarse matching must
    recover it exactly."""
    from deep_image_matching_tpu.models.loftr import coarse_match

    rng = np.random.default_rng(2)
    h0c, w0c = 8, 12
    L = h0c * w0c
    f0 = rng.normal(size=(1, L, 64)).astype(np.float32) * 3
    perm = rng.permutation(L)
    f1 = f0[:, perm] + rng.normal(scale=0.01, size=(1, L, 64)).astype(np.float32)

    i_ids, j_ids, conf, valid = coarse_match(
        jnp.asarray(f0), jnp.asarray(f1), (h0c, w0c), (h0c, w0c),
        max_matches=96, threshold=0.1,
    )
    i_ids, j_ids, valid = map(np.asarray, (i_ids, j_ids, valid))
    # border_rm=2 keeps a 4x8 interior on the query side, and the permuted
    # cell must land interior too -> ~10 surviving matches expected
    assert valid.sum() >= 8
    # recovered mapping equals the permutation: f1[perm[i]] == f0[i]
    inv = np.empty(L, int)
    inv[perm] = np.arange(L)
    for i, j in zip(i_ids[0][valid[0]], j_ids[0][valid[0]]):
        assert inv[i] == j


def test_fine_refine_recovers_offset():
    """A fine feature map shifted by 1 pixel: the soft-argmax offset must
    point at the true displacement."""
    from deep_image_matching_tpu.models import loftr as lm

    params = lm.init_params(jax.random.PRNGKey(0))
    # identity fine_pre / transformer would be ideal; instead test the
    # full fine_refine end-to-end with a distinctive blob pattern
    rng = np.random.default_rng(3)
    Hf = Wf = 32
    Cf = 128
    ff0 = np.zeros((1, Hf, Wf, Cf), np.float32)
    # a bright blob at the window center of cell (4, 4): fine pixel (16, 16)
    ff0[0, 16, 16] = 10.0
    dx = 1
    ff1 = np.roll(ff0, dx, axis=2)
    fc = rng.normal(size=(1, 64, lm.D_COARSE)).astype(np.float32)
    i_ids = jnp.asarray([[4 * 8 + 4]])  # cell (4, 4) on an 8x8 coarse grid
    j_ids = jnp.asarray([[4 * 8 + 4]])
    valid = jnp.asarray([[True]])
    out = lm.fine_refine(
        params, jnp.asarray(ff0), jnp.asarray(ff1), jnp.asarray(fc),
        jnp.asarray(fc), i_ids, j_ids, valid, (8, 8), (8, 8),
    )
    # offsets bounded by the window radius
    off = np.asarray(out)[0, 0]
    assert np.all(np.abs(off) <= lm.FINE_WINDOW // 2 + 1e-3)


def test_loftr_pipeline_shapes():
    from deep_image_matching_tpu.models import loftr as lm

    params = lm.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    img0 = rng.random((1, 96, 128, 1), dtype=np.float64).astype(np.float32)
    img1 = rng.random((1, 96, 128, 1), dtype=np.float64).astype(np.float32)
    out = lm.match_pair(params, jnp.asarray(img0), jnp.asarray(img1),
                        max_matches=128, threshold=0.0)
    out = {k: np.asarray(v) for k, v in out.items()}
    assert out["keypoints0"].shape == (1, 128, 2)
    m = out["mask"][0]
    k0 = out["keypoints0"][0][m]
    k1 = out["keypoints1"][0][m]
    if len(k0):
        assert k0[:, 0].max() < 128 and k0[:, 1].max() < 96
        assert k1[:, 0].max() < 128 + 8 and k1[:, 1].max() < 96 + 8


def test_coarse_match_blocked_parity():
    """The streaming (blocked) coarse matcher must agree with the dense
    one on arbitrary features, including when L is not a block multiple."""
    from deep_image_matching_tpu.models.loftr import (
        coarse_match,
        coarse_match_blocked,
    )

    rng = np.random.default_rng(7)
    h0c, w0c = 9, 13
    h1c, w1c = 11, 10
    L, S = h0c * w0c, h1c * w1c
    f0 = rng.normal(size=(2, L, 64)).astype(np.float32) * 2
    f1 = rng.normal(size=(2, S, 64)).astype(np.float32) * 2
    # plant some strong mutual correspondences
    f1[:, 5:40] = f0[:, 20:55] + rng.normal(
        scale=0.01, size=(2, 35, 64)
    ).astype(np.float32)

    args = (jnp.asarray(f0), jnp.asarray(f1), (h0c, w0c), (h1c, w1c))
    di, dj, dc, dv = map(np.asarray, coarse_match(*args, max_matches=64))
    bi, bj, bc, bv = map(
        np.asarray, coarse_match_blocked(*args, max_matches=64, block=32)
    )
    # top_k order may differ between the two for near-tied confidences:
    # compare the match *sets* per batch element
    assert dv.sum() == bv.sum() > 0
    for b in range(2):
        dense = {
            (i, j): c
            for i, j, c in zip(di[b][dv[b]], dj[b][dv[b]], dc[b][dv[b]])
        }
        blocked = {
            (i, j): c
            for i, j, c in zip(bi[b][bv[b]], bj[b][bv[b]], bc[b][bv[b]])
        }
        assert dense.keys() == blocked.keys()
        for key, c in dense.items():
            np.testing.assert_allclose(blocked[key], c, rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# Full-model parity vs the vendored torch LoFTR (ResNetFPN backbone variant)
# ---------------------------------------------------------------------------

def _import_ref_full_loftr():
    """Import the vendored torch LoFTR package with its unused heavy deps
    (e2cnn / yacs / kornia) replaced by exact minimal stand-ins."""
    import types

    # --- yacs: a dict-backed CfgNode so cvpr_ds_config's lower_config works
    class _CN(dict):
        def __setattr__(self, k, v):
            self[k] = v

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:  # pragma: no cover
                raise AttributeError(k) from e

    yacs = types.ModuleType("yacs")
    yacs_config = types.ModuleType("yacs.config")
    yacs_config.CfgNode = _CN
    yacs.config = yacs_config

    # --- kornia: exact reimplementations of the two functions used
    def _create_meshgrid(h, w, normalized=True, device=None, dtype=None):
        ys = torch.linspace(-1, 1, h) if normalized else torch.arange(h).float()
        xs = torch.linspace(-1, 1, w) if normalized else torch.arange(w).float()
        gy, gx = torch.meshgrid(ys, xs, indexing="ij")
        return torch.stack([gx, gy], -1)[None]  # (1, h, w, 2) xy order

    def _spatial_expectation2d(heat, normalized=True):
        B, N, H, W = heat.shape
        grid = _create_meshgrid(H, W, normalized).reshape(1, 1, H * W, 2)
        return (heat.reshape(B, N, H * W, 1) * grid).sum(2)

    kornia = types.ModuleType("kornia")
    kgeom = types.ModuleType("kornia.geometry")
    ksubpix = types.ModuleType("kornia.geometry.subpix")
    kdsnt = types.ModuleType("kornia.geometry.subpix.dsnt")
    kdsnt.spatial_expectation2d = _spatial_expectation2d
    ksubpix.dsnt = kdsnt
    kgeom.subpix = ksubpix
    kornia.geometry = kgeom
    kutils = types.ModuleType("kornia.utils")
    kgrid = types.ModuleType("kornia.utils.grid")
    kgrid.create_meshgrid = _create_meshgrid
    kutils.grid = kgrid
    kornia.utils = kutils

    e2cnn = types.ModuleType("e2cnn")
    e2cnn.nn = types.ModuleType("e2cnn.nn")
    e2cnn.gspaces = types.ModuleType("e2cnn.gspaces")

    stubs = {
        "yacs": yacs, "yacs.config": yacs_config,
        "kornia": kornia, "kornia.geometry": kgeom,
        "kornia.geometry.subpix": ksubpix,
        "kornia.geometry.subpix.dsnt": kdsnt,
        "kornia.utils": kutils, "kornia.utils.grid": kgrid,
        "e2cnn": e2cnn, "e2cnn.nn": e2cnn.nn, "e2cnn.gspaces": e2cnn.gspaces,
    }
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)

    root = "/root/reference/src/deep_image_matching/thirdparty/se2loftr/src"
    spec = importlib.util.spec_from_file_location(
        "se2l_src", f"{root}/__init__.py",
        submodule_search_locations=[root],
    )
    pkg = importlib.util.module_from_spec(spec)
    sys.modules["se2l_src"] = pkg
    spec.loader.exec_module(pkg)
    loftr_mod = importlib.import_module("se2l_src.loftr")
    return loftr_mod.LoFTR, saved


def test_loftr_full_model_parity():
    """Convert a randomly initialized vendored torch LoFTR and compare the
    FULL pipeline (backbone -> coarse transformer -> dual-softmax coarse
    match -> fine refinement) match-for-match, both coarse impls."""
    LoFTR, _ = _import_ref_full_loftr()
    from deep_image_matching_tpu.models import loftr as jloftr

    cfg = {
        "backbone_type": "ResNetFPN",
        "resolution": (8, 2),
        "fine_window_size": 5,
        "fine_concat_coarse_feat": True,
        "resnetfpn": {"initial_dim": 128, "block_dims": [128, 196, 256]},
        "coarse": {
            "d_model": 256, "d_ffn": 256, "nhead": 8,
            "layer_names": ["self", "cross"] * 4,
            "attention": "linear", "temp_bug_fix": False,
        },
        "match_coarse": {
            "thr": 1e-4, "border_rm": 2, "match_type": "dual_softmax",
            "dsmax_temperature": 0.1, "skh_iters": 3,
            "skh_init_bin_score": 1.0, "skh_prefilter": True,
            "train_coarse_percent": 0.4, "train_pad_num_gt_min": 200,
        },
        "fine": {
            "d_model": 128, "d_ffn": 128, "nhead": 8,
            "layer_names": ["self", "cross"], "attention": "linear",
        },
    }
    torch.manual_seed(11)
    model = LoFTR(cfg).eval()
    # randomize BN running stats so the conv+BN folding is non-trivial
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.5, 1.5)

    # IDENTICAL images: with random weights, a deep convnet's coarse features
    # are chaotic in position (even a 6 px sub-cell shift fully decorrelates
    # them — measured: 3 surviving matches), but self-similarity is real, so
    # the identical pair yields ~70 mutual-NN matches on the i==j diagonal
    # with genuine argmax margins that f32 accumulation noise cannot flip.
    # Two independent noise images give a near-uniform dual softmax where
    # almost nothing clears thr and survivors are noise-ties.
    H, W = 120, 160
    torch.manual_seed(3)
    img0 = torch.rand(1, 1, H, W)
    img1 = img0.clone()
    data = {"image0": img0, "image1": img1}
    with torch.no_grad():
        model(data)
    ref_k0 = data["mkpts0_f"].numpy()
    ref_k1 = data["mkpts1_f"].numpy()
    ref_conf = data["mconf"].numpy()
    assert len(ref_k0) >= 50, f"expected many diagonal matches, got {len(ref_k0)}"
    # sanity on the reference itself: coarse matches sit on the diagonal, so
    # k1 deviates from k0 by at most the fine window half-extent (2 fine px
    # * stride 2 = 4 px).  The fine offsets themselves are NOT near zero —
    # random-weight features rank-collapse onto a shared coarse-context
    # direction, so the soft-argmax lands anywhere in the window — but the
    # soft-argmax is continuous in the similarities, so torch-vs-JAX parity
    # below is still tight.
    diag = np.abs(ref_k1 - ref_k0).max(axis=1)
    assert diag.max() <= 4.01

    params = jloftr.params_from_torch(model.state_dict())
    j0 = jnp.asarray(img0.numpy().transpose(0, 2, 3, 1))
    j1 = jnp.asarray(img1.numpy().transpose(0, 2, 3, 1))

    # --- continuous check: rebuild the coarse confidence matrix from the
    # converted params through the JAX backbone + coarse transformer and
    # compare against the torch conf_matrix elementwise.  This catches any
    # conversion drift (conv/BN folding, attention, FFN) without being
    # subject to the discrete argmax tie-flips below.
    ref_cm = data["conf_matrix"][0].numpy()  # (L, S)
    fc0_map, _ = jloftr.backbone_forward(params, j0)
    fc1_map, _ = jloftr.backbone_forward(params, j1)
    hc, wc = fc0_map.shape[1:3]
    pe = jloftr.sine_pos_encoding(hc, wc, jloftr.D_COARSE, False)
    fc0 = (fc0_map + pe[None]).reshape(1, hc * wc, jloftr.D_COARSE)
    fc1 = (fc1_map + pe[None]).reshape(1, hc * wc, jloftr.D_COARSE)
    fc0, fc1 = jloftr.transformer(
        fc0, fc1, params["coarse"], None, None, jloftr.NHEAD)
    C = jloftr.D_COARSE
    sim = np.einsum(
        "lc,sc->ls", np.asarray(fc0[0]) / C**0.5, np.asarray(fc1[0]) / C**0.5
    ) / 0.1
    def _sm(x, ax):
        e = np.exp(x - x.max(axis=ax, keepdims=True))
        return e / e.sum(axis=ax, keepdims=True)
    my_cm = _sm(sim, 0) * _sm(sim, 1)
    # conf amplifies sim drift by e^(2*dsim/T): a few isolated cells with
    # conf ~O(0.1..1) land at ~5% error from f32 accumulation-order noise
    # (measured: 52/90000 cells above 2e-3, max 0.069).  Quantile bounds
    # catch a systematic conversion bug (which shifts whole rows) while
    # tolerating that tail.
    err = np.abs(my_cm - ref_cm)
    assert err.max() < 0.15, err.max()
    assert (err > 2e-3).mean() < 1e-3, (err > 2e-3).mean()
    assert np.median(err) < 1e-5

    # --- discrete check: the coarse selection applies exact `conf == max`
    # mutual-NN comparisons, and the rank-collapsed random-weight features
    # put neighboring cells within f32 noise of each other, so a ~10% count
    # difference from tie-flips is intrinsic (measured 82 vs 74).  Require
    # high overlap, and tight fine-keypoint/conf parity on the overlap.
    ref = {
        tuple(np.round(p0).astype(int)): (p1, c)
        for p0, p1, c in zip(ref_k0, ref_k1, ref_conf)
    }
    for impl in ("dense", "blocked"):
        out = jloftr.match_pair_impl(
            params, j0, j1, max_matches=512, threshold=1e-4,
            coarse_impl=impl,
        )
        m = np.asarray(out["mask"])[0]
        k0 = np.asarray(out["keypoints0"])[0][m]
        k1 = np.asarray(out["keypoints1"])[0][m]
        conf = np.asarray(out["confidence"])[0][m]
        assert abs(len(k0) - len(ref_k0)) <= len(ref_k0) // 5, (
            impl, len(k0), len(ref_k0))
        n_shared = 0
        for p0, p1, c in zip(k0, k1, conf):
            key = tuple(np.round(p0).astype(int))
            if key not in ref:
                continue
            rp1, rc = ref[key]
            n_shared += 1
            # subpixel tolerance: random-weight fine sims are large, so the
            # soft-argmax acts as a near-hard mixture of deltas and f32 sim
            # drift moves mixture weights by a fraction of a pixel (measured
            # 0.36 px worst case); a real windowing/scale bug shifts by >= 1
            # fine pixel (2 px) or more
            np.testing.assert_allclose(p1, rp1, atol=1.0)
            # conf = softmax_row(sim/T)*softmax_col(sim/T) with T=0.1
            # amplifies sim drift by e^(2*dsim/T) (measured up to ~6% on
            # these O(0.2) matches); the conf-matrix quantile check above is
            # the tight parity guard, this only catches gross scale bugs
            np.testing.assert_allclose(c, rc, rtol=0.3, atol=1e-3)
        assert n_shared >= int(0.8 * len(ref_k0)), (impl, n_shared, len(ref_k0))
