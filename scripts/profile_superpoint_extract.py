"""SuperPoint extraction budget on TPU (VERDICT round-3 weak #5).

Splits the extraction stage into its real costs and reports TF/s for the
conv backbone plus the NMS/top-k/descriptor-sampling tail:
- host: JPEG decode + grayscale (cv2, 1 core)
- upload: uint8 batch host->device
- device: dense_forward (conv backbone + heads) alone, then the full fused
  ``extract`` program (adds simple_nms, select_topk, bilinear sampling)
- analytic conv FLOPs -> achieved TF/s and % of v5e bf16 peak, f32 vs bf16

Usage: python scripts/profile_superpoint_extract.py [--b 8] [--hw 1024]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "src"))

V5E_BF16_PEAK = 197.0  # TFLOP/s
V5E_F32_PEAK = 49.2


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def conv_backbone_flops(H, W):
    """Analytic forward FLOPs for one image (3x3 convs = 2*H*W*Cin*Cout*9)."""
    f = 0.0
    def c3(h, w, ci, co):
        return 2.0 * h * w * ci * co * 9
    def c1(h, w, ci, co):
        return 2.0 * h * w * ci * co
    f += c3(H, W, 1, 64) + c3(H, W, 64, 64)                  # conv1a/b
    f += c3(H // 2, W // 2, 64, 64) * 2                      # conv2a/b
    f += c3(H // 4, W // 4, 64, 128) + c3(H // 4, W // 4, 128, 128)
    f += c3(H // 8, W // 8, 128, 128) * 2                    # conv4a/b
    f += c3(H // 8, W // 8, 128, 256) + c1(H // 8, W // 8, 256, 65)  # det
    f += c3(H // 8, W // 8, 128, 256) + c1(H // 8, W // 8, 256, 256)  # desc
    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--hw", type=int, default=1024)
    ap.add_argument("--k", type=int, default=2048)
    args = ap.parse_args()
    B, H = args.b, args.hw
    W = H

    import cv2
    import jax
    import jax.numpy as jnp

    from deep_image_matching_tpu.models import superpoint as sp

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    log(f"device: {dev}, batch {B} @ {H}x{W}, k={args.k}")

    # --- host side: JPEG decode ------------------------------------------
    src = Path(
        "/root/reference/assets/example_sacre_coeur/images/sacre_coeur_A.jpg"
    )
    if src.exists():
        base = cv2.imread(str(src))
        mosaic = np.tile(base, (H // base.shape[0] + 2,
                                W // base.shape[1] + 2, 1))
        tmp = Path("/dev/shm/sp_budget.jpg")
        cv2.imwrite(str(tmp), mosaic[:H, :W])
        t0 = time.perf_counter()
        for _ in range(8):
            img = cv2.imread(str(tmp), cv2.IMREAD_GRAYSCALE)
        t_decode = (time.perf_counter() - t0) / 8
        tmp.unlink()
        log(f"host JPEG decode+gray {H}px: {t_decode*1000:.1f} ms/img "
            f"({1/t_decode:.0f} img/s/core)")

    params = sp.init_params(jax.random.PRNGKey(0))
    imgs_u8 = (np.random.default_rng(0)
               .uniform(0, 255, (B, H, W, 1)).astype(np.uint8))
    vhw = jnp.tile(jnp.array([[H, W]], jnp.int32), (B, 1))

    # --- upload ------------------------------------------------------------
    t0 = time.perf_counter()
    dimgs = jax.device_put(imgs_u8)
    dimgs.block_until_ready()
    t_upload = time.perf_counter() - t0
    log(f"uint8 upload {B}x{H}x{W}: {t_upload*1000:.1f} ms "
        f"({imgs_u8.nbytes/1e6:.1f} MB)")

    dense_jit = jax.jit(sp.dense_forward, static_argnames=("compute_dtype",))

    for cdt, peak in (("bfloat16", V5E_BF16_PEAK), ("float32", V5E_F32_PEAK)):
        if not on_tpu and cdt == "bfloat16":
            continue
        # dense backbone alone
        out = dense_jit(params, dimgs, compute_dtype=cdt)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        R = 10
        for _ in range(R):
            out = dense_jit(params, dimgs, compute_dtype=cdt)
        jax.block_until_ready(out)
        t_dense = (time.perf_counter() - t0) / R
        fl = conv_backbone_flops(H, W) * B
        log(
            f"[{cdt}] dense_forward: {t_dense*1000:.1f} ms/batch "
            f"({B/t_dense:.0f} img/s) analytic {fl/1e9:.0f} GF -> "
            f"{fl/t_dense/1e12:.1f} TF/s = "
            f"{fl/t_dense/1e12/peak*100:.0f}% of {cdt} peak"
        )
        # full extract (adds norm + NMS + top-k + sampling)
        full = sp.extract(params, dimgs, vhw, max_keypoints=args.k,
                          compute_dtype=cdt)
        jax.block_until_ready(full)
        t0 = time.perf_counter()
        for _ in range(R):
            full = sp.extract(params, dimgs, vhw, max_keypoints=args.k,
                              compute_dtype=cdt)
        jax.block_until_ready(full)
        t_full = (time.perf_counter() - t0) / R
        log(
            f"[{cdt}] extract (full): {t_full*1000:.1f} ms/batch "
            f"({B/t_full:.0f} img/s); NMS/top-k/sampling tail: "
            f"{(t_full-t_dense)*1000:.1f} ms/batch "
            f"({(t_full-t_dense)/t_full*100:.0f}% of extract)"
        )


if __name__ == "__main__":
    main()
