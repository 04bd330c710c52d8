"""ALIKED extraction budget on TPU (round 5).

The tiled bench scenario (2.88 pairs/s) and the real-weight default path
(91 pairs/s) are both bounded by ALIKED device time (~50 ms/MP measured
end-to-end); this script splits that cost into its real stages so the
number is a budget, not a guess:

- ``dense_forward``  : conv backbone (ConvBlock + ResBlocks with DCN) +
                       multi-scale aggregation + score head + f32 L2 norm
- ``+ dkd_detect``   : NMS, masked top-k, soft-argmax refinement
- ``extract`` (full) : adds the SDDH deformable descriptor head

FLOPs come from XLA's own cost analysis of the compiled program (the DCN
gathers and bilinear upsamplings make an analytic count misleading), so
TF/s and %-of-peak are for the program XLA actually runs.

Usage: python scripts/profile_aliked_extract.py [--b 2] [--hw 1216]
       (defaults mirror the tiled scenario's 2-tiles-per-program bucket;
        --b 4 --hw 1024 mirrors the aliked default-path bucket)

Reference context: the upstream runs the vendored torch ALIKED
(``thirdparty/LightGlue/lightglue/aliked.py:560-693``) one image at a
time with a CUDA ``get_patches`` op; here the whole batch is one XLA
program (models/aliked.py).
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


def bench(fn, fetch, reps=10):
    """Time ``fn`` with a tiny device fetch as the sync barrier.

    Under the axon remote plugin ``block_until_ready`` can return before
    the remote computation finishes (measured: a 70 GF program "timed" at
    0.1 ms); fetching a 2-element slice of the result forces completion.
    The single fetch RTT is amortized over ``reps`` dispatches.
    """
    out = fn()
    import jax

    jax.block_until_ready(out)
    _ = np.asarray(fetch(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    _ = np.asarray(fetch(out))
    return (time.perf_counter() - t0) / reps


def xla_flops(jitted, *args, **kw):
    try:
        cost = jitted.lower(*args, **kw).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception as e:  # pragma: no cover - platform dependent
        log(f"  (cost_analysis unavailable: {e})")
        return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--hw", type=int, default=1216)
    ap.add_argument("--k", type=int, default=2048)
    ap.add_argument("--model", default="aliked-n16rot")
    args = ap.parse_args()
    B, H = args.b, args.hw
    W = H

    import functools

    import jax
    import jax.numpy as jnp

    from deep_image_matching_tpu.extractors.aliked import load_params
    from deep_image_matching_tpu.models import aliked as al

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    log(f"device: {dev}, batch {B} @ {H}x{W}, k={args.k}, {args.model}")
    mp = B * H * W / 1e6

    params = load_params(args.model)
    imgs_u8 = (
        np.random.default_rng(0).uniform(0, 255, (B, H, W, 3)).astype(np.uint8)
    )
    dimgs = jax.device_put(imgs_u8)
    vhw = jnp.tile(jnp.array([[H, W]], jnp.int32), (B, 1))

    dense_jit = jax.jit(al.dense_forward, static_argnames=("compute_dtype",))

    @functools.partial(
        jax.jit, static_argnames=("max_keypoints", "compute_dtype")
    )
    def dense_plus_dkd(params, images, valid_hw, max_keypoints,
                       compute_dtype):
        fmap, smap = al.dense_forward(params, images, compute_dtype)
        return al.dkd_detect(smap, valid_hw, max_keypoints,
                             detection_threshold=0.2, nms_radius=2)

    for cdt, peak in (("bfloat16", V5E_BF16_PEAK), ("float32", V5E_F32_PEAK)):
        if not on_tpu and cdt == "bfloat16":
            continue
        t_dense = bench(
            lambda: dense_jit(params, dimgs, compute_dtype=cdt),
            lambda o: o[1][0, :2, 0],
        )
        fl = xla_flops(dense_jit, params, dimgs, compute_dtype=cdt)
        log(
            f"[{cdt}] dense_forward: {t_dense*1000:.1f} ms/batch "
            f"({t_dense*1000/mp:.1f} ms/MP) XLA {fl/1e9:.0f} GF -> "
            f"{fl/t_dense/1e12:.1f} TF/s = "
            f"{fl/t_dense/1e12/peak*100:.0f}% of {cdt} peak"
        )
        t_dd = bench(
            lambda: dense_plus_dkd(params, dimgs, vhw,
                                   max_keypoints=args.k, compute_dtype=cdt),
            lambda o: o[0][0, :2, 0],
        )
        log(
            f"[{cdt}] + dkd_detect: {t_dd*1000:.1f} ms/batch "
            f"(DKD tail {max(t_dd-t_dense, 0)*1000:.1f} ms)"
        )
        t_full = bench(
            lambda: al.extract(params, dimgs, vhw, max_keypoints=args.k,
                               model_name=args.model, compute_dtype=cdt),
            lambda o: o["scores"][0, :2],
        )
        log(
            f"[{cdt}] extract (full): {t_full*1000:.1f} ms/batch "
            f"({t_full*1000/mp:.1f} ms/MP, {B/t_full:.1f} img/s); "
            f"SDDH tail {max(t_full-t_dd, 0)*1000:.1f} ms "
            f"({max(t_full-t_dd, 0)/t_full*100:.0f}% of extract)"
        )


if __name__ == "__main__":
    main()
