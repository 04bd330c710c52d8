"""Stage-level RoMa profile on the live device (RTT-compensated).

Breaks the dense-match pair time into: DINOv2 ViT pyramid, VGG pyramid
(coarse + upsample res), GP+embedding decoder at 1/16, and each
ConvRefiner scale — so optimization effort goes where the milliseconds
are. Methodology per bench.py: dispatch R calls back-to-back, fetch a
4-byte reduction, subtract tunnel RTT.
"""

import sys
import time
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parents[1] / "src"
if _SRC.is_dir() and str(_SRC) not in sys.path:
    sys.path.insert(0, str(_SRC))


def main():
    import jax
    import jax.numpy as jnp

    from deep_image_matching_tpu.models import roma
    from deep_image_matching_tpu.models import dinov2
    from deep_image_matching_tpu.models.vgg_refiner import vgg19_features

    print("device:", jax.devices()[0], file=sys.stderr)
    params = roma.init_params(jax.random.PRNGKey(0), dinov2_depth=24)

    B = 1
    HC = WC = 560
    HU = WU = 864

    key = jax.random.PRNGKey(1)
    imgc = jax.random.uniform(key, (2 * B, HC, WC, 3), jnp.float32)
    imgu = jax.random.uniform(key, (2 * B, HU, WU, 3), jnp.float32)

    # rtt probe
    z = jnp.zeros(())
    for _ in range(3):
        float(z + 1)
    t0 = time.time()
    for _ in range(5):
        float(z + 1)
    rtt = (time.time() - t0) / 5
    print(f"rtt {rtt*1e3:.1f} ms", file=sys.stderr)

    def timeit(fn, fetch, reps=8, rounds=3):
        out = fn()
        fetch(out)  # compile + settle
        best = float("inf")
        for _ in range(rounds):
            t0 = time.time()
            for _ in range(reps):
                out = fn()
            fetch(out)
            best = min(best, (time.time() - t0 - rtt) / reps)
        return best * 1e3  # ms

    # --- stages ---
    # Params and pyramids are always jit ARGUMENTS, never closure captures:
    # closure-captured arrays are embedded in the serialized HLO shipped to
    # the axon remote-compile service (~GB of ViT weights -> 30 min upload).
    only = sys.argv[1] if len(sys.argv) > 1 else None

    if only in (None, "vit"):
        vit = jax.jit(lambda p, x: dinov2.forward_features(p, x))
        t = timeit(lambda: vit(params["dinov2"], imgc),
                   lambda o: float(jnp.sum(o[..., 0])))
        print(f"dinov2 vit24 @560 (2 imgs):      {t:8.1f} ms")
        if only == "vit":
            return

    vggc = jax.jit(lambda p, x: vgg19_features(p, x))
    t = timeit(lambda: vggc(params["vgg"], imgc),
               lambda o: float(jnp.sum(o[0][..., 0])))
    print(f"vgg19 pyramid @560 (2 imgs):     {t:8.1f} ms")

    t = timeit(lambda: vggc(params["vgg"], imgu),
               lambda o: float(jnp.sum(o[0][..., 0])))
    print(f"vgg19 pyramid @864 (2 imgs):     {t:8.1f} ms")
    if only == "vgg":
        return

    # pyramids for decode stages
    pyr = jax.jit(
        lambda p, x: roma.build_pyramid(p, x, compute_dtype="bfloat16")
    )(params, imgc)
    f_q = pyr
    f_s = {s: jnp.concatenate([v[B:], v[:B]], axis=0) for s, v in pyr.items()}

    def dec(scales):
        # one jit object per scale-prefix, reused across timing reps
        return jax.jit(
            lambda p, q, s: roma.decode(p, q, s, scales=tuple(scales))
        )

    # full coarse decode
    f_full = dec(roma.SCALES)
    t_full = timeit(lambda: f_full(params, f_q, f_s),
                    lambda o: float(jnp.sum(o[0][..., 0])))
    print(f"decode 16->1 @560 (2 dirs):      {t_full:8.1f} ms")

    # cumulative prefixes isolate each scale's marginal cost
    prev = 0.0
    for i in range(1, len(roma.SCALES) + 1):
        scales = roma.SCALES[:i]
        f_pre = dec(scales)
        t = timeit(lambda: f_pre(params, f_q, f_s),
                   lambda o: float(jnp.sum(o[0][..., 0])))
        print(
            f"  scale {scales[-1]:>2} marginal:          "
            f"{t - prev:8.1f} ms   (prefix {t:7.1f})"
        )
        prev = t

    # upsample pass
    pyru = jax.jit(
        lambda p, x: roma.build_pyramid(p, x, use_dino=False)
    )(params, imgu)
    fu_q = pyru
    fu_s = {s: jnp.concatenate([v[B:], v[:B]], axis=0) for s, v in pyru.items()}
    flow0 = jnp.zeros((2 * B, 128, 128, 2), jnp.float32)
    cert0 = jnp.zeros((2 * B, 128, 128, 1), jnp.float32)

    upf = jax.jit(
        lambda p, q, s, fl, ce: roma.decode(
            p, q, s, scales=["8", "4", "2", "1"], flow=fl, certainty=ce,
            scale_factor=WU / WC,
        )
    )
    t = timeit(lambda: upf(params, fu_q, fu_s, flow0, cert0),
               lambda o: float(jnp.sum(o[0][..., 0])))
    print(f"decode 8->1 @864 (2 dirs):       {t:8.1f} ms")


def e2e():
    """Full pair: coarse 560 symmetric + 864 upsample refinement.

    Optional argv[2] = batch size (pairs per program; scenario 5 dispatches
    B=4 chunks via ``roma_batch_size``) — reports per-PAIR time either way.
    """
    import jax
    import jax.numpy as jnp

    from deep_image_matching_tpu.models import roma

    print("device:", jax.devices()[0], file=sys.stderr)
    params = roma.init_params(jax.random.PRNGKey(0), dinov2_depth=24)
    batches = (
        [int(sys.argv[2])] if len(sys.argv) > 2 else [1, 4]
    )
    HC, HU = 560, 864
    key = jax.random.PRNGKey(1)

    z = jnp.zeros(())
    for _ in range(3):
        float(z + 1)
    t0 = time.time()
    for _ in range(5):
        float(z + 1)
    rtt = (time.time() - t0) / 5

    for B in batches:
        imc = jax.random.uniform(key, (B, HC, HC, 3), jnp.float32)
        imu = jax.random.uniform(key, (B, HU, HU, 3), jnp.float32)
        for corr_dt in (None, "bfloat16"):
            def run():
                # mirrors DetectorFreeMatcher._dispatch_images_batch: coarse
                # symmetric pass + 864 upsample + ON-DEVICE balanced sampling
                w_ab, c_ab, w_ba, c_ba = roma.match_pair_impl(
                    params, imc, imc, corr_dtype=corr_dt
                )
                w_ab, c_ab, w_ba, c_ba = roma.match_pair_upsample(
                    params, imu, imu, w_ab, c_ab, w_ba, c_ba,
                    scale_factor=HU / HC, corr_dtype=corr_dt,
                )
                ms = [
                    roma.sample_matches_device(
                        w_ab[i], c_ab[i], w_ba[i], c_ba[i],
                        jax.random.PRNGKey(i), num=5000, sample_thresh=0.05,
                    )[0]
                    for i in range(B)
                ]
                return (w_ab, ms)
            out = run()
            float(jnp.sum(out[1][-1]))
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                for _ in range(6):
                    out = run()
                float(jnp.sum(out[1][-1]))
                best = min(best, (time.time() - t0 - rtt) / (6 * B))
            print(f"e2e pair 560+864 B={B} corr_dtype={corr_dt}: "
                  f"{best*1e3:7.1f} ms/pair -> {1/best:5.2f} pairs/s")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "e2e":
        e2e()
    else:
        main()
