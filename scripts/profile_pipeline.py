"""Per-stage breakdown of the bench.py pipeline on the current device:
extraction, LightGlue matching, device RANSAC — each timed separately at
the bench operating point, plus a chunk-size sweep for the match+RANSAC
program. Guides where the next pipeline pairs/s comes from.
"""

import sys
import time
from pathlib import Path

_SRC = Path(__file__).resolve().parents[1] / "src"
if _SRC.is_dir() and str(_SRC) not in sys.path:
    sys.path.insert(0, str(_SRC))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, fetch, rtt, reps=5, rounds=3):
    fetch(fn())
    best = float("inf")
    for _ in range(rounds):
        t0 = time.time()
        out = None
        for _ in range(reps):
            out = fn()
        fetch(out)
        best = min(best, (time.time() - t0 - rtt) / reps)
    return best


def main():
    from deep_image_matching_tpu.models import lightglue as lg
    from deep_image_matching_tpu.models import superpoint as sp
    from deep_image_matching_tpu.ops.ransac import ransac_fundamental_batch

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    N_IMG, H, W, K, D = 16, 1024, 1024, 2048, 256
    attn = "flash" if on_tpu else "xla"
    assign = "fused" if on_tpu else "dense"
    cdt = "bfloat16" if on_tpu else "float32"
    print(f"device={dev}", file=sys.stderr)

    z = jnp.ones(())
    float(z + 1)
    t0 = time.time()
    for _ in range(5):
        float(z + 1)
    rtt = (time.time() - t0) / 5
    print(f"rtt {rtt*1e3:.1f} ms", file=sys.stderr)

    sp_params = sp.init_params(jax.random.PRNGKey(2))
    lg_params = lg.init_params(jax.random.PRNGKey(0), n_layers=9)
    imgs = jax.random.uniform(jax.random.PRNGKey(3), (N_IMG, H, W, 1))
    vhw = jnp.tile(jnp.array([[H, W]], jnp.int32), (N_IMG, 1))

    # --- extraction at EXTRACT_B=8 ---------------------------------------
    for EB in (4, 8, 16):
        ext = jax.jit(lambda im, v: sp.extract(
            sp_params, im, v, max_keypoints=K, compute_dtype=cdt))
        f = lambda: ext(imgs[:EB], vhw[:EB])
        t = timeit(f, lambda o: float(jnp.sum(o["scores"])), rtt)
        print(f"extract EB={EB:2d}: {t*1e3:7.1f} ms  "
              f"({t/EB*1e3:.2f} ms/img; 16 imgs = {16*t/EB*1e3:.0f} ms)",
              file=sys.stderr)

    # --- matching + ransac, chunk sweep -----------------------------------
    kk = jax.random.split(jax.random.PRNGKey(5))
    kpts = jax.random.uniform(kk[0], (32, K, 2), jnp.float32, 0, 1024)
    desc = jax.random.normal(kk[1], (32, K, D), jnp.float32)
    mask = jnp.ones((32, K), bool)

    for MB in (4, 8, 16):
        size = jnp.tile(jnp.array([[float(W), float(H)]]), (MB, 1))

        def match_only(k0, k1, d0, d1):
            return lg.forward(
                lg_params, k0, k1, d0, d1, mask[:MB], mask[:MB], size, size,
                compute_dtype=cdt, attn_impl=attn, assignment_impl=assign)

        match_only = jax.jit(match_only)
        f = lambda: match_only(kpts[:MB], kpts[MB:2*MB],
                               desc[:MB], desc[MB:2*MB])
        t = timeit(f, lambda o: float(jnp.sum(o["matching_scores0"])), rtt)
        print(f"match MB={MB:2d}: {t*1e3:7.1f} ms  "
              f"({t/MB*1e3:.2f} ms/pair; 120 pairs = {120*t/MB*1e3:.0f} ms)",
              file=sys.stderr)

    key = jax.random.PRNGKey(7)
    for RB in (4, 8, 16):
        def rs(k0, p1, v):
            return ransac_fundamental_batch(
                k0, p1, v, key, threshold=4.0, iters=2048)

        rs = jax.jit(rs)
        valid = mask[:RB]
        f = lambda: rs(kpts[:RB], kpts[RB:2*RB], valid)
        t = timeit(f, lambda o: float(jnp.sum(o[2])), rtt)
        print(f"ransac RB={RB:2d} (2048 it): {t*1e3:7.1f} ms  "
              f"({t/RB*1e3:.2f} ms/pair; 120 pairs = {120*t/RB*1e3:.0f} ms)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
