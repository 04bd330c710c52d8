"""Stage-level LoFTR profile on the live device (RTT-compensated).

Splits a pair into: ResNet-FPN backbone, coarse LinearAttention
transformer (4 self+cross layers), coarse matching (dual-softmax), and
fine refinement. Params travel as jit arguments (never closures — see
profile_roma.py)."""

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

    from deep_image_matching_tpu.models import loftr

    print("device:", jax.devices()[0], file=sys.stderr)
    params = loftr.init_params(jax.random.PRNGKey(0))
    H = W = 832  # typical quality-high working size, /8 and /2 divisible

    key = jax.random.PRNGKey(1)
    img = jax.random.uniform(key, (2, H, W, 1), jnp.float32)

    z = jnp.zeros(())
    for _ in range(3):
        float(z + 1)
    t0 = time.time()
    for _ in range(5):
        float(z + 1)
    rtt = (time.time() - t0) / 5
    print(f"rtt {rtt*1e3:.1f} ms", file=sys.stderr)

    def timeit(fn, fetch, reps=8, rounds=3):
        fetch(fn())
        best = float("inf")
        for _ in range(rounds):
            t0 = time.time()
            for _ in range(reps):
                out = fn()
            fetch(out)
            best = min(best, (time.time() - t0 - rtt) / reps)
        return best * 1e3

    bb = jax.jit(lambda p, x: loftr.backbone_forward(p, x))
    t = timeit(lambda: bb(params, img), lambda o: float(jnp.sum(o[0][..., 0])))
    print(f"backbone 2x{H}px:            {t:8.1f} ms")

    fc, ff = bb(params, img)
    Hc, Wc = fc.shape[1:3]
    pe = loftr.sine_pos_encoding(Hc, Wc, fc.shape[-1], False)
    f0 = (fc[:1] + pe).reshape(1, Hc * Wc, -1)
    f1 = (fc[1:] + pe).reshape(1, Hc * Wc, -1)

    tr = jax.jit(
        lambda p, a, b: loftr.transformer(a, b, p["coarse"], None, None)
    )
    t = timeit(lambda: tr(params, f0, f1),
               lambda o: float(jnp.sum(o[0][..., 0])))
    print(f"coarse transformer ({Hc*Wc} tok): {t:8.1f} ms")

    t0_, t1_ = tr(params, f0, f1)

    cm = jax.jit(
        lambda a, b: loftr.coarse_match(a, b, (Hc, Wc), (Hc, Wc), 2048)
    )
    try:
        t = timeit(lambda: cm(t0_, t1_), lambda o: float(jnp.sum(o[0])))
        print(f"coarse match (dense):       {t:8.1f} ms")
    except Exception as e:
        print("coarse match skipped:", repr(e)[:120])
    cmb = jax.jit(
        lambda a, b: loftr.coarse_match_blocked(a, b, (Hc, Wc), (Hc, Wc), 2048)
    )
    try:
        t = timeit(lambda: cmb(t0_, t1_), lambda o: float(jnp.sum(o[0])))
        print(f"coarse match (blocked):     {t:8.1f} ms")
    except Exception as e:
        print("blocked coarse match skipped:", repr(e)[:120])

    for impl in ("dense", "blocked"):
        full = jax.jit(
            lambda p, a, b, _i=impl: loftr.match_pair_impl(
                p, a, b, coarse_impl=_i
            )
        )
        t = timeit(lambda: full(params, img[:1], img[1:]),
                   lambda o: float(jnp.sum(o["keypoints0"])))
        print(f"full pair ({impl}):         {t:8.1f} ms"
              f" -> {1000/t:5.2f} pairs/s @ {H}px")


def bf16():
    import jax
    import jax.numpy as jnp

    from deep_image_matching_tpu.models import loftr

    params = loftr.init_params(jax.random.PRNGKey(0))
    H = W = 832
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, H, W, 1), jnp.float32)
    z = jnp.zeros(())
    for _ in range(3):
        float(z + 1)
    t0 = time.time()
    for _ in range(5):
        float(z + 1)
    rtt = (time.time() - t0) / 5

    for dt in ("float32", "bfloat16"):
        f = jax.jit(
            lambda p, a, b, _d=dt: loftr.match_pair_impl(
                p, a, b, compute_dtype=_d
            )
        )
        out = f(params, img[:1], img[1:])
        float(jnp.sum(out["keypoints0"]))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(8):
                out = f(params, img[:1], img[1:])
            float(jnp.sum(out["keypoints0"]))
            best = min(best, (time.time() - t0 - rtt) / 8)
        print(f"full pair {dt}: {best*1e3:6.1f} ms -> {1/best:5.1f} pairs/s")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "bf16":
        bf16()
    else:
        main()
