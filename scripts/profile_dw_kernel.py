"""Pallas refiner dw-stack kernel vs XLA conv pair, live device."""

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

    from deep_image_matching_tpu.ops.pallas_refiner import refiner_dw_stack

    print("device:", jax.devices()[0], file=sys.stderr)
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

    def xla_stack(x, w1, b1, w2, b2):
        N = w1.shape[0]
        C = x.shape[-1]
        for k in range(N):
            h = jax.lax.conv_general_dilated(
                x, w1[k], (1, 1), [(2, 2), (2, 2)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C,
            ) + b1[k]
            h = jax.nn.relu(h)
            x = jax.lax.conv_general_dilated(
                h, w2[k], (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b2[k]
        return x

    rng = np.random.default_rng(0)
    f_p = jax.jit(refiner_dw_stack)
    f_x = jax.jit(xla_stack)
    for C, H, N in [(24, 560, 9), (24, 864, 9), (144, 280, 9), (144, 432, 9)]:
        B = 2
        x = jnp.asarray(rng.normal(size=(B, H, H, C)).astype(np.float32))
        w1 = jnp.asarray(rng.normal(0, 0.2, (N, 5, 5, 1, C)).astype(np.float32))
        b1 = jnp.asarray(rng.normal(0, 0.1, (N, C)).astype(np.float32))
        w2 = jnp.asarray(rng.normal(0, 0.2, (N, 1, 1, C, C)).astype(np.float32))
        b2 = jnp.asarray(rng.normal(0, 0.1, (N, C)).astype(np.float32))
        ref = f_x(x, w1, b1, w2, b2)
        got = f_p(x, w1, b1, w2, b2)
        err = float(jnp.max(jnp.abs(ref - got)))
        t_x = timeit(lambda: f_x(x, w1, b1, w2, b2),
                     lambda o: float(jnp.sum(o[..., 0])))
        t_p = timeit(lambda: f_p(x, w1, b1, w2, b2),
                     lambda o: float(jnp.sum(o[..., 0])))
        print(f"C={C:4d} {H}px x{N}: xla {t_x:7.2f} ms  pallas {t_p:7.2f} ms "
              f"({t_x/t_p:4.2f}x)  maxdiff {err:.2e}")


if __name__ == "__main__":
    main()
