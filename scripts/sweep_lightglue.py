"""Sweep LightGlue forward over batch size x attention impl on the current
device; prints a pairs/s table. Used to chase the B=4-beats-B=32 anomaly
(VERDICT round-1 item 10).

Usage: python scripts/sweep_lightglue.py [K]
"""

import sys
import time
from pathlib import Path

_SRC = Path(__file__).resolve().parents[1] / "src"
if _SRC.is_dir() and str(_SRC) not in sys.path:
    sys.path.insert(0, str(_SRC))

import jax
import jax.numpy as jnp


def timeit(fn, fetch, rtt, reps=10, rounds=3):
    fetch(fn())  # compile
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

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    D = 256
    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    print(f"device={dev} K={K}", file=sys.stderr)

    x = jnp.ones((4,))
    float(jnp.sum(x))
    t0 = time.time()
    for _ in range(5):
        float(jnp.sum(x))
    rtt = (time.time() - t0) / 5
    print(f"rtt {rtt*1e3:.1f} ms", file=sys.stderr)

    params = lg.init_params(jax.random.PRNGKey(0), n_layers=9)

    for B in (4, 8, 16, 32):
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        kpts = jax.random.uniform(k1, (B, K, 2), jnp.float32, 0, 2000)
        desc = jax.random.normal(k2, (B, K, D), jnp.float32)
        mask = jnp.ones((B, K), bool)
        size = jnp.tile(jnp.array([[2000.0, 1500.0]]), (B, 1))
        variants = (
            [("flash", "split"), ("flash", "unrolled"), ("bidir", "split")]
            if on_tpu else [("xla", "split")]
        )
        for attn, layout in variants:
            def fn():
                return lg.forward(
                    params, kpts, kpts, desc, desc, mask, mask, size, size,
                    compute_dtype="bfloat16" if on_tpu else "float32",
                    attn_impl=attn, layout=layout,
                    assignment_impl="fused" if on_tpu else "dense",
                )

            t = timeit(fn, lambda o: float(jnp.sum(o["matching_scores0"])),
                       rtt)
            print(
                f"B={B:3d} attn={attn:6s} layout={layout:8s}: "
                f"{t*1e3:7.2f} ms/batch "
                f"{B/t:7.1f} pairs/s ({t/B*1e3:.2f} ms/pair)",
                file=sys.stderr,
            )


if __name__ == "__main__":
    main()
