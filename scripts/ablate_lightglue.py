"""Ablation timings for the LightGlue hot path on the current device.

Breaks the per-pair cost into attention stack / assignment / overhead by
timing variants; prints a small table to stderr. Usage:
    python scripts/ablate_lightglue.py [B] [K]
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

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    D = 256
    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    attn = "flash" if on_tpu else "xla"
    print(f"device={dev} B={B} K={K}", file=sys.stderr)

    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    kpts = jax.random.uniform(k1, (B, K, 2), jnp.float32, 0, 2000)
    desc = jax.random.normal(k2, (B, K, D), jnp.float32)
    mask = jnp.ones((B, K), bool)
    size = jnp.tile(jnp.array([[2000.0, 1500.0]]), (B, 1))

    x = jnp.ones((4,))
    float(jnp.sum(x))
    t0 = time.time()
    for _ in range(5):
        float(jnp.sum(x))
    rtt = (time.time() - t0) / 5

    def run(n_layers, attn_impl, assignment_impl):
        params = lg.init_params(jax.random.PRNGKey(0), n_layers=n_layers)

        def fn():
            return lg.forward(
                params, kpts, kpts, desc, desc, mask, mask, size, size,
                compute_dtype="bfloat16", attn_impl=attn_impl,
                assignment_impl=assignment_impl,
            )

        return timeit(fn, lambda o: float(jnp.sum(o["matching_scores0"])), rtt)

    full9 = run(9, attn, "fused" if on_tpu else "dense")
    print(f"full 9L fused : {full9*1000:.1f} ms/batch {B/full9:.1f} pairs/s",
          file=sys.stderr)
    l1 = run(1, attn, "fused" if on_tpu else "dense")
    print(f"1L fused      : {l1*1000:.1f} ms/batch "
          f"(per-layer ~{(full9-l1)/8*1000:.2f} ms, overhead+assign {l1*1000:.1f})",
          file=sys.stderr)
    dense9 = run(9, attn, "dense")
    print(f"full 9L dense : {dense9*1000:.1f} ms/batch", file=sys.stderr)
    if on_tpu:
        xla9 = run(9, "xla", "fused")
        print(f"full 9L xla-attn: {xla9*1000:.1f} ms/batch", file=sys.stderr)


if __name__ == "__main__":
    main()
