"""Benchmark: SuperPoint+LightGlue pair-matching throughput per chip.

North-star metric (BASELINE.json): image pairs/sec/chip for LightGlue at
2048 keypoints/image (9 layers, bf16, Pallas flash attention). Inputs are
generated on device (the test harness's host<->device tunnel is ~3 MB/s and
would otherwise dominate), and timing forces execution with a scalar fetch:
``block_until_ready`` does not reliably block through the tunnel, so R
batches are dispatched back-to-back and a 4-byte reduction of the last
output is fetched; device execution is in-order, so elapsed/R is the true
per-batch time (tunnel RTT measured separately and subtracted).

Prints ONE JSON line to stdout.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

# Runnable from a bare checkout: resolve the src/ layout without installation.
_SRC = Path(__file__).resolve().parent / "src"
if _SRC.is_dir() and str(_SRC) not in sys.path:
    sys.path.insert(0, str(_SRC))


def main():
    import jax
    import jax.numpy as jnp

    from deep_image_matching_tpu.models import lightglue as lg

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    attn = "flash" if on_tpu else "xla"
    assign = "fused" if on_tpu else "dense"
    print(f"device: {dev} attn={attn} assignment={assign}", file=sys.stderr)

    # B=4 measured fastest per-pair on v5e with the fused FFN kernel
    # (258 pairs/s vs 252 at B=8, 222 at B=16, 218 at B=32 - VMEM locality
    # beats batch amortization)
    B, K, D = 4, 2048, 256
    params = lg.init_params(jax.random.PRNGKey(0), n_layers=9)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    kpts = jax.random.uniform(k1, (B, K, 2), jnp.float32, 0, 2000)
    desc = jax.random.normal(k2, (B, K, D), jnp.float32)
    mask = jnp.ones((B, K), bool)
    size = jnp.tile(jnp.array([[2000.0, 1500.0]]), (B, 1))

    def call():
        return lg.forward(
            params, kpts, kpts, desc, desc, mask, mask, size, size,
            compute_dtype="bfloat16", attn_impl=attn, assignment_impl=assign,
        )

    def fetch(out):
        return float(jnp.sum(out["matching_scores0"]))

    # warm rtt probe + measure tunnel round-trip
    x = jnp.ones((4,))
    fetch({"matching_scores0": x})
    t0 = time.time()
    for _ in range(5):
        float(jnp.sum(x))
    rtt = (time.time() - t0) / 5
    print(f"rtt: {rtt * 1000:.1f} ms", file=sys.stderr)

    t0 = time.time()
    fetch(call())  # compile
    print(f"compile+first: {time.time() - t0:.1f}s", file=sys.stderr)

    best = float("inf")
    R = 10
    for _ in range(3):
        t0 = time.time()
        out = None
        for _ in range(R):
            out = call()
        fetch(out)
        best = min(best, (time.time() - t0 - rtt) / R)
    pairs_per_sec = B / best
    p50_ms = best / B * 1000.0

    # secondary: SuperPoint extraction throughput (stderr only)
    try:
        from deep_image_matching_tpu.models import superpoint as sp

        sp_params = sp.init_params(jax.random.PRNGKey(2))
        imgs = jax.random.uniform(jax.random.PRNGKey(3), (8, 1024, 1024, 1))
        vhw = jnp.tile(jnp.array([[1024, 1024]], jnp.int32), (8, 1))

        def sp_call():
            return sp.extract(
                sp_params, imgs, vhw, max_keypoints=2048,
                compute_dtype="bfloat16" if on_tpu else "float32",
            )

        float(jnp.sum(sp_call()["scores"]))  # compile
        t0 = time.time()
        out = None
        for _ in range(5):
            out = sp_call()
        float(jnp.sum(out["scores"]))
        dt = (time.time() - t0 - rtt) / 5
        print(
            f"superpoint extract @1024px: {dt*1000/8:.1f} ms/img "
            f"-> {8/dt:.1f} img/s",
            file=sys.stderr,
        )
    except Exception as e:  # secondary metric must not break the bench
        print(f"extraction bench skipped: {e}", file=sys.stderr)
    print(
        f"batch={B} K={K}: {best*1000:.1f} ms/batch, "
        f"{pairs_per_sec:.1f} pairs/s, {p50_ms:.2f} ms/pair",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "image pairs/sec/chip (SP+LightGlue @2048 kpts, 9 layers, bf16, flash)",
                "value": round(pairs_per_sec, 2),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / 20.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
