"""Benchmark: SuperPoint+LightGlue pair-matching throughput per chip.

Measures the north-star metric (BASELINE.json): image pairs/sec/chip for
LightGlue at 2048 keypoints/image (9 layers, bf16 compute), plus the p50
single-batch latency. Runs on whatever jax.devices() provides (one real TPU
chip under the driver). Prints ONE JSON line to stdout.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from deep_image_matching_tpu.models import lightglue as lg

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    B, K, D = 32, 2048, 256
    params = lg.init_params(jax.random.PRNGKey(0), n_layers=9)
    rng = np.random.default_rng(0)
    kpts0 = jnp.asarray(rng.uniform(0, 2000, (B, K, 2)).astype(np.float32))
    kpts1 = jnp.asarray(rng.uniform(0, 2000, (B, K, 2)).astype(np.float32))
    desc0 = jnp.asarray(rng.normal(size=(B, K, D)).astype(np.float32))
    desc1 = jnp.asarray(rng.normal(size=(B, K, D)).astype(np.float32))
    mask = jnp.ones((B, K), bool)
    size = jnp.asarray(np.tile(np.array([[2000, 1500]], np.float32), (B, 1)))

    def run():
        out = lg.forward(
            params, kpts0, kpts1, desc0, desc1, mask, mask, size, size,
            compute_dtype="bfloat16",
        )
        jax.block_until_ready(out)
        return out

    t0 = time.time()
    run()  # compile
    print(f"compile: {time.time() - t0:.1f}s", file=sys.stderr)

    # steady state
    times = []
    for _ in range(6):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    times = sorted(times)[1:-1]  # trim outliers
    per_batch = float(np.mean(times))
    pairs_per_sec = B / per_batch
    p50_latency_ms = per_batch / B * 1000.0

    print(
        f"batch={B} K={K}: {per_batch*1000:.1f} ms/batch, "
        f"{pairs_per_sec:.1f} pairs/s, p50 {p50_latency_ms:.2f} ms/pair",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "image pairs/sec/chip (SP+LightGlue @2048 kpts, 9 layers, bf16)",
                "value": round(pairs_per_sec, 2),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / 20.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
