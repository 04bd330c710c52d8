"""Probe: throughput of tpu.dynamic_gather (take_along_axis in Pallas) for
VMEM row-gathers — feasibility test for windowed local-correlation."""

import sys
import time
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parents[1] / "src"
if _SRC.is_dir() and str(_SRC) not in sys.path:
    sys.path.insert(0, str(_SRC))


def main():
    import functools
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("device:", jax.devices()[0], file=sys.stderr)
    z = jnp.zeros(())
    for _ in range(3):
        float(z + 1)
    t0 = time.time()
    for _ in range(5):
        float(z + 1)
    rtt = (time.time() - t0) / 5

    S, C = 4096, 256
    REP = 16  # gathers per kernel invocation

    def kernel(src_ref, idx_ref, out_ref):
        acc = jnp.zeros((S, C), jnp.float32)
        src = src_ref[...]
        for k in range(REP):
            idx = idx_ref[...] + k
            acc = acc + jnp.take_along_axis(src, idx, axis=0)
        out_ref[...] = acc

    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, C), jnp.float32),
    )
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(S, C)).astype(np.float32))
    idx = jnp.asarray(
        np.broadcast_to(
            rng.integers(0, S - REP, (S, 1)), (S, C)
        ).astype(np.int32)
    )
    f = jax.jit(call)
    out = f(src, idx)
    ref = np.add.reduce(
        [np.asarray(src)[np.asarray(idx)[:, 0] + k] for k in range(REP)]
    )
    err = float(jnp.max(jnp.abs(out - ref)))
    print("maxdiff", err)

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(8):
            out = f(src, idx)
        float(jnp.sum(out[0]))
        best = min(best, (time.time() - t0 - rtt) / 8)
    n_rows = S * REP
    gb = n_rows * C * 4 / 1e9
    print(
        f"{n_rows} row-gathers of {C*4}B: {best*1e3:.3f} ms "
        f"-> {n_rows/best/1e9:.2f} Grow/s, {gb/best:.0f} GB/s"
    )


if __name__ == "__main__":
    main()
