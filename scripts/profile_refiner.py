"""Decompose ConvRefiner scale cost on the live device (RTT-compensated).

The stage profile (profile_roma.py) shows the refiner stack is ~85% of a
RoMa pair; this script isolates WHICH part — depthwise 5x5 convs, 1x1
convs, local-correlation gathers, or grid_sample — so the Pallas kernel
effort goes to the right op. Params always travel as jit arguments (never
closures): see profile_roma.py.
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

    rng = np.random.default_rng(0)
    B = 2  # two directions of one pair

    # (scale, H, W) at the 560 coarse pass
    cases = {"2": 280, "4": 140, "1": 560}
    full_params = roma.init_params(jax.random.PRNGKey(0), dinov2_depth=2)

    for s, hw in cases.items():
        cin, hidden, disp, radius = roma._REFINERS[s]
        cproj = roma._PROJ[s][1]
        p = full_params["refiners"][s]
        f1 = jnp.asarray(rng.normal(size=(B, hw, hw, cproj)).astype(np.float32))
        f2 = jnp.asarray(rng.normal(size=(B, hw, hw, cproj)).astype(np.float32))
        flow = jnp.tile(roma._grid(hw, hw)[None], (B, 1, 1, 1))

        full = jax.jit(
            lambda p, a, b, fl, _s=s: roma.conv_refiner_fwd(p, a, b, fl, _s)
        )
        t = timeit(lambda: full(p, f1, f2, flow),
                   lambda o: float(jnp.sum(o[0][..., 0])))
        print(f"scale {s} ({hw}px, C={cproj}, hidden={hidden}): full {t:7.2f} ms")

        # hidden-block stack alone on a premade activation (dw + relu + 1x1) x9
        d0 = jnp.asarray(rng.normal(size=(B, hw, hw, hidden)).astype(np.float32))

        def stack_fn(p, x, dw=True, one=True):
            # 9 uniform hidden-style blocks: dw 5x5 (C groups) -> relu -> 1x1
            for bp in [p["block1"]] + list(p["hidden"]):
                if dw:
                    h = jax.lax.conv_general_dilated(
                        x, bp["conv1"]["w"], (1, 1), [(2, 2), (2, 2)],
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        feature_group_count=x.shape[-1],
                    )
                    h = jax.nn.relu(h)
                else:
                    h = jax.nn.relu(x)
                if one:
                    x = jax.lax.conv_general_dilated(
                        h, bp["conv2"]["w"], (1, 1), [(0, 0), (0, 0)],
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                else:
                    x = h
            return x

        f_dw = jax.jit(lambda p, x: stack_fn(p, x, dw=True, one=False))
        f_one = jax.jit(lambda p, x: stack_fn(p, x, dw=False, one=True))
        f_both = jax.jit(lambda p, x: stack_fn(p, x, dw=True, one=True))

        # NB: block1 weights have in=cin not hidden; restrict to hidden blocks
        ph = {"block1": p["hidden"][0], "hidden": p["hidden"][1:]}
        t_dw = timeit(lambda: f_dw(ph, d0), lambda o: float(jnp.sum(o[..., 0])))
        t_one = timeit(lambda: f_one(ph, d0), lambda o: float(jnp.sum(o[..., 0])))
        t_b = timeit(lambda: f_both(ph, d0), lambda o: float(jnp.sum(o[..., 0])))
        print(f"    9-block stack: dw-only {t_dw:7.2f}  1x1-only {t_one:7.2f}  "
              f"dw+1x1 {t_b:7.2f} ms")

        if radius is not None:
            lc = jax.jit(
                lambda a, b, fl, r=radius: jax.vmap(
                    lambda x, y, f: roma.local_correlation(x, y, f, r)
                )(a, b, fl)
            )
            t = timeit(lambda: lc(f1, f2, flow),
                       lambda o: float(jnp.sum(o[..., 0])))
            print(f"    local_correlation r={radius}: {t:7.2f} ms")

        gs = jax.jit(
            lambda b, fl: jax.vmap(roma._grid_sample)(b, fl)
        )
        t = timeit(lambda: gs(f2, flow), lambda o: float(jnp.sum(o[..., 0])))
        print(f"    grid_sample: {t:7.2f} ms")


if __name__ == "__main__":
    main()
