"""Time the decode glue at upsample-pass sizes: jax.image.resize of
flow/certainty, the per-scale 1x1 projections, and a full
conv_refiner_fwd at the 864-pass fine scales. Identifies the decode time
not accounted for by the refiner cores (see profile_refiner.py)."""

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
    B = 2

    # resize chain of the 864 upsample pass: 108->216->432->864 (flow+cert)
    res = jax.jit(lambda x, h, w: roma._resize(x, (h, w)), static_argnums=(1, 2))
    for src, dst in [(108, 216), (216, 432), (432, 864)]:
        x = jnp.asarray(rng.normal(size=(B, src, src, 3)).astype(np.float32))
        t = timeit(lambda x=x, d=dst: res(x, d, d),
                   lambda o: float(jnp.sum(o[..., 0])))
        print(f"resize flow+cert {src}->{dst}:   {t:7.2f} ms")

    # per-scale projection convs at 864 sizes (both pyramids = 2B images)
    params = roma.init_params(jax.random.PRNGKey(0), dinov2_depth=2)
    proj = jax.jit(lambda p, x: x @ p["w"] + p["b"])
    for s, hw in [("8", 108), ("4", 216), ("2", 432), ("1", 864)]:
        ci, co = roma._PROJ[s]
        x = jnp.asarray(rng.normal(size=(2 * B, hw, hw, ci)).astype(np.float32))
        t = timeit(lambda x=x, s=s: proj(params["proj"][s], x),
                   lambda o: float(jnp.sum(o[..., 0])))
        print(f"proj scale {s} ({hw}px {ci}->{co}): {t:7.2f} ms")

    # refiner fulls at 864-pass sizes
    for s, hw in [("8", 108), ("4", 216), ("2", 432), ("1", 864)]:
        cproj = roma._PROJ[s][1]
        p = params["refiners"][s]
        f1 = jnp.asarray(rng.normal(size=(B, hw, hw, cproj)).astype(np.float32))
        f2 = jnp.asarray(rng.normal(size=(B, hw, hw, cproj)).astype(np.float32))
        flow = jnp.tile(roma._grid(hw, hw)[None], (B, 1, 1, 1))
        full = jax.jit(
            lambda p, a, b, fl, _s=s: roma.conv_refiner_fwd(
                p, a, b, fl, _s, scale_factor=864 / 560
            )
        )
        t = timeit(lambda: full(p, f1, f2, flow),
                   lambda o: float(jnp.sum(o[0][..., 0])))
        print(f"refiner full scale {s} @{hw}px:  {t:7.2f} ms")


if __name__ == "__main__":
    main()
