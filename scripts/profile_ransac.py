"""Stage timings inside the batched device RANSAC at the bench operating
point (B pairs, M=2048 candidates, 2048 hypotheses): sampling+gather, the
minimal QR solve, hypothesis scoring, and the refit tail.

Usage: python scripts/profile_ransac.py [B]
"""

import sys
import time
from pathlib import Path

_SRC = Path(__file__).resolve().parents[1] / "src"
if _SRC.is_dir() and str(_SRC) not in sys.path:
    sys.path.insert(0, str(_SRC))

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
    from deep_image_matching_tpu.ops import ransac as R

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    M, ITERS = 2048, 2048
    print(f"device={jax.devices()[0]} B={B} M={M} iters={ITERS}",
          file=sys.stderr)

    z = jnp.ones(())
    float(z + 1)
    t0 = time.time()
    for _ in range(5):
        float(z + 1)
    rtt = (time.time() - t0) / 5
    print(f"rtt {rtt*1e3:.1f} ms", file=sys.stderr)

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    p0 = jax.random.uniform(ks[0], (B, M, 2), jnp.float32, 0, 1024)
    p1 = p0 + jax.random.normal(ks[1], (B, M, 2)) * 2.0
    valid = jnp.ones((B, M), bool)
    key = jax.random.PRNGKey(7)

    # full
    full = jax.jit(lambda: R.ransac_fundamental_batch(
        p0, p1, valid, key, threshold=4.0, iters=ITERS))
    t = timeit(full, lambda o: float(jnp.sum(o[2])), rtt)
    print(f"full ransac      : {t*1e3:7.1f} ms ({t/B*1e3:.2f} ms/pair)",
          file=sys.stderr)

    # sampling + gather + constraint build (stop before solve)
    def sample_only(p0, p1, valid, key):
        def one(p0, p1, v, k):
            p0n, _ = R._normalize_points(p0, v)
            p1n, _ = R._normalize_points(p1, v)
            cum = jnp.cumsum(v.astype(jnp.int32))
            n_valid = v.sum()
            compact = jnp.zeros((M,), jnp.int32)
            compact = compact.at[jnp.where(v, cum - 1, M)].set(
                jnp.arange(M, dtype=jnp.int32), mode="drop")
            u = jax.random.randint(
                k, (ITERS, 8), 0, jnp.maximum(n_valid, 1).astype(jnp.int32))
            si = compact[u]
            return R._build_constraints(p0n[si], p1n[si])
        keys = jax.random.split(key, B)
        return jax.vmap(one)(p0, p1, valid, keys)

    sample_only = jax.jit(sample_only)
    t = timeit(lambda: sample_only(p0, p1, valid, key),
               lambda o: float(jnp.sum(o[..., 0, 0])), rtt)
    print(f"sample+build     : {t*1e3:7.1f} ms", file=sys.stderr)
    A = sample_only(p0, p1, valid, key)

    # minimal solve
    solve = jax.jit(lambda A: R._solve_f_minimal(A))
    t = timeit(lambda: solve(A), lambda o: float(jnp.sum(o[..., 0, 0])), rtt)
    print(f"qr minimal solve : {t*1e3:7.1f} ms", file=sys.stderr)
    Fh = solve(A)

    # scoring
    def score(Fh, p0, p1, valid):
        def one(F, a, b, v):
            err = R._sampson_sq(F, a, b)
            inl = (err < 16.0) & v[None, :]
            return inl.sum(axis=1)
        return jax.vmap(one)(Fh, p0, p1, valid)

    score = jax.jit(score)
    t = timeit(lambda: score(Fh, p0, p1, valid),
               lambda o: float(jnp.sum(o)), rtt)
    print(f"score (dense)    : {t*1e3:7.1f} ms", file=sys.stderr)

    # refit tail: weighted full eigh solve + rescore
    def refit(p0, p1, valid):
        def one(a, b, v):
            A_all = R._build_constraints(a, b)
            F = R._solve_f(A_all * v[:, None].astype(jnp.float32))
            return R._sampson_sq(F, a, b).sum()
        return jax.vmap(one)(p0, p1, valid)

    refit = jax.jit(refit)
    t = timeit(lambda: refit(p0, p1, valid),
               lambda o: float(jnp.sum(o)), rtt)
    print(f"refit (eigh+svd) : {t*1e3:7.1f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
