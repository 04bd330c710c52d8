"""Per-stage LightGlue profile at the bench operating point (B=4, K=2048,
d=256, bf16, flash attention + fused assignment + fused FFN).

Times rotary pos-encoding, one self block, one cross block, the assignment
+ filtering tail, and the full 9-layer forward, RTT-compensated (dispatch R
calls back-to-back, fetch a 4-byte reduction, subtract the tunnel RTT — see
bench.py for why block_until_ready is not trusted through the tunnel).
Params travel as jit ARGUMENTS, never closures (a closure-captured param
pytree is serialized into the HLO shipped to the remote-compile service).

Reference anchors: self/cross blocks lightglue.py:129-243, assignment
:246-297 of thirdparty/LightGlue/lightglue/lightglue.py.
"""

import sys
import time
from pathlib import Path

_SRC = Path(__file__).resolve().parents[1] / "src"
if _SRC.is_dir() and str(_SRC) not in sys.path:
    sys.path.insert(0, str(_SRC))


def main():
    import jax
    import jax.numpy as jnp

    from deep_image_matching_tpu.models import lightglue as lg

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    attn = "flash" if on_tpu else "xla"
    ffn = "fused" if on_tpu else "xla"
    assign = "fused" if on_tpu else "dense"
    print(f"device: {dev} attn={attn} ffn={ffn}", file=sys.stderr)

    z = jnp.zeros(())
    for _ in range(3):
        float(z + 1)
    t0 = time.time()
    for _ in range(5):
        float(z + 1)
    rtt = (time.time() - t0) / 5
    print(f"rtt {rtt*1e3:.1f} ms", file=sys.stderr)

    def timeit(fn, fetch, reps=10, rounds=3):
        fetch(fn())  # compile + warm
        best = float("inf")
        for _ in range(rounds):
            t0 = time.time()
            for _ in range(reps):
                out = fn()
            fetch(out)
            best = min(best, (time.time() - t0 - rtt) / reps)
        return best * 1e3

    B, K, D = 4, 2048, 256
    cdt = jnp.bfloat16 if on_tpu else jnp.float32
    params_f32 = lg.init_params(jax.random.PRNGKey(0), n_layers=9)
    params = jax.tree.map(
        lambda v: v.astype(cdt) if v.dtype == jnp.float32 else v, params_f32
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    kpts = jax.random.uniform(k1, (B, K, 2), jnp.float32, 0, 2000)
    size = jnp.tile(jnp.array([[2000.0, 1500.0]]), (B, 1))
    desc = jax.random.normal(k2, (B, K, D), cdt)
    mask = jnp.ones((B, K), bool)

    # rotary encoding of normalized keypoints
    enc_fn = jax.jit(
        lambda p, k, s: lg.rotary_encoding(
            lg.normalize_keypoints(k, s), p["posenc"]["wr"].astype(jnp.float32)
        )
    )
    t = timeit(lambda: enc_fn(params, kpts, size),
               lambda o: float(jnp.sum(o[0][..., 0])))
    print(f"posenc (both imgs reuse):      {t:7.3f} ms")

    cos, sin = enc_fn(params, kpts, size)
    enc = (cos.astype(cdt), sin.astype(cdt))

    # layers are pre-stacked along a leading axis for lax.scan; slice layer 0
    layer0 = jax.tree.map(lambda v: v[0], params["layers"])

    selfb = jax.jit(
        lambda lp, x, c, s: lg._self_block(
            x, (c, s), mask, lp["self"], 4, attn_impl=attn, ffn_impl=ffn
        )
    )
    t = timeit(lambda: selfb(layer0, desc, *enc),
               lambda o: float(jnp.sum(o[..., 0].astype(jnp.float32))))
    print(f"self block (1 image):          {t:7.3f} ms  x18 = {18*t:6.1f}")

    crossb = jax.jit(
        lambda lp, x0, x1: lg._cross_block(
            x0, x1, mask, mask, lp["cross"], 4, attn_impl=attn, ffn_impl=ffn
        )
    )
    t = timeit(lambda: crossb(layer0, desc, desc),
               lambda o: float(jnp.sum(o[0][..., 0].astype(jnp.float32))))
    print(f"cross block (pair):            {t:7.3f} ms  x9  = {9*t:6.1f}")

    asg = jax.jit(
        lambda lp, x0, x1: lg._log_assignment(
            x0.astype(jnp.float32), x1.astype(jnp.float32), mask, mask,
            lp["assign"],
        )
    )
    t = timeit(lambda: asg(layer0, desc, desc),
               lambda o: float(jnp.sum(o)))
    print(f"assignment (dense path):       {t:7.3f} ms")

    desc_f32 = desc.astype(jnp.float32)
    t = timeit(
        lambda: lg.forward(
            params_f32, kpts, kpts, desc_f32, desc_f32, mask, mask, size, size,
            compute_dtype="bfloat16" if on_tpu else "float32",
            attn_impl=attn, assignment_impl=assign,
        ),
        lambda o: float(jnp.sum(o["matching_scores0"])),
    )
    print(f"full forward (9L, B={B}):       {t:7.3f} ms  -> {B/t*1000:6.1f} pairs/s")


if __name__ == "__main__":
    main()
