"""Bare relu-matmul-chain microbenchmark: the roofline control experiment.

Measures the TF/s XLA sustains on this chip for a plain chain of
``depth`` x (width -> width) dense layers at batch M — the "speed of light"
for an MLP of the train step's own layer shapes (RESULTS.md roofline: the
256-wide fwd+bwd chain is the ceiling the vanilla step is measured against;
the 128-wide rate blends into the articulated ceiling via the deformation +
view branches). Honest sync: fetches a computed scalar per timed call.

Usage: python tools/mlp_chain_bench.py --width 128 --mode fwdbwd
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aonerf_jax_cache")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=43232, help="batch rows")
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--depth", type=int, default=8)
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--mode", choices=["fwd", "fwdbwd"], default="fwdbwd")
    p.add_argument("--inner", type=int, default=20, help="scan-fused chain evals")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--warmup", type=int, default=2)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.m, args.width)) * 0.1, dt)
    ws = [
        jnp.asarray(rng.standard_normal((args.width, args.width)) * 0.05, dt)
        for _ in range(args.depth)
    ]

    def chain(ws, x):
        for w in ws:
            x = jnp.maximum(x @ w, 0.0)
        return jnp.sum(x.astype(jnp.float32))

    if args.mode == "fwd":
        body = lambda ws: chain(ws, x)
    else:
        def body(ws):
            val, g = jax.value_and_grad(lambda ws: chain(ws, x))(ws)
            return val + sum(jnp.sum(gi.astype(jnp.float32)) for gi in g)

    @jax.jit
    def run(ws):
        def step(c, _):
            return c, body(ws)

        _, outs = jax.lax.scan(step, 0, None, length=args.inner)
        return outs[-1]

    for _ in range(args.warmup):
        float(run(ws))
    t0 = time.perf_counter()
    for _ in range(args.steps):
        float(run(ws))
    dt_s = (time.perf_counter() - t0) / (args.steps * args.inner)

    macs = args.m * args.width * args.width * args.depth
    flops = 2 * macs * (3 if args.mode == "fwdbwd" else 1)
    tfs = flops / dt_s / 1e12
    peak = 197.0  # v5e bf16
    print(
        f"M={args.m} {args.depth}x({args.width}->{args.width}) {args.dtype} "
        f"{args.mode}: {tfs:.1f} TF/s ({100 * tfs / peak:.1f}% of v5e bf16 peak)"
    )


if __name__ == "__main__":
    main()
