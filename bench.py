"""Benchmark: rays/sec/chip, forward+backward, full-size vanilla NeRF.

Measures the complete jitted train step (on-device ray-batch gather ->
hierarchical 64+128-sample render -> MSE loss -> grads -> Adam) on a
SAPIEN-640x480-sized ray population, i.e. the reference's vanilla training
configuration (BASELINE.md). Prints ONE JSON line.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
ratio against this repo's own recorded best (bench_baseline.json, updated
when the number improves) — it tracks regression/progress across rounds.
"""

import argparse
import json
import os
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    # f32 @ 4096 is the measured sweet spot on v5e: larger batches trip an
    # XLA regalloc RET_CHECK (live_range_finder.cc) on this toolchain, and
    # bf16 underperforms f32 here (the step is gather/sort/HBM-bound around
    # MXU work that is already saturated at this width).
    p.add_argument("--batch-size", type=int, default=4096)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--dtype", choices=["bf16", "f32"], default="f32")
    p.add_argument("--no-update-baseline", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from aonerf.models import NeRF
    from aonerf.train import create_train_state, make_adam, make_vanilla_train_step

    compute_dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = NeRF(compute_dtype=compute_dtype)  # full 64+128 hierarchy

    # Ray population the size of one SAPIEN 640x480 image set slice.
    n_rays = 640 * 480
    rng = np.random.default_rng(0)
    d = rng.standard_normal((n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    buffers = {
        "rays_o": jnp.asarray((-4.0 * d).astype(np.float32)),
        "rays_d": jnp.asarray(d),
        "viewdirs": jnp.asarray(d),
        "target": jnp.asarray(rng.uniform(size=(n_rays, 3)).astype(np.float32)),
    }

    dummy = {k: v[:8] for k, v in buffers.items()}
    params = model.init(jax.random.PRNGKey(0), dummy, False, True, 2.0, 6.0)
    tx = make_adam()
    state = create_train_state(params, tx)
    step = make_vanilla_train_step(
        model, tx, white_bkgd=True, near=2.0, far=6.0, batch_size=args.batch_size
    )
    key = jax.random.PRNGKey(0)

    for _ in range(args.warmup):
        state, metrics = step(state, buffers, key)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, buffers, key)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    rays_per_sec = args.batch_size * args.steps / dt

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")
    baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f).get("rays_per_sec")
    vs_baseline = rays_per_sec / baseline if baseline else 1.0
    if not args.no_update_baseline and (baseline is None or rays_per_sec > baseline):
        with open(baseline_path, "w") as f:
            json.dump(
                {"rays_per_sec": rays_per_sec, "dtype": args.dtype,
                 "batch_size": args.batch_size, "device": str(jax.devices()[0])},
                f,
            )

    print(
        json.dumps(
            {
                "metric": "rays_per_sec_per_chip_fwd_bwd",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(vs_baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
