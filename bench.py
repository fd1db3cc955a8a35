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
    # bf16 @ small batch is the measured sweet spot on v5e (~122K rays/s @
    # 224 vs 45K for f32 @ 4096): small batches keep the fwd+bwd activations
    # VMEM-resident, and bf16 dots roughly double the MXU rate on top.
    # Fine sweep: 192→117.8K, 224→122.7K, 256→119.9K, 288→122.6K, 320→103.5K
    # (cliff); reproducible to ~0.5%. Batches > 4096 (or bf16 @ 4096) trip an
    # XLA regalloc RET_CHECK (live_range_finder.cc) on this toolchain.
    # Quality in this regime is verified equal-or-better per ray than
    # f32 @ 4096 (RESULTS.md): with grad_clip=1.0, 12800 steps @ 256 reaches
    # val 35.1 dB vs 30.3 dB for 800 steps @ 4096 on the same 3.28M-ray
    # budget.
    p.add_argument("--batch-size", type=int, default=224)
    p.add_argument("--steps", type=int, default=12, help="outer (timed) calls")
    p.add_argument("--inner-steps", type=int, default=183,
                   help="optimizer steps fused into one program via lax.scan")
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--grad-clip", type=float, default=1.0,
                   help="global-norm gradient clip (0 = off); required for "
                        "stable bf16 training, so the benched step includes it")
    p.add_argument("--fused", action="store_true",
                   help="use the Pallas fused fwd+bwd ray-march kernels "
                        "(demoted to a parity cross-check: loses to the "
                        "VMEM-resident XLA step at the shipped batch size — "
                        "see the roofline in RESULTS.md)")
    p.add_argument("--no-update-baseline", action="store_true")
    p.add_argument("--no-pipeline", dest="pipeline", action="store_false",
                   help="fetch the loss scalar after every dispatch instead "
                        "of chaining dispatches; both modes are honest (the "
                        "clock stops only after all computed scalars reach "
                        "the host), pipelining just overlaps host dispatch "
                        "with device compute")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from aonerf.models import NeRF
    from aonerf.train import create_train_state, make_adam
    from aonerf.train.step import make_vanilla_train_multi_step

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
    tx = make_adam(grad_clip=args.grad_clip or None)
    state = create_train_state(params, tx)
    # lax.scan fuses inner_steps optimizer steps into one program: one
    # dispatch + one host fetch per call amortizes the dispatch/tunnel
    # latency that otherwise dominates per-step timing on this runtime.
    if args.fused:
        from aonerf.ops.kernels.fused_train import make_fused_vanilla_train_multi_step

        step = make_fused_vanilla_train_multi_step(
            tx, white_bkgd=True, near=2.0, far=6.0, batch_size=args.batch_size,
            inner_steps=args.inner_steps, dot_bf16=(args.dtype == "bf16"),
            donate=False,
        )
    else:
        step = make_vanilla_train_multi_step(
            model, tx, white_bkgd=True, near=2.0, far=6.0, batch_size=args.batch_size,
            inner_steps=args.inner_steps, donate=False,
        )
    key = jax.random.PRNGKey(0)

    # Hard-sync every step by fetching the loss scalar to the host: on the
    # axon runtime, block_until_ready (even on every state leaf) can return
    # before remote execution completes, inflating throughput ~100x. A
    # device->host read of a computed value cannot lie. The measured time
    # therefore includes per-step host latency — it is a conservative,
    # honest lower bound on pipelined throughput.
    for _ in range(args.warmup):
        state, metrics = step(state, buffers, key)
        float(metrics["loss"])

    t0 = time.perf_counter()
    if args.pipeline:
        losses = []
        for _ in range(args.steps):
            state, metrics = step(state, buffers, key)
            losses.append(metrics["loss"])
        vals = [float(l) for l in losses]
        assert all(v == v for v in vals)  # computed, finite-fetched scalars
    else:
        for _ in range(args.steps):
            state, metrics = step(state, buffers, key)
            float(metrics["loss"])
    dt = time.perf_counter() - t0

    rays_per_sec = args.batch_size * args.inner_steps * args.steps / dt

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")
    baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f).get("rays_per_sec")
    vs_baseline = rays_per_sec / baseline if baseline else 1.0
    # Ratchet the recorded best only on improvements beyond run-to-run noise
    # (~0.5% measured): noise-level ratcheting pins vs_baseline at 1.0 and
    # slowly masks real regressions.
    improved = baseline is None or rays_per_sec > baseline * 1.005
    if not args.no_update_baseline and improved:
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
