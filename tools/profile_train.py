"""Capture a device trace of a train step and print per-op time.

Usage: python tools/profile_train.py [--exp-type vanilla|autodecoder|ae]
       [--batch-size N] [--inner-steps K] [--dtype bf16] [--top 30]

TPU-native replacement for the reference's Lightning profiler="simple"
(run.py:108,128): traces the fully fused train program (batch sampling ->
[encode ->] hierarchical render -> grads -> Adam) with jax.profiler and
aggregates device op time via aonerf.utils.xplane (no TensorFlow needed).
Model/step construction is shared with bench.py, so what is profiled is
exactly what is benchmarked.
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aonerf_jax_cache")


def main() -> None:
    import bench as bench_mod

    p = argparse.ArgumentParser()
    p.add_argument("--exp-type", "--exp_type", dest="exp_type",
                   choices=sorted(bench_mod._MODE_DEFAULTS), default="vanilla")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--inner-steps", type=int, default=None)
    p.add_argument("--views-per-step", type=int, default=None)
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument("--latent-dense", action="store_true", default=True)
    p.add_argument("--no-latent-dense", dest="latent_dense", action="store_false")
    p.add_argument("--cond-dense", action="store_true")
    p.add_argument("--fused", action="store_true")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--trace-dir", type=str, default=None)
    args = p.parse_args()

    defaults = bench_mod._MODE_DEFAULTS[args.exp_type]
    if args.batch_size is None:
        args.batch_size = defaults["batch_size"]
    if args.inner_steps is None:
        args.inner_steps = defaults["inner_steps"]
    if args.views_per_step is None:
        args.views_per_step = defaults.get("views_per_step", 1)

    import jax
    import jax.numpy as jnp

    from aonerf.utils.xplane import device_op_table

    compute_dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    build = {"vanilla": bench_mod._build_vanilla,
             "autodecoder": bench_mod._build_autodecoder,
             "ae": bench_mod._build_ae}[args.exp_type]
    step, state, buffers = build(args, compute_dtype)
    key = jax.random.PRNGKey(0)
    for _ in range(2):  # compile + settle
        state, m = step(state, buffers, key)
        float(m["loss"])

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="aonerf_trace_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(2):
        state, m = step(state, buffers, key)
        float(m["loss"])
    jax.profiler.stop_trace()

    print(f"trace: {trace_dir}")
    print(device_op_table(trace_dir, top_k=args.top))


if __name__ == "__main__":
    main()
