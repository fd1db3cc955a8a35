"""Capture a device trace of the vanilla train step and print per-op time.

Usage: python tools/profile_train.py [--batch-size 224] [--inner-steps 183]
       [--dtype bf16] [--top 30]

TPU-native replacement for the reference's Lightning profiler="simple"
(run.py:108,128): traces the fully fused train program (batch gather ->
hierarchical render -> grads -> Adam) with jax.profiler and aggregates
device op time via aonerf.utils.xplane (no TensorFlow needed).
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=224)
    p.add_argument("--inner-steps", type=int, default=183)
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--trace-dir", type=str, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from aonerf.models import NeRF
    from aonerf.train import create_train_state, make_adam
    from aonerf.train.step import make_vanilla_train_multi_step
    from aonerf.utils.xplane import device_op_table

    model = NeRF(
        compute_dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    )
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
    step = make_vanilla_train_multi_step(
        model, tx, white_bkgd=True, near=2.0, far=6.0,
        batch_size=args.batch_size, inner_steps=args.inner_steps, donate=False,
    )
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
