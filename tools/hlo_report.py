"""Collective-op census of the sharded train steps (round artifact tool).

Lowers the vanilla (ray-sharded), auto-decoder (DDP shard_map) and
auto-encoder (DDP shard_map) train steps on an 8-device virtual CPU mesh and
counts the collectives in the compiled HLO. The invariants (no all-gather of
ray/image buffers, >=1 all-reduce for the grad pmean/psum — the reference's
DDP/NCCL allreduce, run.py:109-111) are enforced as tests in
tests/test_parallel.py; this tool persists the actual counts as an auditable
per-round artifact (ADVICE.md round 1).

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
         python tools/hlo_report.py | tee HLO_rNN.txt
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax


def census(name: str, hlo: str) -> None:
    """Count collective INSTRUCTION DEFINITIONS (lines of the form
    ``%x = <shape> op(...)``), not raw name occurrences — operand references
    (%all-reduce.5 used as an input) would overstate the counts (ADVICE.md
    round 2). Async -start/-done pairs count as one op via the -start line."""
    counts = {}
    for op in ("all-gather", "all-reduce", "all-to-all", "collective-permute",
               "reduce-scatter"):
        # Shapes may be tuples with spaces ("(f32[..], f32[..]) all-reduce("),
        # so match anything after "=" up to the op name immediately followed
        # by its operand paren; the lookbehind rejects operand REFERENCES
        # (%all-reduce.5) and async -done lines.
        defs = re.findall(
            rf"^\s*(?:ROOT\s+)?%?[\w.-]+ = .*?(?<![%\w.-]){op}(?:-start)?\(",
            hlo, re.M,
        )
        counts[op] = len(defs)
    print(f"{name}: " + "  ".join(f"{k}={v}" for k, v in counts.items()))


def main() -> None:
    from aonerf.models import ArticulatedNeRF, CodeLibraryArticulated, NeRF
    from aonerf.models.ae import AutoEncoderArticulatedNeRF
    from aonerf.parallel import (
        make_mesh, replicated_sharding, shard_batch, shard_params,
    )
    from aonerf.train import create_train_state, make_adam, make_vanilla_train_step
    from aonerf.train.step import (
        make_autodecoder_device_train_step, sample_multi_batch,
    )
    from aonerf.train.step_ae import make_ae_device_train_step

    print(f"devices: {len(jax.devices())} x {jax.devices()[0].platform}")
    mesh = make_mesh()
    rng = np.random.default_rng(0)

    # -- vanilla: rays sharded over 'data', params replicated ---------------
    n = 256
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    buf = {
        "rays_o": jnp.asarray(-4.0 * d), "rays_d": jnp.asarray(d),
        "viewdirs": jnp.asarray(d),
        "target": jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)),
    }
    model = NeRF(num_coarse_samples=4, num_fine_samples=4)
    dummy = {k: v[:8] for k, v in buf.items()}
    params = model.init(jax.random.PRNGKey(0), dummy, False, True, 2.0, 6.0)
    tx = make_adam(lr_init=1e-3, lr_delay_steps=0)
    step = make_vanilla_train_step(
        model, tx, white_bkgd=True, near=2.0, far=6.0, batch_size=64, donate=False
    )
    buf_sh = shard_batch(mesh, buf)
    state = create_train_state(shard_params(mesh, params), tx)
    state = jax.device_put(state, replicated_sharding(mesh))
    key = jax.device_put(jax.random.PRNGKey(3), replicated_sharding(mesh))
    census("vanilla_sharded_step", step.lower(state, buf_sh, key).compile().as_text())

    # -- articulated buffers (tiny; h/w large enough for the ResNet stem) ---
    h, w, n_i, n_d, n_v = 48, 64, 2, 3, 2
    hw = h * w
    c2w = np.tile(np.eye(3, 4, dtype=np.float32), (n_i, n_d, n_v, 1, 1))
    c2w[..., 2, 3] = 4.0
    buffers = {
        "rgb": jnp.asarray(rng.integers(0, 255, (n_i, n_d, n_v, hw, 3), dtype=np.uint8)),
        "mask": jnp.asarray(rng.integers(0, 2, (n_i, n_d, n_v, hw)).astype(np.uint8)),
        "c2w": jnp.asarray(c2w),
        "directions": jnp.asarray(rng.standard_normal((hw, 3)).astype(np.float32)),
        "deg": jnp.asarray(np.deg2rad(np.arange(n_d) * 30.0).astype(np.float32)),
    }
    buf_repl = jax.device_put(buffers, replicated_sharding(mesh))
    base_key = jax.random.PRNGKey(7)

    # -- auto-decoder DDP step ----------------------------------------------
    amodel = ArticulatedNeRF(num_coarse_samples=4, num_fine_samples=4)
    lib = CodeLibraryArticulated(n_max_objs=n_i)
    lib_params = lib.init(jax.random.PRNGKey(1), jnp.asarray(0), jnp.asarray(0))
    latents = lib.apply(lib_params, jnp.asarray(0), jnp.asarray(0))
    latents = {k: jnp.atleast_2d(v) for k, v in latents.items()}
    dummy = sample_multi_batch(buffers, jax.random.PRNGKey(0), 16)
    mp = amodel.init(jax.random.PRNGKey(0), dummy, False, True, 2.0, 6.0, latents)
    ad_params = {"model": mp, "codes": lib_params}
    ad_step = make_autodecoder_device_train_step(
        amodel, lib, optax.sgd(1e-2), white_bkgd=True, near=2.0, far=6.0,
        batch_size=16, donate=False, mesh=mesh,
    )
    ad_state = jax.device_put(
        create_train_state(ad_params, optax.sgd(1e-2)), replicated_sharding(mesh)
    )
    census(
        "autodecoder_ddp_step",
        ad_step.lower(ad_state, buf_repl, base_key).compile().as_text(),
    )

    # -- auto-encoder DDP step ----------------------------------------------
    ae = AutoEncoderArticulatedNeRF(num_coarse_samples=4, num_fine_samples=4)
    dummy = sample_multi_batch(buffers, jax.random.PRNGKey(0), 16, src_hw=(h, w))
    ae_params = ae.init(
        jax.random.PRNGKey(0), dummy, dummy["src_imgs"][None], dummy["deg"],
        False, True, 2.0, 6.0,
    )
    ae_step = make_ae_device_train_step(
        ae, optax.sgd(1e-2), white_bkgd=True, near=2.0, far=6.0, img_wh=(w, h),
        batch_size=16, donate=False, mesh=mesh,
    )
    ae_state = jax.device_put(
        create_train_state(ae_params, optax.sgd(1e-2)), replicated_sharding(mesh)
    )
    census(
        "ae_ddp_step",
        ae_step.lower(ae_state, buf_repl, base_key).compile().as_text(),
    )


if __name__ == "__main__":
    main()
