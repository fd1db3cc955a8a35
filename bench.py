"""Benchmark: rays/sec/chip, forward+backward, for all three training modes.

Measures the complete jitted train step (on-device batch sampling ->
hierarchical 64+128-sample render -> losses -> grads -> Adam) for the
experiment type selected by ``--exp-type``:

  vanilla      SAPIEN-640x480-sized ray population, the reference's vanilla
               training configuration (BASELINE.md). The default (what the
               driver runs).
  autodecoder  latent-conditioned articulated field + code-library lookup on
               a synthetic multi-config buffer set (2 instances x 10
               articulations x 12 views @ 320x240).
  ae           auto-encoder step incl. the per-step multi-view ResNet34
               encode fwd+bwd (V=2 x 384 rays/view, the measured-fastest
               preset, RESULTS.md).

Prints ONE JSON line on stdout; progress goes to stderr. The reference
publishes no numbers (BASELINE.md), so ``vs_baseline`` is the ratio against
this repo's own recorded best for the mode (bench_baseline.json, updated when
the number improves) — it tracks regression/progress across rounds.

Robustness (a driver-graded artifact must not die silently): the JAX
compilation cache dir is defaulted from inside the script, progress lines
bracket the cold compile, and ``--budget-s`` bounds total wall clock — when
the budget runs out mid-measurement the JSON is emitted from however many
timed steps completed instead of nothing.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# Per-mode measured-fastest shapes (RESULTS.md): batch rays/step and
# scan-fused steps/dispatch. Small batches keep fwd+bwd activations
# VMEM-resident; bf16 dots roughly double the MXU rate on top. Vanilla fine
# sweep: 192->117.8K, 224->122.7K, 256->119.9K, 288->122.6K, 320->103.5K
# (cliff). Autodecoder optimum sits lower (160) because the deformation MLP +
# latent concats add activations per ray; 176 with the latent_dense
# schedule. AE: 2 views x 384 rays/view batch two ResNet34 encodes into one
# forward — the rays/s-optimal shape (see RESULTS.md for the
# quality-per-wall-clock guidance). Batches >
# 4096 (or bf16 @ 4096) trip an XLA regalloc RET_CHECK (live_range_finder.cc)
# on this toolchain.
_MODE_DEFAULTS = {
    "vanilla": {"batch_size": 224, "inner_steps": 183},
    "autodecoder": {"batch_size": 176, "inner_steps": 233},
    "ae": {"batch_size": 768, "inner_steps": 25, "views_per_step": 2},
}


def _log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _synthetic_rays(n_rays: int):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    d = rng.standard_normal((n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "rays_o": jnp.asarray((-4.0 * d).astype(np.float32)),
        "rays_d": jnp.asarray(d),
        "viewdirs": jnp.asarray(d),
        "target": jnp.asarray(rng.uniform(size=(n_rays, 3)).astype(np.float32)),
    }


def _synthetic_multi_buffers(img_wh=(320, 240), n_i=2, n_d=10, n_v=12):
    """Random buffers in the exact SapienMultiDataset.device_buffers() schema
    (aonerf/data/sapien_multi.py:203-244) — throughput only needs the shapes."""
    import jax.numpy as jnp

    w, h = img_wh
    hw = h * w
    rng = np.random.default_rng(0)
    c2w = np.zeros((n_i, n_d, n_v, 3, 4), np.float32)
    c2w[..., :3, :3] = np.eye(3, dtype=np.float32)
    c2w[..., 2, 3] = -4.0
    i, j = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    f = 0.5 * w / np.tan(0.5 * np.deg2rad(35.0))
    directions = np.stack(
        [(i - w / 2) / f, -(j - h / 2) / f, -np.ones_like(i, np.float32)], -1
    ).astype(np.float32)
    return {
        "rgb": jnp.asarray(rng.integers(0, 256, (n_i, n_d, n_v, hw, 3), np.uint8)),
        "mask": jnp.asarray(rng.integers(0, 2, (n_i, n_d, n_v, hw), np.uint8)),
        "c2w": jnp.asarray(c2w),
        "deg": jnp.asarray(np.deg2rad(np.arange(n_d) * 10.0).astype(np.float32)),
        "directions": jnp.asarray(directions.reshape(-1, 3)),
    }


def _build_vanilla(args, compute_dtype):
    import jax

    from aonerf.models import NeRF
    from aonerf.train import create_train_state, make_adam
    from aonerf.train.step import make_vanilla_train_multi_step

    model = NeRF(compute_dtype=compute_dtype,  # full 64+128 hierarchy
                 cond_dense=args.cond_dense)
    buffers = _synthetic_rays(640 * 480)
    dummy = {k: v[:8] for k, v in buffers.items()}
    params = model.init(jax.random.PRNGKey(0), dummy, False, True, 2.0, 6.0)
    tx = make_adam(grad_clip=args.grad_clip or None)
    if args.fused:
        from aonerf.ops.kernels.fused_train import make_fused_vanilla_train_multi_step

        step = make_fused_vanilla_train_multi_step(
            tx, white_bkgd=True, near=2.0, far=6.0, batch_size=args.batch_size,
            inner_steps=args.inner_steps, dot_bf16=(args.dtype == "bf16"),
            donate=False,
        )
    else:
        step = make_vanilla_train_multi_step(
            model, tx, white_bkgd=True, near=2.0, far=6.0,
            batch_size=args.batch_size, inner_steps=args.inner_steps,
            donate=False,
        )
    return step, create_train_state(params, tx), buffers


def _build_autodecoder(args, compute_dtype):
    import jax
    import jax.numpy as jnp

    from aonerf.models import ArticulatedNeRF, CodeLibraryArticulated
    from aonerf.train import create_train_state, make_adam
    from aonerf.train.step import make_autodecoder_device_train_step

    model = ArticulatedNeRF(compute_dtype=compute_dtype,
                            latent_dense=args.latent_dense)
    code_library = CodeLibraryArticulated(n_max_objs=2)
    buffers = _synthetic_multi_buffers()
    key = jax.random.PRNGKey(0)
    lib_params = code_library.init(key, jnp.asarray(0), jnp.asarray(0))
    latents = code_library.apply(lib_params, jnp.asarray(0), jnp.asarray(0))
    latents = {k: jnp.atleast_2d(v) for k, v in latents.items()}
    dummy = {k: v[:8] for k, v in _synthetic_rays(8).items()}
    model_params = model.init(key, dummy, False, True, 2.0, 6.0, latents)
    tx = make_adam(grad_clip=args.grad_clip or None)
    step = make_autodecoder_device_train_step(
        model, code_library, tx, True, 2.0, 6.0, batch_size=args.batch_size,
        inner_steps=args.inner_steps, donate=False,
    )
    return step, create_train_state({"model": model_params, "codes": lib_params}, tx), buffers


def _build_ae(args, compute_dtype):
    import jax
    import jax.numpy as jnp

    from aonerf.models.ae import AutoEncoderArticulatedNeRF
    from aonerf.train import create_train_state, make_adam
    from aonerf.train.step_ae import make_ae_device_train_step

    img_wh = (320, 240)
    w, h = img_wh
    model = AutoEncoderArticulatedNeRF(compute_dtype=compute_dtype,
                                       latent_dense=args.latent_dense)
    buffers = _synthetic_multi_buffers(img_wh=img_wh)
    dummy = {k: v[:8] for k, v in _synthetic_rays(8).items()}
    src = jnp.zeros((1, 3, h, w))
    params = model.init(
        jax.random.PRNGKey(0), dummy, src, jnp.asarray(0.5), False, True, 2.0, 6.0
    )
    # lr 2.5e-4: the measured joint encoder+field stability edge (RESULTS.md)
    tx = make_adam(lr_init=2.5e-4, grad_clip=args.grad_clip or None)
    step = make_ae_device_train_step(
        model, tx, True, 2.0, 6.0, img_wh=img_wh, batch_size=args.batch_size,
        inner_steps=args.inner_steps, donate=False,
        views_per_step=args.views_per_step,
        encode_reuse=getattr(args, "encode_reuse", 1),
    )
    return step, create_train_state(params, tx), buffers


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--exp-type", "--exp_type", dest="exp_type",
                   choices=sorted(_MODE_DEFAULTS), default="vanilla")
    p.add_argument("--all", dest="all_modes", action="store_true",
                   help="bench ALL THREE modes in one run and write "
                        "bench_all.json (per-mode rays/s + vs_baseline); "
                        "stdout still prints the driver-contract single "
                        "vanilla JSON line. The per-round artifact that "
                        "makes autodecoder/ae regressions visible "
                        "(VERDICT r3 weak #3).")
    p.add_argument("--batch-size", type=int, default=None,
                   help="rays per optimizer step (default: per-mode best)")
    p.add_argument("--steps", type=int, default=12, help="outer (timed) calls")
    p.add_argument("--inner-steps", type=int, default=None,
                   help="optimizer steps fused into one program via lax.scan "
                        "(default: per-mode best)")
    p.add_argument("--views-per-step", type=int, default=None,
                   help="(ae) source views encoded per step")
    p.add_argument("--encode-reuse", type=int, default=1,
                   help="(ae) R optimizer steps per sampled view: 1 full "
                        "encode+field step then R-1 field-only steps on the "
                        "cached latents (train/step_ae.py encode_reuse)")
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--grad-clip", type=float, default=1.0,
                   help="global-norm gradient clip (0 = off); required for "
                        "stable bf16 training, so the benched step includes it")
    p.add_argument("--fused", action="store_true",
                   help="(vanilla) use the Pallas fused fwd+bwd ray-march "
                        "kernels (demoted to a parity cross-check: loses to "
                        "the VMEM-resident XLA step at the shipped batch "
                        "size — see the roofline in RESULTS.md)")
    p.add_argument("--cond-dense", action="store_true",
                   help="(vanilla) contract the view-condition kernel "
                        "columns per ray instead of tiling the condition "
                        "over samples (models/mlp.py::NeRFMLP.cond_dense)")
    p.add_argument("--latent-dense", action="store_true", default=True,
                   help="(autodecoder/ae) contract latent kernel columns per "
                        "view instead of materializing rows x C broadcasts "
                        "(models/articulated.py::_latent_dense). Default ON: "
                        "+19.6%% autodecoder / +10.7%% ae measured, same math "
                        "(RESULTS.md)")
    p.add_argument("--no-latent-dense", dest="latent_dense",
                   action="store_false",
                   help="use the reference-shaped concat schedule")
    p.add_argument("--budget-s", type=float, default=240.0,
                   help="total wall-clock budget incl. compile; when exceeded "
                        "mid-measurement, emit the JSON from the steps that "
                        "completed instead of dying with no output")
    p.add_argument("--no-update-baseline", action="store_true")
    p.add_argument("--no-pipeline", dest="pipeline", action="store_false",
                   help="fetch the loss scalar after every dispatch instead "
                        "of chaining dispatches; both modes are honest (the "
                        "clock stops only after all computed scalars reach "
                        "the host), pipelining just overlaps host dispatch "
                        "with device compute")
    args = p.parse_args()

    # A cold compile of the full train step takes 60-90 s on this runtime
    # (remote compile helper); cache it so only the first-ever run pays.
    # Must be set before jax imports — the driver does not set it (round 2's
    # BENCH artifact died to exactly this, VERDICT.md "What's weak" #1).
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aonerf_jax_cache")
    t_start = time.perf_counter()

    if args.all_modes:
        results = {}
        modes = ["vanilla", "autodecoder", "ae"]  # vanilla first: it is the
        # driver-contract stdout line, so it gets the freshest budget
        for i, mode in enumerate(modes):
            # slice the remaining wall-clock budget evenly over what's left
            sub = argparse.Namespace(**vars(args))
            sub.exp_type = mode
            sub.batch_size = sub.inner_steps = sub.views_per_step = None
            # --all measures the per-mode DEFAULT presets: reset the
            # encoder-amortization lever too, else a user-passed
            # --encode-reuse collides with the restored ae default
            # views_per_step=2 (ValueError) and kills the multi-mode run
            sub.encode_reuse = 1
            remaining = args.budget_s - (time.perf_counter() - t_start)
            sub.budget_s = max(30.0, remaining / (len(modes) - i))
            results[mode] = _bench_mode(sub, time.perf_counter())
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "bench_all.json"), "w") as f:
            json.dump(results, f, indent=1)
        _log(f"bench_all.json: " + " ".join(
            f"{m}={r['value']:.0f}({r['vs_baseline']:.3f}x)"
            for m, r in results.items()
        ))
        print(json.dumps(results["vanilla"]))  # driver-contract single line
        return

    print(json.dumps(_bench_mode(args, t_start)))


def _bench_mode(args, t_start: float) -> dict:
    """Build + warm up + measure one mode; ratchets bench_baseline.json and
    returns the result record. ``args.budget_s`` bounds this mode's wall
    clock from ``t_start``."""
    defaults = _MODE_DEFAULTS[args.exp_type]
    if args.batch_size is None:
        args.batch_size = defaults["batch_size"]
    if args.inner_steps is None:
        args.inner_steps = defaults["inner_steps"]
    if args.views_per_step is None:
        args.views_per_step = defaults.get("views_per_step", 1)

    import jax
    import jax.numpy as jnp

    compute_dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    _log(f"mode={args.exp_type} batch={args.batch_size} K={args.inner_steps} "
         f"dtype={args.dtype} device={jax.devices()[0]}")
    build = {"vanilla": _build_vanilla, "autodecoder": _build_autodecoder,
             "ae": _build_ae}[args.exp_type]
    step, state, buffers = build(args, compute_dtype)
    key = jax.random.PRNGKey(0)

    # Hard-sync every step by fetching the loss scalar to the host: on the
    # axon runtime, block_until_ready (even on every state leaf) can return
    # before remote execution completes, inflating throughput ~100x. A
    # device->host read of a computed value cannot lie. The measured time
    # therefore includes per-step host latency — it is a conservative,
    # honest lower bound on pipelined throughput.
    _log("compiling + warmup (cold compile can take 60-90 s)...")
    t_c = time.perf_counter()
    for i in range(max(1, args.warmup)):
        state, metrics = step(state, buffers, key)
        float(metrics["loss"])
        if i == 0:
            _log(f"first step (compile) done in {time.perf_counter() - t_c:.1f} s")

    def over_budget() -> bool:
        return time.perf_counter() - t_start > args.budget_s

    t0 = time.perf_counter()
    done = 0
    losses = []
    for _ in range(args.steps):
        state, metrics = step(state, buffers, key)
        if args.pipeline:
            losses.append(metrics["loss"])
        else:
            float(metrics["loss"])
        done += 1
        if done >= 1 and over_budget():
            _log(f"budget {args.budget_s:.0f} s exhausted after {done} timed "
                 f"steps; emitting partial result")
            break
    # Pipelined mode: the clock stops only after every computed scalar has
    # reached the host.
    vals = [float(l) for l in losses]
    assert all(v == v for v in vals)
    dt = time.perf_counter() - t0
    _log(f"{done} timed calls in {dt:.2f} s")

    rays_per_sec = args.batch_size * args.inner_steps * done / dt

    # Per-mode baselines keyed by exp_type; a legacy flat file (round 1-2
    # format, vanilla only) is read as the vanilla entry and migrated on the
    # next improvement.
    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json"
    )
    book = {}
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            book = json.load(f)
        if "rays_per_sec" in book:  # legacy flat format
            book = {"vanilla": book}
    baseline = book.get(args.exp_type, {}).get("rays_per_sec")
    vs_baseline = rays_per_sec / baseline if baseline else 1.0
    # Ratchet the recorded best only on improvements beyond run-to-run noise
    # (~0.5% measured): noise-level ratcheting pins vs_baseline at 1.0 and
    # slowly masks real regressions.
    improved = baseline is None or rays_per_sec > baseline * 1.005
    if not args.no_update_baseline and improved:
        book[args.exp_type] = {
            "rays_per_sec": rays_per_sec, "dtype": args.dtype,
            "batch_size": args.batch_size, "device": str(jax.devices()[0]),
        }
        with open(baseline_path, "w") as f:
            json.dump(book, f, indent=1)

    suffix = "" if args.exp_type == "vanilla" else f"_{args.exp_type}"
    return {
        "metric": f"rays_per_sec_per_chip_fwd_bwd{suffix}",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs_baseline, 4),
    }


if __name__ == "__main__":
    main()
