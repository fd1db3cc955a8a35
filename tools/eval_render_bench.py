"""Eval-render throughput + bound accounting (vanilla and articulated).

Measures the one-dispatch tiled image renderer (`make_image_renderer`) and
closes the eval perf story the way the train steps' rooflines do
(RESULTS.md): achieved rays/s, FLOPs per dispatch from XLA's own
cost analysis, effective TF/s, and an f32-vs-bf16 A/B that locates the bound
(matmul-rate-sensitive => MXU-bound; insensitive => bound by the
sampling/CDF/merge VPU chain + memory movement, like the vanilla render).

  python tools/eval_render_bench.py --mode articulated --img-wh 320 240
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aonerf_jax_cache")


def _rays(n, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "rays_o": jnp.asarray((-4.0 * d).astype(np.float32)),
        "rays_d": jnp.asarray(d),
        "viewdirs": jnp.asarray(d),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["vanilla", "articulated"], default="articulated")
    p.add_argument("--img-wh", type=int, nargs=2, default=(320, 240))
    p.add_argument("--chunks", type=int, nargs="+", default=[128, 256, 512])
    p.add_argument("--dtypes", nargs="+", default=["f32", "bf16"])
    p.add_argument("--reps", type=int, default=6)
    p.add_argument("--latent-dense", action="store_true", default=True)
    p.add_argument("--no-latent-dense", dest="latent_dense", action="store_false")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from aonerf.eval.render import make_image_renderer

    w, h = args.img_wh
    n = w * h
    rays = _rays(n)
    init_rays = {k: v[:8] for k, v in rays.items()}  # tiny init trace
    print(f"device={jax.devices()[0]} image={w}x{h} ({n} rays) mode={args.mode}")

    for dtype in args.dtypes:
        cd = jnp.bfloat16 if dtype == "bf16" else jnp.float32
        if args.mode == "vanilla":
            from aonerf.models import NeRF

            model = NeRF(compute_dtype=cd)
            params = model.init(jax.random.PRNGKey(0), init_rays, False, True, 2.0, 6.0)
            latents = None
        else:
            from aonerf.models import ArticulatedNeRF

            model = ArticulatedNeRF(compute_dtype=cd, latent_dense=args.latent_dense)
            rng = np.random.default_rng(1)
            latents = {
                "density": jnp.asarray(rng.standard_normal((1, 128)), jnp.float32),
                "color": jnp.asarray(rng.standard_normal((1, 128)), jnp.float32),
                "articulation": jnp.asarray(rng.standard_normal((1, 32)), jnp.float32),
            }
            params = model.init(
                jax.random.PRNGKey(0), init_rays, False, True, 2.0, 6.0, latents
            )
        for chunk in args.chunks:
            r = make_image_renderer(
                model, True, 2.0, 6.0, chunk=chunk,
                uses_latents=latents is not None,
            )
            call = (lambda: r(params, rays, latents)) if latents is not None else (
                lambda: r(params, rays)
            )
            out = call()
            float(jnp.sum(out[0]))  # sync: fetch a computed scalar
            # XLA's own FLOP count for the compiled dispatch
            try:
                if latents is not None:
                    lowered = jax.jit(r).lower(params, rays, latents)
                else:
                    lowered = jax.jit(r).lower(params, rays)
                cost = lowered.compile().cost_analysis()
                flops = (cost or {}).get("flops", float("nan"))
            except Exception:
                flops = float("nan")
            t0 = time.perf_counter()
            acc = 0.0
            for _ in range(args.reps):
                acc += float(jnp.sum(call()[0]))  # honest per-call sync
            dt = (time.perf_counter() - t0) / args.reps
            assert np.isfinite(acc)
            tf = flops / dt / 1e12 if np.isfinite(flops) else float("nan")
            print(
                f"  dtype={dtype} chunk={chunk}: {n / dt / 1e3:8.1f}K rays/s  "
                f"{dt * 1e3:7.1f} ms/img  {flops / 1e9 if np.isfinite(flops) else float('nan'):7.1f} GFLOP  "
                f"{tf:6.2f} TF/s"
            )


if __name__ == "__main__":
    main()
