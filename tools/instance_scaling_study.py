"""Instance-scaling study: articulated generalization past 2 instances.

Round-3 found (RESULTS.md) that at n=2 instances the auto-ENCODER's
image-conditioned latents beat the auto-DECODER's interpolated codes on
held-out articulations (29.5 vs 28.3 dB). This tool measures whether that
holds as the instance count grows (the reference surfaces N_max_objs,
models/code_library.py:22-34, but never reports multi-instance numbers), and
sweeps the AE's articulation conditioning (deg-embedding, the reference's
embed_deg default, vs the encoder's raw articulation code;
model_ae_art.py:224,239-240).

One run per invocation (so a driver can budget each):

  python tools/instance_scaling_study.py --mode autodecoder --n 4 \
      --data-root /tmp/scale --out /tmp/scale/results.jsonl

Generates (once, cached by path) a synthetic SAPIEN-layout dataset with a
first-class held-out-articulation val split, trains the mode at its
measured-best TPU preset scaled to a fixed ray budget, and appends one JSON
line: held-out val PSNR (10 deterministic views), object PSNR, steps,
wall-clock.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aonerf_jax_cache")

N_DEGREES = tuple(range(0, 91, 10))
VAL_DEGREES = tuple(range(5, 86, 10))
# round-3 per-mode total-ray budgets (RESULTS.md)
DEFAULT_BUDGET = {"autodecoder": 12.3e6, "ae": 6.55e6}


def build_cfg(args, root: str):
    """Config for one study cell — shared with tools/diagnose_autodecoder.py
    so diagnostics reconstruct exactly the trained run."""
    from aonerf.utils.config import Config

    seed_tag = f"_s{args.seed}" if args.seed else ""
    # dataset-shape tag: runs on a non-default view count get their own run
    # dir (same-named runs on different datasets would otherwise auto-resume
    # from each other's checkpoints — the refscale run hit exactly this)
    if args.n_images != 12:
        seed_tag = f"_v{args.n_images}{seed_tag}"
    if args.mode == "autodecoder":
        return Config(
            exp_type="vanilla_autodecoder", dataset_name="sapien_multi",
            root_dir=root, output_path=os.path.join(args.data_root, "runs"),
            exp_name=f"{args.mode}_n{args.n}{args.tag}{seed_tag}",
            img_wh=tuple(args.img_wh), seed=args.seed,
            batch_size=176, inner_steps=233, compute_dtype="bf16",
            grad_clip=1.0, n_max_objs=max(4, args.n), run_max_steps=90909,
            code_reg_weight=getattr(args, "code_reg", 1e-4),
            chunk=256, val_every_steps=10**9, ckpt_every_steps=10**9,
        )
    batch = args.ae_batch or 160
    return Config(
        exp_type="vanilla_ae_art", dataset_name="sapien_multi",
        root_dir=root, output_path=os.path.join(args.data_root, "runs"),
        exp_name=f"{args.mode}_n{args.n}{args.tag}{seed_tag}",
        img_wh=tuple(args.img_wh), seed=args.seed,
        batch_size=batch, ae_views_per_step=1, inner_steps=256,
        compute_dtype="bf16", grad_clip=1.0, lr_init=2.5e-4,
        ae_encode_reuse=args.ae_encode_reuse,
        # keep the per-ray LR decay rate of the 100k@160 schedule;
        # lr_horizon_scale stretches it for equal-wall-clock A/Bs that
        # train proportionally more rays (default 1.0)
        run_max_steps=int(
            100_000 * 160 / batch * getattr(args, "lr_horizon_scale", 1.0)
        ),
        chunk=256,
        ae_embed_deg=args.mode != "ae_raw",
        val_every_steps=10**9, ckpt_every_steps=10**9,
    )


def ensure_dataset(data_root: str, n: int, img_wh, n_images: int, seed: int) -> str:
    from aonerf.data.synthetic import generate_multi_scene

    root = os.path.join(data_root, f"multi_n{n}_v{n_images}")
    if not os.path.isdir(root):
        generate_multi_scene(
            root, img_wh=tuple(img_wh), n_instances=n, degrees=N_DEGREES,
            n_images=n_images, seed=seed, val_degrees=VAL_DEGREES,
            n_val_images=4,
        )
    return root


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["autodecoder", "ae", "ae_raw"], required=True,
                   help="ae_raw = AE with ae_embed_deg=False (raw encoder "
                        "articulation code conditions the deformation)")
    p.add_argument("--n", type=int, required=True, help="instance count")
    p.add_argument("--data-root", type=str, default="/tmp/aonerf_scale")
    p.add_argument("--out", type=str, default=None,
                   help="JSONL results file (default {data-root}/results.jsonl)")
    p.add_argument("--img-wh", type=int, nargs=2, default=(320, 240))
    p.add_argument("--n-images", type=int, default=12)
    p.add_argument("--budget-rays", type=float, default=None,
                   help="total training rays (default: the round-3 per-mode "
                        "budget: 12.3M autodecoder / 6.55M ae)")
    p.add_argument("--val-views", type=int, default=10)
    p.add_argument("--ae-encode-reuse", type=int, default=1,
                   help="(ae modes) encode-reuse R for the quality A/B")
    p.add_argument("--ae-batch", type=int, default=None,
                   help="(ae modes) override the preset batch size")
    p.add_argument("--code-reg", type=float, default=1e-4,
                   help="(autodecoder) L2 code-regularization weight "
                        "(Config.code_reg_weight; reference hardcodes 1e-4) "
                        "— the seed-collapse mitigation A/B, RESULTS.md r5")
    p.add_argument("--lr-horizon-scale", type=float, default=1.0,
                   help="multiply run_max_steps (the LR-decay horizon) — for "
                        "equal-WALL-CLOCK A/Bs where a faster config trains "
                        "more rays, the schedule must decay at the same "
                        "per-ray rate (e.g. 1.49 for the encode-reuse R=2 "
                        "throughput ratio)")
    p.add_argument("--tag", type=str, default="",
                   help="suffix for exp_name/results so A/B runs don't clobber")
    p.add_argument("--validate-only", action="store_true",
                   help="skip training; restore the run's latest checkpoint "
                        "and re-score held-out val with --val-views views "
                        "(cheap noise reduction for the final table)")
    p.add_argument("--seed", type=int, default=0,
                   help="TRAINING seed (Config.seed: init + sampling PRNG); "
                        "tagged into exp_name and the output record so "
                        "multi-seed cells don't clobber each other")
    p.add_argument("--data-seed", type=int, default=0,
                   help="dataset-generation seed (held fixed across training "
                        "seeds so every seed trains on the same scenes)")
    args = p.parse_args()

    from aonerf.train.loop import Trainer
    from aonerf.utils.config import Config

    root = ensure_dataset(
        args.data_root, args.n, args.img_wh, args.n_images, args.data_seed
    )
    out_path = args.out or os.path.join(args.data_root, "results.jsonl")

    cfg = build_cfg(args, root)
    steps = int((args.budget_rays or DEFAULT_BUDGET[
        "autodecoder" if args.mode == "autodecoder" else "ae"
    ]) / cfg.batch_size)

    t0 = time.time()
    fit_s = None
    tr = Trainer(cfg)
    try:
        assert tr.val_dataset.uses_val_split, "dataset must ship a val split"
        if args.validate_only:
            import jax

            assert int(jax.device_get(tr.state.step)) >= steps, (
                "no trained checkpoint found for this run"
            )
        else:
            t_fit = time.time()
            tr.fit(max_steps=steps)
            fit_s = time.time() - t_fit  # incl. first-step compile
        val = tr.validate(n_images=args.val_views)
    finally:
        tr.close()
    rec = {
        "mode": args.mode + args.tag,
        "n_instances": args.n,
        "seed": args.seed,
        "steps": steps,
        "rays": steps * cfg.batch_size,
        "val_views": args.val_views,
        "val_psnr": round(val["psnr"], 3),
        "val_psnr_obj": round(val.get("psnr_obj", float("nan")), 3),
        "wall_s": round(time.time() - t0, 1),
    }
    if fit_s is not None:
        rec["fit_s"] = round(fit_s, 1)
        rec["rays_per_s_incl_compile"] = round(rec["rays"] / fit_s)
    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
