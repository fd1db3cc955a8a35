"""Per-instance diagnosis of an instance-scaling autodecoder run.

Round-4 left an anomaly (VERDICT r4 weak #3): the autodecoder cell at n=4
lands ~5 dB below BOTH n=2 and n=6 on held-out val. This tool attributes the
mechanism for a trained study run by separating:

  - training collapse: per-instance PSNR on TRAIN views with the learned
    codes (a collapsed instance scores low here too);
  - val-conditioning artifact: held-out val views scored two ways —
    with the interpolated midpoint articulation codes (the study protocol,
    reference models/code_library.py:55-71) vs with the NEAREST LEARNED train
    code (is_test=False). A large gap means the articulation code table is
    not midpoint-interpolable (a code-geometry property of the run), not a
    bad radiance field;
  - code-table geometry: per-instance shape/appearance norms, per-degree
    articulation norms, and adjacent-articulation cosine similarity (midpoint
    quality is governed by local smoothness of that table).

Usage (args mirror tools/instance_scaling_study.py so the cfg/exp_name
reconstruction matches the trained run exactly):

  python tools/diagnose_autodecoder.py --n 4 --seed 0 \
      --data-root /tmp/aonerf_scale --out studies/diag_n4_s0.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aonerf_jax_cache")

import numpy as np

from instance_scaling_study import DEFAULT_BUDGET, build_cfg, ensure_dataset


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data-seed", type=int, default=0)
    p.add_argument("--data-root", type=str, default="/tmp/aonerf_scale")
    p.add_argument("--img-wh", type=int, nargs=2, default=(320, 240))
    p.add_argument("--n-images", type=int, default=12)
    p.add_argument("--tag", type=str, default="")
    p.add_argument("--views-per-cell", type=int, default=3,
                   help="rendered views per (instance, protocol, degree-slot)")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()
    args.mode = "autodecoder"
    args.budget_rays = None
    args.ae_batch = None
    args.ae_encode_reuse = 1

    import jax
    import jax.numpy as jnp

    from aonerf.data.sapien_multi import SapienMultiDataset
    from aonerf.eval.metrics import psnr_image
    from aonerf.train.loop import Trainer

    root = ensure_dataset(
        args.data_root, args.n, args.img_wh, args.n_images, args.data_seed
    )
    cfg = build_cfg(args, root)
    tr = Trainer(cfg)
    try:
        step = int(jax.device_get(tr.state.step))
        assert step > 0, f"no trained checkpoint under {tr.run_dir}"

        train_ds = SapienMultiDataset(
            root, split="train", img_wh=cfg.img_wh, white_back=cfg.white_back
        )
        val_ds = tr.val_dataset
        assert val_ds.uses_val_split

        def render_psnr(ds, ii, di, vi, latents):
            img = ds.get_image(ii, di, vi)
            rays = {k: jnp.asarray(img[k]) for k in ("rays_o", "rays_d", "viewdirs")}
            rgb, _, _ = tr._renderer(tr.state.params["model"], rays, latents)
            return float(psnr_image(rgb, jnp.asarray(img["target"]))), img

        train_degs = train_ds.degrees_rad()  # learned-code degree grid
        per_instance = []
        for ii in range(args.n):
            # degree slots spread over each split's range
            def slots(ds):
                n_d = ds.n_articulations(ii)
                return sorted({0, n_d // 2, n_d - 1})

            rec = {"instance": ii}
            # protocol 1: TRAIN views, learned codes → training health
            vals = []
            for di in slots(train_ds):
                for vi in range(min(args.views_per_cell, train_ds.n_images(ii, di))):
                    lat = tr._latents_for(ii, di)
                    p_, _ = render_psnr(train_ds, ii, di, vi, lat)
                    vals.append(p_)
            rec["train_psnr"] = round(float(np.mean(vals)), 3)
            # protocols 2+3: HELD-OUT val views, midpoint-interpolated codes
            # (study protocol) vs nearest learned train code
            interp, nearest = [], []
            for di in slots(val_ds):
                for vi in range(min(args.views_per_cell, val_ds.n_images(ii, di))):
                    img = val_ds.get_image(ii, di, vi)
                    deg = float(img["deg"])
                    lat_i = tr._latents_for(
                        ii, tr._interp_articulation_id(deg), is_test=True
                    )
                    p_, _ = render_psnr(val_ds, ii, di, vi, lat_i)
                    interp.append(p_)
                    near_di = int(np.argmin(np.abs(train_degs - deg)))
                    lat_n = tr._latents_for(ii, near_di)
                    p_, _ = render_psnr(val_ds, ii, di, vi, lat_n)
                    nearest.append(p_)
            rec["val_psnr_interp"] = round(float(np.mean(interp)), 3)
            rec["val_psnr_nearest"] = round(float(np.mean(nearest)), 3)
            per_instance.append(rec)

        codes = tr.state.params["codes"]["params"]
        shape_t = np.asarray(codes["embedding_instance_shape"]["embedding"], np.float64)
        app_t = np.asarray(
            codes["embedding_instance_appearance"]["embedding"], np.float64
        )
        art_t = np.asarray(
            codes["embedding_instance_articulation"]["embedding"], np.float64
        )
        adj_cos = np.sum(art_t[:-1] * art_t[1:], axis=-1) / (
            np.linalg.norm(art_t[:-1], axis=-1) * np.linalg.norm(art_t[1:], axis=-1)
        )
        out = {
            "run": tr.run_dir,
            "step": step,
            "n_instances": args.n,
            "seed": args.seed,
            "per_instance": per_instance,
            "shape_norms": [round(float(x), 3) for x in
                            np.linalg.norm(shape_t, axis=-1)[: args.n]],
            "appearance_norms": [round(float(x), 3) for x in
                                 np.linalg.norm(app_t, axis=-1)[: args.n]],
            "articulation_norms": [round(float(x), 3) for x in
                                   np.linalg.norm(art_t, axis=-1)],
            "articulation_adjacent_cos": [round(float(x), 4) for x in adj_cos],
        }
    finally:
        tr.close()

    text = json.dumps(out, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
