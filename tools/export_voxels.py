"""Export a trained field's occupancy point cloud: checkpoint → PLY.

Drives aonerf.viz.voxelgrid against a run directory — the user-facing
geometry-inspection surface replacing the reference's interactive open3d /
pyvista tooling (visualize_nerf/vis_voxel_grid.py and the viewer suite).
The N^3 density grid is one jitted dispatch on the accelerator.

Usage:
  # vanilla run
  python tools/export_voxels.py --config /tmp/v/train.json --out occ.ply

  # autodecoder run: pick the instance + articulation slot (learned codes);
  # AE run: same flags — latents are encoded from that slot's source view
  python tools/export_voxels.py --config cfg.json --out occ.ply \
      --instance 0 --articulation 0 [--resolution 128] [--threshold 10] \
      [--bbox -1.5 1.5]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aonerf_jax_cache")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, required=True, help="train config JSON")
    p.add_argument("--out", type=str, required=True, help="output .ply path")
    p.add_argument("--resolution", type=int, default=128)
    p.add_argument("--threshold", type=float, default=10.0)
    p.add_argument("--bbox", type=float, nargs=2, default=(-1.5, 1.5),
                   help="cubic bbox [lo, hi] on every axis")
    p.add_argument("--instance", type=int, default=0, help="articulated runs")
    p.add_argument("--articulation", type=int, default=0, help="articulated runs")
    p.add_argument("--mesh", type=str, default=None,
                   help="also extract a triangle-mesh isosurface PLY "
                        "(marching tetrahedra at --threshold) to this path")
    args = p.parse_args(argv)

    import jax

    from aonerf.train.loop import Trainer
    from aonerf.utils.config import load_config
    from aonerf.viz import voxelgrid as vg

    cfg = load_config(args.config, {})
    tr = Trainer(cfg)
    try:
        step = int(jax.device_get(tr.state.step))
        if step <= 0:
            raise SystemExit(f"no trained checkpoint found for {cfg.exp_name!r}")

        if cfg.exp_type == "vanilla":
            fn = vg.nerf_density_fn(tr.model, tr.state.params)
        elif cfg.exp_type == "vanilla_autodecoder":
            lat = tr._latents_for(args.instance, args.articulation)
            fn = vg.articulated_density_fn(tr.model, tr.state.params["model"], lat)
        else:  # AE: latents encoded from the (instance, articulation) source view
            img = tr.dataset.get_image(args.instance, args.articulation, 0)
            params, lat, _ = tr._render_setup(img)
            fn = vg.ae_density_fn(tr.model, params, lat)

        lo, hi = args.bbox
        bbox_min, bbox_max = (lo,) * 3, (hi,) * 3
        grid = vg.density_grid(fn, bbox_min, bbox_max, args.resolution)
        pts = vg.occupied_points(grid, bbox_min, bbox_max, args.threshold)
        from aonerf.viz.pointcloud import write_ply

        path = write_ply(args.out, pts.astype("float32"))
        summary = {
            "out": path, "occupied": int(len(pts)),
            "resolution": args.resolution, "threshold": args.threshold,
            "step": step,
        }
        if args.mesh:
            from aonerf.viz.mesh import marching_tetrahedra, write_mesh_ply

            verts, faces = marching_tetrahedra(
                grid, args.threshold, bbox_min, bbox_max
            )
            summary["mesh"] = write_mesh_ply(args.mesh, verts, faces)
            summary["mesh_verts"] = int(len(verts))
            summary["mesh_faces"] = int(len(faces))
        print(json.dumps(summary))
    finally:
        tr.close()


if __name__ == "__main__":
    main()
