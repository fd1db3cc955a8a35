"""Offline dataset generation driver.

Reference parity: datagen/data_gen.py + data_utils.py — the reference renders
articulated URDF objects with the SAPIEN C++ simulator into
rgb (alpha = seg mask) / depth / seg / transforms.json (per-frame 4x4 c2w
"model matrix" + focal), 100/50/50 random poses on a radius-4±0.5 sphere.

This driver keeps that contract: when the ``sapien`` package is importable it
renders through the simulator (host-side CPU work — data generation is not
TPU work); otherwise it falls back to the analytic articulated-laptop
ray-tracer (aonerf.data.synthetic), which emits the identical on-disk layout.

Usage: python -m aonerf.data.datagen.generate --config gen.json
Config keys: out_dir, mode ('single'|'multi'), img_wh, counts, degrees,
urdf_file (sapien only).
"""

import argparse
import json


def have_sapien() -> bool:
    try:
        import sapien  # noqa: F401

        return True
    except ImportError:
        return False


def generate_with_sapien(cfg: dict) -> str:
    """SAPIEN-backed generation (requires the simulator; mirrors
    data_gen.py:34-87: engine + offscreen renderer, kinematic URDF, 35 deg
    fovy camera, random sphere poses, per-frame model matrix). Dispatches on
    ``mode``: single (default), multi (needs ``urdf_files``), replay (needs
    ``render_pose_path``). See aonerf.data.datagen.sapien_backend."""
    from aonerf.data.datagen import sapien_backend as sb

    mode = cfg.get("mode", "single")
    if mode == "replay":
        return sb.replay_sapien_scene(cfg)
    if mode == "multi":
        return sb.generate_sapien_multi(cfg)
    return sb.generate_sapien_scene(cfg)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, required=True)
    args = p.parse_args(argv)
    with open(args.config) as f:
        cfg = json.load(f)

    if have_sapien() and (cfg.get("urdf_file") or cfg.get("urdf_files")):
        generate_with_sapien(cfg)
        print(json.dumps({"out_dir": cfg["out_dir"], "backend": "sapien"}))
        return

    from aonerf.data.synthetic import (
        generate_multi_scene,
        generate_single_scene,
        replay_scene,
    )

    img_wh = tuple(cfg.get("img_wh", (320, 240)))
    if cfg.get("mode", "single") == "replay":
        # Saved-pose replay (reference: data_utils.py:244-288 / the
        # data_gen_saved_pose.json config): re-render at the c2w poses stored
        # in an existing transforms.json.
        replay_scene(
            cfg["out_dir"],
            transforms_path=cfg["transforms"],
            split=cfg.get("split", "replay"),
            img_wh=img_wh,
            articulation_deg=cfg.get("articulation_deg", 80.0),
            instance_seed=cfg.get("instance_seed", 0),
            write_depth=cfg.get("write_depth", False),
        )
    elif cfg.get("mode", "single") == "multi":
        from aonerf.data.sapien_multi import DEFAULT_VAL_DEGREES

        # val_degrees: list of held-out articulation degrees emitted under
        # {instance}/val/ ("default" = the reference's idx_to_deg["val"]
        # midpoints 5..85, datasets/sapien_multi.py:11-14); omit for the
        # train-only reference layout.
        val_degrees = cfg.get("val_degrees", ())
        if val_degrees == "default":
            val_degrees = DEFAULT_VAL_DEGREES
        generate_multi_scene(
            cfg["out_dir"],
            img_wh=img_wh,
            n_instances=cfg.get("n_instances", 2),
            degrees=tuple(cfg.get("degrees", range(0, 100, 10))),
            n_images=cfg.get("n_images", 60),
            seed=cfg.get("seed", 0),
            val_degrees=tuple(val_degrees),
            n_val_images=cfg.get("n_val_images", 0),
        )
    else:
        generate_single_scene(
            cfg["out_dir"],
            img_wh=img_wh,
            n_train=cfg.get("n_train", 100),
            n_val=cfg.get("n_val", 50),
            n_test=cfg.get("n_test", 50),
            articulation_deg=cfg.get("articulation_deg", 80.0),
            seed=cfg.get("seed", 0),
            write_depth=cfg.get("write_depth", False),
        )
    print(json.dumps({"out_dir": cfg["out_dir"], "backend": "sapien" if have_sapien() else "synthetic"}))


if __name__ == "__main__":
    main()
