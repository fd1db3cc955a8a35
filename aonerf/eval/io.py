"""Output writers: image sequences, depth maps, stats JSON.

Reference parity: models/utils.py:21-73 (store_image jpg sequence,
store_depth_img/raw, write_stats results.json). Video export (models/
utils.py:55-59) is gated on imageio availability (absent in this image) —
``store_video`` raises with instructions instead of failing silently.
"""

import json
import os
from typing import Dict, Sequence

import numpy as np
from PIL import Image


def _to_u8(img: np.ndarray) -> np.ndarray:
    return (np.clip(np.asarray(img, dtype=np.float64), 0.0, 1.0) * 255.0).astype(np.uint8)


def store_image(dirpath: str, rgbs: Sequence[np.ndarray], name: str = "image") -> None:
    """Write each (H, W, 3) float image as {name}{i:03d}.jpg."""
    os.makedirs(dirpath, exist_ok=True)
    for i, rgb in enumerate(rgbs):
        Image.fromarray(_to_u8(rgb)).save(os.path.join(dirpath, f"{name}{i:03d}.jpg"))


def store_depth_img(dirpath: str, depths: Sequence[np.ndarray], name: str = "depth") -> None:
    """Write normalized depth maps as grayscale PNGs (+ raw .npy)."""
    os.makedirs(dirpath, exist_ok=True)
    for i, depth in enumerate(depths):
        d = np.asarray(depth, dtype=np.float64)
        finite = np.isfinite(d)
        lo = d[finite].min() if finite.any() else 0.0
        hi = d[finite].max() if finite.any() else 1.0
        norm = np.zeros_like(d) if hi == lo else np.clip((d - lo) / (hi - lo), 0, 1)
        Image.fromarray((norm * 255).astype(np.uint8), mode="L").save(
            os.path.join(dirpath, f"{name}{i:03d}.png")
        )
        np.save(os.path.join(dirpath, f"{name}{i:03d}.npy"), np.asarray(depth))


def store_depth_raw(
    dirpath: str, depths: Sequence[np.ndarray], name: str = "depth_raw"
) -> None:
    """Raw depth, twice: millimeter uint16 PNGs — the datagen's on-disk
    format (data_utils.py:89-95; aonerf.data.synthetic.write_depth_png), so
    eval depth round-trips through viz/pointcloud alongside the dataset's own
    depth maps (non-finite values store as 0; quantized to 1 mm, clipped at
    65.535 m) — plus a LOSSLESS float .npz ({name}.npz, one array per frame),
    matching the reference store_depth_raw's savez_compressed record
    (models/utils.py:41-53) so the raw artifact remains an exact record of
    the rendered depth."""
    os.makedirs(dirpath, exist_ok=True)
    for i, depth in enumerate(depths):
        d = np.asarray(depth, dtype=np.float64)
        mm = np.where(np.isfinite(d), np.rint(d * 1000.0), 0.0)
        mm = np.clip(mm, 0, np.iinfo(np.uint16).max).astype(np.uint16)
        Image.fromarray(mm, mode="I;16").save(
            os.path.join(dirpath, f"{name}{i:03d}.png")
        )
    np.savez_compressed(
        os.path.join(dirpath, f"{name}.npz"),
        **{f"{name}{i:03d}": np.asarray(d) for i, d in enumerate(depths)},
    )


def store_depth_color(
    dirpath: str, depths: Sequence[np.ndarray], name: str = "depth"
) -> None:
    """Colormapped depth PNGs (+ raw .npy for pointcloud back-projection) —
    the reference's store_depth_img (models/utils.py:29-39), using the same
    colormap as the val grids (eval/viz.py::colorize_depth)."""
    from aonerf.eval.viz import colorize_depth

    os.makedirs(dirpath, exist_ok=True)
    for i, depth in enumerate(depths):
        Image.fromarray(colorize_depth(np.asarray(depth))).save(
            os.path.join(dirpath, f"{name}{i:03d}.png")
        )
        np.save(os.path.join(dirpath, f"{name}{i:03d}.npy"), np.asarray(depth))


def store_opacity(
    dirpath: str, accs: Sequence[np.ndarray], name: str = "opacity"
) -> None:
    """Accumulated-opacity maps as grayscale PNGs (the acc channel the
    reference logs in its val grids, train_helper.py:311-332)."""
    os.makedirs(dirpath, exist_ok=True)
    for i, acc in enumerate(accs):
        a = np.clip(np.nan_to_num(np.asarray(acc, np.float64)), 0.0, 1.0)
        Image.fromarray((a * 255).astype(np.uint8), mode="L").save(
            os.path.join(dirpath, f"{name}{i:03d}.png")
        )


def store_video(dirpath: str, rgbs: Sequence[np.ndarray], name: str = "video") -> str:
    """mp4 export of a rendered sequence (20 fps, as the reference)."""
    try:
        import imageio

        os.makedirs(dirpath, exist_ok=True)
        path = os.path.join(dirpath, f"{name}.mp4")
        imageio.mimwrite(path, [_to_u8(r) for r in rgbs], fps=20, quality=8)
        return path
    except Exception as e:  # imageio missing OR no ffmpeg/pyav plugin
        raise RuntimeError(
            "store_video requires imageio with an mp4 backend (ffmpeg/pyav), "
            "not present in this image; use store_gif / the jpg sequence"
        ) from e


def store_gif(dirpath: str, rgbs: Sequence[np.ndarray], name: str = "video") -> str:
    """Animated-GIF export (20 fps) via PIL — no ffmpeg needed; the mp4-less
    fallback for the articulation-sweep video (interface.py:198-202)."""
    from PIL import Image

    os.makedirs(dirpath, exist_ok=True)
    path = os.path.join(dirpath, f"{name}.gif")
    frames = [Image.fromarray(_to_u8(r)) for r in rgbs]
    frames[0].save(
        path, save_all=True, append_images=frames[1:], duration=50, loop=0
    )
    return path


def write_stats(path: str, **metric_dicts: Dict[str, float]) -> None:
    """results.json writer (models/utils.py:62-73): one entry per metric."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        name: {k: float(v) for k, v in d.items()} for name, d in metric_dicts.items()
    }
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)
