"""Export LPIPS (VGG16) weights to the .npz layout aonerf.eval.lpips expects.

Run this WHERE torchvision + lpips weights are available (this zero-egress
image has neither); copy the resulting .npz next to your checkpoints and pass
its path to aonerf.eval.metrics.lpips_image.

  python tools/export_lpips_weights.py --out lpips_vgg.npz

Layout written (see aonerf/eval/lpips.py):
  features_{i}_kernel  (H, W, In, Out)  for torchvision VGG16 conv indices
  features_{i}_bias    (Out,)
  lin_{j}_kernel       (C_j,)           the 5 LPIPS linear heads
"""

import argparse

import numpy as np

_CONV_IDXS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args()

    try:
        import lpips  # type: ignore
        import torch  # noqa: F401
    except ImportError as e:
        raise SystemExit(
            f"missing dependency ({e}); run this exporter in an environment "
            "with torchvision + the lpips package"
        )

    model = lpips.LPIPS(net="vgg")
    out = {}
    vgg = model.net.slice1  # slices 1..5 chain the VGG features sequentially
    layers = []
    for slice_name in ("slice1", "slice2", "slice3", "slice4", "slice5"):
        layers.extend(getattr(model.net, slice_name))
    conv_i = 0
    for layer in layers:
        if layer.__class__.__name__ == "Conv2d":
            idx = _CONV_IDXS[conv_i]
            out[f"features_{idx}_kernel"] = (
                layer.weight.detach().numpy().transpose(2, 3, 1, 0)
            )
            out[f"features_{idx}_bias"] = layer.bias.detach().numpy()
            conv_i += 1
    for j, lin in enumerate(model.lins):
        out[f"lin_{j}_kernel"] = lin.model[-1].weight.detach().numpy().reshape(-1)
    np.savez(args.out, **out)
    print(f"wrote {args.out} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
