"""Layout round-trip test of tools/export_lpips_weights.py.

The exporter normally runs where torchvision + the ``lpips`` package exist
(not this image). Here a STRUCTURAL STAND-IN of ``lpips.LPIPS(net='vgg')`` is
built from real torch layers — the exact slice1..slice5 / lins surface the
exporter reads — with tiny random conv weights, the exporter's ``main()`` is
run against it, and the resulting .npz is checked two ways:

  1. the file layout is exactly what aonerf.eval.lpips consumes (13 conv
     kernels at the torchvision .features indices in HWIO, 5 flat lin heads);
  2. the exported function VALUE matches: a torch NCHW re-computation of the
     LPIPS distance through the stand-in net equals lpips_from_npz on the
     exported file — so a wrong kernel transpose or index assignment in the
     exporter would fail, not just a wrong shape.

(The torch recomputation mirrors this repo's documented normalization
convention, sqrt(sum + 1e-10); see aonerf/eval/lpips.py.)

Reference surface: models/interface.py:113-123 (piqa LPIPS).
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
_CONV_IDXS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def _fake_lpips_model(c=4, seed=0):
    """lpips.LPIPS(net='vgg')-shaped object: .net.slice1..slice5 chain the
    VGG16 .features layers (pools at the starts of slices 2..5, as the lpips
    package splits them), .lins[j].model[-1] holds the 1x1 head weights."""
    torch.manual_seed(seed)

    def conv(cin, cout):
        m = nn.Conv2d(cin, cout, 3, padding=1)
        with torch.no_grad():
            m.weight.mul_(0.3)
            m.bias.mul_(0.05)
        return m

    net = types.SimpleNamespace(
        slice1=nn.Sequential(conv(3, c), nn.ReLU(), conv(c, c), nn.ReLU()),
        slice2=nn.Sequential(nn.MaxPool2d(2), conv(c, c), nn.ReLU(), conv(c, c), nn.ReLU()),
        slice3=nn.Sequential(nn.MaxPool2d(2), conv(c, c), nn.ReLU(), conv(c, c), nn.ReLU(), conv(c, c), nn.ReLU()),
        slice4=nn.Sequential(nn.MaxPool2d(2), conv(c, c), nn.ReLU(), conv(c, c), nn.ReLU(), conv(c, c), nn.ReLU()),
        slice5=nn.Sequential(nn.MaxPool2d(2), conv(c, c), nn.ReLU(), conv(c, c), nn.ReLU(), conv(c, c), nn.ReLU()),
    )
    lins = []
    for _ in range(5):
        head = nn.Conv2d(c, 1, 1, bias=False)
        with torch.no_grad():
            head.weight.abs_()  # real LPIPS heads are non-negative
        lins.append(types.SimpleNamespace(model=[nn.Dropout(), head]))
    return types.SimpleNamespace(net=net, lins=lins)


def _torch_lpips(model, a, b):
    """NCHW torch recomputation of the LPIPS distance through the stand-in."""

    def feats(img):
        x = torch.from_numpy(np.moveaxis(img, -1, 0)[None].copy())
        x = x * 2.0 - 1.0
        x = (x - _SHIFT) / _SCALE
        out = []
        for s in ("slice1", "slice2", "slice3", "slice4", "slice5"):
            x = getattr(model.net, s)(x)
            out.append(x)
        return out

    with torch.no_grad():
        fa, fb = feats(a), feats(b)
        total = 0.0
        for j, (x, y) in enumerate(zip(fa, fb)):
            xn = x / torch.sqrt((x**2).sum(dim=1, keepdim=True) + 1e-10)
            yn = y / torch.sqrt((y**2).sum(dim=1, keepdim=True) + 1e-10)
            d = (xn - yn) ** 2
            w = model.lins[j].model[-1].weight.view(1, -1, 1, 1)
            total = total + (d * w).sum(dim=1).mean()
        return float(total)


def _run_exporter(model, out_path, monkeypatch):
    fake = types.ModuleType("lpips")
    fake.LPIPS = lambda net="vgg": model
    monkeypatch.setitem(sys.modules, "lpips", fake)
    monkeypatch.setattr(sys, "argv", ["export_lpips_weights.py", "--out", out_path])
    spec = importlib.util.spec_from_file_location(
        "export_lpips_weights", os.path.join(_TOOLS, "export_lpips_weights.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()


class TestExporterLayout:
    def test_npz_layout_and_value_roundtrip(self, tmp_path, monkeypatch):
        model = _fake_lpips_model(c=4, seed=3)
        out = str(tmp_path / "lpips.npz")
        _run_exporter(model, out, monkeypatch)

        data = dict(np.load(out))
        expect_keys = (
            {f"features_{i}_kernel" for i in _CONV_IDXS}
            | {f"features_{i}_bias" for i in _CONV_IDXS}
            | {f"lin_{j}_kernel" for j in range(5)}
        )
        assert set(data) == expect_keys
        # HWIO kernels; first conv maps 3 input channels
        assert data["features_0_kernel"].shape == (3, 3, 3, 4)
        assert data["features_28_kernel"].shape == (3, 3, 4, 4)
        assert all(data[f"lin_{j}_kernel"].shape == (4,) for j in range(5))

        # the exported weights compute the same function
        from aonerf.eval.lpips import lpips_from_npz

        rng = np.random.default_rng(5)
        a = rng.uniform(size=(32, 32, 3)).astype(np.float32)
        b = np.clip(a + 0.25 * rng.standard_normal(a.shape), 0, 1).astype(np.float32)
        want = _torch_lpips(model, a, b)
        got = float(lpips_from_npz(out, a, b))
        assert want > 0
        np.testing.assert_allclose(got, want, rtol=2e-5)

        # and the fp64 oracle agrees with both
        from tests import oracles

        np.testing.assert_allclose(oracles.lpips_np(data, a, b), want, rtol=2e-5)
