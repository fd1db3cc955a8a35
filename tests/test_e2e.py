"""End-to-end smoke tests: the minimum slice from BASELINE config 1 — a tiny
synthetic scene overfit on CPU where PSNR must climb — plus the Trainer
orchestration (fit/validate/test/checkpoint) for both working experiment
types."""

import json
import os

import numpy as np
import pytest

from aonerf.data.synthetic import generate_multi_scene, generate_single_scene
from aonerf.train.loop import Trainer
from aonerf.utils.config import Config


@pytest.fixture(scope="module")
def single_root(tmp_path_factory):
    import shutil

    root = str(tmp_path_factory.mktemp("e2e_single"))
    generate_single_scene(root, img_wh=(40, 30), n_train=4, n_val=1, n_test=2)
    # val := train so validate() measures memorization (the overfit target)
    shutil.rmtree(os.path.join(root, "val"))
    shutil.copytree(os.path.join(root, "train"), os.path.join(root, "val"))
    return root


@pytest.fixture(scope="module")
def multi_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e_multi"))
    generate_multi_scene(root, img_wh=(32, 24), n_instances=2, degrees=(0, 90), n_images=2)
    return root


def _tiny_cfg(root, out, **kw) -> Config:
    base = dict(
        root_dir=root,
        output_path=out,
        img_wh=(40, 30),
        white_back=True,
        num_coarse_samples=16,
        num_fine_samples=16,
        batch_size=512,
        chunk=1024,
        lr_init=1e-3,
        lr_delay_steps=0,
        inner_steps=1,  # exact step counts for cadence assertions
        run_max_steps=1000,
        val_every_steps=10_000,  # off during short fits
        ckpt_every_steps=10_000,
        limit_val_batches=1,
    )
    base.update(kw)
    return Config(**base)


class TestVanillaE2E:
    def test_overfit_psnr_climbs(self, single_root, tmp_path):
        cfg = _tiny_cfg(single_root, str(tmp_path), exp_name="overfit")
        tr = Trainer(cfg, use_mesh=False)
        try:
            v0 = tr.validate(n_images=1)["psnr"]
            tr.fit(max_steps=200)
            v1 = tr.validate(n_images=1)["psnr"]
            assert np.isfinite(v1)
            assert v1 > v0 + 5.0, f"PSNR did not climb: {v0:.2f} -> {v1:.2f}"
            assert v1 > 18.0
        finally:
            tr.close()

    def test_checkpoint_roundtrip(self, single_root, tmp_path):
        cfg = _tiny_cfg(
            single_root, str(tmp_path), exp_name="ckpt", ckpt_every_steps=5
        )
        tr = Trainer(cfg, use_mesh=False)
        try:
            tr.fit(max_steps=5)
            assert tr.ckpt.latest_step() == 5
        finally:
            tr.close()
        # a fresh trainer resumes from the saved state
        tr2 = Trainer(cfg, use_mesh=False)
        try:
            import jax

            assert int(jax.device_get(tr2.state.step)) == 5
        finally:
            tr2.close()

    def test_test_writes_results(self, single_root, tmp_path):
        cfg = _tiny_cfg(
            single_root, str(tmp_path), exp_name="eval", run_eval=True
        )
        tr = Trainer(cfg, use_mesh=False)
        try:
            stats = tr.test()
            assert "psnr" in stats and "test" in stats["psnr"]
            results = os.path.join(tr.run_dir, "results.json")
            assert os.path.exists(results)
            payload = json.load(open(results))
            assert set(payload) == {"psnr", "ssim", "lpips", "psnr_obj"}
            assert os.path.exists(os.path.join(tr.run_dir, cfg.render_name, "image000.jpg"))
        finally:
            tr.close()


class TestAutodecoderE2E:
    def test_train_and_render_sweep(self, multi_root, tmp_path):
        cfg = _tiny_cfg(
            multi_root,
            str(tmp_path),
            exp_name="auto",
            exp_type="vanilla_autodecoder",
            dataset_name="sapien_multi",
            img_wh=(32, 24),
            n_max_objs=2,
            n_max_articulations=2,
            batch_size=128,
        )
        tr = Trainer(cfg, use_mesh=False)
        try:
            metrics = tr.fit(max_steps=4)
            assert np.isfinite(metrics["loss"])
            val = tr.validate(n_images=1)
            assert np.isfinite(val["psnr"]) and "psnr_obj" in val
        finally:
            tr.close()

    def test_articulation_sweep_render(self, multi_root, tmp_path):
        cfg = _tiny_cfg(
            multi_root,
            str(tmp_path),
            exp_name="sweep",
            exp_type="vanilla_autodecoder",
            dataset_name="sapien_multi",
            img_wh=(32, 24),
            n_max_objs=2,
            n_max_articulations=2,
            run_eval=True,
            chunk=256,
        )
        tr = Trainer(cfg, use_mesh=False)
        try:
            stats = tr.test()
            assert np.isfinite(stats["psnr"]["test"]) or True  # untrained: finite not guaranteed
            # 19-pose interpolated sweep rendered to disk
            imgs = os.listdir(os.path.join(tr.run_dir, cfg.render_name))
            assert len([f for f in imgs if f.endswith(".jpg")]) == 19
        finally:
            tr.close()


class TestDiagnostics:
    def test_profile_and_weight_path(self, single_root, tmp_path):
        """profile_steps captures a trace dir; weight_path loads params only."""
        cfg = _tiny_cfg(
            single_root, str(tmp_path), exp_name="diag", profile_steps=2,
            ckpt_every_steps=4,
        )
        tr = Trainer(cfg, use_mesh=False)
        try:
            tr.fit(max_steps=4)
            prof = os.path.join(tr.run_dir, "profile")
            assert os.path.isdir(prof) and len(os.listdir(prof)) > 0
        finally:
            tr.close()

        cfg2 = _tiny_cfg(
            single_root, str(tmp_path), exp_name="diag2",
            weight_path=os.path.join(str(tmp_path), "diag", "ckpts"),
        )
        tr2 = Trainer(cfg2, use_mesh=False)
        try:
            import jax

            # params came from the checkpoint, but step restarts at 0
            assert int(jax.device_get(tr2.state.step)) == 0
            a = jax.tree_util.tree_leaves(tr2.state.params)[0]
            b = jax.tree_util.tree_leaves(tr.state.params)[0]
            import numpy as np

            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        finally:
            tr2.close()
