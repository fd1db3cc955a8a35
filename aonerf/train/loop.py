"""End-to-end training/eval orchestration (the reference's run.py + Lightning
Trainer + Lit systems, re-designed for JAX).

One Trainer covers the experiment types the reference dispatches on
(run.py:21-34): 'vanilla' (LitNeRF), 'vanilla_autodecoder'
(LitNeRF_AutoDecoder) and 'vanilla_ae_art' (LitNeRF_AE_ART). Differences from
the reference architecture, by design:
  - no Lightning; the train loop is a host while-loop around ONE jitted step
  - vanilla: the whole scene's ray buffers live on device; batches are
    gathered on-device (no DataLoader workers)
  - distribution: a jax mesh with rays sharded over 'data' (see
    aonerf.parallel) instead of DDP/NCCL
  - checkpoints: Orbax (params+opt+step), top-k by val PSNR
"""

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aonerf.data import dataset_dict
from aonerf.eval.metrics import masked_psnr, psnr_image, ssim_image, summarize_metric
from aonerf.eval.io import store_image, write_stats
from aonerf.eval.render import make_image_renderer
from aonerf.models import ArticulatedNeRF, CodeLibraryArticulated, NeRF
from aonerf.parallel import make_mesh, replicated_sharding, shard_batch, shard_params
from aonerf.train.step import (
    create_train_state,
    make_autodecoder_device_train_step,
    make_vanilla_train_step,
)
from aonerf.utils.ckpt import CheckpointManager
from aonerf.utils.config import Config
from aonerf.utils.logging import MetricLogger


def _compute_dtype(cfg: Config):
    return jnp.bfloat16 if cfg.compute_dtype == "bf16" else jnp.float32


class Trainer:
    def __init__(self, cfg: Config, use_mesh: bool = True):
        self.cfg = cfg
        self.run_dir = os.path.join(cfg.output_path, cfg.exp_name)
        os.makedirs(self.run_dir, exist_ok=True)
        if cfg.platform:  # e.g. "cpu" to debug without the TPU tunnel
            jax.config.update("jax_platforms", cfg.platform)
        if cfg.debug_nans:  # the reference's detect_anomaly (run.py:104)
            jax.config.update("jax_debug_nans", True)
        # Multi-host: join the jax.distributed cluster when one is configured
        # (env-driven on TPU pods; no-op single-process). After this the mesh
        # below spans every chip of every host and XLA's grad all-reduce
        # rides ICI within hosts + DCN across them (SURVEY.md §5.8).
        from aonerf.parallel.distributed import initialize, is_main_process

        initialize()
        self._is_main = is_main_process()
        self.logger = MetricLogger(self.run_dir)
        # launcher-variant checkpoint cadences (reference run.py:38-61):
        # is_optimize keeps every ckpt, both variants save every "epoch"
        if cfg.is_optimize or cfg.finetune_lpips:
            cfg.ckpt_every_steps = cfg.steps_per_epoch
        ckpt_keep = None if cfg.is_optimize else cfg.ckpt_keep  # None = all
        self.ckpt = CheckpointManager(os.path.join(self.run_dir, "ckpts"), keep=ckpt_keep)
        self.mesh = make_mesh(n_model=cfg.n_model_shards) if use_mesh else None
        self.rng = np.random.default_rng(cfg.seed)
        self.base_key = jax.random.PRNGKey(cfg.seed)

        ds_cls = dataset_dict[cfg.dataset_name]
        mlp_kwargs = dict(
            num_coarse_samples=cfg.num_coarse_samples,
            num_fine_samples=cfg.num_fine_samples,
            min_deg_point=cfg.min_deg_point,
            max_deg_point=cfg.max_deg_point,
            deg_view=cfg.deg_view,
            noise_std=cfg.noise_std,
            lindisp=cfg.lindisp,
            compute_dtype=_compute_dtype(cfg),
        )

        # Optimizer/scheduler via the factory (reference opt.py:134-162,
        # utils/__init__.py:32-111): default is the log-lerp Adam every
        # reference system runs; `optimizer`/`lr_scheduler`/`latent_lr`
        # config fields select the others.
        from aonerf.train.optim import build_optimizer_from_config

        self.tx, self.lr_fn = build_optimizer_from_config(cfg)

        if cfg.exp_type == "vanilla":
            self.model = NeRF(**mlp_kwargs)
            self.code_library = None
            split = "test" if cfg.run_eval else "train"
            self.dataset = ds_cls(
                cfg.root_dir, split=split, img_wh=cfg.img_wh, white_back=cfg.white_back,
                eval_inference=cfg.render_name if cfg.run_eval else None,
            )
            if not cfg.run_eval:
                self.val_dataset = ds_cls(
                    cfg.root_dir, split="val", img_wh=cfg.img_wh, white_back=cfg.white_back
                )
        elif cfg.exp_type in ("vanilla_autodecoder", "vanilla_ae_art"):
            mlp_kwargs["latent_dense"] = cfg.latent_dense
            if cfg.exp_type == "vanilla_autodecoder":
                self.model = ArticulatedNeRF(**mlp_kwargs)
                self.code_library = CodeLibraryArticulated(
                    n_max_objs=cfg.n_max_objs,
                    obj_code_dim=cfg.obj_code_dim,
                    n_max_articulations=cfg.n_max_articulations,
                    art_code_dim=cfg.art_code_dim,
                )
            else:  # auto-encoder: latents predicted from the source image
                from aonerf.models.ae import AutoEncoderArticulatedNeRF

                ae_kwargs = dict(mlp_kwargs)
                ae_kwargs.pop("netdepth", None)
                ae_kwargs["sigma_activation"] = cfg.ae_sigma_activation
                ae_kwargs["embed_deg"] = cfg.ae_embed_deg
                self.model = AutoEncoderArticulatedNeRF(**ae_kwargs)
                self.code_library = None
            self.dataset = ds_cls(
                cfg.root_dir, split="test" if cfg.run_eval else "train",
                img_wh=cfg.img_wh, white_back=cfg.white_back,
                eval_inference=cfg.render_name if cfg.run_eval else None,
                ray_batch_size=cfg.batch_size,
            )
            # First-class held-out-articulation validation: when the dataset
            # ships {instance}/val/{deg}_degree dirs (the reference's
            # idx_to_deg["val"] midpoints, datasets/sapien_multi.py:11-14),
            # validate() renders degrees absent from training. Reference
            # layouts without them fall back to train views (the reference's
            # own practice).
            if not cfg.run_eval and ds_cls.has_val_split(cfg.root_dir):
                self.val_dataset = ds_cls(
                    cfg.root_dir, split="val", img_wh=cfg.img_wh,
                    white_back=cfg.white_back, ray_batch_size=cfg.batch_size,
                )
            else:
                self.val_dataset = self.dataset
        else:
            raise ValueError(f"unknown exp_type {cfg.exp_type!r}")

        self.near, self.far = self.dataset.near, self.dataset.far
        self._init_state()

    # ----------------------------------------------------------------- setup

    def _ddp_mesh(self):
        """Mesh for the articulated DDP steps (per-chip sampling + pmean'd
        grads, the reference's 7-GPU DDP, README.md:105) — only when params
        are replicated (no tp) and the mesh actually has >1 data chip."""
        if self.mesh is not None and self.cfg.n_model_shards == 1:
            return self.mesh
        return None

    def _sharded_scene_buffers(self) -> bool:
        """True when the articulated scene buffers are view-sharded over the
        data mesh axis instead of replicated (cfg.shard_scene_buffers on a
        >1-chip DDP mesh)."""
        mesh = self._ddp_mesh()
        return (
            self.cfg.shard_scene_buffers
            and mesh is not None
            and mesh.shape.get("data", 1) > 1
        )

    def _init_state(self) -> None:
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed)
        dummy = self._dummy_rays()
        if cfg.exp_type == "vanilla":
            from aonerf.train.step import make_vanilla_train_multi_step

            params = self.model.init(key, dummy, False, cfg.white_back, self.near, self.far)
            self._inner_steps = max(1, cfg.inner_steps)
            self.step_fn = make_vanilla_train_multi_step(
                self.model, self.tx, cfg.white_back, self.near, self.far,
                batch_size=cfg.batch_size, inner_steps=self._inner_steps,
                randomized=cfg.randomized, lr_fn=self.lr_fn,
            )
        elif cfg.exp_type == "vanilla_ae_art":
            from aonerf.train.step_ae import make_ae_device_train_step

            w, h = cfg.img_wh
            src = jnp.zeros((1, 3, h, w))
            params = self.model.init(
                key, dummy, src, jnp.asarray(0.5), False, cfg.white_back,
                self.near, self.far,
            )
            # Fully on-device step (sampling + src-image gather + encode
            # inside the program), scan-fused; fit() falls back to the
            # host-batched step for non-rectangular datasets.
            self._inner_steps = max(1, cfg.inner_steps)
            self.step_fn = make_ae_device_train_step(
                self.model, self.tx, cfg.white_back, self.near, self.far,
                img_wh=cfg.img_wh, batch_size=cfg.batch_size,
                randomized=cfg.randomized, lr_fn=self.lr_fn,
                inner_steps=self._inner_steps,
                opacity_loss=cfg.ae_opacity_loss,
                photometric=cfg.ae_photometric,
                opacity_lambda=cfg.opacity_lambda,
                mesh=self._ddp_mesh(),
                views_per_step=cfg.ae_views_per_step,
                sharded_views=self._sharded_scene_buffers(),
                encode_reuse=cfg.ae_encode_reuse,
            )
        else:
            lib_params = self.code_library.init(key, jnp.asarray(0), jnp.asarray(0))
            latents = self.code_library.apply(lib_params, jnp.asarray(0), jnp.asarray(0))
            latents = {k: jnp.atleast_2d(v) for k, v in latents.items()}
            model_params = self.model.init(
                key, dummy, False, cfg.white_back, self.near, self.far, latents
            )
            params = {"model": model_params, "codes": lib_params}
            self._inner_steps = max(1, cfg.inner_steps)
            self.step_fn = make_autodecoder_device_train_step(
                self.model, self.code_library, self.tx, cfg.white_back,
                self.near, self.far, batch_size=cfg.batch_size,
                randomized=cfg.randomized, lr_fn=self.lr_fn,
                inner_steps=self._inner_steps,
                reg_weight=cfg.code_reg_weight,
                mesh=self._ddp_mesh(),
                sharded_views=self._sharded_scene_buffers(),
            )
        if self.mesh is not None:
            params = shard_params(self.mesh, params, tp=cfg.n_model_shards > 1)
        self.state = create_train_state(params, self.tx)
        if self.mesh is not None and cfg.n_model_shards == 1:
            self.state = jax.device_put(self.state, replicated_sharding(self.mesh))
        # One-dispatch tiled image renderer (lax.map over cfg.chunk-ray tiles
        # inside a single jit) — see aonerf/eval/render.py. With a dp mesh
        # the tile axis is sharded over chips (chip-parallel eval; single-
        # device-exact, tests/test_parallel.py::TestShardedEvalRender).
        # Multi-process runs keep the renderer UNMESHED: Trainer.test()
        # shards at image granularity across processes (each host renders a
        # different slice, different call counts), which is incompatible
        # with a cross-process shard_map — divergent programs would deadlock
        # the collective. Cross-process parallelism stays at the
        # test()/gather_images layer (the reference's DDP-rank eval split,
        # interface.py:31-51); in-process chip parallelism applies only when
        # this process owns the whole mesh.
        render_mesh = self._ddp_mesh() if jax.process_count() == 1 else None
        if cfg.exp_type == "vanilla":
            self._renderer = make_image_renderer(
                self.model, cfg.white_back, self.near, self.far, chunk=cfg.chunk,
                mesh=render_mesh,
            )
        elif cfg.exp_type == "vanilla_autodecoder":
            self._renderer = make_image_renderer(
                self.model, cfg.white_back, self.near, self.far, chunk=cfg.chunk,
                uses_latents=True, mesh=render_mesh,
            )
        else:  # AE: render through the field submodule with encoded latents
            self._renderer = make_image_renderer(
                self.model, cfg.white_back, self.near, self.far, chunk=cfg.chunk,
                uses_latents=True, method=self.model.render, mesh=render_mesh,
            )
        if cfg.ckpt_path:
            mgr = CheckpointManager(cfg.ckpt_path)
            self.state = mgr.restore(self.state)
            mgr.close()
        elif cfg.weight_path:
            # weights-only load (reference --weight_path, opt.py:123-124:
            # params without optimizer state); optimizer restarts fresh
            mgr = CheckpointManager(cfg.weight_path)
            restored = mgr.restore(self.state)
            mgr.close()
            self.state = self.state.replace(params=restored.params)
        elif self.ckpt.latest_step() is not None:
            self.state = self.ckpt.restore(self.state)

    def _dummy_rays(self) -> Dict[str, jnp.ndarray]:
        d = np.array([[0.0, 0.0, -1.0]] * 8, np.float32)
        return {
            "rays_o": jnp.asarray(-4.0 * d),
            "rays_d": jnp.asarray(d),
            "viewdirs": jnp.asarray(d),
            "target": jnp.zeros((8, 3)),
        }

    # ----------------------------------------------------------------- train

    def fit(self, max_steps: Optional[int] = None) -> Dict[str, float]:
        cfg = self.cfg
        total = max_steps or (cfg.num_epochs * cfg.steps_per_epoch)
        start = int(jax.device_get(self.state.step))

        buffers = None
        if cfg.exp_type == "vanilla":
            buffers = {k: jnp.asarray(v) for k, v in self.dataset.train_buffers().items()}
            if self.mesh is not None:
                buffers = shard_batch(self.mesh, buffers)
        elif cfg.exp_type in ("vanilla_autodecoder", "vanilla_ae_art"):
            # whole multi-config dataset resident in HBM; per-step sampling
            # happens inside the jitted step. On a DDP mesh the image
            # buffers are view-SHARDED over 'data' by default (each chip
            # holds + samples only its slice — per-chip HBM scales down with
            # the mesh; shard_scene_buffers=false restores full replication)
            try:
                buffers = {k: jnp.asarray(v) for k, v in self.dataset.device_buffers().items()}
            except ValueError:
                if cfg.exp_type == "vanilla_autodecoder":
                    raise
                # AE fallback for non-rectangular datasets: host-batched step
                from aonerf.train.step_ae import make_ae_train_step

                self.step_fn = make_ae_train_step(
                    self.model, self.tx, cfg.white_back, self.near, self.far,
                    randomized=cfg.randomized, lr_fn=self.lr_fn,
                    opacity_loss=cfg.ae_opacity_loss,
                    photometric=cfg.ae_photometric,
                    opacity_lambda=cfg.opacity_lambda,
                )
                self._inner_steps = 1
            if buffers is not None and self.mesh is not None:
                if self._sharded_scene_buffers():
                    from aonerf.parallel import shard_multi_buffers

                    buffers = shard_multi_buffers(self._ddp_mesh(), buffers)
                else:
                    from aonerf.parallel import replicated_sharding

                    buffers = jax.device_put(buffers, replicated_sharding(self.mesh))

        stride = getattr(self, "_inner_steps", 1) if buffers is not None else 1
        profiling = False
        if cfg.profile_steps > 0:  # the reference's profiler="simple" analogue
            jax.profiler.start_trace(os.path.join(self.run_dir, "profile"))
            profiling = True
        prefetcher = None
        if buffers is None:  # AE: overlap host batch assembly with device steps
            from aonerf.data.prefetch import Prefetcher

            prefetcher = Prefetcher(lambda: self.dataset.sample_train(self.rng))

        # Multi-device CPU meshes (the virtual-device test/sim configuration)
        # must not run with a deep async dispatch queue: XLA CPU's in-process
        # collectives share one thread pool across devices, and with many
        # executions in flight the device threads end up blocked in
        # DIFFERENT executions' rendezvous — a deterministic deadlock that
        # aborts the process after the 40 s rendezvous timeout
        # (rendezvous.cc:127; reproduced: 60 queued vanilla steps on a
        # 4-device 2-vCPU mesh deadlock at the same op, 60 synced steps run
        # fine). Syncing each dispatch costs nothing on CPU; TPU keeps the
        # full async pipeline (its runtime handles deep queues).
        throttle = (
            self.mesh is not None
            and len(self.mesh.devices.flat) > 1
            and jax.devices()[0].platform == "cpu"
        )

        last = {}
        step = start
        while step < total:
            if buffers is not None:
                self.state, metrics = self.step_fn(self.state, buffers, self.base_key)
            else:  # AE: host-sampled batch (needs the normalized src image)
                batch = self._device_batch(prefetcher.get())
                self.state, metrics = self.step_fn(self.state, batch, self.base_key)
            if throttle:
                jax.block_until_ready(metrics["loss"])
            prev, step = step, step + stride

            # cadences fire when the fused stride crosses their boundary
            def crossed(every):
                return (step // every) > (prev // every)

            if crossed(100) or prev == start:
                last = {k: float(v) for k, v in jax.device_get(metrics).items()}
                if self._is_main:  # rank-0 gate (model_autodecoder.py:575-580)
                    self.logger.log(step, last, prefix="train")
            if crossed(cfg.val_every_steps):
                val = self.validate()
                if self._is_main:
                    self.logger.log(step, val, prefix="val")
                last.update({f"val_{k}": v for k, v in val.items()})
            if crossed(cfg.ckpt_every_steps) or step >= total:
                if self._is_main:  # params are replicated; rank 0 writes
                    self.ckpt.save(step, jax.device_get(self.state), last.get("val_psnr"))
            if profiling and step - start >= cfg.profile_steps:
                jax.block_until_ready(jax.tree_util.tree_leaves(self.state))
                jax.profiler.stop_trace()
                profiling = False
        if profiling:
            jax.profiler.stop_trace()
        if prefetcher is not None:
            prefetcher.close()
        return last

    def _device_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        drop = () if self.cfg.exp_type == "vanilla_ae_art" else ("src_imgs",)
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k not in drop}
        if self.mesh is not None:
            batch = shard_batch(self.mesh, batch)
        return batch

    # ------------------------------------------------------------------ eval

    def _latents_for(self, instance_id, articulation_id, is_test: bool = False):
        latents = self.code_library.apply(
            self.state.params["codes"],
            jnp.asarray(instance_id),
            jnp.asarray(articulation_id),
            is_test=is_test,
        )
        return {k: jnp.atleast_2d(v) for k, v in latents.items()}

    def _interp_articulation_id(self, deg_rad: float) -> int:
        """Nearest index in the 2N-1 interpolated articulation sweep: learned
        codes at the TRAIN degrees (even indices), neighbor midpoints at odd
        indices (models/codes.py::get_interpolated_articulations)."""
        train_degs = self.dataset.degrees_rad()
        grid = np.empty(2 * len(train_degs) - 1, np.float64)
        grid[0::2] = train_degs
        grid[1::2] = 0.5 * (train_degs[:-1] + train_degs[1:])
        return int(np.argmin(np.abs(grid - deg_rad)))

    def _render_setup(self, img: Dict, is_test: bool = False):
        """(params_for_renderer, latents, aux) for the articulated variants;
        ``aux`` carries the AE's predicted joint state (radians) so callers
        can score the state error without re-encoding."""
        if self.cfg.exp_type == "vanilla_autodecoder":
            latents = self._latents_for(
                img["instance_id"], img["articulation_id"], is_test=is_test
            )
            return self.state.params["model"], latents, {}
        # AE: encode the source image; condition the deformation on the
        # ground-truth angle at val time and on the PREDICTED one at test
        # time (the reference's intended-but-broken inference path,
        # model_ae_art.py:566-570 — here it works).
        params = self.state.params
        src = jnp.asarray(img["src_imgs"])[None]
        latents = self.model.apply(params, src, method=self.model.encode)
        pred_state = self.model.apply(
            params, latents["articulation"], method=self.model.predict_state
        )
        deg = pred_state.reshape(()) if (is_test or "deg" not in img) else jnp.asarray(img["deg"])
        latents = dict(latents)
        if self.model.embed_deg:
            latents["articulation_deg"] = self.model.apply(
                params, deg, method=self.model.deg_code
            )
        latents = {k: jnp.atleast_2d(v) for k, v in latents.items()}
        return params, latents, {"pred_state": float(pred_state.reshape(()))}

    def _save_val_grid(self, target, rgb, depth, acc) -> None:
        """GT|pred|depth|opacity grid for the current val step (the
        reference's wandb image grid, model.py:370-373)."""
        from PIL import Image

        from aonerf.eval.viz import visualize_val_rgb_opa_depth

        grid = visualize_val_rgb_opa_depth(self.cfg.img_wh, target, rgb, depth, acc)
        vis_dir = os.path.join(self.run_dir, "val_vis")
        os.makedirs(vis_dir, exist_ok=True)
        step = int(jax.device_get(self.state.step))
        Image.fromarray(grid).save(os.path.join(vis_dir, f"step{step:07d}.png"))

    def validate(self, n_images: Optional[int] = None) -> Dict[str, float]:
        cfg = self.cfg
        psnrs, obj_psnrs = [], []
        if cfg.exp_type == "vanilla":
            n = min(n_images or cfg.limit_val_batches, self.val_dataset.num_images)
            for i in range(n):
                s = self.val_dataset.get_image(i)
                rays = {
                    "rays_o": jnp.asarray(s.rays_o),
                    "rays_d": jnp.asarray(s.rays_d),
                    "viewdirs": jnp.asarray(s.viewdirs),
                }
                rgb, acc, depth = (
                    np.asarray(x) for x in self._renderer(self.state.params, rays)
                )
                psnrs.append(float(psnr_image(jnp.asarray(rgb), jnp.asarray(s.target))))
                if i == 0 and self._is_main:
                    self._save_val_grid(s.target, rgb, depth, acc)
        else:
            n = n_images or cfg.limit_val_batches
            ds = self.val_dataset
            held_out = bool(getattr(ds, "uses_val_split", False))
            state_sq_errs, state_deg_errs = [], []
            # Deterministic rotating coverage (reference limit_val_batches=5,
            # run.py:107,148): each validate() call renders ``n`` consecutive
            # entries of the flattened (view, articulation, instance) grid,
            # offset by the current step, so (a) a given step always scores
            # the same views (the val/psnr stream driving best-ckpt retention
            # is a stable multi-view mean, not one random draw) and (b)
            # successive calls rotate through the whole grid. Instances vary
            # fastest so even a single call spans instances.
            step_now = int(jax.device_get(self.state.step))
            base = (step_now // max(1, cfg.val_every_steps)) * n
            first = True
            for k in range(n):
                g = base + k
                ii = g % ds.n_instances
                g //= ds.n_instances
                di = g % ds.n_articulations(ii)
                g //= ds.n_articulations(ii)
                vi = g % ds.n_images(ii, di)
                img = ds.get_image(ii, di, vi)
                rays = {k: jnp.asarray(img[k]) for k in ("rays_o", "rays_d", "viewdirs")}
                if held_out and cfg.exp_type == "vanilla_autodecoder":
                    # No learned code exists for a held-out degree; use the
                    # nearest entry of the 2N-1 interpolated articulation
                    # sweep (midpoints land exactly on the 5..85 deg val
                    # schedule) — the reference's test-time interpolation
                    # (code_library.py:55-71) as a val conditioning.
                    img = dict(
                        img,
                        articulation_id=np.int32(
                            self._interp_articulation_id(float(img["deg"]))
                        ),
                    )
                    render_params, latents, aux = self._render_setup(img, is_test=True)
                else:
                    render_params, latents, aux = self._render_setup(img)
                if "pred_state" in aux and "deg" in img:
                    # joint-state error in the reference's two val metrics
                    # (model_ae_art.py:519-523): MSE in radians, and the
                    # rounded-degree deviation (reported as an abs mean)
                    gt = float(img["deg"])
                    state_sq_errs.append((aux["pred_state"] - gt) ** 2)
                    state_deg_errs.append(abs(
                        round(np.rad2deg(aux["pred_state"]))
                        - round(np.rad2deg(gt))
                    ))
                rgb, acc, depth = (
                    np.asarray(x)
                    for x in self._renderer(render_params, rays, latents)
                )
                if first and self._is_main:
                    # first val image: GT/pred/depth/opacity grid (the
                    # reference's rank-0 wandb val images for the articulated
                    # systems, model_autodecoder.py:571-580)
                    self._save_val_grid(img["target"], rgb, depth, acc)
                first = False
                target = jnp.asarray(img["target"])
                psnrs.append(float(psnr_image(jnp.asarray(rgb), target)))
                obj_psnrs.append(
                    float(masked_psnr(jnp.asarray(rgb), target, jnp.asarray(img["instance_mask"])))
                )
        out = {"psnr": float(np.mean(psnrs))}
        if obj_psnrs:
            out["psnr_obj"] = float(np.mean(obj_psnrs))
        if cfg.exp_type == "vanilla_ae_art" and state_sq_errs:
            out["state_error_rad"] = float(np.mean(state_sq_errs))
            out["abs_state_error_deg"] = float(np.mean(state_deg_errs))
        return out

    def test(self) -> Dict[str, Dict[str, float]]:
        """Full test render + metrics + results.json (reference
        test_epoch_end, model.py:459-507). Rendering is sharded across
        PROCESSES (each host renders its contiguous slice of the test
        images) and collated with gather_images — the reference's
        DDP-eval alter_gather_cat (interface.py:31-51), at image rather
        than ray granularity."""
        from aonerf.parallel.distributed import gather_images, local_shard_bounds

        cfg = self.cfg
        w, h = cfg.img_wh
        n_images = (
            self.dataset.num_images if cfg.exp_type == "vanilla"
            else cfg.test_sweep_poses
        )
        start, stop = local_shard_bounds(n_images)

        local_rgbs, local_depths, local_accs, targets, masks = [], [], [], [], []
        for i in range(n_images):
            if cfg.exp_type == "vanilla":
                s = self.dataset.get_image(i)
                targets.append(s.target.reshape(h, w, 3))
                masks.append(s.instance_mask.reshape(h, w))
                if start <= i < stop:
                    rays = {
                        "rays_o": jnp.asarray(s.rays_o),
                        "rays_d": jnp.asarray(s.rays_d),
                        "viewdirs": jnp.asarray(s.viewdirs),
                    }
                    rgb, acc, depth = (
                        np.asarray(x) for x in self._renderer(self.state.params, rays)
                    )
                    local_rgbs.append(rgb.reshape(h, w, 3))
                    local_depths.append(depth.reshape(h, w))
                    local_accs.append(acc.reshape(h, w))
            else:  # interpolated articulation sweep (cfg.render_instance)
                img = self.dataset.get_test_image(cfg.render_instance, i)
                targets.append(img["target"].reshape(h, w, 3))
                masks.append(img["instance_mask"].reshape(h, w))
                if start <= i < stop:
                    rays = {k: jnp.asarray(img[k]) for k in ("rays_o", "rays_d", "viewdirs")}
                    render_params, latents, _ = self._render_setup(img, is_test=True)
                    rgb, acc, depth = (
                        np.asarray(x)
                        for x in self._renderer(render_params, rays, latents)
                    )
                    local_rgbs.append(rgb.reshape(h, w, 3))
                    local_depths.append(depth.reshape(h, w))
                    local_accs.append(acc.reshape(h, w))

        def _gather(stack, shape):
            local = (
                np.stack(stack) if stack else np.zeros((0, *shape), np.float32)
            )
            return list(gather_images(local, n_images))

        rgbs = _gather(local_rgbs, (h, w, 3))
        depths = _gather(local_depths, (h, w))
        accs = _gather(local_accs, (h, w))

        psnr = summarize_metric(
            [psnr_image(jnp.asarray(a), jnp.asarray(b)) for a, b in zip(rgbs, targets)]
        )
        ssim = summarize_metric(
            [ssim_image(jnp.asarray(a), jnp.asarray(b)) for a, b in zip(rgbs, targets)]
        )
        psnr_obj = summarize_metric(
            [
                masked_psnr(jnp.asarray(a), jnp.asarray(b), jnp.asarray(m))
                for a, b, m in zip(rgbs, targets, masks)
            ]
        )
        # LPIPS activates when exported VGG weights are pointed to by
        # AONERF_LPIPS_WEIGHTS (tools/export_lpips_weights.py); this image
        # cannot download the pretrained net, so it is NaN-gated otherwise.
        lpips_weights = os.environ.get("AONERF_LPIPS_WEIGHTS", "")
        if lpips_weights and os.path.exists(lpips_weights):
            from aonerf.eval.metrics import lpips_image

            lpips = summarize_metric(
                [
                    lpips_image(jnp.asarray(a), jnp.asarray(b), lpips_weights)
                    for a, b in zip(rgbs, targets)
                ]
            )
        else:
            lpips = {"test": float("nan")}

        if self._is_main:  # rank-0 writes (reference model.py:497-505)
            image_dir = os.path.join(self.run_dir, cfg.render_name)
            store_image(image_dir, rgbs, "image")
            # depth (colormapped + raw mm-u16, the datagen's on-disk format —
            # round-trips through viz/pointcloud) and opacity sequences
            # alongside rgb (reference models/utils.py:29-53)
            from aonerf.eval.io import store_depth_color, store_depth_raw, store_opacity

            store_depth_color(image_dir, depths)
            store_depth_raw(image_dir, depths)
            store_opacity(image_dir, accs)
            # video alongside the jpg sequence (interface.py:198-202): mp4
            # when an ffmpeg backend exists, animated GIF (pure PIL) otherwise
            from aonerf.eval.io import store_gif, store_video

            try:
                store_video(image_dir, rgbs)
            except RuntimeError:
                store_gif(image_dir, rgbs)
            write_stats(
                os.path.join(self.run_dir, "results.json"),
                psnr=psnr, ssim=ssim, lpips=lpips, psnr_obj=psnr_obj,
            )
        return {"psnr": psnr, "ssim": ssim, "lpips": lpips, "psnr_obj": psnr_obj}

    # ------------------------------------------- test-time code optimization

    def optimize_instance_codes(
        self,
        instance_idx: Optional[int] = None,
        n_steps: Optional[int] = None,
        lr: Optional[float] = None,
        batch_size: Optional[int] = None,
    ):
        """Fit fresh (shape, appearance) codes for one dataset instance as
        if it were unseen — the auto-decoder inversion the reference's
        ``is_optimize`` launcher variant gestures at (run.py:38-61,
        opt.py:117). The trained field and articulation table are frozen.
        Returns (codes, history); history['psnr1'] must climb. The codes are
        also written to {run_dir}/optimized_codes.npz (rank 0)."""
        if self.cfg.exp_type != "vanilla_autodecoder":
            raise ValueError("code optimization requires the auto-decoder mode")
        from aonerf.train.optimize import optimize_codes

        cfg = self.cfg
        instance_idx = cfg.optimize_instance if instance_idx is None else instance_idx
        buffers = {k: jnp.asarray(v) for k, v in self.dataset.device_buffers().items()}
        for k in ("rgb", "mask", "c2w"):  # restrict to the target instance
            buffers[k] = buffers[k][instance_idx : instance_idx + 1]
        art_table = self.state.params["codes"]["params"][
            "embedding_instance_articulation"
        ]["embedding"]
        codes, history = optimize_codes(
            self.model,
            self.state.params["model"],
            art_table,
            buffers,
            jax.random.fold_in(self.base_key, 17),
            n_steps=n_steps or cfg.optimize_steps,
            lr=lr or cfg.optimize_lr,
            batch_size=batch_size or cfg.batch_size,
            obj_code_dim=cfg.obj_code_dim,
            white_bkgd=cfg.white_back,
            near=self.near,
            far=self.far,
        )
        if self._is_main:
            np.savez(
                os.path.join(self.run_dir, "optimized_codes.npz"),
                density=np.asarray(codes["density"]),
                color=np.asarray(codes["color"]),
                history_psnr1=np.asarray(history["psnr1"]),
            )
        return codes, history

    def close(self) -> None:
        self.logger.close()
        self.ckpt.close()
