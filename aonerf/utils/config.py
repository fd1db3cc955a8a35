"""Experiment configuration: typed dataclass + JSON override merge.

Replaces the reference's ~70-flag argparse namespace with JSON-file merge
(opt.py:4-224). Field names follow this codebase; ``_ALIASES`` maps the
reference's flag names so its config/*.json files load unchanged. Unknown
keys are kept in ``extras`` (the reference silently setattr's them,
opt.py:221-222) so downstream tools can still read them.
"""

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


@dataclass
class Config:
    # experiment
    exp_type: str = "vanilla"  # vanilla | vanilla_autodecoder | vanilla_ae_art
    exp_name: str = "exp"
    dataset_name: str = "sapien"
    root_dir: str = ""
    output_path: str = "./results"
    render_name: str = "render"
    run_eval: bool = False
    seed: int = 0

    # data
    img_wh: Tuple[int, int] = (640, 480)
    white_back: bool = True
    batch_size: int = 2048  # rays per step (vanilla); 4096 via sapien_multi
    # Eval rays per tile (reference --chunk, opt.py:103, default 3840 there).
    # On TPU small tiles win (the tile loop is ONE lax.map program, so there
    # is no per-tile dispatch cost, and a small tile's working set stays
    # VMEM-resident): 640x480 full-image render measured 377K rays/s @ 256
    # vs 262K @ 4096 (v5e).
    chunk: int = 256
    samples_per_epoch: int = 4000  # sapien_multi virtual epoch

    # field
    num_coarse_samples: int = 64
    num_fine_samples: int = 128
    min_deg_point: int = 0
    max_deg_point: int = 10
    deg_view: int = 4
    netdepth: int = 8
    netwidth: int = 256
    noise_std: float = 0.0
    lindisp: bool = False
    compute_dtype: str = "f32"  # f32 | bf16

    # codes (articulated)
    n_max_objs: int = 4
    obj_code_dim: int = 128
    n_max_articulations: int = 10
    art_code_dim: int = 32
    # L2 code-regularization weight of the autodecoder loss (the reference
    # hardcodes 1e-4, model_autodecoder.py:428-466). Exposed because the
    # round-5 instance-scaling study found rare seed-dependent per-instance
    # code collapse (one instance's shape code drifts while the field drops
    # it; studies/diag_n4_s0.json) that a stronger pull toward the origin
    # mitigates — see RESULTS.md round 5.
    code_reg_weight: float = 1e-4

    # optimization
    lr_init: float = 5.0e-4
    lr_final: float = 5.0e-6
    lr_delay_steps: int = 2500
    lr_delay_mult: float = 0.01
    run_max_steps: int = 100_000
    # Optimizer factory (reference opt.py:134-162 + utils/__init__.py:32-111,
    # routed through aonerf/train/optim.py). "adam" (default) = plain Adam
    # with the reference systems' manual log-lerp schedule (model.py:391-414)
    # — exactly the behavior all reference systems actually run. Other values
    # (sgd | radam | ranger), or "adam" with ``lr_scheduler`` set (= the
    # reference's AdamW), use make_optimizer with make_schedule.
    optimizer: str = "adam"
    # None = the log-lerp schedule above; steplr | cosine | poly select the
    # reference's epoch-granular schedulers (utils/__init__.py:71-111)
    lr_scheduler: Optional[str] = None
    momentum: float = 0.9
    weight_decay: float = 0.0
    decay_step: Tuple[int, ...] = (20,)
    decay_gamma: float = 0.1
    poly_exp: float = 0.99
    warmup_multiplier: float = 1.0
    warmup_epochs: int = 0
    # separate AdamW lr for the code tables (reference --latent_lr,
    # opt.py:146, get_optimizer_latent); None = one optimizer for everything
    latent_lr: Optional[float] = None
    # global-norm gradient clip; 0 = off (reference parity). bf16 compute
    # diverges mid-run without it — use 1.0 with compute_dtype="bf16".
    grad_clip: float = 0.0
    num_epochs: int = 100
    steps_per_epoch: int = 1000
    randomized: bool = True
    # optimizer steps fused into one XLA program via lax.scan (vanilla path);
    # amortizes dispatch latency without changing results (PRNG is per-step)
    inner_steps: int = 10

    # checkpointing / eval cadence
    ckpt_keep: int = 5
    ckpt_every_steps: int = 2000
    # launcher variants (reference run.py:38-61): both flip the checkpoint
    # cadence to every "epoch" (steps_per_epoch steps); is_optimize
    # additionally keeps EVERY checkpoint (save_top_k=-1). is_optimize also
    # enables the test-time latent-code optimization entry point
    # (cli --run_optimize / Trainer.optimize_instance_codes).
    is_optimize: bool = False
    finetune_lpips: bool = False
    # test-time code optimization (train/optimize.py): which dataset
    # instance to treat as unseen, and the inversion hyperparameters
    optimize_instance: int = 0
    optimize_steps: int = 500
    optimize_lr: float = 1.0e-2
    val_every_steps: int = 1000
    limit_val_batches: int = 5
    # articulated test(): which instance the spheric sweep renders, and how
    # many spheric poses / interpolated articulation ids it walks (the
    # reference hardcodes instance 0 and 19 = 2*10-1 poses,
    # model_autodecoder.py:584-602, sapien_multi.py:152)
    render_instance: int = 0
    test_sweep_poses: int = 19
    ckpt_path: Optional[str] = None
    weight_path: Optional[str] = None

    # auto-encoder (vanilla_ae_art) loss selection; see train/step_ae.py.
    # opacity: bce_prob (working default) | mse | bce_logits (reference's
    # active-but-collapsing choice) | bce_prob+mse | none
    ae_opacity_loss: str = "bce_prob"
    ae_photometric: str = "masked"  # masked (reference) | full
    opacity_lambda: float = 0.5
    # softplus trains; relu (reference, model_ae_art.py:233) measured dead at
    # every lr tried. The AE supervises tail-free opacity so softplus's
    # acc==1 pinning does not matter (see models/ae.py, RESULTS.md).
    ae_sigma_activation: str = "softplus"
    # source views per fused AE step (>1 batches the ResNet encodes and
    # conditions batch_size/V ray slices per view — the encoder-throughput
    # lever; see train/step_ae.py views_per_step)
    ae_views_per_step: int = 1
    # Temporal encoder amortization: groups of R optimizer steps share ONE
    # sampled view — step 1 runs the full encode+field step, steps 2..R are
    # field-only on the detached step-1 latents (fresh random pixels each).
    # Field-only steps apply a MASKED optimizer update (step_ae.masked_
    # field_update): the encoder/state-decoder/deg-embedding params and
    # their optimizer moments are bitwise frozen (zero grads alone would
    # not freeze them under Adam), so the non-field partition truly updates
    # every R-th step while the field updates every step. Alternative to
    # ae_views_per_step (cannot combine). Measured: RESULTS.md.
    ae_encode_reuse: int = 1
    # AE articulation conditioning: True (reference default, embed_deg
    # model_ae_art.py:224,239-240) looks up an embedding of the rounded
    # joint angle in degrees; False feeds the encoder's raw articulation
    # code to the deformation MLP instead (the reference's embed_deg=False
    # branch). RESULTS.md has the measured sweep.
    ae_embed_deg: bool = True

    # articulated/AE field compute schedule: contract latent kernel columns
    # once per view instead of materializing rays x samples x C latent
    # broadcasts (models/articulated.py::_latent_dense). Same math and param
    # tree (equivalence + oracle-parity tested); default ON because it is the
    # measured-faster schedule in both modes (+19.6% autodecoder, +10.7% AE,
    # RESULTS.md). Set false for the reference-shaped concat compute graph.
    latent_dense: bool = True

    # parallelism
    n_model_shards: int = 1
    # articulated modes on a >1-chip data mesh: shard the scene image
    # buffers over 'data' by VIEW (each chip holds + samples only its
    # n_views/n_chips slice — per-chip HBM scales down with the mesh;
    # parallel.shard_multi_buffers) instead of replicating the whole
    # dataset per chip. Gradients stay pmean'd either way.
    shard_scene_buffers: bool = True

    # backend: None = whatever jax picks (TPU when available); "cpu" forces
    # the host backend even when a sitecustomize force-registers a TPU
    # plugin (config update beats the env var, which such plugins override)
    platform: Optional[str] = None

    # diagnostics (reference analogues: Lightning profiler run.py:108,128 and
    # detect_anomaly run.py:104)
    profile_steps: int = 0  # >0: capture a jax.profiler trace of that many steps
    debug_nans: bool = False  # jax_debug_nans tripwire

    extras: Dict[str, Any] = field(default_factory=dict)


# reference flag name -> Config field
_ALIASES = {
    "N_samples": "num_coarse_samples",
    "N_importance": "num_fine_samples",
    "N_emb_xyz": "max_deg_point",
    "N_emb_dir": "deg_view",
    "N_max_objs": "n_max_objs",
    "N_obj_code_length": "obj_code_dim",
    "use_disp": "lindisp",
    "D": "netdepth",
    "W": "netwidth",
    "lr": "lr_init",
    "save_path": "render_name",
    "perturb": "randomized",  # reference treats it as a 0/1 factor (opt.py:30)
}


def _coerce(name: str, value: Any) -> Any:
    if name == "img_wh" and isinstance(value, (list, tuple)):
        return tuple(int(v) for v in value)
    if name == "decay_step" and isinstance(value, (list, tuple)):
        return tuple(int(v) for v in value)
    if name == "randomized" and not isinstance(value, bool):
        return bool(value)
    return value


def load_config(path: Optional[str] = None, overrides: Optional[Dict[str, Any]] = None) -> Config:
    """Build a Config from an optional JSON file plus explicit overrides
    (overrides win, as CLI flags do in the reference... actually the
    reference lets the JSON win, opt.py:220-222 — we keep JSON < overrides
    because it is strictly more useful and documented here)."""
    cfg = Config()
    fields = {f.name for f in dataclasses.fields(Config)}

    def apply(d: Dict[str, Any]):
        for key, value in d.items():
            name = _ALIASES.get(key, key)
            if name in fields and name != "extras":
                setattr(cfg, name, _coerce(name, value))
            else:
                cfg.extras[key] = value

    if path:
        with open(path) as f:
            apply(json.load(f))
    if overrides:
        apply({k: v for k, v in overrides.items() if v is not None})
    return cfg
