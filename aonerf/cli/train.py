"""CLI launcher: ``python -m aonerf.cli.train --config cfg.json [--run_eval]``.

Reference parity: run.py:20-171 (experiment dispatch on exp_type, fit vs
test on --run_eval). Any Config field can be overridden on the command line
as --<name> <value>.
"""

import argparse
import json
import sys

from aonerf.train.loop import Trainer
from aonerf.utils.config import Config, load_config


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, default=None, help="JSON config file")
    p.add_argument("--run_eval", action="store_true", default=None)
    p.add_argument("--run_optimize", action="store_true", default=None,
                   help="test-time latent-code optimization for an unseen "
                        "instance (auto-decoder; reference is_optimize)")
    p.add_argument("--max_steps", type=int, default=None)
    # accept any config field as an override flag
    import dataclasses

    for f in dataclasses.fields(Config):
        if f.name in ("run_eval", "extras"):
            continue
        p.add_argument(f"--{f.name}", type=str, default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    overrides = {}
    for k, v in vars(args).items():
        if k in ("config", "max_steps", "run_optimize") or v is None:
            continue
        try:
            overrides[k] = json.loads(v) if isinstance(v, str) else v
        except (json.JSONDecodeError, TypeError):
            overrides[k] = v
    cfg = load_config(args.config, overrides)

    trainer = Trainer(cfg)
    try:
        if args.run_optimize:
            _, history = trainer.optimize_instance_codes()
            print(json.dumps({"psnr1": history["psnr1"]}))
        elif cfg.run_eval:
            stats = trainer.test()
            print(json.dumps(stats))
        else:
            metrics = trainer.fit(max_steps=args.max_steps)
            print(json.dumps(metrics))
    finally:
        trainer.close()


if __name__ == "__main__":
    main()
