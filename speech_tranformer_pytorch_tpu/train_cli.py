"""Training CLI (reference: ``python train.py --config ...`` — SURVEY.md L4).

  python -m speech_tranformer_pytorch_tpu.train_cli \
      --preset base --data-dir exp/data --work-dir exp/run1 \
      --set train.num_epochs=40 --set model.dropout_rate=0.1 [--resume]
"""

from __future__ import annotations

import argparse
import os

from .cli_common import add_common_args, resolve_config


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    add_common_args(ap)
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--train-manifest", default=None)
    ap.add_argument("--dev-manifest", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--mesh", choices=("auto", "on", "off"), default="auto",
                    help="'auto' (default): sharded SPMD steps over a "
                         "('data','model') mesh whenever the launch is "
                         "multi-process or mesh.model_axis>1; 'on' forces "
                         "the mesh path on all devices; 'off' forces the "
                         "collective-free single-process path (refused "
                         "under multi-process launches)")
    ap.add_argument("--distributed", action="store_true",
                    help="call jax.distributed.initialize() first "
                         "(multi-process launch; env-based rendezvous)")
    args = ap.parse_args(argv)

    if args.distributed:
        import jax
        jax.distributed.initialize()

    saved = os.path.join(args.work_dir, "config.json")
    if args.resume and os.path.exists(saved):
        # Resume uses the run's OWN saved config as the base (the same
        # contract recognize_cli follows), so library-default changes
        # between versions (e.g. train.moment_dtype, data.audio_dtype)
        # can never silently alter a resumed run; --set overrides apply
        # on top. A --preset on resume is NOT applied (the saved config
        # wins) — common when re-running the original command line with
        # --resume appended, so it warns rather than errors.
        if args.preset is not None:
            import sys
            print(f"warning: --preset {args.preset} ignored on --resume "
                  "(the run's saved config.json is the base; use --set "
                  "K=V for targeted changes)", file=sys.stderr)
        import json as _json

        from .cli_common import _parse_value
        from .config import apply_overrides, config_from_dict
        cfg = config_from_dict(_json.load(open(saved)))
        overrides = {}
        for kv in args.overrides:
            k, v = kv.split("=", 1)
            overrides[k] = _parse_value(v)
        if overrides:
            cfg = apply_overrides(cfg, overrides)
        cfg = cfg.validate()
    else:
        cfg = resolve_config(args)
    os.makedirs(args.work_dir, exist_ok=True)
    with open(os.path.join(args.work_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())

    from .runner import Trainer
    if args.mesh == "auto":
        mesh = "auto"
    elif args.mesh == "on":
        from .parallel.mesh import make_mesh
        mesh = make_mesh(cfg.mesh)
    else:
        mesh = None
    trainer = Trainer(
        cfg, work_dir=args.work_dir,
        train_manifest=args.train_manifest,
        dev_manifest=args.dev_manifest,
        resume=args.resume, mesh=mesh)
    trainer.train(max_steps=args.max_steps)
    print(f"done: step={int(trainer.state.step)} work_dir={args.work_dir}")


if __name__ == "__main__":
    main()
