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
    args = ap.parse_args(argv)

    cfg = resolve_config(args)
    os.makedirs(args.work_dir, exist_ok=True)
    with open(os.path.join(args.work_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())

    from .runner import Trainer
    trainer = Trainer(
        cfg, work_dir=args.work_dir,
        train_manifest=args.train_manifest,
        dev_manifest=args.dev_manifest,
        resume=args.resume)
    trainer.train(max_steps=args.max_steps)
    print(f"done: step={int(trainer.state.step)} work_dir={args.work_dir}")


if __name__ == "__main__":
    main()
