"""Decoding/eval CLI (reference: ``python recognize.py --beam 5`` —
SURVEY.md L5).

  python -m speech_tranformer_pytorch_tpu.recognize_cli \
      --preset base --data-dir exp/data --work-dir exp/run1 \
      --split test --beam 5 --out exp/run1/hyps.jsonl
"""

from __future__ import annotations

import argparse
import json
import os

from .cli_common import add_common_args, resolve_config


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    add_common_args(ap)
    ap.add_argument("--work-dir", required=True,
                    help="training work dir (checkpoints/ inside)")
    ap.add_argument("--manifest", default=None,
                    help="explicit manifest path (else <data-dir>/<split>.jsonl)")
    ap.add_argument("--split", default="test")
    ap.add_argument("--beam", type=int, default=None)
    ap.add_argument("--max-len", type=int, default=None)
    ap.add_argument("--alpha", type=float, default=None)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    cfg = resolve_config(args)
    manifest = args.manifest or os.path.join(args.data_dir,
                                             f"{args.split}.jsonl")
    from .recognize import load_recognizer
    rec = load_recognizer(cfg, os.path.join(args.work_dir, "checkpoints"),
                          vocab_path=cfg.data.vocab_path or None)
    scores = rec.decode_manifest(
        manifest, beam_size=args.beam, max_len=args.max_len,
        alpha=args.alpha, batch_size=args.batch_size, out_path=args.out)
    print(json.dumps(scores))


if __name__ == "__main__":
    main()
