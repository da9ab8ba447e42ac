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
    ap.add_argument("--batch-size", type=int, default=32,
                    help="utterances per decode batch (measured best "
                         "throughput at 32 on v5e: +14%% over 16, flat at "
                         "64 — BENCHMARKS.md)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--checkpoint", choices=("latest", "best"),
                    default="latest",
                    help="'best' decodes the best-dev-loss model the "
                         "Trainer tracked (work_dir/best — reference "
                         "Solver best-model parity); 'latest' the newest "
                         "step checkpoint")
    ap.add_argument("--int8", action="store_true",
                    help="weights-only int8 decode (decode.int8_weights): "
                         "kernels stored int8 + per-channel scales, dequant "
                         "fused into the matmul reads — decode is weight-"
                         "bandwidth-bound (BENCHMARKS.md r4); single-device")
    ap.add_argument("--int8-kv", action="store_true",
                    help="int8 cross-KV decode cache (decode.int8_kv_cache): "
                         "the largest per-step decode HBM stream served as "
                         "int8 (BENCHMARKS.md r5); single-device")
    ap.add_argument("--mesh", choices=("auto", "on", "off"), default="auto",
                    help="'auto': sharded decode over a ('data','model') "
                         "mesh when mesh.model_axis>1 (TP-trained "
                         "checkpoints); 'on' forces it; 'off' single-device")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host data-parallel decode: call "
                         "jax.distributed.initialize(), build the mesh over "
                         "ALL devices, decode each host's manifest shard "
                         "through the sharded beam step and all-gather "
                         "hypotheses so every host reports the full-"
                         "manifest scores (--out written by host 0; "
                         "--batch-size is per host)")
    args = ap.parse_args(argv)

    if args.distributed:
        import jax
        jax.distributed.initialize()

    # Prefer the exact training config saved by train_cli; --preset/--set
    # remain as overrides on top (reference: recognize.py re-specifies the
    # model dims on its CLI — here they come from the run itself).
    saved = os.path.join(args.work_dir, "config.json")
    if os.path.exists(saved):
        import json as _json

        from .config import apply_overrides, config_from_dict
        from .cli_common import _parse_value
        cfg = config_from_dict(_json.load(open(saved)))
        overrides = {}
        for kv in args.overrides:
            k, v = kv.split("=", 1)
            overrides[k] = _parse_value(v)
        if overrides:
            cfg = apply_overrides(cfg, overrides)
    else:
        cfg = resolve_config(args)
    if args.int8:
        cfg = cfg.replace(decode=cfg.decode.replace(int8_weights=True))
    if args.int8_kv:
        cfg = cfg.replace(decode=cfg.decode.replace(int8_kv_cache=True))
    manifest = args.manifest or os.path.join(args.data_dir,
                                             f"{args.split}.jsonl")
    mesh = None
    if args.distributed or args.mesh == "on":
        # Distributed decode always needs the mesh (strict — a bad
        # topology is an error, not a silent single-host decode).
        from .parallel.mesh import make_mesh
        mesh = make_mesh(cfg.mesh)
    elif args.mesh == "auto" and cfg.mesh.model_axis > 1:
        # Fall back to single-device decode (warning) when the checkpoint's
        # model_axis does not fit this host's devices — a Sharded-preset
        # checkpoint stays decodable on a 1-chip box; 'on' is the strict path.
        from .parallel.mesh import make_mesh_auto
        mesh = make_mesh_auto(cfg.mesh)
    from .recognize import load_recognizer
    ckpt_dir = os.path.join(
        args.work_dir, "best" if args.checkpoint == "best" else "checkpoints")
    if args.checkpoint == "best" and not os.path.isdir(ckpt_dir):
        raise FileNotFoundError(
            f"{ckpt_dir} not found — the run had no dev evals, so no "
            "best model was tracked (use --checkpoint latest)")
    rec = load_recognizer(cfg, ckpt_dir,
                          vocab_path=cfg.data.vocab_path or None, mesh=mesh)
    scores = rec.decode_manifest(
        manifest, beam_size=args.beam, max_len=args.max_len,
        alpha=args.alpha, batch_size=args.batch_size, out_path=args.out,
        distributed=args.distributed)
    print(json.dumps(scores))


if __name__ == "__main__":
    main()
