"""AOT serving-export CLI (no reference analogue — the reference deploys
by ``torch.load`` + Python; this exports the whole batched recognizer as a
self-contained StableHLO artifact, SURVEY.md §2.1 "Checkpoint I/O" →
serving.py).

  python -m speech_tranformer_pytorch_tpu.export_cli \
      --work-dir exp/run1 --out exp/run1/decoder.stablehlo \
      --batch-size 32 --frames 1000 --beam 5 --max-len 100

Export on the target platform: a TPU process emits a TPU artifact (the
CPU artifact is for tests). The serving side needs only jax —
``serving.load_exported(open(p,'rb').read())(params_flat, feats, lens)``.
Params ship alongside as an .npz (flat leaf list, index-ordered).
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--work-dir", required=True,
                    help="training work dir (checkpoints/ + config.json)")
    ap.add_argument("--out", required=True, help="artifact path (.stablehlo)")
    ap.add_argument("--params-out", default=None,
                    help="flat-params .npz path (default: <out>.params.npz)")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--max-len", type=int, default=100)
    ap.add_argument("--alpha", type=float, default=None)
    args = ap.parse_args(argv)

    import numpy as np

    from .config import config_from_dict
    from .recognize import load_recognizer
    from .serving import export_recognizer, flatten_params

    saved = os.path.join(args.work_dir, "config.json")
    if not os.path.exists(saved):
        raise FileNotFoundError(
            f"{saved} not found — export needs the run's saved config "
            "(train_cli writes it)")
    cfg = config_from_dict(json.load(open(saved)))
    # Export serializes full-precision weights; int8 decode is a live-
    # Recognizer feature (quantized export would change the artifact's
    # param signature — future work).
    cfg = cfg.replace(decode=cfg.decode.replace(int8_weights=False))
    rec = load_recognizer(cfg, os.path.join(args.work_dir, "checkpoints"))
    alpha = args.alpha if args.alpha is not None else cfg.decode.length_penalty

    data = export_recognizer(
        cfg, rec.params, batch_size=args.batch_size, frames=args.frames,
        beam_size=args.beam, max_len=args.max_len, alpha=alpha)
    with open(args.out, "wb") as f:
        f.write(data)

    params_out = args.params_out or args.out + ".params.npz"
    flat = flatten_params(rec.params)
    np.savez(params_out, **{f"p{i:05d}": np.asarray(x)
                            for i, x in enumerate(flat)})
    print(json.dumps({"artifact": args.out, "bytes": len(data),
                      "params": params_out, "num_param_leaves": len(flat),
                      "batch_size": args.batch_size, "frames": args.frames,
                      "beam": args.beam, "max_len": args.max_len}))


if __name__ == "__main__":
    main()
