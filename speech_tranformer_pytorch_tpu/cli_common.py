"""Shared CLI plumbing: preset selection + ``--set section.key=value``
overrides + data-dir conventions (reference: the argparse block of
``train.py``/``recognize.py`` — SURVEY.md L6)."""

from __future__ import annotations

import argparse
import ast
import os
from typing import Optional

from .config import ExperimentConfig, apply_overrides, get_config


def add_common_args(ap: argparse.ArgumentParser) -> None:
    # Default is None (resolved to "base" in resolve_config) so callers can
    # tell an explicit --preset apart from the default — train_cli --resume
    # refuses an explicit preset rather than silently ignoring it.
    ap.add_argument("--preset", default=None,
                    help="tiny|base|large|librispeech|sharded (default: base)")
    ap.add_argument("--data-dir", default=None,
                    help="directory with {train,dev,test}.jsonl + vocab.json")
    ap.add_argument("--set", action="append", default=[], metavar="K=V",
                    dest="overrides",
                    help="config override, e.g. --set model.d_model=640")


def _parse_value(s: str):
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        return s


def resolve_config(args) -> ExperimentConfig:
    overrides = {}
    for kv in args.overrides:
        if "=" not in kv:
            raise SystemExit(f"--set expects K=V, got {kv!r}")
        k, v = kv.split("=", 1)
        overrides[k] = _parse_value(v)

    cfg = get_config(args.preset or "base")
    if args.data_dir:
        d = args.data_dir
        data_overrides = {}
        for split in ("train", "dev", "test"):
            p = os.path.join(d, f"{split}.jsonl")
            if os.path.exists(p):
                data_overrides[f"data.{split}_manifest"] = p
        vocab = os.path.join(d, "vocab.json")
        if os.path.exists(vocab):
            data_overrides["data.vocab_path"] = vocab
            from .data.tokenizer import load_tokenizer
            tok = load_tokenizer(vocab)
            data_overrides["model.vocab_size"] = tok.vocab_size
        cfg = apply_overrides(cfg, data_overrides)
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    return cfg.validate()
