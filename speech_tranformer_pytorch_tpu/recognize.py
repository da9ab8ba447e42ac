"""Decoding / eval driver (reference: ``recognize.py`` — SURVEY.md §2.1
"Greedy decode"/"Beam search"/"CER scoring", §3.2: load checkpoint, decode
the test set, write hypotheses, compute CER).

TPU-first: batches of utterances decode together (bucketed, static shapes
— one compile per bucket), encoder runs once per batch and the whole beam
advances in a single ``lax.scan``; the reference decodes one utterance at a
time in Python. Reports CER and RTF (decode wall-time / audio seconds)."""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

import jax
import numpy as np

from .config import ExperimentConfig
from .data.pipeline import (AudioBatch, BucketedBatcher, ManifestDataset,
                            make_preprocess_fn)
from .data.tokenizer import EOS, load_tokenizer
from .decoding import beam_decode, greedy_decode_jit
from .models import SpeechTransformer
from .ops.metrics import cer
from .train import TrainState, create_train_state
from .utils.checkpoint import Checkpointer, CheckpointState


class Recognizer:
    def __init__(self, cfg: ExperimentConfig, params, *,
                 tokenizer=None):
        self.cfg = cfg
        # Inference never updates params: cast the f32 checkpoint tree to the
        # compute dtype ONCE at load, halving weight HBM reads per decode step.
        from .train import cast_params, compute_cast_dtype
        self.params = cast_params(params, compute_cast_dtype(cfg))
        self.model = SpeechTransformer(cfg.model)
        self.tokenizer = tokenizer
        self.preprocess = jax.jit(make_preprocess_fn(cfg.features, None))
        self._beam_fns = {}

    def _beam_fn(self, beam_size: int, max_len: int, alpha: float):
        key = (beam_size, max_len, alpha)
        if key not in self._beam_fns:
            model = self.model
            if beam_size == 1:
                fn = jax.jit(lambda p, f, l: greedy_decode_jit(
                    model, p, f, l, max_len=max_len))
            else:
                fn = jax.jit(lambda p, f, l: beam_decode(
                    model, p, f, l, beam_size=beam_size, max_len=max_len,
                    alpha=alpha))
            self._beam_fns[key] = fn
        return self._beam_fns[key]

    def decode_batch(self, abatch: AudioBatch, *, beam_size: int,
                     max_len: int, alpha: float) -> List[List[int]]:
        batch = self.preprocess(abatch)
        fn = self._beam_fn(beam_size, max_len, alpha)
        out = fn(self.params, batch.feats, batch.frame_lens)
        if beam_size == 1:
            tokens, lengths = out
            t = np.asarray(tokens)
            l = np.asarray(lengths)
            hyps = [t[i, :l[i]].tolist() for i in range(t.shape[0])]
        else:
            t = np.asarray(out.tokens[:, 0])
            l = np.asarray(out.lengths[:, 0])
            hyps = [t[i, :l[i]].tolist() for i in range(t.shape[0])]
        return [[x for x in h if x != EOS] for h in hyps]

    def decode_manifest(
        self,
        manifest_path: str,
        *,
        beam_size: Optional[int] = None,
        max_len: Optional[int] = None,
        alpha: Optional[float] = None,
        batch_size: int = 16,
        out_path: Optional[str] = None,
    ) -> Dict[str, float]:
        d = self.cfg.decode
        beam_size = beam_size if beam_size is not None else d.beam_size
        max_len = max_len if max_len is not None else d.max_decode_len
        alpha = alpha if alpha is not None else d.length_penalty

        ds = ManifestDataset(manifest_path, self.cfg.data, self.cfg.features)
        batcher = BucketedBatcher(
            ds, batch_size=batch_size,
            bucket_boundaries=self.cfg.data.bucket_boundaries,
            target_len=min(self.cfg.data.max_target_len,
                           self.cfg.model.max_target_positions),
            shuffle=False, drop_remainder=False)

        # Track utterance order: batcher yields in bucket order; reconstruct
        # refs per row via the batcher's own index stream.
        refs, hyps, utt_ids = [], [], []
        audio_seconds = 0.0
        # warmup compile excluded from RTF
        t_decode = 0.0
        for abatch, rows in _batches_with_rows(batcher):
            batch_max_len = max_len
            if d.max_len_ratio > 0:
                # Cap decode steps by the bucket's subsampled frame count
                # (shape-static per bucket => at most one extra compile per
                # bucket; reference caps per utterance in its python loop).
                enc_frames = int(abatch.audio.shape[1]
                                 // self.cfg.features.frame_shift) // 4
                batch_max_len = max(4, min(
                    max_len, int(d.max_len_ratio * enc_frames)))
            t0 = time.perf_counter()
            out = self.decode_batch(abatch, beam_size=beam_size,
                                    max_len=batch_max_len, alpha=alpha)
            t1 = time.perf_counter()
            t_decode += t1 - t0
            for row, idx in enumerate(rows):
                e = ds.entries[idx]
                refs.append(e["tokens"])
                hyps.append(out[row])
                utt_ids.append(e["utt_id"])
                audio_seconds += e["num_samples"] / self.cfg.features.sample_rate

        scores = cer(refs, hyps)
        scores["rtf"] = t_decode / max(audio_seconds, 1e-9)
        scores["audio_seconds"] = audio_seconds
        scores["utterances"] = float(len(hyps))

        if out_path:
            with open(out_path, "w", encoding="utf-8") as f:
                for uid, h in zip(utt_ids, hyps):
                    text = (self.tokenizer.decode(h)
                            if self.tokenizer is not None else "")
                    f.write(json.dumps({"utt_id": uid, "tokens": h,
                                        "text": text},
                                       ensure_ascii=False) + "\n")
        return scores


def _batches_with_rows(batcher: BucketedBatcher):
    """Yield (AudioBatch, manifest_row_indices) preserving identity."""
    # Reimplements the bucket walk to expose indices (shuffle=False).
    order = list(range(len(batcher.ds)))
    order = order[batcher.shard_index::batcher.num_shards]
    buckets: Dict[int, List[int]] = {}
    for idx in order:
        e = batcher.ds.entries[idx]
        from .data.pipeline import _frames_for_samples
        b = batcher._bucket_of(_frames_for_samples(e["num_samples"],
                                                   batcher.ds.fcfg))
        buckets.setdefault(b, []).append(idx)
        if len(buckets[b]) == batcher.batch_size:
            idxs = buckets.pop(b)
            yield batcher._make_batch(idxs, b), idxs
    for b, idxs in sorted(buckets.items()):
        if idxs:
            yield batcher._make_batch(idxs, b, pad_to_batch=True), idxs


def load_recognizer(cfg: ExperimentConfig, checkpoint_dir: str,
                    *, vocab_path: Optional[str] = None) -> Recognizer:
    """Build a Recognizer from the latest checkpoint in ``checkpoint_dir``."""
    from .data.synthetic import batch_from_dataset, make_synthetic_dataset

    # Template state: shapes only (tiny synthetic batch to init).
    ds = make_synthetic_dataset(2, vocab_size=min(cfg.model.vocab_size, 32),
                                seed=0)
    example = batch_from_dataset(ds, cfg.features)
    state = create_train_state(cfg, jax.random.PRNGKey(0), example)
    ckpt = Checkpointer(checkpoint_dir)
    template = CheckpointState(state, jax.random.PRNGKey(0), 0, 0,
                               cfg.model_hash())
    _, restored = ckpt.restore(template)
    tok = load_tokenizer(vocab_path) if vocab_path else None
    return Recognizer(cfg, restored.state.params, tokenizer=tok)
