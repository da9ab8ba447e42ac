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
                 tokenizer=None, mesh=None):
        """``mesh``: a single-process ``jax.sharding.Mesh`` routes decoding
        through the sharded builders (parallel/decode.py) — batch over
        'data', params over the TP rules — for multi-chip serving on one
        host. Mesh-less construction substitutes ring->dot via build_model
        (ring-trained checkpoints decode unchanged)."""
        self.cfg = cfg
        self.mesh = mesh
        # Inference never updates params: cast the f32 checkpoint tree to the
        # compute dtype ONCE at load, halving weight HBM reads per decode step.
        from .train import build_model, cast_params, compute_cast_dtype
        self.params = cast_params(params, compute_cast_dtype(cfg))
        self.model = build_model(cfg, mesh=mesh)
        if mesh is not None:
            from .parallel.sharding import param_shardings
            self.params = jax.tree.map(
                jax.device_put, self.params,
                param_shardings(mesh, self.params))
        self.tokenizer = tokenizer
        self.preprocess = jax.jit(make_preprocess_fn(cfg.features, None))
        self._beam_fns = {}

    def _beam_fn(self, beam_size: int, max_len: int, alpha: float):
        key = (beam_size, max_len, alpha)
        if key not in self._beam_fns:
            model = self.model
            if self.mesh is not None:
                from .parallel.decode import (make_sharded_beam_decode,
                                              make_sharded_greedy_decode)
                if beam_size == 1:
                    fn = make_sharded_greedy_decode(
                        model, self.mesh, max_len=max_len)(self.params)
                else:
                    fn = make_sharded_beam_decode(
                        model, self.mesh, beam_size=beam_size,
                        max_len=max_len, alpha=alpha)(self.params)
            elif beam_size == 1:
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
        if self.mesh is not None:
            from .parallel.sharding import globalize_audio_batch
            abatch = globalize_audio_batch(self.mesh, abatch)
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
        max_frames_per_batch: int = 0,
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
            shuffle=False, drop_remainder=False,
            max_frames_per_batch=max_frames_per_batch)
        if self.mesh is not None:
            # The 'data' axis must divide every batch's row count; round
            # each bucket's batch size up (remainder batches already pad to
            # the bucket size, padded rows carry valid=False).
            dp = int(self.mesh.shape.get("data", 1))
            batcher.bucket_batch_sizes = [
                -(-b // dp) * dp for b in batcher.bucket_batch_sizes]

        def _batch_max_len(abatch: AudioBatch) -> int:
            if d.max_len_ratio <= 0:
                return max_len
            # Cap decode steps by the bucket's subsampled frame count
            # (shape-static per bucket => at most one extra compile per
            # bucket; reference caps per utterance in its python loop).
            # Exact conv math — the same subsampled_lengths the encoder
            # applies — not the //4 approximation, which was off by a few
            # frames at bucket boundaries.
            from .data.pipeline import _frames_for_samples
            from .models.modules import subsampled_lengths
            frames = _frames_for_samples(int(abatch.audio.shape[1]),
                                         self.cfg.features)
            enc_frames = int(subsampled_lengths(np.asarray(frames)))
            return max(4, min(max_len, int(d.max_len_ratio * enc_frames)))

        sr = self.cfg.features.sample_rate
        refs, hyps, utt_ids = [], [], []
        audio_total = t_total = 0.0
        # Steady-state RTF: the first call at each (shape, decode-args) key
        # includes XLA compilation — count it in rtf_with_compile but keep
        # it out of the headline RTF (the steady-state number is what an
        # N-batch production eval converges to).
        audio_steady = t_steady = 0.0
        seen_shapes = set()
        for abatch, rows in batcher.epoch(0, with_rows=True):
            bml = _batch_max_len(abatch)
            key = (abatch.audio.shape, beam_size, bml, alpha)
            t0 = time.perf_counter()
            out = self.decode_batch(abatch, beam_size=beam_size,
                                    max_len=bml, alpha=alpha)
            dt = time.perf_counter() - t0
            batch_audio = sum(ds.entries[i]["num_samples"] for i in rows) / sr
            t_total += dt
            audio_total += batch_audio
            if key in seen_shapes:
                t_steady += dt
                audio_steady += batch_audio
            else:
                seen_shapes.add(key)
            for row, idx in enumerate(rows):
                e = ds.entries[idx]
                refs.append(e["tokens"])
                hyps.append(out[row])
                utt_ids.append(e["utt_id"])

        if audio_steady == 0.0 and audio_total > 0.0:
            # Every batch was a first-of-shape (compile) call — small
            # manifest. Re-run the epoch through the now-warm executables
            # so the reported RTF is still compile-free.
            for abatch, rows in batcher.epoch(0, with_rows=True):
                bml = _batch_max_len(abatch)
                t0 = time.perf_counter()
                self.decode_batch(abatch, beam_size=beam_size,
                                  max_len=bml, alpha=alpha)
                t_steady += time.perf_counter() - t0
                audio_steady += sum(
                    ds.entries[i]["num_samples"] for i in rows) / sr

        scores = cer(refs, hyps)
        scores["rtf"] = t_steady / max(audio_steady, 1e-9)
        scores["rtf_with_compile"] = t_total / max(audio_total, 1e-9)
        scores["audio_seconds"] = audio_total
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


def load_recognizer(cfg: ExperimentConfig, checkpoint_dir: str,
                    *, vocab_path: Optional[str] = None,
                    mesh=None) -> Recognizer:
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
    return Recognizer(cfg, restored.state.params, tokenizer=tok, mesh=mesh)
