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
import jax.numpy as jnp
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
        # Weights-only int8 PTQ (decode.int8_weights): kernels live as
        # int8 + per-out-channel scales; the jitted decode dequantizes
        # inside the program so XLA fuses the dequant into each matmul's
        # weight read — HBM serves int8 (decode is weight-bandwidth-bound;
        # measured win in BENCHMARKS.md r4). self.params becomes the
        # (qparams, scales) pair; _beam_fn builds matching signatures.
        self._int8 = bool(getattr(cfg.decode, "int8_weights", False))
        self._int8_kv = bool(getattr(cfg.decode, "int8_kv_cache", False))
        if (self._int8 or self._int8_kv) and mesh is not None:
            raise ValueError(
                "decode.int8_weights / decode.int8_kv_cache are "
                "single-device serving only (v1): disable them for "
                "mesh/distributed decode")
        if self._int8:
            from .ops.quantize import quantize_params
            # Quantize from the f32 checkpoint values (params were cast to
            # bf16 above — re-deriving scales from bf16 would double-round).
            # embedding_rows: per-row int8 embedding serves both the token
            # gather and the tied logits matmul (decoder._embedding_table).
            self.params = quantize_params(params, embedding_rows=True)
        if mesh is not None:
            from .parallel.sharding import param_shardings
            # Host snapshot first: device_put of a device-COMMITTED array
            # onto a cross-process sharding needs backend cross-host
            # transfers (unsupported on CPU, DCN-flag-gated on TPU); a
            # numpy tree is fully host-replicated, so each process places
            # its own shards locally (same trick as __graft_entry__).
            host = jax.tree.map(np.asarray, self.params)
            self.params = jax.tree.map(
                jax.device_put, host, param_shardings(mesh, host))
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
            elif self._int8:
                # decode_variables: encoder dequantized up front (runs once
                # per batch), decoder kernels kept int8 + 'qscales'
                # collection so QuantDenseGeneral dispatches the Pallas
                # int8 kernel INSIDE the decode scan (the weight stream
                # HBM serves per step is the int8 bytes — the XLA
                # dequant-fusion path hoists and serves bf16 instead;
                # measured, BENCHMARKS.md r4/r5).
                from .ops.quantize import decode_variables
                from .train import compute_cast_dtype
                dt = compute_cast_dtype(self.cfg) or jnp.float32
                kv = self._int8_kv
                if beam_size == 1:
                    fn = jax.jit(lambda qp, f, l: greedy_decode_jit(
                        model, decode_variables(*qp, dt), f, l,
                        max_len=max_len, int8_kv=kv))
                else:
                    fn = jax.jit(lambda qp, f, l: beam_decode(
                        model, decode_variables(*qp, dt), f, l,
                        beam_size=beam_size, max_len=max_len, alpha=alpha,
                        int8_kv=kv))
            elif beam_size == 1:
                fn = jax.jit(lambda p, f, l: greedy_decode_jit(
                    model, p, f, l, max_len=max_len,
                    int8_kv=self._int8_kv))
            else:
                fn = jax.jit(lambda p, f, l: beam_decode(
                    model, p, f, l, beam_size=beam_size, max_len=max_len,
                    alpha=alpha, int8_kv=self._int8_kv))
            self._beam_fns[key] = fn
        return self._beam_fns[key]

    def _decode_raw(self, abatch: AudioBatch, *, beam_size: int,
                    max_len: int, alpha: float):
        """Run the (possibly sharded) decode step; returns best-hypothesis
        ``(tokens, lengths)`` as jax arrays — global arrays in mesh mode
        (each host holds only its addressable shards under a multi-process
        launch)."""
        if self.mesh is not None:
            from .parallel.sharding import globalize_audio_batch
            abatch = globalize_audio_batch(self.mesh, abatch)
        batch = self.preprocess(abatch)
        fn = self._beam_fn(beam_size, max_len, alpha)
        out = fn(self.params, batch.feats, batch.frame_lens)
        if beam_size == 1:
            return out
        return out.tokens[:, 0], out.lengths[:, 0]

    def decode_batch(self, abatch: AudioBatch, *, beam_size: int,
                     max_len: int, alpha: float) -> List[List[int]]:
        tokens, lengths = self._decode_raw(abatch, beam_size=beam_size,
                                           max_len=max_len, alpha=alpha)
        t = np.asarray(tokens)
        l = np.asarray(lengths)
        hyps = [t[i, :l[i]].tolist() for i in range(t.shape[0])]
        return [[x for x in h if x != EOS] for h in hyps]

    def _decode_batch_rows(self, abatch: AudioBatch, rows, *, beam_size: int,
                           max_len: int, alpha: float, distributed: bool):
        """Decode one (possibly host-sharded) batch; returns
        ``(manifest_rows, hyp_lists)`` aligned 1:1.

        Distributed mode pairs hypotheses with manifest rows by globalizing
        a row-id vector with EXACTLY the same 'data'-axis sharding as the
        batch itself, then all-gathering it alongside the decoded tokens —
        the hyp↔utterance pairing is then correct by construction for any
        mesh device order, and padded remainder rows (row id -1) drop out."""
        tokens, lengths = self._decode_raw(abatch, beam_size=beam_size,
                                           max_len=max_len, alpha=alpha)
        if not distributed:
            t = np.asarray(tokens)
            l = np.asarray(lengths)
            hyps = [[x for x in t[i, :l[i]].tolist() if x != EOS]
                    for i in range(len(rows))]
            return list(rows), hyps

        from jax.experimental import multihost_utils
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel.mesh import DATA_AXIS
        bsz = int(abatch.audio.shape[0])
        local_rows = np.full((bsz,), -1, np.int32)
        local_rows[:len(rows)] = rows
        g_rows = jax.make_array_from_process_local_data(
            NamedSharding(self.mesh, P(DATA_AXIS)), local_rows)
        gather = lambda x: np.asarray(
            multihost_utils.process_allgather(x, tiled=True))
        t, l, r = gather(tokens), gather(lengths), gather(g_rows)
        keep = np.nonzero(r >= 0)[0]
        hyps = [[x for x in t[i, :l[i]].tolist() if x != EOS] for i in keep]
        return [int(x) for x in r[keep]], hyps

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
        distributed: bool = False,
    ) -> Dict[str, float]:
        """Decode + score a manifest. ``distributed=True`` is the multi-host
        data-parallel mode (the BASELINE north-star "multi-host
        data-parallel beam search"): every host decodes its
        ``process_index``-strided shard of each globally-planned batch
        through the sharded decode step, then all-gathers hypotheses and
        row identities so every host scores the FULL manifest and returns
        identical scores (the same pattern as Trainer._greedy_batch;
        ``out_path`` is written by host 0 only). ``batch_size`` is
        per-host in distributed mode, matching the Trainer's per-host
        batch-size convention."""
        d = self.cfg.decode
        beam_size = beam_size if beam_size is not None else d.beam_size
        max_len = max_len if max_len is not None else d.max_decode_len
        alpha = alpha if alpha is not None else d.length_penalty

        nproc = jax.process_count()
        if distributed:
            if self.mesh is None:
                raise ValueError(
                    "decode_manifest(distributed=True) needs a mesh: "
                    "construct the Recognizer with mesh=... (recognize_cli "
                    "--distributed builds one automatically)")
        elif nproc > 1:
            raise RuntimeError(
                "decode_manifest without distributed=True under a "
                f"multi-process launch ({nproc} processes): every host "
                "would feed the FULL manifest into globalize_audio_batch, "
                "which expects per-host shards — pass distributed=True "
                "(recognize_cli --distributed).")
        shard_index = jax.process_index() if distributed else 0
        num_shards = nproc if distributed else 1

        ds = ManifestDataset(manifest_path, self.cfg.data, self.cfg.features)
        batcher = BucketedBatcher(
            ds, batch_size=batch_size,
            bucket_boundaries=self.cfg.data.bucket_boundaries,
            target_len=min(self.cfg.data.max_target_len,
                           self.cfg.model.max_target_positions),
            shuffle=False, drop_remainder=False,
            shard_index=shard_index, num_shards=num_shards,
            max_frames_per_batch=max_frames_per_batch,
            adaptive_target_len=self.cfg.data.adaptive_target_len)
        if self.mesh is not None:
            # The 'data' axis must divide every GLOBAL batch's row count
            # (per-host rows × num_shards); round each bucket's per-host
            # batch size up (remainder batches already pad to the bucket
            # size, padded rows carry valid=False).
            import math
            dp = int(self.mesh.shape.get("data", 1))
            q = dp // math.gcd(dp, num_shards)
            batcher.bucket_batch_sizes = [
                -(-b // q) * q for b in batcher.bucket_batch_sizes]

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
        refs, hyps, utt_ids, ref_rows = [], [], [], []
        audio_total = t_total = 0.0
        # Steady-state RTF: the first call at each (shape, decode-args) key
        # includes XLA compilation — count it in rtf_with_compile but keep
        # it out of the headline RTF (the steady-state number is what an
        # N-batch production eval converges to). In distributed mode the
        # per-host wall time covers the GLOBAL batch (the decode step and
        # the gather are collective, so hosts are time-synchronized) and
        # batch_audio counts all shards' utterances — RTF semantics match
        # the single-process number.
        audio_steady = t_steady = 0.0
        seen_shapes = set()
        for abatch, rows in batcher.epoch(0, with_rows=True):
            bml = _batch_max_len(abatch)
            key = (abatch.audio.shape, beam_size, bml, alpha)
            t0 = time.perf_counter()
            g_rows, out = self._decode_batch_rows(
                abatch, rows, beam_size=beam_size, max_len=bml, alpha=alpha,
                distributed=distributed)
            dt = time.perf_counter() - t0
            batch_audio = sum(ds.entries[i]["num_samples"] for i in g_rows) / sr
            t_total += dt
            audio_total += batch_audio
            if key in seen_shapes:
                t_steady += dt
                audio_steady += batch_audio
            else:
                seen_shapes.add(key)
            for idx, h in zip(g_rows, out):
                e = ds.entries[idx]
                refs.append(e["tokens"])
                ref_rows.append(idx)
                hyps.append(h)
                utt_ids.append(e["utt_id"])

        if audio_steady == 0.0 and audio_total > 0.0:
            # Every batch was a first-of-shape (compile) call — small
            # manifest. Re-run the epoch through the now-warm executables
            # so the reported RTF is still compile-free.
            for abatch, rows in batcher.epoch(0, with_rows=True):
                bml = _batch_max_len(abatch)
                t0 = time.perf_counter()
                g_rows, _ = self._decode_batch_rows(
                    abatch, rows, beam_size=beam_size, max_len=bml,
                    alpha=alpha, distributed=distributed)
                t_steady += time.perf_counter() - t0
                audio_steady += sum(
                    ds.entries[i]["num_samples"] for i in g_rows) / sr

        scores = cer(refs, hyps)
        if self.tokenizer is not None and hasattr(self.tokenizer, "merges"):
            # BPE outputs (LibriSpeech): the headline metric is word-level
            # WER — decode hypotheses to text and score against the
            # manifest's reference text (token-level "cer" above stays as
            # the subword error rate).
            from .ops.metrics import wer
            ref_words = [ds.entries[i]["text"].split() for i in ref_rows]
            hyp_words = [self.tokenizer.decode(h).split() for h in hyps]
            scores["wer"] = wer(ref_words, hyp_words)["wer"]
        scores["rtf"] = t_steady / max(audio_steady, 1e-9)
        scores["rtf_with_compile"] = t_total / max(audio_total, 1e-9)
        scores["audio_seconds"] = audio_total
        scores["utterances"] = float(len(hyps))

        if out_path and (not distributed or jax.process_index() == 0):
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
