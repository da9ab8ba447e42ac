"""Input pipeline (reference: ``AudioDataset``/``collate_fn``/``DataLoader``
with length sorting, padding, epoch shuffling — SURVEY.md §2.1
"Dataset/loader"; the TPU redesign is the bucketed-by-length, host-sharded
pipeline of SURVEY.md §5 "Long-context" item 1 and §3.5).

Host side stays cheap: read manifests, shuffle per epoch (seeded,
host-sharded without duplication), bucket by length, pad to the bucket's
static shape, read PCM. Feature extraction (fbank/CMVN/SpecAugment) runs
on-device inside the jit'd step (see ``make_preprocess_fn``) — the host
never computes an FFT.

Static shapes: each bucket has a fixed (audio_samples, target_len) pad
shape and fixed batch size => at most ``len(buckets)`` XLA compilations.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DataConfig, ExperimentConfig, FeatureConfig, SpecAugmentConfig
from ..train import Batch
from .features import extract_features, frame_lengths_from_sample_lengths
from .prepare import read_audio, read_manifest
from .tokenizer import EOS, PAD, SOS


@dataclasses.dataclass(frozen=True)
class AudioBatch:
    """Padded raw-audio batch (features are computed on device)."""
    audio: jnp.ndarray          # [B, S] float32
    sample_lens: jnp.ndarray    # [B]
    targets_in: jnp.ndarray     # [B, U]
    targets_out: jnp.ndarray    # [B, U]
    target_lens: jnp.ndarray    # [B]
    valid: jnp.ndarray          # [B] bool — False for eval-padding rows


jax.tree_util.register_pytree_node(
    AudioBatch,
    lambda b: ((b.audio, b.sample_lens, b.targets_in, b.targets_out,
                b.target_lens, b.valid), None),
    lambda _, xs: AudioBatch(*xs),
)


def _frames_for_samples(n: int, fcfg: FeatureConfig) -> int:
    if n < fcfg.frame_length:
        return 0
    return 1 + (n - fcfg.frame_length) // fcfg.frame_shift


def _samples_for_frames(frames: int, fcfg: FeatureConfig) -> int:
    return fcfg.frame_length + (frames - 1) * fcfg.frame_shift


class ManifestDataset:
    """Loaded manifest with tokenized targets; filters over-long utterances
    (reference behavior: sort + discard/clip long utts, SURVEY.md §5)."""

    def __init__(self, manifest_path: str, data_cfg: DataConfig,
                 feature_cfg: FeatureConfig):
        self.entries = read_manifest(manifest_path)
        self.fcfg = feature_cfg
        # Batches carry PCM in this dtype; int16 (default) ships the WAV's
        # native samples and the on-device fbank dequantizes (see
        # read_audio / extract_features).
        self.audio_dtype = getattr(data_cfg, "audio_dtype", "float32")
        kept = []
        for e in self.entries:
            frames = _frames_for_samples(e["num_samples"], feature_cfg)
            if frames == 0 or frames > data_cfg.max_source_frames:
                continue
            if len(e["tokens"]) + 1 > data_cfg.max_target_len:
                continue
            kept.append(e)
        self.dropped = len(self.entries) - len(kept)
        self.entries = kept

    def __len__(self) -> int:
        return len(self.entries)


@dataclasses.dataclass(frozen=True)
class PlannedBatch:
    """One global batch decided purely from manifest metadata."""
    bucket: int
    global_idxs: Tuple[int, ...]   # entry indices, global order
    pad_to_batch: bool             # remainder batch — pad rows to full size


def target_width_for_rows(ds: "ManifestDataset", global_idxs,
                          target_len: int, *,
                          adaptive: bool = True) -> int:
    """Per-batch target pad width: the smallest multiple of 16 covering
    the batch's longest target (+1 for the sos/eos column), capped at
    ``target_len``.

    Why: padding every batch to the global ``max_target_len`` (128 at
    base) runs a 128-position decoder against ~15-30-token speech targets
    — measured 20% of the whole train step wasted (20.5 -> 17.0 ms/step
    at 30-token targets, tools/r5_loop_ceiling.py). Rounding to 16 bounds
    recompiles at target_len/16 distinct widths per frame bucket (in
    practice utterance length correlates with frames, so far fewer).

    Derived from the GLOBAL plan rows — metadata every host already holds
    — so all hosts of a multi-process launch pick the same static shape
    for their shards of the batch (a per-shard max would diverge).
    ``adaptive=False`` or ``target_len <= 16`` keeps the legacy fixed
    padding (the cap also makes tiny-test shapes bit-identical)."""
    if not adaptive or target_len <= 16:
        return target_len
    need = 2
    for i in global_idxs:
        n = min(len(ds.entries[i]["tokens"]), target_len - 1) + 1
        if n > need:
            need = n
    return min(target_len, -(-need // 16) * 16)


def plan_epoch(
    ds: "ManifestDataset",
    *,
    boundaries: Sequence[int],
    bucket_batch_sizes: Sequence[int],
    num_shards: int,
    seed: int,
    epoch_index: int,
    shuffle: bool,
    drop_remainder: bool,
) -> List[PlannedBatch]:
    """Metadata-only epoch plan shared by both pipelines.

    Every host computes the SAME plan (global shuffled order, global batch
    boundaries of per-host-batch × num_shards), so all hosts yield the same
    number of batches per epoch — per-shard bucketing would drift and
    deadlock synchronous collectives (SURVEY.md §7 hard part 4). Because
    the plan needs no audio IO, checkpoint resume can skip into an epoch
    at batch granularity without reading the skipped utterances.
    """
    order = np.arange(len(ds))
    if shuffle:
        rng = np.random.default_rng(seed + epoch_index)
        rng.shuffle(order)

    def bucket_of(frames: int) -> int:
        for i, b in enumerate(boundaries):
            if frames <= b:
                return i
        return len(boundaries) - 1

    plans: List[PlannedBatch] = []
    buckets: Dict[int, List[int]] = {}
    for idx in order:
        e = ds.entries[idx]
        b = bucket_of(_frames_for_samples(e["num_samples"], ds.fcfg))
        buckets.setdefault(b, []).append(int(idx))
        if len(buckets[b]) == bucket_batch_sizes[b] * num_shards:
            plans.append(PlannedBatch(b, tuple(buckets.pop(b)), False))
    if not drop_remainder:
        for b, global_idxs in sorted(buckets.items()):
            if global_idxs:
                # all hosts see the same non-empty global remainder =>
                # same batch count; a host's slice may be empty -> all
                # padding rows (valid=False).
                plans.append(PlannedBatch(b, tuple(global_idxs), True))
    return plans


class BucketedBatcher:
    """Length-bucketed, epoch-shuffled, host-sharded batch iterator.

    Each host sees entries where ``index % num_shards == shard_index``
    (deterministic, no duplication — SURVEY.md §7 hard part 4).
    """

    def __init__(
        self,
        ds: ManifestDataset,
        *,
        batch_size: int,
        bucket_boundaries: Sequence[int],     # frame-count upper bounds
        target_len: int,
        seed: int = 0,
        shard_index: int = 0,
        num_shards: int = 1,
        drop_remainder: bool = True,
        shuffle: bool = True,
        max_frames_per_batch: int = 0,
        adaptive_target_len: bool = True,
    ):
        self.ds = ds
        self.batch_size = batch_size
        self.boundaries = list(bucket_boundaries)
        self.adaptive_target_len = adaptive_target_len
        # Frame-budget batching: each bucket's batch size is chosen so
        # batch*boundary ~= max_frames_per_batch, equalizing padded compute
        # per step across buckets (short utts -> big batches). 0 = fixed
        # utterance-count batching (reference behavior).
        if max_frames_per_batch > 0:
            self.bucket_batch_sizes = [
                max(max_frames_per_batch // bnd, 1) for bnd in self.boundaries]
        else:
            self.bucket_batch_sizes = [batch_size] * len(self.boundaries)
        self.target_len = target_len
        self.seed = seed
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.drop_remainder = drop_remainder
        self.shuffle = shuffle

    def _bucket_of(self, frames: int) -> int:
        for i, b in enumerate(self.boundaries):
            if frames <= b:
                return i
        return len(self.boundaries) - 1

    def _target_width(self, global_idxs) -> int:
        return target_width_for_rows(self.ds, global_idxs, self.target_len,
                                     adaptive=self.adaptive_target_len)

    def plan(self, epoch_index: int) -> List[PlannedBatch]:
        return plan_epoch(
            self.ds, boundaries=self.boundaries,
            bucket_batch_sizes=self.bucket_batch_sizes,
            num_shards=self.num_shards, seed=self.seed,
            epoch_index=epoch_index, shuffle=self.shuffle,
            drop_remainder=self.drop_remainder)

    def epoch(self, epoch_index: int, skip_batches: int = 0,
              with_rows: bool = False) -> Iterator:
        """Host-sharded epoch stream (see ``plan_epoch`` for the multi-host
        parity argument). ``skip_batches`` resumes mid-epoch without any
        audio IO for the skipped batches (the plan is metadata-only).

        ``with_rows=True`` yields ``(AudioBatch, entry_indices)`` so callers
        that need row identity (decode/eval: hypothesis↔reference pairing)
        share this single batch-composition path instead of re-deriving it
        (the reference pairs hyp/ref trivially in its per-utterance loop)."""
        for p in self.plan(epoch_index)[skip_batches:]:
            idxs = list(p.global_idxs[self.shard_index::self.num_shards])
            batch = self._make_batch(idxs, p.bucket,
                                     pad_to_batch=p.pad_to_batch,
                                     target_width=self._target_width(
                                         p.global_idxs))
            yield (batch, idxs) if with_rows else batch

    def _make_batch(self, idxs: List[int], bucket: int,
                    *, pad_to_batch: bool = False,
                    target_width: Optional[int] = None) -> AudioBatch:
        fcfg = self.ds.fcfg
        max_samples = _samples_for_frames(self.boundaries[bucket], fcfg)
        bsz = self.bucket_batch_sizes[bucket] if pad_to_batch else len(idxs)
        width = target_width or self.target_len
        adt = np.int16 if self.ds.audio_dtype == "int16" else np.float32
        audio = np.zeros((bsz, max_samples), adt)
        slens = np.zeros((bsz,), np.int32)
        tin = np.full((bsz, width), PAD, np.int32)
        tout = np.full((bsz, width), PAD, np.int32)
        tlens = np.zeros((bsz,), np.int32)
        valid = np.zeros((bsz,), bool)
        for row, idx in enumerate(idxs):
            e = self.ds.entries[idx]
            samples, _ = read_audio(e["audio"], dtype=self.ds.audio_dtype)
            n = min(len(samples), max_samples)
            audio[row, :n] = samples[:n]
            slens[row] = n
            toks = e["tokens"][: width - 1]
            tin[row, 0] = SOS
            tin[row, 1:1 + len(toks)] = toks
            tout[row, :len(toks)] = toks
            tout[row, len(toks)] = EOS
            tlens[row] = len(toks) + 1
            valid[row] = True
        for row in range(len(idxs), bsz):   # eval padding rows
            slens[row] = fcfg.frame_length
            tlens[row] = 1
            tin[row, 0] = SOS
            tout[row, 0] = EOS
        return AudioBatch(
            audio=jnp.asarray(audio), sample_lens=jnp.asarray(slens),
            targets_in=jnp.asarray(tin), targets_out=jnp.asarray(tout),
            target_lens=jnp.asarray(tlens), valid=jnp.asarray(valid))


def make_preprocess_fn(feature_cfg: FeatureConfig,
                       spec_cfg: Optional[SpecAugmentConfig] = None):
    """On-device audio -> features: fbank + CMVN (+ SpecAugment when a key
    is given). Composable inside the jit'd train step."""
    from .augment import spec_augment

    def preprocess(batch: AudioBatch, key: Optional[jax.Array] = None) -> Batch:
        feats, frame_lens = extract_features(
            batch.audio, batch.sample_lens, feature_cfg)
        if spec_cfg is not None and spec_cfg.enabled and key is not None:
            feats = spec_augment(key, feats, frame_lens, spec_cfg)
        return Batch(feats=feats, frame_lens=frame_lens,
                     targets_in=batch.targets_in,
                     targets_out=batch.targets_out,
                     target_lens=batch.target_lens)

    return preprocess


def make_audio_train_step(cfg: ExperimentConfig, *, donate: bool = True):
    """Fused on-device (preprocess -> model -> loss -> update) train step
    taking raw AudioBatch — the production path (fbank runs on the TPU,
    SURVEY.md §2.1 native-checklist row 1)."""
    from ..train import TrainState, make_train_step

    if jax.process_count() > 1:
        raise RuntimeError(
            "make_audio_train_step is collective-free: under a "
            "multi-process launch each process would train on its own data "
            "shard with NO gradient all-reduce — silently divergent "
            "replicas. Use parallel.sharding.make_sharded_audio_train_step "
            "under a mesh (runner.Trainer selects it automatically when "
            "jax.process_count() > 1).")

    preprocess = make_preprocess_fn(cfg.features, cfg.spec_augment)
    inner = make_train_step(cfg, donate=False)  # we jit the composition

    def step(state: TrainState, abatch: AudioBatch, rng: jax.Array):
        aug_key, step_key = jax.random.split(jax.random.fold_in(rng, state.step))
        batch = preprocess(abatch, aug_key)
        return inner(state, batch, step_key)

    return jax.jit(step, donate_argnums=(0,) if donate else ())

