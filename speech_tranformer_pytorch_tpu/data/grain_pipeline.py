"""grain-backed input pipeline (SURVEY.md §2.1 native-checklist row 5:
"grain / tf.data sharded input pipeline" replacing the reference's
DataLoader worker pool).

grain provides the deterministic, host-sharded, checkpointable index
stream and the multiprocess IO workers; bucketing-by-length and padding
reuse the same assembler as the pure-Python pipeline (pipeline.py), so
both paths produce identical AudioBatch contracts. The grain iterator is
checkpointable via ``PyGrainCheckpointHandler`` (SURVEY.md §5 "Checkpoint /
resume": data-iterator state in checkpoints).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional, Sequence

import numpy as np

import grain.python as gp

from ..config import DataConfig, FeatureConfig
from .pipeline import AudioBatch, ManifestDataset, _frames_for_samples
from .prepare import read_audio
from .tokenizer import EOS, PAD, SOS


class ManifestSource(gp.RandomAccessDataSource):
    """Random-access view of a manifest: returns (audio, tokens, entry_idx)."""

    def __init__(self, ds: ManifestDataset):
        self._ds = ds

    def __len__(self) -> int:
        return len(self._ds)

    def __getitem__(self, idx: int):
        e = self._ds.entries[idx]
        samples, _ = read_audio(e["audio"])
        return {"audio": samples, "tokens": np.asarray(e["tokens"], np.int32),
                "idx": np.int64(idx)}


class GrainBucketedPipeline:
    """Deterministic sharded epoch iterator over bucketed AudioBatches.

    grain owns shuffling/sharding/worker IO; this class owns bucket
    assembly (same static-shape contract as BucketedBatcher).
    """

    def __init__(
        self,
        ds: ManifestDataset,
        *,
        batch_size: int,
        bucket_boundaries: Sequence[int],
        target_len: int,
        seed: int = 0,
        shard_index: int = 0,
        num_shards: int = 1,
        num_workers: int = 0,
        drop_remainder: bool = True,
    ):
        self.ds = ds
        self.batch_size = batch_size
        self.boundaries = list(bucket_boundaries)
        self.target_len = target_len
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.source = ManifestSource(ds)
        self.shard_options = gp.ShardOptions(
            shard_index=shard_index, shard_count=num_shards,
            drop_remainder=False)
        self.num_workers = num_workers

    def _loader(self, epoch: int) -> gp.DataLoader:
        sampler = gp.IndexSampler(
            num_records=len(self.source),
            shard_options=self.shard_options,
            shuffle=True,
            num_epochs=1,
            seed=self.seed + epoch,
        )
        return gp.DataLoader(
            data_source=self.source,
            sampler=sampler,
            operations=[],
            worker_count=self.num_workers,
        )

    def _bucket_of(self, frames: int) -> int:
        for i, b in enumerate(self.boundaries):
            if frames <= b:
                return i
        return len(self.boundaries) - 1

    def epoch(self, epoch_index: int) -> Iterator[AudioBatch]:
        import jax.numpy as jnp

        fcfg = self.ds.fcfg
        hop, L = fcfg.frame_shift, fcfg.frame_length
        buckets: dict[int, List[dict]] = {}

        def assemble(items: List[dict], bucket: int,
                     pad_to_batch: bool) -> AudioBatch:
            max_samples = L + (self.boundaries[bucket] - 1) * hop
            bsz = self.batch_size if pad_to_batch else len(items)
            audio = np.zeros((bsz, max_samples), np.float32)
            slens = np.zeros((bsz,), np.int32)
            tin = np.full((bsz, self.target_len), PAD, np.int32)
            tout = np.full((bsz, self.target_len), PAD, np.int32)
            tlens = np.zeros((bsz,), np.int32)
            valid = np.zeros((bsz,), bool)
            for row, it in enumerate(items):
                n = min(len(it["audio"]), max_samples)
                audio[row, :n] = it["audio"][:n]
                slens[row] = n
                toks = it["tokens"][: self.target_len - 1]
                tin[row, 0] = SOS
                tin[row, 1:1 + len(toks)] = toks
                tout[row, :len(toks)] = toks
                tout[row, len(toks)] = EOS
                tlens[row] = len(toks) + 1
                valid[row] = True
            for row in range(len(items), bsz):
                slens[row] = L
                tlens[row] = 1
                tin[row, 0] = SOS
                tout[row, 0] = EOS
            return AudioBatch(jnp.asarray(audio), jnp.asarray(slens),
                              jnp.asarray(tin), jnp.asarray(tout),
                              jnp.asarray(tlens), jnp.asarray(valid))

        for item in self._loader(epoch_index):
            frames = _frames_for_samples(len(item["audio"]), fcfg)
            b = self._bucket_of(frames)
            buckets.setdefault(b, []).append(item)
            if len(buckets[b]) == self.batch_size:
                yield assemble(buckets.pop(b), b, False)
        if not self.drop_remainder:
            for b, items in sorted(buckets.items()):
                if items:
                    yield assemble(items, b, True)
