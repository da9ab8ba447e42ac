"""Synthetic AISHELL-like fixture generator (SURVEY.md §7 step 1: sine-wave
audio + fake transcripts so everything downstream is testable with no
corpus). Deterministic given the seed.

Each "utterance" is a sequence of pure tones, one tone per transcript token,
so the mapping audio→text is learnable by a tiny model in a few hundred
steps — the 10-utterance overfit anchor of SURVEY.md §4.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from ..config import ExperimentConfig, FeatureConfig
from ..train import Batch

PAD, SOS, EOS, UNK = 0, 1, 2, 3
NUM_SPECIALS = 4


@dataclasses.dataclass
class SyntheticDataset:
    waves: List[np.ndarray]           # float32 audio
    transcripts: List[List[int]]      # token ids (>= NUM_SPECIALS)
    vocab_size: int
    sample_rate: int


def make_synthetic_dataset(
    num_utterances: int = 10,
    *,
    vocab_size: int = 32,
    min_tokens: int = 2,
    max_tokens: int = 6,
    tone_ms: float = 120.0,
    sample_rate: int = 16000,
    seed: int = 0,
    noise: float = 0.01,
) -> SyntheticDataset:
    rng = np.random.default_rng(seed)
    n_real = vocab_size - NUM_SPECIALS
    tone_len = int(sample_rate * tone_ms / 1000.0)
    freqs = 200.0 * (2.0 ** (np.arange(n_real) / 6.0))  # log-spaced, <8kHz for n_real<=32
    waves, transcripts = [], []
    for _ in range(num_utterances):
        n_tok = int(rng.integers(min_tokens, max_tokens + 1))
        toks = rng.integers(0, n_real, n_tok)
        segs = []
        for tk in toks:
            t = np.arange(tone_len) / sample_rate
            segs.append(np.sin(2 * np.pi * freqs[tk] * t))
        wave = np.concatenate(segs) + noise * rng.standard_normal(tone_len * n_tok)
        waves.append(wave.astype(np.float32))
        transcripts.append([int(tk) + NUM_SPECIALS for tk in toks])
    return SyntheticDataset(waves, transcripts, vocab_size, sample_rate)


def batch_from_dataset(
    ds: SyntheticDataset,
    feature_cfg: FeatureConfig,
    *,
    indices: Tuple[int, ...] | None = None,
    max_target_len: int = 0,
) -> Batch:
    """Pad the (sub)set into one Batch; features extracted via the frontend."""
    import jax.numpy as jnp

    from .features import extract_features

    idx = list(indices) if indices is not None else list(range(len(ds.waves)))
    waves = [ds.waves[i] for i in idx]
    trans = [ds.transcripts[i] for i in idx]

    max_samples = max(len(w) for w in waves)
    audio = np.zeros((len(idx), max_samples), np.float32)
    slens = np.zeros((len(idx),), np.int32)
    for b, w in enumerate(waves):
        audio[b, :len(w)] = w
        slens[b] = len(w)

    u = max_target_len or (max(len(t) for t in trans) + 1)  # +1 for eos
    tgt_in = np.full((len(idx), u), PAD, np.int32)
    tgt_out = np.full((len(idx), u), PAD, np.int32)
    tlens = np.zeros((len(idx),), np.int32)
    for b, t in enumerate(trans):
        tgt_in[b, 0] = SOS
        tgt_in[b, 1:1 + len(t)] = t
        tgt_out[b, :len(t)] = t
        tgt_out[b, len(t)] = EOS
        tlens[b] = len(t) + 1

    feats, flens = extract_features(
        jnp.asarray(audio), jnp.asarray(slens), feature_cfg)
    return Batch(feats=feats, frame_lens=flens,
                 targets_in=jnp.asarray(tgt_in),
                 targets_out=jnp.asarray(tgt_out),
                 target_lens=jnp.asarray(tlens))
