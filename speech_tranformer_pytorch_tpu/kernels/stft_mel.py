"""Fused Pallas STFT+mel kernel (reference: torchaudio/Kaldi C++ fbank —
SURVEY.md §2.1 native-checklist row 1: "fused Pallas STFT+mel kernel").

TPU-first formulation: everything before the |.|^2 nonlinearity —
per-frame DC-offset removal, pre-emphasis, windowing, and the real DFT —
is LINEAR in the frame samples, so it composes into two effective
matrices::

    C_eff = D_dc @ P_pre @ diag(window) @ C_dft    [frame_len, n_bins]
    S_eff = D_dc @ P_pre @ diag(window) @ S_dft

and the whole fbank becomes ``log(((F @ C)^2 + (F @ S)^2) @ M)`` — three
MXU matmuls per frame block instead of a scalar FFT (a radix-2 FFT is
VPU-hostile; at frame_len=400 the DFT-as-matmul costs ~0.2 MFLOP/frame,
noise for the MXU, and fuses framing+window+power+mel in one VMEM pass).

Overlapping framing (400-sample window / 160-sample hop) is done inside
the kernel with the reshape trick: audio chunk -> rows of 160 samples;
frame i = concat(row_i, row_{i+1}, row_{i+2}[:80]) — contiguous slices,
no gather.

The kernel is the drop-in behind ``FeatureConfig.use_pallas`` and is
golden-tested against the jnp path (data/features.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import FeatureConfig
from ..data.features import (_LOG_EPS, make_mel_matrix, make_window)


@functools.lru_cache(maxsize=8)
def _effective_matrices(cfg: FeatureConfig) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(C_eff [L, Fb], S_eff [L, Fb], mel [Fb, M]) in float32, Fb padded to
    a lane multiple."""
    L = cfg.frame_length
    nfft = cfg.fft_length
    n_bins = nfft // 2 + 1

    # D_dc: remove per-frame mean.
    d_dc = np.eye(L) - np.full((L, L), 1.0 / L)
    # P_pre: y_j = x_j - k*x_{j-1} (y_0 = (1-k)*x_0), as right-multiply.
    p = np.eye(L)
    if cfg.preemphasis > 0:
        k = cfg.preemphasis
        for j in range(1, L):
            p[j - 1, j] = -k
        p[0, 0] = 1.0 - k
    w = np.diag(make_window(cfg.window, L).astype(np.float64))
    # Real DFT bases over the first L points of the nfft-point transform.
    n = np.arange(L)[:, None]
    kk = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * n * kk / nfft
    c_dft = np.cos(ang)
    s_dft = -np.sin(ang)

    pre = d_dc @ p @ w
    c_eff = (pre @ c_dft).astype(np.float32)
    s_eff = (pre @ s_dft).astype(np.float32)
    mel = make_mel_matrix(cfg.num_mel_bins, nfft, cfg.sample_rate,
                          cfg.low_freq, cfg.high_freq)

    # Pad the bin dimension to a multiple of 128 lanes.
    fb = -(-n_bins // 128) * 128
    c_eff = np.pad(c_eff, ((0, 0), (0, fb - n_bins)))
    s_eff = np.pad(s_eff, ((0, 0), (0, fb - n_bins)))
    mel = np.pad(mel, ((0, fb - n_bins), (0, 0)))
    return c_eff, s_eff, mel


def _stft_mel_kernel(frames_ref,           # [1, block_frames, L] VMEM
                     c_ref, s_ref, m_ref,  # effective matrices, VMEM
                     out_ref,              # [1, block_frames, n_mels]
                     *, use_log: bool):
    frames = frames_ref[0].astype(jnp.float32)       # [block_frames, L]

    # HIGHEST precision: MXU's bf16 mantissa is not enough for the DFT —
    # low-energy bins would wash out after the log (measured 0.85 max log
    # error vs f32 rfft with default precision; <2e-3 with HIGHEST).
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, c_ref[...], preferred_element_type=jnp.float32,
                 precision=hi)
    im = jnp.dot(frames, s_ref[...], preferred_element_type=jnp.float32,
                 precision=hi)
    power = re * re + im * im                        # [block_frames, Fb]
    mel = jnp.dot(power, m_ref[...], preferred_element_type=jnp.float32,
                  precision=hi)
    if use_log:
        mel = jnp.log(jnp.maximum(mel, _LOG_EPS))
    # ALWAYS f32 out: emitting bf16 here was MEASURED 18% SLOWER on the
    # base train step (19.5 vs 16.5 ms — the narrow 80-lane bf16 store
    # tiles badly); cfg.output_dtype='bfloat16' instead casts at the END
    # of CMVN, where it fuses into the elementwise chain for free
    # (BENCHMARKS.md 2026-08-21).
    out_ref[0] = mel


def log_mel_pallas(waveform: jnp.ndarray, cfg: FeatureConfig,
                   n_frames: int, *, block_frames: int = 256) -> jnp.ndarray:
    """[..., S] audio -> [..., n_frames, num_mel_bins] log-mel, fused kernel."""
    squeeze = waveform.ndim == 1
    if squeeze:
        waveform = waveform[None]
    b, s = waveform.shape
    L, hop = cfg.frame_length, cfg.frame_shift

    t_pad = -(-n_frames // block_frames) * block_frames
    n_blocks = t_pad // block_frames
    n_rows = t_pad + -(-L // hop)                    # hop-rows needed
    needed = n_rows * hop
    if s < needed:
        waveform = jnp.pad(waveform, ((0, 0), (0, needed - s)))

    # XLA-side framing via the reshape trick (Mosaic cannot concat
    # sublane-misaligned slices in-kernel): rows of `hop` samples; frame i
    # = concat(row_i .. row_{i+n_full}, partial). ~2.5x audio bytes, noise
    # next to the feature tensor itself.
    rows = waveform[:, :needed].reshape(b, n_rows, hop)
    n_full = L // hop
    parts = [rows[:, r:r + t_pad, :] for r in range(n_full)]
    rem = L - n_full * hop
    if rem > 0:
        parts.append(rows[:, n_full:n_full + t_pad, :rem])
    frames = jnp.concatenate(parts, axis=2)          # [B, t_pad, L]

    c_eff, s_eff, mel = _effective_matrices(cfg)

    kernel = functools.partial(_stft_mel_kernel, use_log=cfg.use_log)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t_pad, cfg.num_mel_bins),
                                       jnp.float32),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec((1, block_frames, L),
                         lambda b_, t_: (b_, t_, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_frames, cfg.num_mel_bins),
                               lambda b_, t_: (b_, t_, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=(jax.default_backend() == "cpu"),
    )(frames, jnp.asarray(c_eff), jnp.asarray(s_eff), jnp.asarray(mel))
    out = out[:, :n_frames]
    return out[0] if squeeze else out
