"""Fused Pallas STFT+mel kernel goldens vs the jnp frontend
(SURVEY.md §4: "Pallas STFT+mel vs scipy golden"). CPU interpreter mode."""

import jax.numpy as jnp
import numpy as np
import pytest

from speech_tranformer_pytorch_tpu.config import FeatureConfig
from speech_tranformer_pytorch_tpu.data.features import (
    log_mel_spectrogram, num_frames)
from speech_tranformer_pytorch_tpu.kernels.stft_mel import (
    _effective_matrices, log_mel_pallas)


@pytest.fixture(scope="module")
def cfg():
    return FeatureConfig(cmvn=False)


def test_matches_jnp_path(cfg, rng):
    wave = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32))
    want = np.asarray(log_mel_spectrogram(wave, cfg))
    got = np.asarray(log_mel_pallas(wave, cfg, want.shape[1]))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_single_utterance_and_odd_length(cfg, rng):
    wave = jnp.asarray(rng.standard_normal(7231).astype(np.float32))
    n = num_frames(7231, cfg.frame_length, cfg.frame_shift)
    want = np.asarray(log_mel_spectrogram(wave, cfg))
    got = np.asarray(log_mel_pallas(wave, cfg, n))
    assert got.shape == (n, cfg.num_mel_bins)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_via_config_flag(rng):
    cfg = FeatureConfig(cmvn=False, use_pallas=True)
    ref_cfg = FeatureConfig(cmvn=False, use_pallas=False)
    wave = jnp.asarray(rng.standard_normal((1, 8000)).astype(np.float32))
    got = np.asarray(log_mel_spectrogram(wave, cfg))
    want = np.asarray(log_mel_spectrogram(wave, ref_cfg))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_effective_matrices_shapes(cfg):
    c, s, m = _effective_matrices(cfg)
    nbins = cfg.fft_length // 2 + 1
    fb = -(-nbins // 128) * 128
    assert c.shape == (cfg.frame_length, fb)
    assert s.shape == (cfg.frame_length, fb)
    assert m.shape == (fb, cfg.num_mel_bins)
    # padded bin columns must be exactly zero so they add nothing
    assert np.abs(c[:, nbins:]).max() == 0
    assert np.abs(m[nbins:]).max() == 0


def test_no_preemph_no_log_variant(rng):
    cfg = FeatureConfig(cmvn=False, preemphasis=0.0, use_log=False,
                        window="hann")
    wave = jnp.asarray(rng.standard_normal((1, 8000)).astype(np.float32))
    want = np.asarray(log_mel_spectrogram(wave, cfg))
    got = np.asarray(log_mel_pallas(wave, cfg, want.shape[1]))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2)
