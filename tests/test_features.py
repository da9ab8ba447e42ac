"""Golden tests for the fbank frontend vs independent numpy/scipy
implementations (SURVEY.md §4 "Unit")."""

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.signal

from speech_tranformer_pytorch_tpu.config import FeatureConfig
from speech_tranformer_pytorch_tpu.data import features as F


def _numpy_fbank(wave: np.ndarray, cfg: FeatureConfig) -> np.ndarray:
    """Independent numpy re-implementation (the golden)."""
    fl, fs = cfg.frame_length, cfg.frame_shift
    n = F.num_frames(len(wave), fl, fs)
    frames = np.stack([wave[i * fs:i * fs + fl] for i in range(n)]).astype(np.float64)
    frames -= frames.mean(axis=1, keepdims=True)
    if cfg.preemphasis > 0:
        shifted = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - cfg.preemphasis * shifted
    frames *= F.make_window(cfg.window, fl)
    spec = np.fft.rfft(frames, n=cfg.fft_length, axis=1)
    power = np.abs(spec) ** 2
    mel = power @ F.make_mel_matrix(cfg.num_mel_bins, cfg.fft_length,
                                    cfg.sample_rate, cfg.low_freq, cfg.high_freq)
    return np.log(np.maximum(mel, F._LOG_EPS))


@pytest.fixture(scope="module")
def cfg():
    return FeatureConfig(cmvn=False)


def test_num_frames():
    assert F.num_frames(400, 400, 160) == 1
    assert F.num_frames(399, 400, 160) == 0
    assert F.num_frames(560, 400, 160) == 2
    assert F.num_frames(16000, 400, 160) == 98


def test_frame_lengths_vectorized(cfg):
    lens = jnp.array([400, 399, 560, 16000, 0])
    out = F.frame_lengths_from_sample_lengths(lens, 400, 160)
    assert out.tolist() == [1, 0, 2, 98, 0]


def test_mel_matrix_shape_and_partition(cfg):
    m = F.make_mel_matrix(80, 512, 16000)
    assert m.shape == (257, 80)
    assert (m >= 0).all()
    # Triangles overlap to near-unity response in the passband interior.
    rowsum = m.sum(axis=1)
    assert rowsum[30:200].min() > 0.5


def test_fbank_matches_numpy_golden(cfg, rng):
    wave = rng.standard_normal(16000).astype(np.float32) * 0.1
    got = np.asarray(F.log_mel_spectrogram(jnp.asarray(wave), cfg))
    want = _numpy_fbank(wave, cfg)
    assert got.shape == want.shape == (98, 80)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_fbank_sine_peak_bin(cfg):
    """A pure tone's energy must land in the mel bin containing its freq."""
    sr, f0 = 16000, 1000.0
    t = np.arange(sr) / sr
    wave = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    feats = np.asarray(F.log_mel_spectrogram(jnp.asarray(wave), cfg))
    mean_spec = feats.mean(axis=0)
    peak_bin = int(mean_spec.argmax())
    # mel bin centers
    centers = F.mel_to_hz(np.linspace(F.hz_to_mel(cfg.low_freq),
                                      F.hz_to_mel(8000.0), cfg.num_mel_bins + 2))[1:-1]
    assert abs(centers[peak_bin] - f0) < 150.0


def test_batched_equals_single(cfg, rng):
    waves = rng.standard_normal((3, 8000)).astype(np.float32)
    batched = np.asarray(F.log_mel_spectrogram(jnp.asarray(waves), cfg))
    for i in range(3):
        single = np.asarray(F.log_mel_spectrogram(jnp.asarray(waves[i]), cfg))
        np.testing.assert_allclose(batched[i], single, rtol=1e-5, atol=1e-5)


def test_cmvn_zero_mean_unit_var(rng):
    feats = jnp.asarray(rng.standard_normal((2, 50, 8)).astype(np.float32) * 3 + 5)
    lens = jnp.array([50, 30])
    out = np.asarray(F.apply_cmvn(feats, lens))
    # valid region of utt 1
    v = out[1, :30]
    np.testing.assert_allclose(v.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(v.var(axis=0), 1.0, atol=1e-3)
    # padded region zeroed
    assert np.abs(out[1, 30:]).max() == 0.0


def test_extract_features_end_to_end(rng):
    cfg = FeatureConfig()
    waves = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32))
    slens = jnp.array([16000, 8000])
    feats, flens = F.extract_features(waves, slens, cfg)
    assert feats.shape == (2, 98, 80)
    assert flens.tolist() == [98, 48]
    assert np.isfinite(np.asarray(feats)).all()


class TestBf16FeatureEmission:
    """features.output_dtype='bfloat16' (ROADMAP lever 2): the frontend
    emits bf16 with f32 internal math — values must match the f32 pipeline
    to bf16 rounding, and CMVN statistics must not degrade."""

    def test_bf16_close_to_f32(self, rng):
        import jax.numpy as jnp

        from speech_tranformer_pytorch_tpu.config import FeatureConfig
        from speech_tranformer_pytorch_tpu.data.features import \
            extract_features

        wav = jnp.asarray(
            rng.standard_normal((2, 16000)).astype(np.float32)) * 0.3
        lens = jnp.array([16000, 12000], jnp.int32)
        f32, fl = extract_features(wav, lens, FeatureConfig())
        bf16, fl2 = extract_features(
            wav, lens, FeatureConfig(output_dtype="bfloat16"))
        assert bf16.dtype == jnp.bfloat16
        np.testing.assert_array_equal(np.asarray(fl), np.asarray(fl2))
        # CMVN output is O(1)-scaled. The dominant error is the bf16
        # rounding of the raw log-mel BEFORE CMVN (values up to ~16 =>
        # resolution ~0.06), carried through the normalization — measured
        # max ~0.05, i.e. feature-level noise well under SpecAugment's.
        np.testing.assert_allclose(
            np.asarray(bf16, np.float32), np.asarray(f32), atol=0.08)

    def test_kernel_always_emits_f32(self, rng):
        """The fbank kernel stores f32 regardless of output_dtype (bf16
        emission measured 18% slower — BENCHMARKS.md); the bf16 cast
        happens at the end of extract_features only."""
        import jax.numpy as jnp

        from speech_tranformer_pytorch_tpu.config import FeatureConfig
        from speech_tranformer_pytorch_tpu.kernels.stft_mel import \
            log_mel_pallas

        cfg = FeatureConfig(output_dtype="bfloat16", cmvn=False)
        wav = jnp.asarray(
            rng.standard_normal((1, 8000)).astype(np.float32)) * 0.3
        got = log_mel_pallas(wav, cfg, 48)   # interpret=True on CPU
        assert got.dtype == jnp.float32


class TestPallasDispatchPredicate:
    """VERDICT r3 weak #3 / item #6: the fbank kernel and the attention/topk
    kernels must share ONE dispatch predicate, so the fbank kernel dispatches
    exactly when flash would — two predicates disagreeing (e.g. on a
    backend-name change) is an invisible ~18% step-time regression."""

    def test_fbank_follows_shared_predicate(self, monkeypatch):
        from speech_tranformer_pytorch_tpu.data import features
        from speech_tranformer_pytorch_tpu.kernels import interface

        for value in (True, False):
            monkeypatch.setattr(interface, "_pallas_ok", lambda v=value: v)
            assert features._pallas_fbank_ok() == value

    def test_kill_switch_disables_both(self, monkeypatch):
        from speech_tranformer_pytorch_tpu.data import features
        from speech_tranformer_pytorch_tpu.kernels import interface

        monkeypatch.setenv("ST_TPU_DISABLE_PALLAS", "1")
        assert interface._pallas_ok() is False
        assert features._pallas_fbank_ok() is False
