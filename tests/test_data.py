"""Data layer tests: tokenizers, wav I/O, manifests, bucketed pipeline,
SpecAugment (SURVEY.md §4)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_tranformer_pytorch_tpu.config import (DataConfig, FeatureConfig,
                                                  SpecAugmentConfig)
from speech_tranformer_pytorch_tpu.data import (BpeTokenizer, BucketedBatcher,
                                                CharTokenizer,
                                                ManifestDataset,
                                                load_tokenizer,
                                                make_preprocess_fn,
                                                prepare_synthetic, read_audio,
                                                read_manifest, write_wav)
from speech_tranformer_pytorch_tpu.data.augment import spec_augment


class TestCharTokenizer:
    def test_roundtrip(self):
        tok = CharTokenizer.train(["你好 世界", "好 的"])
        ids = tok.encode("你好")
        assert len(ids) == 2
        assert tok.decode(ids) == "你好"

    def test_specials_reserved(self):
        tok = CharTokenizer.train(["AB"])
        assert tok.vocab["<pad>"] == 0
        assert tok.vocab["<sos>"] == 1
        assert tok.vocab["<eos>"] == 2
        assert tok.vocab["<unk>"] == 3

    def test_unk(self):
        tok = CharTokenizer.train(["AB"])
        assert tok.encode("Z") == [3]

    def test_space_removal_and_case(self):
        tok = CharTokenizer.train(["a b"])
        assert tok.decode(tok.encode("ab")) == "AB"

    def test_save_load(self, tmp_path):
        tok = CharTokenizer.train(["你好"])
        p = str(tmp_path / "vocab.json")
        tok.save(p)
        tok2 = load_tokenizer(p)
        assert tok2.vocab == tok.vocab


class TestBpeTokenizer:
    def test_train_and_roundtrip(self):
        corpus = ["the cat sat on the mat", "the cat ran"] * 20
        tok = BpeTokenizer.train(corpus, vocab_size=40)
        ids = tok.encode("the cat")
        assert tok.decode(ids) == "THE CAT"
        assert tok.vocab_size <= 40

    def test_merges_reduce_length(self):
        corpus = ["aaaa aaaa aaaa"] * 10
        small = BpeTokenizer.train(corpus, vocab_size=8)
        big = BpeTokenizer.train(corpus, vocab_size=20)
        assert len(big.encode("aaaa")) <= len(small.encode("aaaa"))

    def test_save_load(self, tmp_path):
        tok = BpeTokenizer.train(["hello world"] * 5, vocab_size=30)
        p = str(tmp_path / "bpe.json")
        tok.save(p)
        tok2 = load_tokenizer(p)
        assert tok2.encode("hello world") == tok.encode("hello world")
        assert tok2.decode(tok2.encode("hello")) == "HELLO"


class TestAudioIO:
    def test_wav_roundtrip(self, tmp_path, rng):
        samples = np.clip(rng.standard_normal(8000) * 0.3, -0.99, 0.99).astype(np.float32)
        p = str(tmp_path / "a.wav")
        write_wav(p, samples, 16000)
        got, rate = read_audio(p)
        assert rate == 16000
        np.testing.assert_allclose(got, samples, atol=1e-4)


class TestPrepareAndPipeline:
    @pytest.fixture(scope="class")
    def corpus(self, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("syncorpus"))
        paths = prepare_synthetic(out, num_train=12, num_dev=4, num_test=4,
                                  vocab_size=16, seed=0)
        return paths

    def test_manifests_written(self, corpus):
        for split in ("train", "dev", "test"):
            entries = read_manifest(corpus[split])
            assert entries, split
            e = entries[0]
            assert os.path.exists(e["audio"])
            assert e["num_samples"] > 0
            assert e["tokens"]
            # token ids decode back to the text
            tok = load_tokenizer(corpus["vocab"])
            assert tok.decode(e["tokens"]) == e["text"]

    def test_bucketed_batcher_shapes_and_coverage(self, corpus):
        fcfg = FeatureConfig()
        ds = ManifestDataset(corpus["train"], DataConfig(max_target_len=16),
                             fcfg)
        assert len(ds) == 12
        batcher = BucketedBatcher(
            ds, batch_size=4, bucket_boundaries=(50, 100, 200), target_len=8,
            seed=0, drop_remainder=False)
        seen = 0
        for batch in batcher.epoch(0):
            b = batch.audio.shape[0]
            assert batch.targets_in.shape == (b, 8)
            assert bool(batch.valid.any())
            seen += int(np.asarray(batch.valid).sum())
        assert seen == 12   # every utterance appears exactly once

    def test_host_sharding_partitions(self, corpus):
        fcfg = FeatureConfig()
        ds = ManifestDataset(corpus["train"], DataConfig(max_target_len=16), fcfg)
        all_ids = set()
        for shard in range(3):
            batcher = BucketedBatcher(
                ds, batch_size=2, bucket_boundaries=(200,), target_len=8,
                seed=5, shard_index=shard, num_shards=3,
                drop_remainder=False, shuffle=True)
            for batch in batcher.epoch(0):
                for row in range(batch.audio.shape[0]):
                    if bool(batch.valid[row]):
                        key = (float(np.asarray(batch.audio[row]).sum()),
                               int(batch.sample_lens[row]))
                        assert key not in all_ids, "duplicate across shards"
                        all_ids.add(key)
        assert len(all_ids) == 12

    def test_epoch_shuffling_changes_order(self, corpus):
        fcfg = FeatureConfig()
        ds = ManifestDataset(corpus["train"], DataConfig(max_target_len=16), fcfg)
        batcher = BucketedBatcher(ds, batch_size=4, bucket_boundaries=(200,),
                                  target_len=8, seed=1)
        e0 = [np.asarray(b.sample_lens).tolist() for b in batcher.epoch(0)]
        e1 = [np.asarray(b.sample_lens).tolist() for b in batcher.epoch(1)]
        e0b = [np.asarray(b.sample_lens).tolist() for b in batcher.epoch(0)]
        assert e0 == e0b          # deterministic given epoch
        assert e0 != e1 or len(e0) <= 1

    def test_preprocess_on_device(self, corpus):
        fcfg = FeatureConfig()
        ds = ManifestDataset(corpus["train"], DataConfig(max_target_len=16), fcfg)
        batcher = BucketedBatcher(ds, batch_size=4, bucket_boundaries=(200,),
                                  target_len=8, seed=0)
        batch = next(iter(batcher.epoch(0)))
        pre = make_preprocess_fn(fcfg)
        out = jax.jit(pre)(batch)
        assert out.feats.ndim == 3 and out.feats.shape[-1] == 80
        assert np.isfinite(np.asarray(out.feats)).all()
        assert (np.asarray(out.frame_lens) > 0).all()


class TestSpecAugment:
    def test_masks_applied(self):
        cfg = SpecAugmentConfig(enabled=True, num_freq_masks=1,
                                freq_mask_width=10, num_time_masks=1,
                                time_mask_width=20)
        feats = jnp.ones((2, 100, 80))
        lens = jnp.array([100, 80])
        out = spec_augment(jax.random.PRNGKey(0), feats, lens, cfg)
        assert out.shape == feats.shape
        zeros = float((np.asarray(out) == 0).mean())
        assert 0.0 < zeros < 0.9

    def test_disabled_identity(self):
        cfg = SpecAugmentConfig(enabled=False)
        feats = jnp.ones((1, 10, 8))
        out = spec_augment(jax.random.PRNGKey(0), feats, jnp.array([10]), cfg)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(feats))

    def test_different_keys_different_masks(self):
        cfg = SpecAugmentConfig(enabled=True)
        feats = jnp.ones((1, 200, 80))
        lens = jnp.array([200])
        a = spec_augment(jax.random.PRNGKey(1), feats, lens, cfg)
        b = spec_augment(jax.random.PRNGKey(2), feats, lens, cfg)
        assert not np.array_equal(np.asarray(a), np.asarray(b))

    def test_budget_short_utterance_never_fully_masked(self):
        """max_total_frac property: even when num_time_masks x
        time_mask_width >> frames, at least (1 - frac) of the valid
        frames survive on every draw (VERDICT r4 weak #5 — the old
        budget parameter was dead and time masks had none at all)."""
        frac = 0.5
        cfg = SpecAugmentConfig(enabled=True, num_time_masks=8,
                                time_mask_width=100,
                                time_mask_max_frac=1.0,
                                max_total_frac=frac,
                                num_freq_masks=4, freq_mask_width=40)
        t, f, n_valid = 40, 80, 30   # 8 masks x up to 30 wide vs 30 frames
        feats = jnp.ones((1, t, f))
        lens = jnp.array([n_valid])
        for seed in range(50):
            out = np.asarray(spec_augment(jax.random.PRNGKey(seed),
                                          feats, lens, cfg))[0]
            # a time step is masked iff its whole feature row is zero
            alive_rows = (out[:n_valid] != 0).any(axis=1).sum()
            assert alive_rows >= int(n_valid * (1 - frac)), (seed, alive_rows)
            # freq axis budget: some mel bins survive in full
            alive_cols = (out[:n_valid] != 0).any(axis=0).sum()
            assert alive_cols >= int(f * (1 - frac)), (seed, alive_cols)

    def test_adaptive_time_mask_count(self):
        """time_masks_per_frame scales the applied mask count with the
        utterance's valid length: a short utterance sees at most its
        adaptive count of distinct zero spans, a long one up to the cap."""
        cfg = SpecAugmentConfig(enabled=True, num_freq_masks=0,
                                num_time_masks=10, time_mask_width=3,
                                time_mask_max_frac=1.0,
                                time_masks_per_frame=0.01,
                                max_total_frac=0.0)
        t, f = 600, 8
        feats = jnp.ones((2, t, f))
        lens = jnp.array([100, 600])   # -> 1 mask vs 6 masks
        def count_spans(row_alive):
            # number of 0-runs in the alive vector
            a = np.concatenate([[True], row_alive, [True]])
            return int(((~a[1:]) & a[:-1]).sum())
        short_spans, long_spans = [], []
        for seed in range(30):
            out = np.asarray(spec_augment(jax.random.PRNGKey(seed),
                                          feats, lens, cfg))
            short_spans.append(count_spans((out[0] != 0).any(axis=1)))
            long_spans.append(count_spans((out[1] != 0).any(axis=1)))
        # short utterance: at most 1 span per draw; long: sometimes >1
        assert max(short_spans) <= 1, short_spans
        assert max(long_spans) > 1, long_spans


class TestGrainPipeline:
    @pytest.fixture(scope="class")
    def corpus(self, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("graincorpus"))
        return prepare_synthetic(out, num_train=12, num_dev=4, num_test=4,
                                 vocab_size=16, seed=1)

    def test_grain_covers_all_utterances(self, corpus):
        from speech_tranformer_pytorch_tpu.data.grain_pipeline import \
            GrainBucketedPipeline
        fcfg = FeatureConfig()
        ds = ManifestDataset(corpus["train"], DataConfig(max_target_len=16), fcfg)
        pipe = GrainBucketedPipeline(
            ds, batch_size=4, bucket_boundaries=(200,), target_len=8,
            seed=0, drop_remainder=False)
        seen = 0
        for batch in pipe.epoch(0):
            seen += int(np.asarray(batch.valid).sum())
            assert batch.targets_in.shape[1] == 8
        assert seen == 12

    def test_grain_deterministic_and_epoch_varies(self, corpus):
        from speech_tranformer_pytorch_tpu.data.grain_pipeline import \
            GrainBucketedPipeline
        fcfg = FeatureConfig()
        ds = ManifestDataset(corpus["train"], DataConfig(max_target_len=16), fcfg)
        pipe = GrainBucketedPipeline(
            ds, batch_size=4, bucket_boundaries=(200,), target_len=8, seed=3,
            drop_remainder=False)
        sig = lambda ep: [np.asarray(b.sample_lens).tolist()
                          for b in pipe.epoch(ep)]
        assert sig(0) == sig(0)
        assert sig(0) != sig(1) or len(sig(0)) <= 1

    def test_grain_matches_python_pipeline_exactly(self, corpus):
        """Both pipelines share plan_epoch => identical batches."""
        from speech_tranformer_pytorch_tpu.data.grain_pipeline import \
            GrainBucketedPipeline
        from speech_tranformer_pytorch_tpu.data.pipeline import \
            BucketedBatcher
        fcfg = FeatureConfig()
        ds = ManifestDataset(corpus["train"], DataConfig(max_target_len=16), fcfg)
        kw = dict(batch_size=4, bucket_boundaries=(100, 200), target_len=8,
                  seed=7, drop_remainder=False)
        ga = list(GrainBucketedPipeline(ds, **kw).epoch(1))
        py = list(BucketedBatcher(ds, **kw).epoch(1))
        assert len(ga) == len(py) > 0
        for a, b in zip(ga, py):
            for fa, fb in zip(jax.tree_util.tree_leaves(a),
                              jax.tree_util.tree_leaves(b)):
                np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))

    def test_skip_batches_no_io_resume(self, corpus):
        """epoch(e, skip_batches=n) == epoch(e)[n:] for both pipelines."""
        from speech_tranformer_pytorch_tpu.data.grain_pipeline import \
            GrainBucketedPipeline
        from speech_tranformer_pytorch_tpu.data.pipeline import \
            BucketedBatcher
        fcfg = FeatureConfig()
        ds = ManifestDataset(corpus["train"], DataConfig(max_target_len=16), fcfg)
        kw = dict(batch_size=4, bucket_boundaries=(200,), target_len=8,
                  seed=0, drop_remainder=False)
        for cls in (BucketedBatcher, GrainBucketedPipeline):
            pipe = cls(ds, **kw)
            full = list(pipe.epoch(0))
            assert len(full) >= 2
            skipped = list(pipe.epoch(0, skip_batches=1))
            assert len(skipped) == len(full) - 1
            for a, b in zip(full[1:], skipped):
                for fa, fb in zip(jax.tree_util.tree_leaves(a),
                                  jax.tree_util.tree_leaves(b)):
                    np.testing.assert_array_equal(np.asarray(fa),
                                                  np.asarray(fb))

    def test_grain_multihost_batch_count_parity(self, corpus):
        """All shards yield the same number of batches (no deadlock)."""
        from speech_tranformer_pytorch_tpu.data.grain_pipeline import \
            GrainBucketedPipeline
        fcfg = FeatureConfig()
        ds = ManifestDataset(corpus["train"], DataConfig(max_target_len=16), fcfg)
        counts = []
        for shard in range(3):
            pipe = GrainBucketedPipeline(
                ds, batch_size=2, bucket_boundaries=(100, 200), target_len=8,
                seed=5, shard_index=shard, num_shards=3,
                drop_remainder=False)
            counts.append(len(list(pipe.epoch(0))))
        assert len(set(counts)) == 1, counts

    def test_grain_sharding_partitions(self, corpus):
        from speech_tranformer_pytorch_tpu.data.grain_pipeline import \
            GrainBucketedPipeline
        fcfg = FeatureConfig()
        ds = ManifestDataset(corpus["train"], DataConfig(max_target_len=16), fcfg)
        seen = []
        for shard in range(2):
            pipe = GrainBucketedPipeline(
                ds, batch_size=2, bucket_boundaries=(200,), target_len=8,
                seed=5, shard_index=shard, num_shards=2, drop_remainder=False)
            for b in pipe.epoch(0):
                for row in range(b.audio.shape[0]):
                    if bool(b.valid[row]):
                        seen.append(float(np.asarray(b.audio[row]).sum()))
        assert len(seen) == 12
        assert len(set(seen)) == 12, "duplicate utterance across shards"


class TestAishellPrepare:
    @pytest.fixture(scope="class")
    def aishell_corpus(self, tmp_path_factory):
        """Fabricate the AISHELL-1 on-disk layout with tiny wavs."""
        import numpy as np_
        from speech_tranformer_pytorch_tpu.data.prepare import write_wav
        root = tmp_path_factory.mktemp("aishell")
        rng = np_.random.default_rng(0)
        trans_lines = []
        utts = {"train": ["BAC009S0002W0122", "BAC009S0002W0123"],
                "dev": ["BAC009S0724W0121"],
                "test": ["BAC009S0764W0121"]}
        texts = {"BAC009S0002W0122": "绿 是 阳春",
                 "BAC009S0002W0123": "烟 景 大",
                 "BAC009S0724W0121": "块 文章",
                 "BAC009S0764W0121": "的 底色"}
        for split, ids in utts.items():
            for uid in ids:
                spk = uid[6:11]
                d = root / "wav" / split / spk
                d.mkdir(parents=True, exist_ok=True)
                wave = (rng.standard_normal(8000) * 0.1).astype(np_.float32)
                write_wav(str(d / f"{uid}.wav"), wave)
                trans_lines.append(f"{uid} {texts[uid]}")
        td = root / "transcript"
        td.mkdir()
        (td / "aishell_transcript_v0.8.txt").write_text(
            "\n".join(trans_lines), encoding="utf-8")
        return str(root)

    def test_prepare_aishell(self, aishell_corpus, tmp_path):
        from speech_tranformer_pytorch_tpu.data.prepare import prepare_aishell
        out = prepare_aishell(aishell_corpus, str(tmp_path / "out"))
        assert set(out) == {"vocab", "train", "dev", "test"}
        train = read_manifest(out["train"])
        assert len(train) == 2
        tok = load_tokenizer(out["vocab"])
        e = train[0]
        # normalization removed spaces; tokens decode to normalized text
        assert " " not in e["text"]
        assert tok.decode(e["tokens"]) == e["text"]
        # dev/test tokens may contain <unk> for chars unseen in train
        test = read_manifest(out["test"])
        assert len(test) == 1


class TestPrefetch:
    def test_order_preserved(self):
        from speech_tranformer_pytorch_tpu.data.prefetch import prefetch
        assert list(prefetch(range(100))) == list(range(100))

    def test_exception_propagates(self):
        from speech_tranformer_pytorch_tpu.data.prefetch import prefetch

        def gen():
            yield 1
            raise RuntimeError("boom")
        it = prefetch(gen())
        assert next(it) == 1
        with pytest.raises(RuntimeError):
            list(it)

    def test_empty(self):
        from speech_tranformer_pytorch_tpu.data.prefetch import prefetch
        assert list(prefetch([])) == []


class TestFrameBudgetBatching:
    def test_bucket_batch_sizes(self, tmp_path):
        corpus = prepare_synthetic(str(tmp_path / "c"), num_train=20,
                                   num_dev=0, num_test=0, vocab_size=16,
                                   seed=4)
        fcfg = FeatureConfig()
        ds = ManifestDataset(corpus["train"], DataConfig(max_target_len=16), fcfg)
        batcher = BucketedBatcher(
            ds, batch_size=4, bucket_boundaries=(40, 80, 200), target_len=8,
            max_frames_per_batch=400, drop_remainder=False)
        assert batcher.bucket_batch_sizes == [10, 5, 2]
        seen = 0
        for b in batcher.epoch(0):
            bucket_frames = b.audio.shape[1]
            seen += int(np.asarray(b.valid).sum())
            # batch size respects the per-bucket cap
            assert b.audio.shape[0] <= 10
        assert seen == 20


class TestMultiHostBatchParity:
    """Multi-host safety: all shards must yield the SAME number of batches
    per epoch (sync-collective deadlock otherwise)."""

    def test_equal_batch_counts_across_shards(self, tmp_path):
        corpus = prepare_synthetic(str(tmp_path / "c"), num_train=23,
                                   num_dev=0, num_test=0, vocab_size=16,
                                   seed=9)
        fcfg = FeatureConfig()
        ds = ManifestDataset(corpus["train"], DataConfig(max_target_len=16), fcfg)
        counts, seen = [], set()
        for shard in range(4):
            batcher = BucketedBatcher(
                ds, batch_size=2, bucket_boundaries=(40, 80, 200),
                target_len=8, seed=3, shard_index=shard, num_shards=4,
                drop_remainder=False)
            n = 0
            for b in batcher.epoch(0):
                n += 1
                for row in range(b.audio.shape[0]):
                    if bool(b.valid[row]):
                        key = (float(np.asarray(b.audio[row]).sum()),
                               int(b.sample_lens[row]))
                        assert key not in seen, "duplicate across shards"
                        seen.add(key)
            counts.append(n)
        assert len(set(counts)) == 1, f"shards disagree on batch count: {counts}"
        assert len(seen) == 23

    def test_equal_counts_with_drop_remainder(self, tmp_path):
        corpus = prepare_synthetic(str(tmp_path / "c2"), num_train=17,
                                   num_dev=0, num_test=0, vocab_size=16,
                                   seed=10)
        fcfg = FeatureConfig()
        ds = ManifestDataset(corpus["train"], DataConfig(max_target_len=16), fcfg)
        counts = []
        for shard in range(2):
            batcher = BucketedBatcher(
                ds, batch_size=3, bucket_boundaries=(40, 80, 200),
                target_len=8, seed=3, shard_index=shard, num_shards=2,
                drop_remainder=True)
            counts.append(sum(1 for _ in batcher.epoch(0)))
        assert counts[0] == counts[1]


class TestInt16AudioTransport:
    """data.audio_dtype='int16' (default): batches carry the WAV's native
    PCM; the on-device fbank dequantizes by 1/32768 — an exact power of
    two, so features from WAV sources are BIT-identical to the float32
    host-conversion path while halving host-memory and H2D bytes."""

    def test_features_bit_identical_to_float32_path(self, tmp_path):
        import jax
        from speech_tranformer_pytorch_tpu.config import get_config
        from speech_tranformer_pytorch_tpu.data.pipeline import (
            BucketedBatcher, ManifestDataset, make_preprocess_fn)
        from speech_tranformer_pytorch_tpu.data.prepare import prepare_synthetic

        paths = prepare_synthetic(str(tmp_path), num_train=4, num_dev=0,
                                  num_test=0, vocab_size=16, seed=3)
        cfg = get_config("tiny")
        pre = jax.jit(make_preprocess_fn(cfg.features, None))

        def batch_for(audio_dtype):
            ds = ManifestDataset(
                paths["train"],
                cfg.data.replace(audio_dtype=audio_dtype), cfg.features)
            b = BucketedBatcher(ds, batch_size=4,
                                bucket_boundaries=cfg.data.bucket_boundaries,
                                target_len=16, shuffle=False,
                                drop_remainder=False)
            return next(iter(b.epoch(0)))

        b16 = batch_for("int16")
        b32 = batch_for("float32")
        assert b16.audio.dtype == jnp.int16
        assert b16.audio.nbytes * 2 == b32.audio.nbytes
        f16 = pre(b16)
        f32 = pre(b32)
        np.testing.assert_array_equal(np.asarray(f16.feats),
                                      np.asarray(f32.feats))
        np.testing.assert_array_equal(np.asarray(f16.frame_lens),
                                      np.asarray(f32.frame_lens))

    def test_read_audio_int16_roundtrip(self, tmp_path):
        from speech_tranformer_pytorch_tpu.data.prepare import (read_audio,
                                                                write_wav)
        rng = np.random.default_rng(0)
        wav = str(tmp_path / "x.wav")
        write_wav(wav, rng.standard_normal(1600).astype(np.float32) * 0.3)
        raw, rate = read_audio(wav, dtype="int16")
        flt, _ = read_audio(wav)
        assert raw.dtype == np.int16 and rate == 16000
        np.testing.assert_array_equal(raw.astype(np.float32) / 32768.0, flt)


class TestAishellDownload:
    """run.sh stage 0 parity (SURVEY.md §3.4 "download_and_untar"): the
    downloader fetches a tarball (file:// URL here — no egress), extracts
    it, then extracts the OpenSLR release's NESTED per-speaker wav
    tarballs, and the result feeds prepare_aishell end-to-end."""

    @pytest.fixture(scope="class")
    def release_tarball(self, tmp_path_factory):
        """Miniature data_aishell.tgz with the real release's nesting:
        outer tgz -> data_aishell/{transcript/..., wav/S*.tar.gz} where
        each inner tarball holds wav/<split>/<spk>/*.wav trees."""
        import tarfile

        import numpy as np_
        from speech_tranformer_pytorch_tpu.data.prepare import write_wav

        root = tmp_path_factory.mktemp("slr33")
        stage = root / "stage" / "data_aishell"
        rng = np_.random.default_rng(1)
        utts = {"train": ["BAC009S0002W0122", "BAC009S0002W0123"],
                "dev": ["BAC009S0724W0121"], "test": ["BAC009S0764W0121"]}
        texts = {"BAC009S0002W0122": "绿 是 阳春",
                 "BAC009S0002W0123": "烟 景 大",
                 "BAC009S0724W0121": "块 文章",
                 "BAC009S0764W0121": "的 底色"}
        # Build per-speaker trees, then pack each speaker into an inner
        # tar.gz under wav/ (members rooted at <split>/<spk>/...).
        trans = []
        by_spk = {}
        for split, ids in utts.items():
            for uid in ids:
                spk = uid[6:11]
                d = root / "spks" / spk / split / spk
                d.mkdir(parents=True, exist_ok=True)
                write_wav(str(d / f"{uid}.wav"),
                          (rng.standard_normal(4000) * 0.1).astype(
                              np_.float32))
                trans.append(f"{uid} {texts[uid]}")
                by_spk.setdefault(spk, root / "spks" / spk)
        (stage / "wav").mkdir(parents=True)
        for spk, spkroot in by_spk.items():
            with tarfile.open(stage / "wav" / f"{spk}.tar.gz", "w:gz") as tf:
                for split_dir in sorted(spkroot.iterdir()):
                    tf.add(split_dir, arcname=split_dir.name)
        td = stage / "transcript"
        td.mkdir()
        (td / "aishell_transcript_v0.8.txt").write_text(
            "\n".join(trans), encoding="utf-8")
        out = root / "data_aishell.tgz"
        with tarfile.open(out, "w:gz") as tf:
            tf.add(stage, arcname="data_aishell")
        return str(out)

    def test_download_extract_prepare_end_to_end(self, release_tarball,
                                                 tmp_path):
        from speech_tranformer_pytorch_tpu import prepare_cli
        from speech_tranformer_pytorch_tpu.data.prepare import read_manifest

        dest = tmp_path / "corpus"
        out = tmp_path / "data"
        prepare_cli.main(["aishell", "--download",
                          "--url", f"file://{release_tarball}",
                          "--corpus", str(dest), "--out", str(out)])
        train = read_manifest(str(out / "train.jsonl"))
        assert len(train) == 2
        assert all((dest / "data_aishell").exists()
                   for _ in [0])
        # inner archives consumed and removed
        import glob
        assert not glob.glob(str(dest / "data_aishell" / "wav" / "*.tar.gz"))

    def test_reentrant_skips_download(self, release_tarball, tmp_path):
        """Interrupted-run contract: with the extracted tree present the
        downloader touches nothing (no re-fetch, idempotent)."""
        from speech_tranformer_pytorch_tpu.data.prepare import download_aishell
        dest = tmp_path / "c2"
        root = download_aishell(str(dest), url=f"file://{release_tarball}")
        again = download_aishell(str(dest), url="file:///nonexistent.tgz")
        assert again == root

    def test_rejects_traversal_member(self, tmp_path):
        import tarfile

        from speech_tranformer_pytorch_tpu.data.prepare import \
            _safe_extract_tar
        evil = tmp_path / "evil.tgz"
        payload = tmp_path / "p.txt"
        payload.write_text("x")
        with tarfile.open(evil, "w:gz") as tf:
            tf.add(payload, arcname="../../escape.txt")
        with pytest.raises(Exception):
            _safe_extract_tar(str(evil), str(tmp_path / "out"))
        assert not (tmp_path.parent / "escape.txt").exists()


class TestFlacCodec:
    """First-party FLAC codec (data/flac.py + native/flacdec.cc): the
    Python decoder is the behavioral reference; the native decoder must
    match it bit-for-bit over every encoder mode the fixture writer can
    produce (LibriSpeech recipe — VERDICT r4 missing #4)."""

    @staticmethod
    def _tone(n, seed=0):
        rng = np.random.default_rng(seed)
        t = np.arange(n)
        return (3000 * np.sin(0.03 * t) + 500 * np.sin(0.31 * t)
                + rng.normal(0, 50, n)).astype(np.int16).astype(np.int32)

    def test_roundtrip_all_modes(self, tmp_path):
        from speech_tranformer_pytorch_tpu.data import flac
        tone = self._tone(30000)
        rng = np.random.default_rng(1)
        cases = [(f"m_{m}", tone, dict(subframe_mode=m))
                 for m in ("auto", "lpc", "fixed0", "fixed2", "fixed4",
                           "verbatim")]
        cases += [
            ("constant", np.full(9000, -123, np.int32),
             dict(subframe_mode="constant")),
            ("noise_escape", rng.integers(-32768, 32767, 15000
                                          ).astype(np.int32), {}),
            ("odd_tail", tone[:4097], {}),
            ("short", tone[:100], {}),
            ("stereo", np.stack([tone[:8000], tone[:8000] // 2], 1), {}),
            ("bps8", (tone[:6000] // 256).astype(np.int32), dict(bps=8)),
            ("bps24", (tone[:6000] * 200).astype(np.int32), dict(bps=24)),
            ("rate_code", tone[:4000], dict()),
        ]
        native = flac._load_native() is not None
        for name, x, kw in cases:
            f = str(tmp_path / f"{name}.flac")
            flac.write_flac(f, x, 16000, **kw)
            py, r, b = flac.decode_flac(f, force_python=True)
            want = x if x.ndim == 2 else x[:, None]
            np.testing.assert_array_equal(py, want, err_msg=name)
            if native:
                nat, r2, b2 = flac.decode_flac(f)
                np.testing.assert_array_equal(nat, py, err_msg=name)
                assert (r, b) == (r2, b2), name

    def test_flac_info_no_decode(self, tmp_path):
        from speech_tranformer_pytorch_tpu.data.flac import (flac_info,
                                                             write_flac)
        x = self._tone(12345)
        f = str(tmp_path / "a.flac")
        write_flac(f, x, 8000)
        total, rate, channels, bps = flac_info(f)
        assert (total, rate, channels, bps) == (12345, 8000, 1, 16)

    def test_read_audio_flac_matches_wav(self, tmp_path):
        """read_audio on .flac == read_audio on the same PCM as .wav, in
        both float32 and int16 transport modes."""
        from speech_tranformer_pytorch_tpu.data.prepare import (read_audio,
                                                                write_wav)
        from speech_tranformer_pytorch_tpu.data.flac import write_flac
        import wave
        x = self._tone(20000)
        fw = str(tmp_path / "a.wav")
        ff = str(tmp_path / "a.flac")
        with wave.open(fw, "wb") as w:   # exact PCM (write_wav re-quantizes)
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(x.astype(np.int16).tobytes())
        write_flac(ff, x, 16000)
        for dt in ("float32", "int16"):
            aw, rw = read_audio(fw, dtype=dt)
            af, rf = read_audio(ff, dtype=dt)
            assert rw == rf == 16000
            np.testing.assert_array_equal(aw, af)

    def test_corrupt_stream_rejected(self, tmp_path):
        from speech_tranformer_pytorch_tpu.data import flac
        f = str(tmp_path / "a.flac")
        flac.write_flac(f, self._tone(5000), 16000)
        data = bytearray(open(f, "rb").read())
        data[len(data) // 2] ^= 0xFF       # flip a bit mid-frame
        with pytest.raises(flac.FlacError):
            flac.decode_flac_py(bytes(data))
        if flac._load_native() is not None:
            with pytest.raises(flac.FlacError):
                flac.decode_flac(bytes(data))
        with pytest.raises(flac.FlacError):
            flac.decode_flac_py(b"RIFF" + bytes(data[4:]))


def _make_librispeech_fixture(root, *, seed=0, n_train=8, n_dev=3,
                              n_test=3):
    """Miniature LibriSpeech tree: LibriSpeech/<split>/<spk>/<chap>/ with
    .flac audio (first-party encoder, mixed fixed/LPC subframes) and
    per-chapter *.trans.txt in the real release format. Transcripts are
    fake English words so the BPE path is exercised end-to-end.
    Returns (corpus_root, {split: [(utt_id, text)]})."""
    import os

    from speech_tranformer_pytorch_tpu.data.flac import write_flac
    from speech_tranformer_pytorch_tpu.data.synthetic import \
        make_synthetic_dataset

    words = ["ALPHA", "BRAVO", "CHARLIE", "DELTA", "ECHO", "FOXTROT",
             "GOLF", "HOTEL", "INDIA", "JULIET", "KILO", "LIMA", "MIKE",
             "NOVEMBER", "OSCAR", "PAPA", "QUEBEC", "ROMEO", "SIERRA",
             "TANGO", "UNIFORM", "VICTOR", "WHISKEY", "XRAY", "YANKEE",
             "ZULU", "ONE", "TWO"]
    counts = {"train-clean-100": n_train, "dev-clean": n_dev,
              "test-clean": n_test}
    total = sum(counts.values())
    ds = make_synthetic_dataset(total, vocab_size=32, seed=seed)
    corpus = os.path.join(str(root), "LibriSpeech")
    out = {}
    idx = 0
    for split, n in counts.items():
        utts = []
        for j in range(n):
            spk = str(100 + j % 2)
            chap = str(200 + j % 2)
            d = os.path.join(corpus, split, spk, chap)
            os.makedirs(d, exist_ok=True)
            utt_id = f"{spk}-{chap}-{idx:04d}"
            pcm = (np.clip(ds.waves[idx], -1, 1) * 32767).astype(np.int32)
            write_flac(os.path.join(d, f"{utt_id}.flac"), pcm, 16000)
            text = " ".join(words[t % len(words)]
                            for t in ds.transcripts[idx])
            with open(os.path.join(d, f"{spk}-{chap}.trans.txt"), "a",
                      encoding="utf-8") as f:
                f.write(f"{utt_id} {text}\n")
            utts.append((utt_id, text))
            idx += 1
        out[split] = utts
    return corpus, out


class TestLibrispeechPrepare:
    """LibriSpeech recipe (BASELINE.json configs[3] / SURVEY.md §7 step 8):
    layout walker + trans.txt join + BPE vocab + .flac manifests."""

    @pytest.fixture(scope="class")
    def corpus(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("ls")
        return _make_librispeech_fixture(root)

    def test_prepare_manifests(self, corpus, tmp_path):
        from speech_tranformer_pytorch_tpu.data.prepare import (
            prepare_librispeech, read_manifest)
        from speech_tranformer_pytorch_tpu.data.tokenizer import \
            load_tokenizer
        corpus_root, utts = corpus
        out = str(tmp_path / "data")
        paths = prepare_librispeech(
            corpus_root, out, train_splits=("train-clean-100",),
            bpe_vocab_size=64)
        tok = load_tokenizer(paths["vocab"])
        assert hasattr(tok, "merges")     # BPE, not char
        for split, want in (("train", "train-clean-100"),
                            ("dev", "dev-clean"), ("test", "test-clean")):
            m = read_manifest(paths[split])
            assert len(m) == len(utts[want])
            ids = {e["utt_id"] for e in m}
            assert ids == {u for u, _ in utts[want]}
            for e in m:
                assert e["audio"].endswith(".flac")
                assert e["num_samples"] > 0
                assert e["sample_rate"] == 16000
                # tokens decode back to the normalized text (train split:
                # exact; dev/test may contain train-OOV chars -> <unk>)
                if split == "train":
                    assert tok.decode(e["tokens"]) == e["text"]
                else:
                    assert (len(tok.decode(e["tokens"]).split())
                            == len(e["text"].split()))

    def test_prepare_reads_audio(self, corpus, tmp_path):
        """The manifest's .flac entries load through read_audio with the
        length STREAMINFO promised (the pipeline buckets by it)."""
        from speech_tranformer_pytorch_tpu.data.prepare import (
            prepare_librispeech, read_audio, read_manifest)
        corpus_root, _ = corpus
        out = str(tmp_path / "d2")
        paths = prepare_librispeech(
            corpus_root, out, train_splits=("train-clean-100",),
            bpe_vocab_size=48)
        for e in read_manifest(paths["train"])[:3]:
            samples, rate = read_audio(e["audio"], dtype="int16")
            assert len(samples) == e["num_samples"]
            assert rate == e["sample_rate"]


class TestLibrispeechDownload:
    def test_download_extract_prepare(self, tmp_path):
        """OpenSLR-12 layout parity via file:// split tarballs (each
        expands to LibriSpeech/<split>/...), then the full prepare."""
        import tarfile

        from speech_tranformer_pytorch_tpu import prepare_cli
        from speech_tranformer_pytorch_tpu.data.prepare import read_manifest

        src = tmp_path / "src"
        corpus_root, utts = _make_librispeech_fixture(src, n_train=4,
                                                      n_dev=2, n_test=2)
        mirror = tmp_path / "mirror"
        mirror.mkdir()
        for split in ("train-clean-100", "dev-clean", "test-clean"):
            with tarfile.open(mirror / f"{split}.tar.gz", "w:gz") as tf:
                tf.add(os.path.join(corpus_root, split),
                       arcname=f"LibriSpeech/{split}")
        dest = tmp_path / "corpus"
        out = tmp_path / "data"
        prepare_cli.main([
            "librispeech", "--download",
            "--url-base", f"file://{mirror}",
            "--corpus", str(dest), "--out", str(out),
            "--train-splits", "train-clean-100",
            "--bpe-vocab-size", "48"])
        train = read_manifest(str(out / "train.jsonl"))
        assert len(train) == 4
        # tarballs consumed; extracted splits in place
        assert (dest / "LibriSpeech" / "dev-clean").is_dir()
        assert not list(dest.glob("*.tar.gz"))

    def test_reentry_skips_completed_splits(self, tmp_path):
        import tarfile

        from speech_tranformer_pytorch_tpu.data.prepare import \
            download_librispeech

        src = tmp_path / "src"
        corpus_root, _ = _make_librispeech_fixture(src, n_train=2, n_dev=1,
                                                   n_test=1)
        mirror = tmp_path / "mirror"
        mirror.mkdir()
        with tarfile.open(mirror / "dev-clean.tar.gz", "w:gz") as tf:
            tf.add(os.path.join(corpus_root, "dev-clean"),
                   arcname="LibriSpeech/dev-clean")
        dest = tmp_path / "c"
        root = download_librispeech(str(dest), ["dev-clean"],
                                    url_base=f"file://{mirror}")
        # second call must not touch the (now missing) mirror
        again = download_librispeech(str(dest), ["dev-clean"],
                                     url_base="file:///nonexistent")
        assert again == root


class TestAdaptiveTargetLen:
    """Per-batch adaptive target padding (pipeline.target_width_for_rows):
    fixed max_target_len padding ran a 128-position decoder against
    ~15-30-token targets — 20% of the base train step (BENCHMARKS.md r5)."""

    @pytest.fixture(scope="class")
    def corpus(self, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("adaptcorpus"))
        return prepare_synthetic(out, num_train=12, num_dev=0, num_test=0,
                                 vocab_size=16, seed=1)

    def test_width_rounding_and_cap(self, corpus):
        from speech_tranformer_pytorch_tpu.data.pipeline import (
            target_width_for_rows)
        ds = ManifestDataset(corpus["train"], DataConfig(max_target_len=128),
                             FeatureConfig())
        idxs = list(range(len(ds)))
        w = target_width_for_rows(ds, idxs, 128)
        need = max(len(ds.entries[i]["tokens"]) for i in idxs) + 1
        assert w == -(-need // 16) * 16
        assert w % 16 == 0 and w <= 128
        # cap: small target_len keeps legacy fixed padding (test shapes)
        assert target_width_for_rows(ds, idxs, 8) == 8
        assert target_width_for_rows(ds, idxs, 16) == 16
        # opt-out
        assert target_width_for_rows(ds, idxs, 128, adaptive=False) == 128

    def test_batches_use_adaptive_width_and_content_matches(self, corpus):
        fcfg = FeatureConfig()
        ds = ManifestDataset(corpus["train"], DataConfig(), fcfg)
        kw = dict(batch_size=4, bucket_boundaries=(50, 100, 200), seed=0,
                  drop_remainder=False, shuffle=False)
        legacy = BucketedBatcher(ds, target_len=128,
                                 adaptive_target_len=False, **kw)
        adapt = BucketedBatcher(ds, target_len=128, **kw)
        for bl, ba in zip(legacy.epoch(0), adapt.epoch(0)):
            wa = ba.targets_in.shape[1]
            assert wa % 16 == 0 and wa <= 128
            assert bl.targets_in.shape[1] == 128
            # identical content: adaptive is a pure truncation of the pad
            np.testing.assert_array_equal(np.asarray(bl.targets_in)[:, :wa],
                                          np.asarray(ba.targets_in))
            assert np.asarray(bl.targets_in)[:, wa:].max(initial=0) == 0
            np.testing.assert_array_equal(np.asarray(bl.target_lens),
                                          np.asarray(ba.target_lens))
            np.testing.assert_array_equal(np.asarray(bl.audio),
                                          np.asarray(ba.audio))

    def test_grain_matches_python_pipeline_width(self, corpus):
        from speech_tranformer_pytorch_tpu.data.grain_pipeline import (
            GrainBucketedPipeline)
        fcfg = FeatureConfig()
        ds = ManifestDataset(corpus["train"], DataConfig(), fcfg)
        kw = dict(batch_size=4, bucket_boundaries=(50, 100, 200),
                  target_len=128, seed=0, drop_remainder=False, shuffle=False)
        py = BucketedBatcher(ds, **kw)
        gr = GrainBucketedPipeline(ds, **kw)
        for bp, bg in zip(py.epoch(0), gr.epoch(0)):
            assert bp.targets_in.shape == bg.targets_in.shape
            np.testing.assert_array_equal(np.asarray(bp.targets_in),
                                          np.asarray(bg.targets_in))
