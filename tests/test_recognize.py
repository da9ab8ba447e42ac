"""Eval driver tests: manifest decode, CER, RTF, hypothesis file
(reference ``recognize.py`` behavior — SURVEY.md §3.2)."""

import json
import os

import jax
import numpy as np
import pytest

from speech_tranformer_pytorch_tpu.config import tiny_config
from speech_tranformer_pytorch_tpu.data.prepare import (prepare_synthetic,
                                                        read_manifest)
from speech_tranformer_pytorch_tpu.recognize import Recognizer, load_recognizer
from speech_tranformer_pytorch_tpu.runner import Trainer
from speech_tranformer_pytorch_tpu.utils.checkpoint import (Checkpointer,
                                                            CheckpointState)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("rec")
    cfg = tiny_config()
    cfg = cfg.replace(model=cfg.model.replace(
        vocab_size=32, d_model=96, num_heads=2, d_ff=192,
        num_encoder_layers=2, num_decoder_layers=2, dropout_rate=0.0,
        subsample_channels=8))
    cfg = cfg.replace(train=cfg.train.replace(
        batch_size=8, num_epochs=250, warmup_steps=50, log_every=1000,
        checkpoint_every_steps=10_000))
    paths = prepare_synthetic(str(tmp / "c"), num_train=8, num_dev=0,
                              num_test=0, vocab_size=16, seed=2)
    tr = Trainer(cfg, work_dir=str(tmp / "w"), train_manifest=paths["train"])
    tr.train(max_steps=250)
    return cfg, paths, str(tmp / "w"), tr.state.params


def test_decode_manifest_cer_and_rtf(setup, tmp_path):
    cfg, paths, work, params = setup
    rec = Recognizer(cfg, params)
    out_path = str(tmp_path / "hyps.jsonl")
    scores = rec.decode_manifest(paths["train"], beam_size=3, max_len=8,
                                 batch_size=4, out_path=out_path)
    assert scores["utterances"] == 8
    assert scores["cer"] <= 5.0, scores       # overfit => ~0 CER
    assert scores["rtf"] > 0
    hyps = [json.loads(l) for l in open(out_path)]
    assert len(hyps) == 8
    refs = {e["utt_id"]: e["tokens"] for e in read_manifest(paths["train"])}
    match = sum(1 for h in hyps if refs[h["utt_id"]] == h["tokens"])
    assert match >= 7


def test_greedy_decode_manifest(setup):
    cfg, paths, work, params = setup
    rec = Recognizer(cfg, params)
    scores = rec.decode_manifest(paths["train"], beam_size=1, max_len=8,
                                 batch_size=8)
    assert scores["cer"] <= 5.0


def test_load_recognizer_from_checkpoint(setup):
    cfg, paths, work, params = setup
    rec = load_recognizer(cfg, os.path.join(work, "checkpoints"),
                          vocab_path=paths["vocab"])
    scores = rec.decode_manifest(paths["train"], beam_size=3, max_len=8,
                                 batch_size=8)
    assert scores["cer"] <= 5.0
    assert rec.tokenizer is not None


def test_max_len_ratio_caps_decode(setup):
    cfg, paths, work, params = setup
    cfg2 = cfg.replace(decode=cfg.decode.replace(max_len_ratio=0.6,
                                                 max_decode_len=32))
    rec = Recognizer(cfg2, params)
    scores = rec.decode_manifest(paths["train"], beam_size=3, batch_size=8)
    # still decodes correctly (overfit corpus) with capped lengths
    assert scores["cer"] <= 5.0


def test_mesh_recognizer_matches_plain(setup, tmp_path):
    """Recognizer(mesh=...) routes through the sharded decode builders
    (parallel/decode.py) with TP-sharded params and 'data'-sharded
    batches; hypotheses, CER and per-utterance pairing must match the
    single-device Recognizer exactly (incl. the bucket-size rounding for
    'data'-axis divisibility)."""
    from speech_tranformer_pytorch_tpu.parallel import make_mesh

    cfg, paths, work, params = setup
    plain = Recognizer(cfg, params)
    want = plain.decode_manifest(paths["train"], beam_size=3, max_len=8,
                                 batch_size=4)

    mesh = make_mesh(model_axis_size=2)   # DP4 x TP2 on the fake devices
    rec = Recognizer(cfg, params, mesh=mesh)
    out_path = str(tmp_path / "hyps_mesh.jsonl")
    got = rec.decode_manifest(paths["train"], beam_size=3, max_len=8,
                              batch_size=4, out_path=out_path)
    assert got["utterances"] == want["utterances"] == 8
    assert got["cer"] == want["cer"]
    hyps = [json.loads(l) for l in open(out_path)]
    refs = {e["utt_id"]: e["tokens"] for e in read_manifest(paths["train"])}
    match = sum(1 for h in hyps if refs[h["utt_id"]] == h["tokens"])
    assert match >= 7


def test_mesh_recognizer_greedy(setup):
    from speech_tranformer_pytorch_tpu.parallel import make_mesh

    cfg, paths, work, params = setup
    mesh = make_mesh(model_axis_size=2)
    rec = Recognizer(cfg, params, mesh=mesh)
    scores = rec.decode_manifest(paths["train"], beam_size=1, max_len=8,
                                 batch_size=8)
    assert scores["cer"] <= 5.0


def test_distributed_decode_single_process_matches_plain(setup, tmp_path):
    """decode_manifest(distributed=True) under a single process exercises
    the full multi-host path (host-sharded batcher with num_shards=1,
    row-id globalize + allgather pairing) and must reproduce the plain
    Recognizer's scores and per-utterance hypotheses exactly (VERDICT r3
    item #1 — the 2-process version lives in test_multiprocess.py)."""
    from speech_tranformer_pytorch_tpu.parallel import make_mesh

    cfg, paths, work, params = setup
    plain = Recognizer(cfg, params)
    want_path = str(tmp_path / "hyps_plain.jsonl")
    want = plain.decode_manifest(paths["train"], beam_size=3, max_len=8,
                                 batch_size=4, out_path=want_path)

    mesh = make_mesh(model_axis_size=2)   # DP4 x TP2 on the fake devices
    rec = Recognizer(cfg, params, mesh=mesh)
    got_path = str(tmp_path / "hyps_dist.jsonl")
    got = rec.decode_manifest(paths["train"], beam_size=3, max_len=8,
                              batch_size=4, out_path=got_path,
                              distributed=True)
    assert got["utterances"] == want["utterances"] == 8
    assert got["cer"] == want["cer"]
    assert got["errors"] == want["errors"]
    want_hyps = {json.loads(l)["utt_id"]: json.loads(l)["tokens"]
                 for l in open(want_path)}
    got_hyps = {json.loads(l)["utt_id"]: json.loads(l)["tokens"]
                for l in open(got_path)}
    assert got_hyps == want_hyps


def test_decode_manifest_refuses_bare_multiprocess(setup, monkeypatch):
    """Without distributed=True a multi-process launch must be refused —
    every host would feed the full manifest into globalize_audio_batch
    (mirrors make_audio_train_step's divergent-replica guard)."""
    cfg, paths, work, params = setup
    rec = Recognizer(cfg, params)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(RuntimeError, match="distributed=True"):
        rec.decode_manifest(paths["train"], beam_size=1, max_len=8)


class TestInt8WeightsDecode:
    """decode.int8_weights: weights-only PTQ for the decode path
    (ops/quantize.py) — kernels stored int8 + per-out-channel scales,
    dequant inside the jitted decode. Accuracy must hold on the overfit
    corpus, and the quantization error is bounded by construction."""

    def test_quantize_roundtrip_bounds(self, setup):
        import jax
        import jax.numpy as jnp
        from speech_tranformer_pytorch_tpu.ops.quantize import (
            dequantize_params, max_abs_error, quantize_params)

        cfg, paths, work, params = setup
        qp, sc = quantize_params(params)
        # embedding stays full precision; biases untouched; kernels int8
        flat_q = {jax.tree_util.keystr(p): l for p, l in
                  jax.tree_util.tree_leaves_with_path(qp)}
        assert any(l.dtype == jnp.int8 for l in flat_q.values())
        for key, leaf in flat_q.items():
            if "embed" in key and "embedding" in key:
                assert leaf.dtype != jnp.int8, key
            if hasattr(leaf, "ndim") and leaf.ndim < 2:
                assert leaf.dtype != jnp.int8, key
        # |w - dq| <= s/2 per channel => globally <= max(s)/2
        worst = max_abs_error(params, qp, sc)
        smax = max(float(jnp.max(s)) for s in jax.tree.leaves(sc)
                   if s.ndim > 0)
        assert 0.0 < worst <= smax / 2 + 1e-7

    def test_int8_decode_accuracy_on_overfit_corpus(self, setup):
        cfg, paths, work, params = setup
        cfg8 = cfg.replace(decode=cfg.decode.replace(int8_weights=True))
        rec = Recognizer(cfg8, params)
        scores = rec.decode_manifest(paths["train"], beam_size=3, max_len=8,
                                     batch_size=8)
        assert scores["cer"] <= 5.0, scores   # matches the bf16 bound

    def test_int8_greedy_matches_shapes(self, setup):
        cfg, paths, work, params = setup
        cfg8 = cfg.replace(decode=cfg.decode.replace(int8_weights=True))
        rec = Recognizer(cfg8, params)
        scores = rec.decode_manifest(paths["train"], beam_size=1, max_len=8,
                                     batch_size=8)
        assert scores["cer"] <= 5.0, scores

    def test_int8_rejects_mesh(self, setup):
        from speech_tranformer_pytorch_tpu.parallel import make_mesh
        cfg, paths, work, params = setup
        cfg8 = cfg.replace(decode=cfg.decode.replace(int8_weights=True))
        with pytest.raises(ValueError, match="int8"):
            Recognizer(cfg8, params, mesh=make_mesh(model_axis_size=2))


def test_recognize_cli_best_checkpoint(tmp_path):
    """--checkpoint best decodes the Trainer's best-dev model
    (work_dir/best, reference Solver parity); a run without dev evals
    fails with an actionable error."""
    import json

    from speech_tranformer_pytorch_tpu import (prepare_cli, recognize_cli,
                                               train_cli)

    data = tmp_path / "d"
    work = tmp_path / "w"
    prepare_cli.main(["synthetic", "--out", str(data), "--num-train", "8",
                      "--num-dev", "4", "--num-test", "4",
                      "--vocab-size", "16"])
    common = ["--preset", "tiny", "--data-dir", str(data),
              "--set", "model.d_model=32", "--set", "model.num_heads=2",
              "--set", "model.d_ff=64", "--set", "model.num_encoder_layers=1",
              "--set", "model.num_decoder_layers=1",
              "--set", "model.subsample_channels=4",
              "--set", "train.batch_size=8",
              "--set", "train.checkpoint_every_steps=2",
              "--set", "train.eval_every_steps=2"]
    train_cli.main(common + ["--work-dir", str(work), "--max-steps", "4"])
    assert (work / "best").is_dir()
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        recognize_cli.main(["--data-dir", str(data), "--work-dir", str(work),
                            "--split", "test", "--beam", "2",
                            "--batch-size", "4", "--checkpoint", "best"])
    scores = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert scores["utterances"] == 4.0

    # no-dev run -> actionable failure
    work2 = tmp_path / "w2"
    prepare_cli.main(["synthetic", "--out", str(tmp_path / "d2"),
                      "--num-train", "8", "--num-dev", "0", "--num-test", "0",
                      "--vocab-size", "16"])
    train_cli.main(common[:2] + ["--data-dir", str(tmp_path / "d2"),
                   "--work-dir", str(work2)] + common[4:]
                   + ["--max-steps", "2"])
    with pytest.raises(FileNotFoundError, match="best"):
        recognize_cli.main(["--data-dir", str(tmp_path / "d2"),
                            "--work-dir", str(work2), "--split", "train",
                            "--beam", "1", "--checkpoint", "best"])


def test_librispeech_recipe_end_to_end(tmp_path):
    """The librispeech preset trains on a miniature LibriSpeech-layout
    fixture (first-party .flac, BPE vocab) through train_cli and decodes
    through recognize_cli with word-level WER in the scores (VERDICT r4
    missing #4 'LibriSpeech-960h is a preset, not a recipe')."""
    import json

    from speech_tranformer_pytorch_tpu import recognize_cli, train_cli
    from speech_tranformer_pytorch_tpu.data.prepare import prepare_librispeech
    from speech_tranformer_pytorch_tpu.data.tokenizer import load_tokenizer
    from tests.test_data import _make_librispeech_fixture

    corpus_root, _ = _make_librispeech_fixture(tmp_path, n_train=8, n_dev=2,
                                               n_test=4)
    data = tmp_path / "data"
    paths = prepare_librispeech(corpus_root, str(data),
                                train_splits=("train-clean-100",),
                                bpe_vocab_size=64)
    vs = load_tokenizer(paths["vocab"]).vocab_size
    work = tmp_path / "w"
    args = ["--preset", "librispeech", "--data-dir", str(data),
            "--work-dir", str(work),
            "--set", f"data.bpe_vocab_size={vs}",
            "--set", "model.d_model=32", "--set", "model.num_heads=2",
            "--set", "model.d_ff=64", "--set", "model.num_encoder_layers=1",
            "--set", "model.num_decoder_layers=1",
            "--set", "model.subsample_channels=4",
            "--set", "data.max_target_len=64",
            "--set", "train.batch_size=4",
            "--set", "train.checkpoint_every_steps=2"]
    train_cli.main(args + ["--max-steps", "2"])
    cfg = json.load(open(work / "config.json"))
    assert cfg["model"]["vocab_size"] == vs      # vocab wired from data dir
    assert cfg["spec_augment"]["enabled"]        # preset's augment survived

    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        recognize_cli.main(["--data-dir", str(data), "--work-dir", str(work),
                            "--split", "test", "--beam", "1",
                            "--batch-size", "4"])
    scores = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert scores["utterances"] == 4.0
    assert "wer" in scores            # word-level metric for BPE outputs
    assert 0.0 <= scores["wer"]
