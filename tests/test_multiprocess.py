"""Multi-process distributed training test (SURVEY.md §4: "Multi-process
paths tested with jax.distributed.initialize over localhost subprocesses").

Two local processes, CPU backend with gloo collectives, 2-device data
mesh; asserts both workers compute the identical global loss (grad
all-reduce across processes works) and that worker death + restart
resumes cleanly (SURVEY.md §5 failure-detection contract).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

assert jax.process_count() == nproc
devices = jax.devices()
mesh = Mesh(np.array(devices).reshape(nproc), ("data",))

# Each process contributes its own shard of a global batch.
local = jnp.full((2, 4), float(pid + 1))
global_shape = (2 * nproc, 4)
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data", None)), np.asarray(local), global_shape)

@jax.jit
def global_mean(x):
    return jnp.mean(x)

out = float(jax.device_get(global_mean(arr)))
# mean over shards [1..nproc] each constant: (1+..+nproc)/nproc
want = sum(range(1, nproc + 1)) / nproc
assert abs(out - want) < 1e-6, (out, want)
print(f"worker {pid} ok {out}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_data_parallel(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one device per process
    env["PYTHONPATH"] = "/root/repo"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("multi-process rendezvous timed out in this sandbox")
        outs.append(out.decode())
    codes = [p.returncode for p in procs]
    if any(c != 0 for c in codes):
        joined = "\n".join(outs)
        if "gloo" in joined.lower() or "collective" in joined.lower() \
                or "UNIMPLEMENTED" in joined:
            pytest.skip(f"cpu collectives unavailable: {joined[-300:]}")
        pytest.fail(f"workers failed: {codes}\n{joined}")
    assert "worker 0 ok" in outs[0]
    assert "worker 1 ok" in outs[1]


MP_STEP_WORKER = r"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)
import numpy as np
from speech_tranformer_pytorch_tpu.config import tiny_config
from speech_tranformer_pytorch_tpu.data.synthetic import (
    batch_from_dataset, make_synthetic_dataset)
from speech_tranformer_pytorch_tpu.parallel import (
    batch_shardings, make_mesh, make_sharded_train_step, state_shardings)
from speech_tranformer_pytorch_tpu.train import create_train_state

assert jax.process_count() == nproc

cfg = tiny_config()
cfg = cfg.replace(model=cfg.model.replace(
    vocab_size=32, d_model=64, num_heads=2, d_ff=128,
    num_encoder_layers=1, num_decoder_layers=1, dropout_rate=0.0,
    attention_dropout_rate=0.0, subsample_channels=8))
# Deterministic fixture: every process derives the SAME global batch and
# initial params, then contributes only its addressable shard.
ds = make_synthetic_dataset(8, vocab_size=32, seed=3)
batch = batch_from_dataset(ds, cfg.features)
state = create_train_state(cfg, jax.random.PRNGKey(0), batch, sharded=True)

mesh = make_mesh(model_axis_size=1)   # nproc-way DP, 1 cpu device/process

def globalize(x, sharding):
    x = np.asarray(x)
    if sharding.spec and sharding.spec[0] == "data":
        per = x.shape[0] // nproc
        local = x[pid * per:(pid + 1) * per]
    else:
        local = x                      # replicated (incl. size-1 'model')
    return jax.make_array_from_process_local_data(sharding, local, x.shape)

sstate = jax.tree.map(globalize, state, state_shardings(mesh, state))
sbatch = jax.tree.map(globalize, batch, batch_shardings(mesh, batch))
step = make_sharded_train_step(cfg, mesh)(state, batch)
for i in range(3):
    sstate, metrics = step(sstate, sbatch, jax.random.PRNGKey(7))
    print(json.dumps({"worker": pid, "step": i,
                      "loss": float(jax.device_get(metrics["loss"])),
                      "grad_norm": float(jax.device_get(metrics["grad_norm"]))}),
          flush=True)
"""


@pytest.mark.slow
def test_two_process_real_train_step_matches_single_process(tmp_path):
    """The production grad all-reduce across an actual process boundary:
    make_sharded_train_step over a 2-process 'data' mesh (gloo) must produce
    the same per-step loss/grad-norm as the single-process step on the same
    global batch (SURVEY.md §4 "Multi-process paths tested with
    jax.distributed.initialize"; VERDICT r1 item #3)."""
    port = _free_port()
    script = tmp_path / "mp_step_worker.py"
    script.write_text(MP_STEP_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one device per process
    env["PYTHONPATH"] = "/root/repo"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("multi-process rendezvous timed out in this sandbox")
        outs.append(out.decode())
    codes = [p.returncode for p in procs]
    if any(c != 0 for c in codes):
        joined = "\n".join(outs)
        if "gloo" in joined.lower() or "UNIMPLEMENTED" in joined:
            pytest.skip(f"cpu collectives unavailable: {joined[-300:]}")
        pytest.fail(f"workers failed: {codes}\n{joined}")

    import json as _json
    got = {}   # worker -> [(loss, grad_norm), ...]
    for out in outs:
        for line in out.splitlines():
            if line.startswith("{"):
                r = _json.loads(line)
                got.setdefault(r["worker"], []).append(
                    (r["step"], r["loss"], r["grad_norm"]))
    assert sorted(got) == [0, 1], got
    assert got[0] == got[1], "workers disagree on replicated metrics"
    assert len(got[0]) == 3

    # Single-process reference: identical cfg/seeds, unsharded step.
    from speech_tranformer_pytorch_tpu.config import tiny_config
    from speech_tranformer_pytorch_tpu.data.synthetic import (
        batch_from_dataset, make_synthetic_dataset)
    from speech_tranformer_pytorch_tpu.train import (create_train_state,
                                                     make_train_step, make_tx)
    import jax

    cfg = tiny_config()
    cfg = cfg.replace(model=cfg.model.replace(
        vocab_size=32, d_model=64, num_heads=2, d_ff=128,
        num_encoder_layers=1, num_decoder_layers=1, dropout_rate=0.0,
        attention_dropout_rate=0.0, subsample_channels=8))
    ds = make_synthetic_dataset(8, vocab_size=32, seed=3)
    batch = batch_from_dataset(ds, cfg.features)
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch, sharded=True)
    step = make_train_step(cfg, make_tx(cfg), donate=False)
    for i, (step_i, loss, grad_norm) in enumerate(sorted(got[0])):
        assert step_i == i
        state, metrics = step(state, batch, jax.random.PRNGKey(7))
        np.testing.assert_allclose(loss, float(metrics["loss"]),
                                   rtol=1e-5, err_msg=f"step {i} loss")
        np.testing.assert_allclose(grad_norm, float(metrics["grad_norm"]),
                                   rtol=1e-4, err_msg=f"step {i} grad_norm")


MESH_TRAINER_WORKER = r"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
work_dir, corpus = sys.argv[4], sys.argv[5]
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc

from speech_tranformer_pytorch_tpu.config import get_config
from speech_tranformer_pytorch_tpu.runner import Trainer

cfg = get_config("tiny")
cfg = cfg.replace(
    model=cfg.model.replace(vocab_size=36, d_model=32, num_heads=2, d_ff=64,
                            num_encoder_layers=1, num_decoder_layers=1,
                            subsample_channels=4, dropout_rate=0.0),
    train=cfg.train.replace(batch_size=4, checkpoint_every_steps=1000,
                            num_epochs=50, log_every=1000),
    data=cfg.data.replace(train_manifest=f"{corpus}/train.jsonl",
                          dev_manifest="", vocab_path=f"{corpus}/vocab.json"))
trainer = Trainer(cfg, work_dir=work_dir)  # mesh='auto' -> mesh mode (2 procs)
assert trainer.mesh is not None, "auto mesh selection failed multi-process"

orig = trainer.step_fn
def rec(st, ab, rng):
    st, m = orig(st, ab, rng)
    print(json.dumps({"worker": pid,
                      "loss": float(jax.device_get(m["loss"])),
                      "grad_norm": float(jax.device_get(m["grad_norm"]))}),
          flush=True)
    return st, m
trainer.step_fn = rec
trainer.train(max_steps=3)
print("MESH_TRAIN_DONE", int(jax.device_get(trainer.state.step)), flush=True)
"""


@pytest.mark.slow
def test_two_process_trainer_end_to_end(tmp_path):
    """VERDICT r2 item #2 done-criterion: the 2-process launch drives
    ``Trainer.train(max_steps=3)`` end-to-end — auto mesh selection, the
    sharded audio train step, make_array_from_process_local_data batch
    assembly, multi-process orbax save — with per-step loss matching a
    single-process Trainer on the same manifest."""
    from speech_tranformer_pytorch_tpu.data.prepare import prepare_synthetic

    corpus = tmp_path / "corpus"
    prepare_synthetic(str(corpus), num_train=8, num_dev=0, num_test=0,
                      vocab_size=32, seed=1)
    port = _free_port()
    script = tmp_path / "mesh_trainer_worker.py"
    script.write_text(MESH_TRAINER_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one device per process
    env["PYTHONPATH"] = "/root/repo"
    wd = tmp_path / "mpwork"
    os.makedirs(wd)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port),
             str(wd), str(corpus)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("multi-process rendezvous timed out in this sandbox")
        outs.append(out.decode())
    codes = [p.returncode for p in procs]
    if any(c != 0 for c in codes):
        joined = "\n".join(outs)
        if "gloo" in joined.lower() or "UNIMPLEMENTED" in joined:
            pytest.skip(f"cpu collectives unavailable: {joined[-300:]}")
        pytest.fail(f"workers failed: {codes}\n{joined}")
    assert all("MESH_TRAIN_DONE 3" in o for o in outs), outs

    import json as _json
    got = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("{"):
                r = _json.loads(line)
                got.setdefault(r["worker"], []).append(
                    (r["loss"], r["grad_norm"]))
    assert sorted(got) == [0, 1]
    assert got[0] == got[1], "workers disagree on replicated metrics"
    assert len(got[0]) == 3

    # Single-process reference Trainer on the same corpus/config.
    import jax
    from speech_tranformer_pytorch_tpu.config import get_config
    from speech_tranformer_pytorch_tpu.runner import Trainer

    cfg = get_config("tiny")
    cfg = cfg.replace(
        model=cfg.model.replace(vocab_size=36, d_model=32, num_heads=2,
                                d_ff=64, num_encoder_layers=1,
                                num_decoder_layers=1, subsample_channels=4,
                                dropout_rate=0.0),
        train=cfg.train.replace(batch_size=4, checkpoint_every_steps=1000,
                                num_epochs=50, log_every=1000),
        data=cfg.data.replace(train_manifest=f"{corpus}/train.jsonl",
                              dev_manifest="",
                              vocab_path=f"{corpus}/vocab.json"))
    ref_losses = []
    tr = Trainer(cfg, work_dir=str(tmp_path / "sp"), mesh=None)
    orig = tr.step_fn

    def rec(st, ab, rng):
        st, m = orig(st, ab, rng)
        ref_losses.append(float(jax.device_get(m["loss"])))
        return st, m

    tr.step_fn = rec
    tr.train(max_steps=3)
    mp_losses = [l for l, _ in got[0]]
    np.testing.assert_allclose(mp_losses, ref_losses, rtol=1e-5)


TRAIN_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

work_dir, corpus, mode = sys.argv[1], sys.argv[2], sys.argv[3]
from speech_tranformer_pytorch_tpu.config import get_config
from speech_tranformer_pytorch_tpu.runner import Trainer

cfg = get_config("tiny")
cfg = cfg.replace(
    model=cfg.model.replace(vocab_size=36, d_model=32, num_heads=2, d_ff=64,
                            num_encoder_layers=1, num_decoder_layers=1,
                            subsample_channels=4),
    train=cfg.train.replace(batch_size=4, checkpoint_every_steps=2,
                            num_epochs=100, log_every=1000),
    data=cfg.data.replace(train_manifest=f"{corpus}/train.jsonl",
                          dev_manifest="", vocab_path=f"{corpus}/vocab.json"))
trainer = Trainer(cfg, work_dir=work_dir, resume=(mode == "resume"))
if mode == "crash":
    # Abrupt death right after step 6: the loop's periodic step-6 orbax
    # save is ASYNC and may still be in flight — resume must pick the
    # latest COMMITTED checkpoint either way.
    trainer._finish = lambda *a, **k: os._exit(137)
    trainer.train(max_steps=6)
trainer.train(max_steps=8)
leaves = jax.tree_util.tree_leaves_with_path(trainer.state.params)
np.savez(os.path.join(work_dir, "final.npz"),
         **{jax.tree_util.keystr(p): np.asarray(x) for p, x in leaves})
print("TRAIN_DONE", int(trainer.state.step), flush=True)
"""


@pytest.mark.slow
def test_crash_fault_injection_resume_bit_exact(tmp_path):
    """SURVEY.md §5 failure-detection contract, process-level: a real
    training process dies abruptly (os._exit, no cleanup — its last async
    orbax save may be mid-flight), is restarted with resume, and the final
    params must be BIT-exact vs an uninterrupted run of the same 8 steps."""
    from speech_tranformer_pytorch_tpu.data.prepare import prepare_synthetic

    corpus = tmp_path / "corpus"
    prepare_synthetic(str(corpus), num_train=8, num_dev=0, num_test=0,
                      vocab_size=32, seed=1)
    script = tmp_path / "train_worker.py"
    script.write_text(TRAIN_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = "/root/repo"

    def run(work_dir, mode, expect_code=0):
        p = subprocess.Popen(
            [sys.executable, str(script), str(work_dir), str(corpus), mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        out, _ = p.communicate(timeout=600)
        assert p.returncode == expect_code, (p.returncode, out.decode())
        return out.decode()

    wa = tmp_path / "uninterrupted"
    wb = tmp_path / "killed"
    os.makedirs(wa); os.makedirs(wb)
    run(wa, "fresh")
    run(wb, "crash", expect_code=137)
    assert not os.path.exists(wb / "final.npz")
    out = run(wb, "resume")
    assert "TRAIN_DONE 8" in out

    a = np.load(wa / "final.npz")
    b = np.load(wb / "final.npz")
    assert sorted(a.files) == sorted(b.files)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


DIST_DECODE_WORKER = r"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
work_dir, manifest, out_path = sys.argv[4], sys.argv[5], sys.argv[6]
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc

from speech_tranformer_pytorch_tpu.config import config_from_dict
from speech_tranformer_pytorch_tpu.parallel import make_mesh
from speech_tranformer_pytorch_tpu.recognize import load_recognizer

cfg = config_from_dict(json.load(open(f"{work_dir}/config.json")))
mesh = make_mesh(model_axis_size=1)     # 2-process DP over 2 cpu devices
rec = load_recognizer(cfg, f"{work_dir}/checkpoints", mesh=mesh)

# Guard: the bare (non-distributed) path must refuse multi-process launches.
try:
    rec.decode_manifest(manifest, beam_size=3, max_len=8, batch_size=2)
    print("GUARD_FAILED", flush=True)
    sys.exit(1)
except RuntimeError:
    pass

scores = rec.decode_manifest(manifest, beam_size=3, max_len=8, batch_size=2,
                             out_path=out_path, distributed=True)
print("SCORES " + json.dumps(
    {k: scores[k] for k in ("cer", "errors", "ref_tokens", "utterances")}),
    flush=True)
print("DIST_DECODE_DONE", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_decode_matches_single_process(tmp_path):
    """VERDICT r3 item #1 done-criterion: a 2-process launch drives
    ``Recognizer.decode_manifest(distributed=True)`` end-to-end — each host
    decodes its manifest shard through the sharded beam step and
    all-gathers hypotheses — and every host returns the IDENTICAL
    CER/errors/utterance-pairing as a single-process decode of the same
    manifest from the same checkpoint."""
    import json as _json

    import jax
    from speech_tranformer_pytorch_tpu.config import get_config
    from speech_tranformer_pytorch_tpu.data.prepare import prepare_synthetic
    from speech_tranformer_pytorch_tpu.recognize import load_recognizer
    from speech_tranformer_pytorch_tpu.runner import Trainer

    corpus = tmp_path / "corpus"
    prepare_synthetic(str(corpus), num_train=8, num_dev=0, num_test=0,
                      vocab_size=16, seed=5)
    cfg = get_config("tiny")
    cfg = cfg.replace(
        model=cfg.model.replace(vocab_size=36, d_model=48, num_heads=2,
                                d_ff=96, num_encoder_layers=1,
                                num_decoder_layers=1, subsample_channels=4,
                                dropout_rate=0.0),
        train=cfg.train.replace(batch_size=8, checkpoint_every_steps=1000,
                                num_epochs=100, log_every=1000),
        data=cfg.data.replace(train_manifest=f"{corpus}/train.jsonl",
                              dev_manifest="",
                              vocab_path=f"{corpus}/vocab.json"))
    wd = tmp_path / "work"
    tr = Trainer(cfg, work_dir=str(wd), mesh=None)
    tr.train(max_steps=30)
    with open(wd / "config.json", "w") as f:
        f.write(cfg.to_json())

    # Single-process reference decode from the saved checkpoint.
    rec = load_recognizer(cfg, str(wd / "checkpoints"))
    want_path = tmp_path / "hyps_sp.jsonl"
    want = rec.decode_manifest(f"{corpus}/train.jsonl", beam_size=3,
                               max_len=8, batch_size=2,
                               out_path=str(want_path))

    port = _free_port()
    script = tmp_path / "dist_decode_worker.py"
    script.write_text(DIST_DECODE_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one device per process
    env["PYTHONPATH"] = "/root/repo"
    out_path = tmp_path / "hyps_mp.jsonl"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port),
             str(wd), f"{corpus}/train.jsonl", str(out_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("multi-process rendezvous timed out in this sandbox")
        outs.append(out.decode())
    codes = [p.returncode for p in procs]
    if any(c != 0 for c in codes):
        joined = "\n".join(outs)
        if "gloo" in joined.lower() or "UNIMPLEMENTED" in joined:
            pytest.skip(f"cpu collectives unavailable: {joined[-300:]}")
        pytest.fail(f"workers failed: {codes}\n{joined}")
    assert all("DIST_DECODE_DONE" in o for o in outs), outs

    got_scores = []
    for out in outs:
        for line in out.splitlines():
            if line.startswith("SCORES "):
                got_scores.append(_json.loads(line[len("SCORES "):]))
    assert len(got_scores) == 2
    assert got_scores[0] == got_scores[1], "hosts disagree on scores"
    for k in ("cer", "errors", "ref_tokens", "utterances"):
        assert got_scores[0][k] == want[k], (k, got_scores[0], want)

    # Host 0 wrote the hypothesis file; pairing must match single-process.
    want_hyps = {_json.loads(l)["utt_id"]: _json.loads(l)["tokens"]
                 for l in open(want_path)}
    got_hyps = {_json.loads(l)["utt_id"]: _json.loads(l)["tokens"]
                for l in open(out_path)}
    assert got_hyps == want_hyps
