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
