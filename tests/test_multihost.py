"""Multi-host scaffolding tests: a real 2-process jax.distributed group
over CPU devices runs the sharded engine and resumes a checkpoint written
single-process (SURVEY.md §5.8 — the reference has no distributed layer;
this is the new TPU-first component, exercised here without TPU hardware).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import numpy as np

sys.path.insert(0, os.environ["PRMERS_REPO"])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_ENABLE_X64"] = "1"

import jax
# the env var alone loses to device-plugin discovery (the axon TPU plugin
# registers itself); the config update pins the cpu client before the
# distributed client initializes
jax.config.update("jax_platforms", "cpu")

from prmers_tpu.parallel import dist
assert dist.init_from_env(), "distributed init failed"

jax.config.update("jax_enable_x64", True)
assert jax.process_count() == 2
assert len(jax.devices()) == 8          # 4 local x 2 processes

from prmers_tpu.parallel.sharded import ShardedEngine, make_mesh
from prmers_tpu.engine.api import Engine

# establish the cross-process collective context with a tiny op BEFORE
# the big per-process compiles stagger the processes (the gloo context
# init has a 30 s rendezvous window)
dist.barrier("warmup")

p = 1279
mp = (1 << p) - 1
eng = ShardedEngine(p, 2, make_mesh())
dist.barrier("tables")

print("MH: engine ready", jax.process_index(), flush=True)

# resume the state the single-process phase checkpointed
blob = open(os.environ["PRMERS_CKPT"], "rb").read()
eng.set_checkpoint(blob)
print("MH: checkpoint restored", flush=True)

for i in range(5):
    eng.square_mul(0, 1)
    print("MH: step", i, flush=True)
eng.sync()
v = eng.get_int(0)
print("MH: value gathered", flush=True)

dist.barrier("done")
if dist.is_primary():
    with open(os.environ["PRMERS_OUT"], "w") as f:
        f.write(str(v))
print("WORKER_OK", jax.process_index(), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_resume(tmp_path):
    """Phase A (in-process, 8 virtual devices): run 5 squarings, write a
    checkpoint. Phase B (two real OS processes, 4 CPU devices each, one
    jax.distributed group): resume the checkpoint, continue 5 squarings.
    The result must equal 10 straight squarings — proving checkpoints are
    process-count independent and the distributed init path works."""
    from prmers_tpu.parallel.sharded import ShardedEngine, make_mesh
    import jax

    p = 1279
    mp = (1 << p) - 1
    seed = 0x5EED
    eng = ShardedEngine(p, 2, make_mesh(8))
    eng.set_int(0, seed)
    for _ in range(5):
        eng.square_mul(0, 1)
    blob = eng.get_checkpoint()
    ckpt = tmp_path / "phaseA.ckpt"
    ckpt.write_bytes(blob)

    # ground truth: 10 squarings of the seed
    want = seed
    for _ in range(10):
        want = want * want % mp

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    out = tmp_path / "result.txt"
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "PRMERS_REPO": os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
            "PRMERS_COORDINATOR": f"127.0.0.1:{port}",
            "PRMERS_NUM_PROCS": "2",
            "PRMERS_PROC_ID": str(pid),
            "PRMERS_CKPT": str(ckpt),
            "PRMERS_OUT": str(out),
        })
        env.pop("PYTEST_CURRENT_TEST", None)
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outputs = []
    for pr in procs:
        stdout, _ = pr.communicate(timeout=600)
        outputs.append(stdout.decode())
    for pr, txt in zip(procs, outputs):
        assert pr.returncode == 0, txt[-2000:]
        assert "WORKER_OK" in txt
    got = int(out.read_text())
    assert got == want
