"""REAL multi-process mesh execution (SURVEY.md §5 "distributed
backend").

Spawns two OS processes, each with 4 virtual CPU devices, joined into one
8-device global mesh by parallel/distributed.py (jax.distributed +
gloo-backed CPU collectives). The workers drive the framework's own
sharded kernels — msum with its all_gather fold and the four-step NTT
with its all_to_all — so the collective traffic genuinely crosses
process boundaries, the closest a dev box gets to a pod slice's
DCN/ICI split.

The reference is single-host rayon (SURVEY.md §2.5); this is the
TPU-native replacement's multi-process path, previously only exercised
single-process.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_mp_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(WORKER)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_mesh_collectives():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count (4)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=REPO, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"MP_WORKER_OK pid={pid}" in out, out[-4000:]
