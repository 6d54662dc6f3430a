"""Two-process multi-host simulation: jax.distributed over 127.0.0.1 with 2
CPU processes x 2 virtual devices each, a (2, 2) global mesh whose data axis
spans processes (DCN analog) and model axis stays process-local (ICI analog),
and one fully sharded train step (see multihost_worker.py).

Validates parallel/distributed.py's claim that the single-host mesh extends
to pods unchanged — without TPU pod hardware.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_multihost_train_step():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen([sys.executable, worker, str(port), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
    losses = []
    for out in outs:
        lines = [ln for ln in out.splitlines()
                 if ln.startswith("MULTIHOST_LOSS ")]
        assert lines, out
        losses.append(float(lines[-1].split()[-1]))
    assert np.isfinite(losses).all()
    # the replicated loss scalar must agree bit-for-bit across processes
    assert losses[0] == losses[1], losses


@pytest.mark.slow
def test_two_process_multihost_full_trainer(tmp_path):
    """The FULL Trainer (prefetching pipeline, jitted step, batched eval
    scorers) runs on a 2-process global mesh: seed-identical host pipelines
    place global batches, replicated loss and allgathered eval scores agree
    bit-for-bit across processes (multihost_trainer_worker.py)."""
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_trainer_worker.py")
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(i), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
    results = []
    for out in outs:
        lines = [ln for ln in out.splitlines()
                 if ln.startswith("MULTIHOST_TRAINER ")]
        assert lines, out
        _, loss, auc = lines[-1].split()
        results.append((float(loss), float(auc)))
    assert all(np.isfinite(v) for r in results for v in r)
    assert results[0] == results[1], results
