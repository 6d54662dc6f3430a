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


@pytest.mark.slow
def test_two_process_cli_train(tmp_path):
    """`train --multihost` from the actual CLI: two processes, seed-identical
    fixtures, one epoch on the global mesh — both exit 0 and report the same
    best AUC."""
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["LSTC_VAD_PLATFORM"] = "cpu"

    import runpy  # noqa: F401  (documents that the CLI runs as __main__)

    fixture_script = (
        "import sys; sys.path.insert(0, {tests!r});"
        "from fixtures import make_sht_like;"
        "print(','.join(make_sht_like(sys.argv[1], n_patch=4, d_model=16,"
        "n_clips=(14, 30), seed=7)))").format(
        tests=os.path.dirname(os.path.abspath(__file__)))

    procs = []
    for i in range(2):
        root = str(tmp_path / f"proc{i}")
        out = subprocess.run([sys.executable, "-c", fixture_script, root],
                             capture_output=True, text=True, env=env)
        assert out.returncode == 0, out.stderr
        h5, train_txt, test_txt, mask_dir = \
            out.stdout.strip().splitlines()[-1].split(",")
        argv = [sys.executable, "-m", "lstc_vad_tpu", "train",
                "--preset", "sht_stn", "--epochs", "1",
                "--multihost", f"127.0.0.1:{port}",
                "--num-processes", "2", "--process-id", str(i),
                "--h5", h5, "--train-txt", train_txt, "--test-txt", test_txt,
                "--mask-dir", mask_dir + "/", "--batch-size", "2",
                "--set", "encoder.d_model=16", "--set", "encoder.d_inner=32",
                "--set", "encoder.n_head=2", "--set", "encoder.d_k=8",
                "--set", "encoder.d_v=8", "--set", "encoder.n_layers=1",
                "--set", "encoder.attn_impl=xla", "--set", "head.d_model=16",
                "--set", "head.hidden_dim=8", "--set", "data.n_patch=4",
                "--set", "data.d_model=16", "--set", "data.part_num=4",
                "--set", "data.part_len=3", "--set", "save_threshold=2.0"]
        procs.append(subprocess.Popen(argv, stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True,
                                      env=env))
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
    aucs = []
    for out in outs:
        assert "multihost: process" in out
        lines = [ln for ln in out.splitlines() if "best test AUC" in ln]
        assert lines, out
        aucs.append(lines[-1].split("best test AUC")[-1])
    assert aucs[0] == aucs[1], aucs


@pytest.mark.slow
def test_two_process_multihost_coteach(tmp_path):
    """Co-teaching alternation on a 2-process global mesh: process 0 writes
    the shared pseudo-label artifacts behind barriers, both rounds train,
    final AUC identical across processes (multihost_coteach_worker.py)."""
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_coteach_worker.py")
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
    aucs = []
    for out in outs:
        lines = [ln for ln in out.splitlines()
                 if ln.startswith("MULTIHOST_COTEACH ")]
        assert lines, out
        aucs.append(float(lines[-1].split()[-1]))
    assert np.isfinite(aucs).all() and aucs[0] == aucs[1], aucs
