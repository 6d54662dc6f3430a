"""Worker for the two-process multi-host CO-TEACHING test.

Two alternation rounds (STN -> STN pseudo -> LTN -> LTN pseudo) on a
(2 data x 2 model) global mesh: pseudo-label artifacts live in a SHARED
workdir — process 0 writes them, everyone barriers, the next round's
Trainer loads them (pseudo/coteach.py::_save_pseudo).

Run: python multihost_coteach_worker.py <port> <process_id> <shared_root>
"""

import os
import sys

port, pid, root = sys.argv[1], int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from lstc_vad_tpu.parallel.distributed import (initialize_multihost,  # noqa: E402
                                               make_global_mesh)

initialize_multihost(f"127.0.0.1:{port}", 2, pid)

sys.path.insert(0, os.path.dirname(__file__))
from fixtures import make_sht_like  # noqa: E402
from test_golden_pipeline import _cfg as golden_cfg  # noqa: E402

from lstc_vad_tpu.pseudo import CoTeachingDriver  # noqa: E402

# seed-identical fixtures, one per process dir; SHARED co-teaching workdir
fixture = make_sht_like(os.path.join(root, f"proc{pid}"), n_patch=4,
                        d_model=16, n_clips=(14, 30), seed=7)
mesh = make_global_mesh(n_head=2)
assert dict(zip(mesh.axis_names, mesh.devices.shape)) == \
    {"data": 2, "model": 2}, mesh

from pathlib import Path  # noqa: E402

tmp = Path(root)
driver = CoTeachingDriver(golden_cfg("stn", fixture, tmp),
                          golden_cfg("ltn", fixture, tmp),
                          os.path.join(root, "shared_work"),
                          stn_threshold=0.5, ltn_threshold=0.4, mesh=mesh)
trainers = driver.run(rounds=2, stn_epochs=1, ltn_epochs=1)
assert trainers[0].multiprocess
auc = trainers[1].evaluate("test")
print(f"MULTIHOST_COTEACH {auc!r}", flush=True)
