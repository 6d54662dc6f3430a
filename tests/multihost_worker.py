"""Worker for the two-process multi-host simulation test (test_multihost.py).

Each process: 2 virtual CPU devices -> jax.distributed.initialize ->
make_global_mesh over the 4 global devices (data axis spans processes, the
'DCN' analog; model axis stays within the process, the 'ICI' analog) -> one
fully sharded LTN train step -> print the loss for cross-process comparison.

Run: python multihost_worker.py <port> <process_id>
"""

import os
import sys

port, pid = sys.argv[1], int(sys.argv[2])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from lstc_vad_tpu.parallel.distributed import (initialize_multihost,  # noqa: E402
                                               make_global_mesh)

initialize_multihost(f"127.0.0.1:{port}", 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

mesh = make_global_mesh(n_head=8)
assert dict(zip(mesh.axis_names, mesh.devices.shape)) == \
    {"data": 2, "model": 2}, mesh
# tp stays within the process: each mesh row's devices share one process
for row in mesh.devices:
    assert len({d.process_index for d in row}) == 1, "model axis crossed DCN"

import numpy as np  # noqa: E402

from lstc_vad_tpu.parallel.dryrun import tiny_ltn_config  # noqa: E402
from lstc_vad_tpu.parallel.mesh import (batch_sharding,  # noqa: E402
                                        state_shardings)
from lstc_vad_tpu.train.state import create_train_state  # noqa: E402
from lstc_vad_tpu.train.steps import make_ltn_train_step  # noqa: E402


def to_global(tree, shardings):
    """Every process holds the full value (same seeds); each contributes the
    shards of its addressable devices."""
    def put(x, s):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s,
                                            lambda idx, x=x: x[idx])
    return jax.tree.map(put, tree, shardings)


cfg = tiny_ltn_config(batch_size=4)
state, encoder, head, tx = create_train_state(cfg)
step_fn = make_ltn_train_step(encoder, head, cfg, tx)
state = to_global(state, state_shardings(state, mesh))

d = cfg.data
rng = np.random.default_rng(0)  # identical on both processes
shape = (4, d.part_num * d.part_len, d.n_patch, cfg.encoder.d_model)
bshard = batch_sharding(mesh)
norm = to_global(rng.standard_normal(shape, dtype=np.float32), bshard)
abnorm = to_global(rng.standard_normal(shape, dtype=np.float32), bshard)
labs = to_global(rng.random((4, d.part_num * d.part_len)).astype(np.float32),
                 bshard)

state, metrics = step_fn(state, norm, labs, abnorm, labs)
loss = float(metrics["loss"])  # scalar outputs are fully replicated
assert np.isfinite(loss), metrics
print(f"MULTIHOST_LOSS {loss!r}", flush=True)
