"""Worker for the two-process FULL-Trainer multi-host test.

Each process: 2 virtual CPU devices -> jax.distributed.initialize -> global
(2 data x 2 model) mesh -> the SAME synthetic fixture built from the same
seed -> a real Trainer.fit(epochs=1) with the prefetching pipeline placing
every batch as a global array -> in-training + final evaluate().  Prints the
final loss and AUC for cross-process comparison (must be identical: the
host pipelines are seed-identical and scalars are replicated).

Run: python multihost_trainer_worker.py <port> <process_id> <fixture_root>
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
assert jax.process_count() == 2

sys.path.insert(0, os.path.dirname(__file__))
from fixtures import make_sht_like  # noqa: E402

# both processes build byte-identical fixtures (seeded) in their own dir
fixture_dir = os.path.join(root, f"proc{pid}")
h5, train_txt, test_txt, mask_dir = make_sht_like(
    fixture_dir, n_patch=4, d_model=16, n_clips=(14, 30), seed=7)

from lstc_vad_tpu.config import (DataConfig, EncoderConfig,  # noqa: E402
                                 HeadConfig, LossConfig, TrainConfig)
from lstc_vad_tpu.train.driver import Trainer  # noqa: E402

cfg = TrainConfig(
    model="ltn",
    encoder=EncoderConfig(d_model=16, d_inner=32, n_head=2, d_k=8, d_v=8,
                          n_layers=1, attn_impl="xla", mha_layernorm=True,
                          ffn_layernorm=True, relative_pe=True,
                          window_size=4, window_depth=3),
    head=HeadConfig(kind="classifier", d_model=16, hidden_dim=8),
    seed=3,
    data=DataConfig(dataset="SHT", h5_path=h5, train_txt=train_txt,
                    test_txt=test_txt, test_mask_dir=mask_dir + "/",
                    n_patch=4, d_model=16, part_num=4, part_len=3,
                    batch_size=2, seed=11),
    epochs=1, inter_epoch=1, save_threshold=2.0, eval_train_split=False,
    model_save_dir=os.path.join(fixture_dir, "ckpt"),
    loss=LossConfig(temporal_only=True))

mesh = make_global_mesh(n_head=cfg.encoder.n_head)
assert dict(zip(mesh.axis_names, mesh.devices.shape)) == \
    {"data": 2, "model": 2}, mesh

trainer = Trainer(cfg, mesh=mesh)
assert trainer.multiprocess
result = trainer.fit(epochs=1)
loss = result.history[0]["loss"]
auc = trainer.evaluate("test")

# multiprocess checkpointing: both SHARED-path saves (sync + async with the
# deferred promote) restore into a fresh global-mesh Trainer
from lstc_vad_tpu.ckpt import wait_for_saves  # noqa: E402

shared_sync = os.path.join(root, "shared_ckpt")  # same path on both procs
trainer.save_state(shared_sync)
shared_async = os.path.join(root, "shared_ckpt_async")
trainer.save_state(shared_async, asynchronous=True)
wait_for_saves()

for path in (shared_sync, shared_async):
    t2 = Trainer(cfg, mesh=mesh, eval_only=True)
    # eval_only Trainers still build a full state skeleton to restore into
    t2.restore_state(path)
    assert int(t2.state.step) == int(trainer.state.step), path
    auc2 = t2.evaluate("test")
    assert auc2 == auc, (path, auc2, auc)

print(f"MULTIHOST_TRAINER {loss!r} {auc!r}", flush=True)
