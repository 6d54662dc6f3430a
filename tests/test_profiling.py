"""Profiling utilities: StepTimer accounting and jax trace smoke."""

import os
import time

import jax
import jax.numpy as jnp

from lstc_vad_tpu.utils.profiling import StepTimer, annotate, trace


def test_step_timer_accounting():
    t = StepTimer()
    for _ in range(3):
        with t:
            time.sleep(0.01)
        t.add_items(100)
    assert t.steps == 3
    assert t.items == 300
    assert t.seconds >= 0.03
    assert t.rate() > 0
    assert t.per_step() >= 0.01


def test_trace_writes_profile(tmp_path):
    logdir = str(tmp_path / "prof")
    with trace(logdir):
        with annotate("matmul"):
            x = jnp.ones((64, 64))
            (x @ x).block_until_ready()
    # jax writes plugins/profile/<ts>/*.pb under the logdir
    found = []
    for root, _dirs, files in os.walk(logdir):
        found.extend(files)
    assert found, "profiler produced no artifacts"
