#!/bin/bash
# Round-5 real-TPU evidence agenda (VERDICT r4 next-round #1 and #6), in
# priority order so a re-outage mid-agenda still leaves the most valuable
# artifacts.  Probe-first per CLAUDE.md; never SIGKILL a running TPU job.
#
#   PYTHONPATH=/root/repo:/root/.axon_site bash scripts/tpu_round5_agenda.sh
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=docs/TPU_R5_AGENDA.log
ts() { date -u +%H:%M:%S; }
say() { echo "[$(ts)] $*" | tee -a "$LOG"; }

say "probe"
if ! timeout 120 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1
then
    say "tunnel still down - aborting (re-run when the watcher fires)"
    exit 1
fi

say "1/4 bench.py"
timeout 2400 python bench.py > /tmp/bench_r5.json 2>> "$LOG"
cat /tmp/bench_r5.json | tee -a "$LOG"

say "2/4 full-dims CLI drive (train -> gen-pseudo -> coteach -> evaluate)"
timeout 7200 python scripts/full_dims_cli_drive.py --epochs 6 \
    2>&1 | tail -20 | tee -a "$LOG"

say "3/4 bf16_sr paired-seed arms (vs the r4 f32/bf16 arms, same seeds)"
for seed in 0 1 2; do
    timeout 7200 python scripts/bf16_quality_study.py \
        tpu-convergence 30 bfloat16_sr "$seed" 2>&1 | tail -3 | tee -a "$LOG"
done

say "4/4 serving mp backend sanity on the real chip"
timeout 1200 python - <<'EOF' 2>&1 | tail -4 | tee -a "$LOG"
import numpy as np, time
from lstc_vad_tpu.config import preset
from lstc_vad_tpu.evaluation.scoring import get_apply
from lstc_vad_tpu.models import Encoder, make_head
from lstc_vad_tpu.serving_mp import BatchingBackend, RemoteApply
import jax
cfg = preset("sht_ltn")
enc = Encoder(cfg.encoder); head = make_head("classifier", 2048, 512)
x = np.zeros((1, 48, 2048), np.float32)
params = {"encoder": enc.init(jax.random.PRNGKey(0), x)["params"],
          "head": head.init(jax.random.PRNGKey(1),
                            np.zeros((1, 2048), np.float32))["params"]}
b = BatchingBackend(get_apply(enc, head, "classifier", False), params, 2048,
                    max_batch=64, window_ms=2.0)
b.start("/tmp/r5mp.sock")
c = RemoteApply("/tmp/r5mp.sock", 2048)
rows = np.random.default_rng(0).standard_normal((16, 48, 2048)).astype(np.float32)
c(None, rows)  # compile
t0 = time.perf_counter(); n = 20
for _ in range(n): c(None, rows)
dt = (time.perf_counter() - t0) / n
print(f"mp-backend roundtrip: {16/dt:.0f} parts/s, {dt*1e3:.1f} ms/flush of 16")
b.shutdown()
EOF

say "agenda complete"
