"""Online-serving latency/throughput study (VERDICT r3 #4).

Measures ``serving.StreamingScorer`` on the real TPU at flagship SHT LTN
dims (d_model 2048, part_len 3, n_patch 16 -> 48-token parts) for
S ∈ {1, 16, 64} concurrent streams: each round pushes one full part per
stream, then one ``flush()`` scores the round.  Reports per-flush latency
(p50 / p99) and sustained parts/s.  ``end_streams`` is not separately
measured: it dispatches through the same compiled flush program.

The flush dispatches every ``max_streams`` group before fetching any
result (transfer overlaps compute — the async dispatch added round 4), so
S=64 with max_streams=64 is one device call; the study also runs S=64
with max_streams=16 to show the multi-group pipelining.

Results append to docs/SERVING_STUDY.jsonl; the summary table lives in
docs/ARCHITECTURE.md.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/serving_latency_study.py
"""

import json
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "docs", "SERVING_STUDY.jsonl")


def measure(n_streams: int, max_streams: int, n_flushes: int = 200):
    import jax

    from lstc_vad_tpu.config import preset
    from lstc_vad_tpu.models import Encoder, make_head
    from lstc_vad_tpu.serving import StreamingScorer

    cfg = preset("sht_ltn")
    d = cfg.encoder.d_model
    part_len, n_patch = cfg.data.part_len, cfg.data.n_patch
    encoder = Encoder(cfg.encoder)
    head = make_head(cfg.head.kind, cfg.head.d_model,
                     cfg.head.hidden_dim)
    rng = np.random.default_rng(0)
    params = {
        "encoder": encoder.init(
            jax.random.PRNGKey(0),
            np.zeros((1, part_len * n_patch, d), np.float32))["params"],
        "head": head.init(jax.random.PRNGKey(1),
                          np.zeros((1, d), np.float32))["params"],
    }
    scorer = StreamingScorer(encoder, head, params, part_len, n_patch, d,
                             max_streams=max_streams)
    clip = rng.standard_normal((n_patch, d)).astype(np.float32)

    def push_round():
        for s in range(n_streams):
            for _ in range(part_len):
                scorer.push(f"s{s}", clip)

    push_round()
    scorer.flush()  # compile
    lat = []
    t_all = time.perf_counter()
    for _ in range(n_flushes):
        push_round()
        t0 = time.perf_counter()
        got = scorer.flush()
        lat.append(time.perf_counter() - t0)
        assert len(got) == n_streams
    total = time.perf_counter() - t_all
    lat_ms = np.sort(np.array(lat) * 1e3)
    rec = {
        "ts": round(time.time(), 1),
        "n_streams": n_streams,
        "max_streams": max_streams,
        "n_flushes": n_flushes,
        "parts_per_sec": round(n_streams * n_flushes / total, 1),
        "flush_p50_ms": round(float(lat_ms[len(lat_ms) // 2]), 2),
        # nearest-rank p99: ceil(0.99*n)-1 (int(n*0.99) selects one rank
        # higher — ~p99.5 at n=200)
        "flush_p99_ms": round(
            float(lat_ms[max(0, int(np.ceil(len(lat_ms) * 0.99)) - 1)]), 2),
        "flush_mean_ms": round(float(lat_ms.mean()), 2),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)
    return rec


def main():
    import jax

    print(f"devices: {jax.devices()}", flush=True)
    # each S gets a right-sized program (max_streams=S — a deployment sizes
    # the batch to its stream count); (64, 16) adds the multi-group case
    # where the async dispatch overlaps one group's H2D with another's
    # compute
    for n_streams, max_streams in [(1, 1), (16, 16), (64, 64), (64, 16)]:
        measure(n_streams, max_streams)


if __name__ == "__main__":
    main()
