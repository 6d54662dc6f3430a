"""Benchmark (package home — run via `python bench.py`,
`python -m lstc_vad_tpu benchmark`, or the installed console script): flagship (ShanghaiTech LTN) evaluation throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: snippets (16-frame clips) scored per second through the full eval
path — encoder (3 layers, d_model 2048, 8 heads, 3-D relative position bias
over 49 tokens) + classifier — with all parts of all videos batched on
device, as the evaluation drivers run it.

Baseline: the reference evaluates ONE part per device call in a Python loop
with a `.cpu().numpy()` sync per part
(/root/reference/Test/evaluation_shanghaitech_ubnormal.py:77-91).  It
publishes no throughput numbers (SURVEY §6), so vs_baseline is measured, not
quoted: the same weights are driven through a reference-style batch-1
per-part loop (device round-trip per part, as the reference does) ON THE
SAME CHIP, and vs_baseline = batched / reference_style.

Both paths run on device-resident inputs; host<->device staging of the
synthetic test set is outside the timed region (in deployment, input
transfer overlaps compute via the prefetch pipeline).

Caveat: both paths pay this environment's device-dispatch latency; the
reference-style loop is hurt more by it (one round trip per part).  On
locally-attached hardware the loop's absolute rate would be higher, but the
architectural gap (per-part sync vs one fused sweep near MXU peak — measured
~135 TFLOP/s, ~69% MFU on v5e) is what the ratio demonstrates.

Extra keys in the same JSON line (driver parses ONE line; the contract keys
metric/value/unit/vs_baseline are unchanged):
- ``train_snippets_per_sec``: the full jitted LTN train step (fwd + bwd +
  two-group Adagrad, donated state, device-resident preset-sized batch) —
  the device program of Train/temporal_transformer_shanghaitech.py:99-142.
- ``eval_tflops`` / ``train_tflops``: FLOP-derived rates from the analytic
  matmul count (backward ~= 2x forward); ``eval_mfu`` is vs the v5e nominal
  bf16 peak of 197 TFLOP/s (approximate: the model runs f32-accumulate, and
  tunnel timing has ~ms jitter).
"""

import json
import sys
import time

import numpy as np


def flops_per_part(cfg) -> float:
    """Analytic forward FLOPs for ONE part (L = part_len*n_patch + CLS
    tokens) through the encoder + head: qkv/out projections, attention
    score + weighted-sum matmuls, FFN, head MLP.  2 FLOPs per MAC;
    layernorm/softmax/bias terms are negligible and excluded."""
    e = cfg.encoder
    L = cfg.data.part_len * cfg.data.n_patch + 1
    d, h, dk, dv, di = e.d_model, e.n_head, e.d_k, e.d_v, e.d_inner
    per_layer = (2 * L * d * h * (2 * dk + dv)   # q, k, v projections
                 + 2 * h * L * L * (dk + dv)     # scores + weighted sum
                 + 2 * L * h * dv * d            # output projection
                 + 2 * L * d * di * 2)           # FFN in + out
    hid = cfg.head.hidden_dim
    head = 2 * (d * hid + hid * 32 + 32 * 2)
    return float(e.n_layers * per_layer + head)


def main(retry_wait_s: float = 300.0):
    """One transient-failure retry around the measurement: a recently
    SIGTERMed TPU process can leave the remote device grant wedged
    (RESOURCE_EXHAUSTED on attach).  jax caches a failed backend attach per
    process, so the retry RE-EXECS a fresh interpreter (guarded by an env
    flag — one retry only); nothing is printed to stdout until a full run
    succeeds, so the one-JSON-line contract holds."""
    import os

    try:
        return _run()
    except Exception as e:
        if "RESOURCE_EXHAUSTED" not in str(e) \
                or os.environ.get("LSTC_BENCH_RETRY"):
            raise
        print(f"transient device failure ({e}); re-executing in "
              f"{retry_wait_s:.0f}s", file=sys.stderr)
        time.sleep(retry_wait_s)
        os.environ["LSTC_BENCH_RETRY"] = "1"
        sys.stderr.flush()
        os.execv(sys.executable, [sys.executable] + sys.argv)


def _run():
    import jax

    from lstc_vad_tpu.config import preset
    from lstc_vad_tpu.models import Encoder, make_head

    cfg = preset("sht_ltn")
    encoder = Encoder(cfg.encoder)
    head = make_head(cfg.head.kind, cfg.head.d_model)
    d = cfg.encoder.d_model
    part_len, n_patch = cfg.data.part_len, cfg.data.n_patch
    tokens_per_part = part_len * n_patch

    rng = np.random.default_rng(0)
    params = {
        "encoder": encoder.init(
            jax.random.PRNGKey(0),
            np.zeros((1, tokens_per_part, d), np.float32))["params"],
        "head": head.init(jax.random.PRNGKey(1),
                          np.zeros((1, d), np.float32))["params"],
    }

    @jax.jit
    def apply(params, x):
        h = encoder.apply({"params": params["encoder"]}, x,
                          deterministic=True)
        return head.apply({"params": params["head"]}, h[:, 0, :],
                          deterministic=True)[:, 1]

    # synthetic SHT-scale test sweep: 64 videos x 192 clips = 64 parts each
    n_videos, clips_per_video = 64, 192
    parts_per_video = clips_per_video // part_len
    batch = 1024  # parts per device call in the batched path

    video_parts = [
        jax.device_put(rng.standard_normal(
            (parts_per_video, tokens_per_part, d)).astype(np.float32))
        for _ in range(n_videos)]
    all_parts = np.concatenate([np.asarray(v) for v in video_parts])
    staged = [jax.device_put(all_parts[i:i + batch])
              for i in range(0, len(all_parts), batch)]
    total_snippets = n_videos * clips_per_video

    # --- batched path (ours): large device batches, one drain per sweep ---
    float(apply(params, staged[0]).sum())  # compile
    for chunk in staged:                   # warm sweep
        out = apply(params, chunk)
    float(out.sum())
    sweeps = 3
    t0 = time.perf_counter()
    for _ in range(sweeps):
        outs = [apply(params, chunk) for chunk in staged]
    float(outs[-1].sum())
    batched_dt = (time.perf_counter() - t0) / sweeps
    batched = total_snippets / batched_dt

    # --- reference-style: batch-1 per part, host fetch per part ---
    one = staged[0][:1]
    np.asarray(apply(params, one))  # compile batch-1 program
    n_ref_parts = 128
    t0 = time.perf_counter()
    for i in range(n_ref_parts):
        score = np.asarray(apply(params, staged[0][i:i + 1]))
    ref_dt = time.perf_counter() - t0
    ref_rate = n_ref_parts * part_len / ref_dt

    # free the eval sweep's staged device buffers before the train phase:
    # ~10 GB of parts would otherwise sit in HBM next to the backward's
    # activation temps (~8 GB at bs=40 f32) and OOM the 15.75 GB chip
    del video_parts, staged, all_parts, one, chunk, out, outs

    # --- train step: fwd + bwd + two-group Adagrad, donated state ---
    from lstc_vad_tpu.train.state import create_train_state
    from lstc_vad_tpu.train.steps import make_ltn_train_step

    state, t_encoder, t_head, tx = create_train_state(cfg)
    step_fn = make_ltn_train_step(t_encoder, t_head, cfg, tx)
    b = cfg.data.batch_size
    pn = cfg.data.part_num
    fshape = (b, pn * part_len, n_patch, d)
    norm = jax.device_put(rng.standard_normal(fshape).astype(np.float32))
    abnorm = jax.device_put(rng.standard_normal(fshape).astype(np.float32))
    labs = jax.device_put(rng.random((b, pn * part_len)).astype(np.float32))

    state, m = step_fn(state, norm, labs, abnorm, labs)  # compile
    float(m["loss"])
    for _ in range(2):                                   # warm
        state, m = step_fn(state, norm, labs, abnorm, labs)
    float(m["loss"])
    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, m = step_fn(state, norm, labs, abnorm, labs)
    float(m["loss"])  # host fetch forces the drain through the tunnel
    train_dt = (time.perf_counter() - t0) / n_steps
    train_rate = 2 * b * pn * part_len / train_dt

    fpp = flops_per_part(cfg)
    eval_tflops = (batched / part_len) * fpp / 1e12
    train_tflops = (train_rate / part_len) * 3 * fpp / 1e12

    print(f"batched: {batched:.0f} snippets/s ({batched_dt*1e3:.0f} ms for "
          f"{total_snippets}) | reference-style loop: {ref_rate:.0f} "
          f"snippets/s | train step: {train_rate:.0f} snippets/s "
          f"({train_dt*1e3:.0f} ms/step)", file=sys.stderr)
    print(json.dumps({
        "metric": "sht_ltn_eval_snippets_per_sec",
        "value": round(batched, 1),
        "unit": "snippets/s",
        "vs_baseline": round(batched / ref_rate, 2),
        "train_snippets_per_sec": round(train_rate, 1),
        "eval_tflops": round(eval_tflops, 1),
        "train_tflops": round(train_tflops, 1),
        "eval_mfu": round(eval_tflops / 197.0, 3),
    }))


if __name__ == "__main__":
    main()
