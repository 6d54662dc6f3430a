"""Benchmark (package home — run via `python bench.py`,
`python -m lstc_vad_tpu benchmark`, or the installed console script):
single-chip throughput over the FULL preset matrix.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus extra
keys (the driver parses one line; the contract keys are unchanged).

Headline metric: snippets (16-frame clips) scored per second through the
flagship ShanghaiTech LTN eval path — encoder (3 layers, d_model 2048,
8 heads, 3-D relative position bias over 49 tokens) + classifier — with all
parts of all videos batched on device, as the evaluation drivers run it.

Baseline: the reference evaluates ONE part per device call in a Python loop
with a `.cpu().numpy()` sync per part
(/root/reference/Test/evaluation_shanghaitech_ubnormal.py:77-91).  It
publishes no throughput numbers (SURVEY §6), so vs_baseline is measured, not
quoted: the same weights are driven through a reference-style batch-1
per-part loop (device round-trip per part, as the reference does) ON THE
SAME CHIP, and vs_baseline = batched / reference_style.

Caveat: both paths pay this environment's device-dispatch latency; the
reference-style loop is hurt more by it (one round trip per part).  On
locally-attached hardware the loop's absolute rate would be higher, but the
architectural gap (per-part sync vs one fused sweep near MXU peak) is what
the ratio demonstrates.

Extra keys (each measured where the corresponding reference script actually
runs, not extrapolated from the flagship shape):
- ``stn_eval_snippets_per_sec``: SHT STN eval — 17-token sequences (16
  patches + CLS), regressor head (Train/spatio_transformer_shanghaitech.py:
  133-137).  One clip = one snippet.
- ``ucf_eval_snippets_per_sec``: the UCF LTN final-eval path END TO END —
  host-side 32-bin linspace mean-pooling + device L2-normalize + encoder at
  part_len=2 (Test/evaluation_UCF.py:52-77), through UCFBinnedScorer exactly
  as `evaluate --preset ucf_ltn` drives it.  Snippets = raw input clips.
  Measured attribution on this box: ~14% host pooling (one core), the rest
  H2D transfer + dispatch through the remote tunnel — which is why the
  scorers pool before transfer and bucket-decompose batches to ship zero
  padding rows (evaluation/scoring.py score_tokens).
- ``ubnormal_eval_snippets_per_sec``: UBnormal LTN eval — d_model 1024,
  part_len 5 (81-token parts), the README.md:55 shape.
- ``hostfed_eval_snippets_per_sec``: the SHT LTN sweep fed from HOST memory
  through the production scorer path (read-ahead + block packing +
  exact-bucket decomposition + double-buffered dispatch) — includes the
  H2D transfer the flagship's device-resident number excludes; tunnel-
  bandwidth-bound in this environment.
- ``train_snippets_per_sec``: the full jitted SHT LTN train step (fwd + bwd
  + two-group Adagrad, donated state, device-resident preset-sized batch) —
  the device program of Train/temporal_transformer_shanghaitech.py:99-142.
  HEADLINE stays the f32-compute step (the preset default): the round-4
  paired-seed quality study (docs/ARCHITECTURE.md, docs/BF16_STUDY.jsonl)
  measured bf16 TRAIN compute converging ~0.03 AUC BELOW f32 on every seed
  at matched epochs, so the +8.6%-throughput bf16 step is reported as the
  ``train_bf16_*`` alternate, not the default.
- ``hostfed_h2d_gbps`` / ``h2d_raw_gbps``: achieved wire rate of the
  host-fed sweep vs the raw device_put ceiling of this link — the pair that
  makes the host-fed absolute number interpretable (saturated link vs
  pipeline stall).
- ``serving_parts_per_sec`` / ``serving_flush_p50_ms`` / ``_p99_ms``:
  online StreamingScorer at 16 concurrent flagship-LTN streams, one part
  per stream per flush.
- ``serving_mp_parts_per_sec`` / ``serving_mp_roundtrip_p50_ms``: the
  multi-process serving path (serving_mp.py) — 16-part requests through a
  unix-socket RemoteApply into an in-process BatchingBackend; the delta vs
  ``serving_parts_per_sec`` is the socket + coalesce + pad overhead.
- ``eval_tflops`` / ``train_tflops`` / ``stn_eval_tflops`` /
  ``ubnormal_eval_tflops``: FLOP-derived rates from the analytic matmul
  count (backward ~= 2x forward); ``eval_mfu`` / ``train_mfu`` are vs the
  v5e nominal bf16 peak of 197 TFLOP/s (approximate: the f32 paths run
  f32-accumulate, and tunnel timing has ~ms jitter).
"""

import json
import sys
import time

import numpy as np

V5E_PEAK_TFLOPS = 197.0


def flops_per_tokens(cfg, L: int) -> float:
    """Analytic forward FLOPs for ONE L-token sequence (CLS included)
    through the encoder + head: qkv/out projections, attention score +
    weighted-sum matmuls, FFN, head MLP.  2 FLOPs per MAC;
    layernorm/softmax/bias terms are negligible and excluded."""
    e = cfg.encoder
    d, h, dk, dv, di = e.d_model, e.n_head, e.d_k, e.d_v, e.d_inner
    per_layer = (2 * L * d * h * (2 * dk + dv)   # q, k, v projections
                 + 2 * h * L * L * (dk + dv)     # scores + weighted sum
                 + 2 * L * h * dv * d            # output projection
                 + 2 * L * d * di * 2)           # FFN in + out
    hid = cfg.head.hidden_dim
    head = 2 * (d * hid + hid * 32 + 32 * 2)
    return float(e.n_layers * per_layer + head)


def flops_per_part(cfg) -> float:
    """Forward FLOPs for one training-shaped part
    (part_len*n_patch + CLS tokens)."""
    return flops_per_tokens(cfg, cfg.data.part_len * cfg.data.n_patch + 1)


def _probe_device(timeout_s: float = 90.0):
    """Cheap device-reachability probe in a FRESH subprocess with a hard
    timeout: backend init through the remote tunnel either succeeds in
    seconds or hangs/raises for hours (observed 2026-08-17/18), and jax
    caches a failed attach per process — so the probe must not share this
    interpreter.  Returns (ok, detail).

    A hung probe child is SIGTERMed, NEVER SIGKILLed (CLAUDE.md: SIGKILL of
    a TPU-attaching process can wedge the remote device grant ~30-60 min).
    If SIGTERM is ignored, the child is abandoned to a daemon reaper thread
    — it exits on its own when the backend attach fails or times out."""
    import subprocess
    import threading

    code = "import jax; jax.devices(); print('LSTC_PROBE_OK')"
    p = subprocess.Popen([sys.executable, "-c", code],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
    try:
        out, err = p.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        p.terminate()
        try:
            p.communicate(timeout=15)
        except subprocess.TimeoutExpired:
            threading.Thread(target=p.communicate, daemon=True).start()
        return False, f"device probe hung >{timeout_s:.0f}s (tunnel down?)"
    if p.returncode == 0 and "LSTC_PROBE_OK" in out:
        return True, ""
    return False, (err.strip() or out.strip())[-500:]


# every key the success-path JSON line carries (kept in sync by an assert
# in main's success path and by tests/test_benchmark_outage.py): an outage
# line must present the SAME keys as nulls so per-key consumers see None,
# never KeyError.
CONTRACT_KEYS = (
    "metric", "value", "unit", "vs_baseline",
    "train_snippets_per_sec", "eval_tflops", "train_tflops",
    "eval_mfu", "train_mfu", "train_compute_dtype",
    "train_bf16_snippets_per_sec", "train_bf16_tflops", "train_bf16_mfu",
    "train_bf16_sr_snippets_per_sec", "train_bf16_sr_tflops",
    "train_bf16_sr_mfu",
    "stn_eval_snippets_per_sec", "stn_eval_tflops",
    "ubnormal_eval_snippets_per_sec", "ubnormal_eval_tflops",
    "ucf_eval_snippets_per_sec",
    "hostfed_eval_snippets_per_sec", "hostfed_h2d_gbps", "h2d_raw_gbps",
    "serving_parts_per_sec", "serving_flush_p50_ms", "serving_flush_p99_ms",
    "serving_mp_parts_per_sec", "serving_mp_roundtrip_p50_ms",
)


def _print_outage(detail: str) -> None:
    """The one-JSON-line contract under a confirmed outage: the SAME
    contract keys as the success line, null values, plus an explicit
    transient_outage marker so the driver records 'environment down'
    instead of rc:124."""
    line = {k: None for k in CONTRACT_KEYS}
    line.update({
        "metric": "sht_ltn_eval_snippets_per_sec",
        "unit": "snippets/s",
        "transient_outage": True,
        "outage_detail": detail[-500:],
    })
    print(json.dumps(line))


def main(retry_wait_s: float = 60.0, probe=_probe_device, runner=None):
    """Outage-proof entry: exactly ONE JSON line on stdout even when the
    TPU tunnel is down.  (Round 4 lost its bench artifact to the opposite
    design — an in-process 300 s sleep-and-re-exec that the driver's own
    timeout killed mid-sleep, rc:124.)

    1. Probe reachability in a cheap subprocess BEFORE backend init; on
       failure, re-probe once after a short bounded wait (blips recover in
       seconds; the multi-hour outages never do — don't burn the driver's
       budget sleeping), then print the explicit transient-outage line.
    2. A transient failure MID-run (RESOURCE_EXHAUSTED device-grant wedge,
       UNAVAILABLE tunnel drop) gets one re-exec retry in a fresh
       interpreter; if it persists, the outage line is printed instead of
       raising, so the artifact survives either way."""
    import os

    runner = runner or _run
    ok, detail = probe()
    if not ok:
        time.sleep(min(retry_wait_s, 60.0))
        ok, detail = probe()
        if not ok:
            _print_outage(detail)
            return
    try:
        return runner()
    except Exception as e:
        transient = ("RESOURCE_EXHAUSTED" in str(e)
                     or "UNAVAILABLE" in str(e))
        if not transient:
            raise
        if os.environ.get("LSTC_BENCH_RETRY"):
            # persisted across a fresh interpreter: only call it an outage
            # if the device really is unreachable — a reachable device means
            # a genuine bug (e.g. an HBM OOM raising RESOURCE_EXHAUSTED)
            # that must fail loudly, not be laundered into an outage line
            ok, _detail = probe()
            if ok:
                raise
            _print_outage(f"transient failure persisted after re-exec: {e}")
            return
        print(f"transient device failure ({e}); re-executing in "
              f"{retry_wait_s:.0f}s", file=sys.stderr)
        time.sleep(retry_wait_s)
        os.environ["LSTC_BENCH_RETRY"] = "1"
        sys.stderr.flush()
        # sys.argv[0] is __main__.py under 'python -m lstc_vad_tpu', which
        # cannot be re-run as a top-level script (relative imports) — rebuild
        # from the real interpreter command line; exec the interpreter by
        # absolute path (orig_argv[0] is typically a bare 'python' that
        # os.execv would not find on PATH)
        tail = (list(sys.orig_argv)[1:] if getattr(sys, "orig_argv", None)
                else sys.argv)
        os.execv(sys.executable, [sys.executable] + tail)


def _build_apply(cfg):
    """(params, jitted apply(params, x) -> [B] scores) for a preset config."""
    import jax

    from lstc_vad_tpu.models import Encoder, make_head

    encoder = Encoder(cfg.encoder)
    head = make_head(cfg.head.kind, cfg.head.d_model,
                     cfg.head.hidden_dim)
    d = cfg.encoder.d_model
    seq = (cfg.data.n_patch if cfg.model.startswith("stn")
           else cfg.data.part_len * cfg.data.n_patch)
    params = {
        "encoder": encoder.init(
            jax.random.PRNGKey(0),
            np.zeros((1, seq, d), np.float32))["params"],
        "head": head.init(jax.random.PRNGKey(1),
                          np.zeros((1, d), np.float32))["params"],
    }

    @jax.jit
    def apply(params, x):
        h = encoder.apply({"params": params["encoder"]}, x,
                          deterministic=True)
        out = head.apply({"params": params["head"]}, h[:, 0, :],
                         deterministic=True)
        return out[:, 1] if cfg.head.kind == "classifier" else out[:, 0]

    return encoder, head, params, apply


def _sweep_rate(apply, params, staged, n_items: int, sweeps: int = 3):
    """Items (leading-axis rows) per second over device-resident batches;
    host fetch at the end of each timed region forces the tunnel drain."""
    for chunk in staged:  # warm (compile already done by caller)
        out = apply(params, chunk)
    float(out.sum())
    t0 = time.perf_counter()
    for _ in range(sweeps):
        outs = [apply(params, chunk) for chunk in staged]
    float(outs[-1].sum())
    dt = (time.perf_counter() - t0) / sweeps
    return n_items / dt


def _flagship_eval(rng):
    """SHT LTN eval sweep + the reference-style batch-1 loop (vs_baseline).
    Returns (snippets_per_sec, vs_baseline, tflops)."""
    import jax

    from lstc_vad_tpu.config import preset

    cfg = preset("sht_ltn")
    d = cfg.encoder.d_model
    part_len, n_patch = cfg.data.part_len, cfg.data.n_patch
    tokens = part_len * n_patch
    _, _, params, apply = _build_apply(cfg)

    # synthetic SHT-scale test sweep: 64 videos x 192 clips = 64 parts each
    n_videos, clips_per_video = 64, 192
    parts_per_video = clips_per_video // part_len
    batch = 1024  # measured optimum (512: -4%, 2048: -2%)
    all_parts = rng.standard_normal(
        (n_videos * parts_per_video, tokens, d)).astype(np.float32)
    staged = [jax.device_put(all_parts[i:i + batch])
              for i in range(0, len(all_parts), batch)]
    total_snippets = n_videos * clips_per_video

    float(apply(params, staged[0]).sum())  # compile
    batched = _sweep_rate(apply, params, staged, total_snippets)

    # reference-style: batch-1 per part, host fetch per part
    np.asarray(apply(params, staged[0][:1]))  # compile batch-1 program
    n_ref_parts = 128
    t0 = time.perf_counter()
    for i in range(n_ref_parts):
        np.asarray(apply(params, staged[0][i:i + 1]))
    ref_rate = n_ref_parts * part_len / (time.perf_counter() - t0)

    tflops = (batched / part_len) * flops_per_part(cfg) / 1e12
    return batched, batched / ref_rate, tflops


def _device_sweep(cfg, rng, n_rows: int, tokens: int, batch: int):
    """Rows-per-second of a device-resident [n_rows, tokens, d] sweep:
    build, stage, compile, time (the shared shape of every device-bound
    eval phase)."""
    import jax

    rows = rng.standard_normal(
        (n_rows, tokens, cfg.encoder.d_model)).astype(np.float32)
    _, _, params, apply = _build_apply(cfg)
    staged = [jax.device_put(rows[i:i + batch])
              for i in range(0, n_rows, batch)]
    float(apply(params, staged[0]).sum())  # compile
    return _sweep_rate(apply, params, staged, n_rows)


def _stn_eval(rng):
    """SHT STN eval: 17-token clip sequences through the regressor
    (Train/spatio_transformer_shanghaitech.py:133-137)."""
    from lstc_vad_tpu.config import preset

    cfg = preset("sht_stn")
    n_patch = cfg.data.n_patch
    rate = _device_sweep(cfg, rng, n_rows=16384, tokens=n_patch, batch=2048)
    tflops = rate * flops_per_tokens(cfg, n_patch + 1) / 1e12
    return rate, tflops


def _ubnormal_eval(rng):
    """UBnormal LTN eval: d_model 1024, part_len 5 -> 81-token parts
    (README.md:55 shape; Train/temporal_transformer_UBnormal.py)."""
    from lstc_vad_tpu.config import preset

    cfg = preset("ubnormal_ltn")
    part_len, n_patch = cfg.data.part_len, cfg.data.n_patch
    tokens = part_len * n_patch
    parts_rate = _device_sweep(cfg, rng, n_rows=4096, tokens=tokens,
                               batch=1024)
    tflops = parts_rate * flops_per_tokens(cfg, tokens + 1) / 1e12
    return parts_rate * part_len, tflops


def _ucf_eval(rng):
    """UCF LTN final-eval path end to end through UCFBinnedScorer: host
    32-bin linspace mean-pool + device L2-norm + encoder at part_len=2
    (Test/evaluation_UCF.py:52-77).  Snippets = raw input clips."""
    from lstc_vad_tpu.config import preset, replace
    from lstc_vad_tpu.evaluation.scoring import UCFBinnedScorer

    # the final-eval shape override cmd_evaluate applies (part_len=2 and the
    # matching window_depth=2 RPE table, Test/evaluation_UCF.py:33,42) — the
    # measured program is the one production compiles
    cfg = replace(preset("ucf_ltn"), **{"encoder.window_depth": 2,
                                        "data.part_len": 2})
    d, n_patch = cfg.encoder.d_model, cfg.data.n_patch
    encoder, head, params, _ = _build_apply(cfg)
    # final-eval flags: part_len=2, 32 bins, L2 (cli/main.py ucf_final_scorer)
    scorer = UCFBinnedScorer(encoder, head, part_len=2, n_patch=n_patch,
                             max_clips=cfg.max_clips, l2_normalize=True,
                             tail_rewindow=True)
    n_videos, clips_per_video = 32, 320
    items = [(rng.standard_normal(
        (clips_per_video, n_patch, d)).astype(np.float32), clips_per_video)
        for _ in range(n_videos)]
    scorer.score_videos(params, items)  # compile + warm (host pool + device)
    sweeps = 2
    t0 = time.perf_counter()
    for _ in range(sweeps):
        scorer.score_videos(params, items)
    dt = (time.perf_counter() - t0) / sweeps
    return n_videos * clips_per_video / dt


def _hostfed_eval(rng):
    """SHT LTN eval fed from HOST memory through the production scorer path
    (PartScorer.score_videos: read-ahead + block packing + exact-bucket
    decomposition + double-buffered async dispatch) — the H2D-inclusive
    number the device-resident flagship sweep cannot show.  On
    remote-attached chips this is transfer-bound; the pipelining recovers
    ~1.67x vs synchronous dispatch (docs/ARCHITECTURE.md).

    Returns (snippets_per_sec, achieved_h2d_gbps): the achieved wire rate
    makes the absolute number interpretable — compare against the raw
    device_put ceiling (_h2d_probe) to tell 'saturated link' from
    'pipeline stall'."""
    from lstc_vad_tpu.config import preset
    from lstc_vad_tpu.evaluation.scoring import PartScorer

    cfg = preset("sht_ltn")
    d = cfg.encoder.d_model
    part_len, n_patch = cfg.data.part_len, cfg.data.n_patch
    encoder, head, params, _ = _build_apply(cfg)
    scorer = PartScorer(encoder, head, part_len, n_patch)
    # 2 videos x 1536 clips = 1024 full parts (~0.4 GB of wire per sweep —
    # bounded so a degraded tunnel cannot stall the whole bench artifact)
    feats = [rng.standard_normal(
        (1536, n_patch, d)).astype(np.float32) for _ in range(2)]
    scorer.score_videos(params, feats)  # compile + warm
    sweeps = 2
    t0 = time.perf_counter()
    for _ in range(sweeps):
        scorer.score_videos(params, feats)
    dt = (time.perf_counter() - t0) / sweeps
    wire_bytes = sum(f.nbytes for f in feats)  # all clips ship exactly once
    return 2 * 1536 / dt, wire_bytes / dt / 1e9


def _h2d_probe(rng):
    """Raw host->device ceiling of this link: device_put of one 256 MB
    INCOMPRESSIBLE array, best of 3 (the number every host-fed figure
    divides against).

    Two measurement traps, both hit and fixed on this box:
    - ``block_until_ready`` alone can return before a tunneled wire
      transfer completes — measured 1.58 GB/s phantom; every timing here
      ends with a host fetch of a scalar reduction (the 4-byte fetch adds
      one round trip, ~ms, negligible vs the ~5 s transfer).
    - the tunnel compresses the wire: ``np.ones`` ships at 0.105-0.136
      GB/s vs 0.054 GB/s for random data (measured back to back).  Feature
      tensors are incompressible, so the ceiling MUST be probed with
      random data or the host-fed fraction reads as a phantom pipeline
      stall (0.024/0.136 = 18% vs the true ~80%-of-link)."""
    import jax
    import jax.numpy as jnp

    x = rng.standard_normal((64, 1024, 1024)).astype(np.float32)  # 256 MB
    float(jnp.sum(jax.device_put(x)))  # warm the transfer + reduce programs
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(jax.device_put(x)))  # fetch proves arrival
        best = min(best, time.perf_counter() - t0)
    return x.nbytes / best / 1e9


def _serving_probe(rng, n_streams: int = 16, n_flushes: int = 100):
    """Online serving (StreamingScorer) at flagship LTN dims: ``n_streams``
    concurrent streams each push one part per round, then one flush scores
    the round in a single device call.  Returns (parts_per_sec, p50_ms,
    p99_ms) of the flush latency — the online path the reference lacks
    (PARITY.md 'beyond-reference')."""
    from lstc_vad_tpu.config import preset
    from lstc_vad_tpu.serving import StreamingScorer

    cfg = preset("sht_ltn")
    d = cfg.encoder.d_model
    part_len, n_patch = cfg.data.part_len, cfg.data.n_patch
    encoder, head, params, _ = _build_apply(cfg)
    scorer = StreamingScorer(encoder, head, params, part_len, n_patch, d,
                             max_streams=n_streams)
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
    # nearest-rank percentile (int(n*0.99) selects the MAX at n=100 — the
    # trap scripts/serving_latency_study.py documents; keep both consistent)
    p99_idx = max(0, int(np.ceil(len(lat_ms) * 0.99)) - 1)
    return (n_streams * n_flushes / total,
            float(lat_ms[len(lat_ms) // 2]),
            float(lat_ms[p99_idx]))


def _serving_mp_probe(rng, n_rows: int = 16, n_calls: int = 50):
    """Multi-process serving path at flagship LTN dims: one in-process
    BatchingBackend on a unix socket + one RemoteApply client shipping
    ``n_rows``-part requests (the worker wire format, serving_mp.py).
    Returns (parts_per_sec, roundtrip_p50_ms) — the socket+coalesce+pad
    overhead on top of the raw device call, measured on the same chip."""
    import tempfile

    from lstc_vad_tpu.config import preset
    from lstc_vad_tpu.serving_mp import BatchingBackend, RemoteApply

    cfg = preset("sht_ltn")
    d = cfg.encoder.d_model
    tokens = cfg.data.part_len * cfg.data.n_patch
    _, _, params, apply = _build_apply(cfg)
    sock = tempfile.mktemp(prefix="lstc_bench_mp_", suffix=".sock")
    backend = BatchingBackend(apply, params, d, max_batch=64, window_ms=0.0)
    backend.start(sock)
    try:
        client = RemoteApply(sock, d)
        rows = rng.standard_normal((n_rows, tokens, d)).astype(np.float32)
        client(None, rows)  # compile [64, tokens, d]
        lat = []
        t_all = time.perf_counter()
        for _ in range(n_calls):
            t0 = time.perf_counter()
            client(None, rows)
            lat.append(time.perf_counter() - t0)
        total = time.perf_counter() - t_all
        client.close()
        lat_ms = np.sort(np.array(lat) * 1e3)
        return (n_rows * n_calls / total,
                float(lat_ms[len(lat_ms) // 2]))
    finally:
        backend.shutdown()


def _train_step(rng, compute_dtype: str = "float32", cast_sr: bool = False):
    """SHT LTN train step: fwd + bwd + two-group Adagrad, donated state
    (the device program of Train/temporal_transformer_shanghaitech.py:99-142).
    Returns (snippets_per_sec, tflops).

    ``compute_dtype='bfloat16'`` measures the throughput alternate: matmuls/
    activations in bf16 (params, LN, softmax stay f32).  The round-4
    paired-seed study (docs/ARCHITECTURE.md) found it converges ~0.03 AUC
    below f32 on every seed, so it is NOT the default — reported so the
    tradeoff stays measured.  ``cast_sr=True`` (bf16 only) adds unbiased
    stochastic-rounding casts on the matmul inputs (`ops/sr.py`) — the
    round-5 probe arm's throughput twin."""
    import jax

    from lstc_vad_tpu.config import preset
    from lstc_vad_tpu.train.state import create_train_state
    from lstc_vad_tpu.train.steps import make_ltn_train_step

    cfg = preset("sht_ltn", **{"encoder.compute_dtype": compute_dtype,
                               "encoder.cast_sr": cast_sr})
    d = cfg.encoder.d_model
    part_len, n_patch = cfg.data.part_len, cfg.data.n_patch
    state, t_encoder, t_head, tx = create_train_state(cfg)
    step_fn = make_ltn_train_step(t_encoder, t_head, cfg, tx)
    b, pn = cfg.data.batch_size, cfg.data.part_num
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
    rate = 2 * b * pn * part_len / train_dt
    tflops = (rate / part_len) * 3 * flops_per_part(cfg) / 1e12
    return rate, tflops


def _run():
    rng = np.random.default_rng(0)

    eval_rate, vs_ref, eval_tflops = _flagship_eval(rng)
    stn_rate, stn_tflops = _stn_eval(rng)
    ub_rate, ub_tflops = _ubnormal_eval(rng)
    ucf_rate = _ucf_eval(rng)
    hostfed_rate, hostfed_gbps = _hostfed_eval(rng)
    h2d_raw_gbps = _h2d_probe(rng)
    serving_rate, serving_p50, serving_p99 = _serving_probe(rng)
    mp_rate, mp_p50 = _serving_mp_probe(rng)
    # train phases last: each phase's staging is freed on helper return, so
    # the backward's activation temps (~8 GB at bs=40 f32) never share HBM
    # with an eval sweep's parts on the 15.75 GB chip.
    # HEADLINE train = f32 compute (the preset default): the paired-seed
    # quality study (docs/ARCHITECTURE.md) measured bf16 train compute
    # converging ~0.03 AUC below f32 on every seed, so the faster bf16
    # step is the reported-alongside alternate, not the default.
    train_rate, train_tflops = _train_step(rng, "float32")
    train_bf16_rate, train_bf16_tflops = _train_step(rng, "bfloat16")
    # stochastic-rounding arm (encoder.cast_sr): bf16 MXU matmuls with
    # unbiased SR casts on their inputs — the round-5 quality probe's
    # throughput twin (AUC arms: docs/BF16_STUDY.jsonl "bfloat16_sr").
    train_sr_rate, train_sr_tflops = _train_step(rng, "bfloat16",
                                                 cast_sr=True)

    print(f"sht_ltn eval: {eval_rate:.0f} snippets/s ({eval_tflops:.1f} "
          f"TFLOP/s) | stn: {stn_rate:.0f} ({stn_tflops:.1f}) | "
          f"ubnormal: {ub_rate:.0f} ({ub_tflops:.1f}) | "
          f"ucf end-to-end: {ucf_rate:.0f} | "
          f"host-fed: {hostfed_rate:.0f} ({hostfed_gbps:.2f} GB/s of "
          f"{h2d_raw_gbps:.2f} raw) | "
          f"serving: {serving_rate:.0f} parts/s "
          f"(p50 {serving_p50:.1f} ms) | "
          f"serving-mp: {mp_rate:.0f} parts/s (p50 {mp_p50:.1f} ms) | "
          f"train f32: {train_rate:.0f} ({train_tflops:.1f}) | "
          f"train bf16 alt: {train_bf16_rate:.0f} ({train_bf16_tflops:.1f})"
          f" | train bf16+SR: {train_sr_rate:.0f} ({train_sr_tflops:.1f})",
          file=sys.stderr)
    line = {
        "metric": "sht_ltn_eval_snippets_per_sec",
        "value": round(eval_rate, 1),
        "unit": "snippets/s",
        "vs_baseline": round(vs_ref, 2),
        "train_snippets_per_sec": round(train_rate, 1),
        "eval_tflops": round(eval_tflops, 1),
        "train_tflops": round(train_tflops, 1),
        "eval_mfu": round(eval_tflops / V5E_PEAK_TFLOPS, 3),
        "train_mfu": round(train_tflops / V5E_PEAK_TFLOPS, 3),
        "train_compute_dtype": "float32",
        "train_bf16_snippets_per_sec": round(train_bf16_rate, 1),
        "train_bf16_tflops": round(train_bf16_tflops, 1),
        "train_bf16_mfu": round(train_bf16_tflops / V5E_PEAK_TFLOPS, 3),
        "train_bf16_sr_snippets_per_sec": round(train_sr_rate, 1),
        "train_bf16_sr_tflops": round(train_sr_tflops, 1),
        "train_bf16_sr_mfu": round(train_sr_tflops / V5E_PEAK_TFLOPS, 3),
        "stn_eval_snippets_per_sec": round(stn_rate, 1),
        "stn_eval_tflops": round(stn_tflops, 1),
        "ubnormal_eval_snippets_per_sec": round(ub_rate, 1),
        "ubnormal_eval_tflops": round(ub_tflops, 1),
        "ucf_eval_snippets_per_sec": round(ucf_rate, 1),
        "hostfed_eval_snippets_per_sec": round(hostfed_rate, 1),
        "hostfed_h2d_gbps": round(hostfed_gbps, 3),
        "h2d_raw_gbps": round(h2d_raw_gbps, 3),
        "serving_parts_per_sec": round(serving_rate, 1),
        "serving_flush_p50_ms": round(serving_p50, 2),
        "serving_flush_p99_ms": round(serving_p99, 2),
        "serving_mp_parts_per_sec": round(mp_rate, 1),
        "serving_mp_roundtrip_p50_ms": round(mp_p50, 2),
    }
    assert set(line) == set(CONTRACT_KEYS), (
        "success line keys drifted from CONTRACT_KEYS: "
        f"{set(line) ^ set(CONTRACT_KEYS)}")
    print(json.dumps(line))


if __name__ == "__main__":
    main()
