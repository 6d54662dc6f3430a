"""Multi-process serving (serving_mp.py): batching backend + jax-free
workers.  PARITY.md 'beyond-reference' — the reference has no serving; the
invariant here is online-mp == online-single-process == offline part
semantics, plus the batching/coalescing machinery itself.
"""

import io
import json
import os
import subprocess
import sys
import threading

import numpy as np
import pytest

from lstc_vad_tpu.serving_mp import (BatchingBackend, RemoteApply,
                                     make_worker_scorer)

D = 8


def _fake_apply(_params, tokens):
    """Deterministic per-row stand-in for the jitted eval apply."""
    return np.asarray(tokens, np.float32).sum(axis=(1, 2))


def test_submit_roundtrip_and_counters():
    b = BatchingBackend(_fake_apply, None, D, max_batch=8, window_ms=0.0)
    b._dispatcher = threading.Thread(target=b._dispatch_loop, daemon=True)
    b._dispatcher.start()
    try:
        rows = np.arange(2 * 3 * D, dtype=np.float32).reshape(2, 3, D)
        out = b.submit(3, rows)
        np.testing.assert_allclose(out, rows.sum(axis=(1, 2)), rtol=1e-6)
        assert b.n_calls == 1 and b.n_rows == 2
    finally:
        b.shutdown()


def test_concurrent_submits_coalesce_and_route_correctly():
    b = BatchingBackend(_fake_apply, None, D, max_batch=64, window_ms=50.0)
    b._dispatcher = threading.Thread(target=b._dispatch_loop, daemon=True)
    b._dispatcher.start()
    results = {}
    barrier = threading.Barrier(6)

    def worker(i):
        rows = np.full((2, 4, D), float(i + 1), np.float32)
        barrier.wait()
        results[i] = b.submit(4, rows)

    try:
        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        for i in range(6):
            np.testing.assert_allclose(results[i], (i + 1) * 4 * D,
                                       rtol=1e-6)
        # six 2-row requests inside one 50 ms window: far fewer device calls
        # than requests — the coalescing actually happened
        assert b.n_calls < 6, b.n_calls
        assert b.n_rows == 12
    finally:
        b.shutdown()


def test_dispatcher_fifo_across_token_lengths():
    """The dispatcher serves the token length holding the OLDEST request:
    a sustained majority length cannot starve a minority one."""
    import time as _time

    b = BatchingBackend(_fake_apply, None, D, max_batch=8, window_ms=0.0)
    done = []

    def sub(L):
        done.append((L, b.submit(L, np.zeros((1, L, D), np.float32))))

    t_old = threading.Thread(target=sub, args=(5,))
    t_new = threading.Thread(target=sub, args=(3,))
    t_old.start()
    _time.sleep(0.05)
    t_new.start()
    _time.sleep(0.05)
    try:
        tok1, taken1 = b._take_round()
        assert tok1 == 5  # oldest first, not most-rows first
        for p in taken1:
            p.scores = np.zeros(len(p.rows), np.float32)
            p.event.set()
        tok2, taken2 = b._take_round()
        assert tok2 == 3
        for p in taken2:
            p.scores = np.zeros(len(p.rows), np.float32)
            p.event.set()
        t_old.join(timeout=10)
        t_new.join(timeout=10)
        assert len(done) == 2
    finally:
        b.shutdown()


def test_worker_flush_ships_only_real_rows(tmp_path):
    """pad_batches=False: a worker flush of k ready streams sends k rows to
    the backend, not max_streams — padding is the backend's job, once,
    after coalescing."""
    seen = []

    def spy_apply(_params, tokens):
        seen.append(np.asarray(tokens).shape)
        return _fake_apply(_params, tokens)

    sock = str(tmp_path / "b.sock")
    b = BatchingBackend(spy_apply, None, D, max_batch=8, window_ms=0.0)
    b.start(sock)
    try:
        s = make_worker_scorer(sock, part_len=2, n_patch=3, d_model=D,
                               max_streams=6)
        clip = np.ones((3, D), np.float32)
        for sid in ("a", "b"):  # 2 ready streams of 6 max
            for _ in range(2):
                s.push(sid, clip)
        out = s.flush()
        assert len(out) == 2
        # the device call is the backend's padded max_batch shape, but the
        # WIRE request carried 2 rows (visible as backend n_rows == 2)
        assert b.n_rows == 2
        assert seen and seen[0][0] == 8  # backend pads to its max_batch
    finally:
        b.shutdown()


def test_concurrent_stress_routing_integrity(tmp_path):
    """Randomized stress: 4 socket clients fire 40 requests each of random
    row counts and token lengths; every reply must be exactly the fake
    apply of THAT request's rows (no cross-request mixups under coalescing,
    FIFO scheduling, and concurrent socket framing)."""
    sock = str(tmp_path / "b.sock")
    b = BatchingBackend(_fake_apply, None, D, max_batch=16, window_ms=1.0)
    b.start(sock)
    errors = []

    sent_rows = []

    def client(cid):
        rng = np.random.default_rng(cid)
        try:
            c = RemoteApply(sock, D)
            total = 0
            for i in range(40):
                n = int(rng.integers(1, 6))
                tok = int(rng.choice([2, 3, 5]))
                rows = rng.standard_normal((n, tok, D)).astype(np.float32)
                out = c(None, rows)
                total += n
                expect = rows.sum(axis=(1, 2))
                if not np.allclose(out, expect, rtol=1e-5, atol=1e-5):
                    errors.append((cid, i, out, expect))
                    return
            sent_rows.append(total)
            c.close()
        except Exception as e:  # pragma: no cover - surfaced via errors
            errors.append((cid, repr(e)))

    try:
        threads = [threading.Thread(target=client, args=(cid,))
                   for cid in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors, errors[:2]
        assert len(sent_rows) == 4
        assert b.n_rows == sum(sent_rows)  # every row scored exactly once
        assert b.n_calls <= 4 * 40
    finally:
        b.shutdown()


def test_submit_validates_shape_and_size():
    b = BatchingBackend(_fake_apply, None, D, max_batch=4, window_ms=0.0)
    b._dispatcher = threading.Thread(target=b._dispatch_loop, daemon=True)
    b._dispatcher.start()
    try:
        with pytest.raises(ValueError, match="max_batch"):
            b.submit(3, np.zeros((5, 3, D), np.float32))
        with pytest.raises(ValueError, match="shape"):
            b.submit(3, np.zeros((2, 3, D + 1), np.float32))
    finally:
        b.shutdown()


def test_apply_error_fails_request_not_backend():
    calls = {"n": 0}

    def flaky(_params, tokens):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("device fell over")
        return _fake_apply(_params, tokens)

    b = BatchingBackend(flaky, None, D, max_batch=8, window_ms=0.0)
    b._dispatcher = threading.Thread(target=b._dispatch_loop, daemon=True)
    b._dispatcher.start()
    try:
        with pytest.raises(RuntimeError, match="device fell over"):
            b.submit(2, np.ones((1, 2, D), np.float32))
        out = b.submit(2, np.ones((1, 2, D), np.float32))
        np.testing.assert_allclose(out, 2 * D, rtol=1e-6)
    finally:
        b.shutdown()


def test_socket_roundtrip_and_dmodel_check(tmp_path):
    sock = str(tmp_path / "b.sock")
    b = BatchingBackend(_fake_apply, None, D, max_batch=8, window_ms=0.0)
    b.start(sock)
    try:
        client = RemoteApply(sock, D)
        assert client.max_batch == 8
        tokens = np.arange(3 * 2 * D, dtype=np.float32).reshape(3, 2, D)
        out = client(None, tokens)
        np.testing.assert_allclose(out, tokens.sum(axis=(1, 2)), rtol=1e-6)
        client.close()
        with pytest.raises(ValueError, match="d_model"):
            RemoteApply(sock, D + 1)
    finally:
        b.shutdown()


def _tiny_model():
    from lstc_vad_tpu.config import EncoderConfig
    from lstc_vad_tpu.evaluation.scoring import get_apply
    from lstc_vad_tpu.models import Encoder, make_head

    import jax

    cfg = EncoderConfig(d_model=D, d_inner=16, n_head=2, d_k=4, d_v=4,
                        n_layers=1, relative_pe=True, window_size=2,
                        window_depth=3, attn_impl="xla")
    enc = Encoder(cfg)
    head = make_head("classifier", D, 8)
    x = np.zeros((1, 3 * 4, D), np.float32)
    params = {
        "encoder": enc.init(jax.random.PRNGKey(0), x)["params"],
        "head": head.init(jax.random.PRNGKey(1),
                          np.zeros((1, D), np.float32))["params"],
    }
    return enc, head, params, get_apply(enc, head, "classifier", False)


def test_worker_scorer_matches_single_process(tmp_path):
    """make_worker_scorer through a live backend == plain StreamingScorer:
    same pushes, identical flush and end_streams scores."""
    from lstc_vad_tpu.serving import StreamingScorer

    enc, head, params, apply_fn = _tiny_model()
    sock = str(tmp_path / "b.sock")
    b = BatchingBackend(apply_fn, params, D, max_batch=8, window_ms=0.0)
    b.start(sock)
    try:
        local = StreamingScorer(enc, head, params, part_len=3, n_patch=4,
                                d_model=D, max_streams=4)
        remote = make_worker_scorer(sock, part_len=3, n_patch=4, d_model=D,
                                    max_streams=4)
        rng = np.random.default_rng(0)
        for t in range(7):  # 2 full parts + 1 tail clip per stream
            for sid in ("a", "b", "c"):
                clip = rng.standard_normal((4, D)).astype(np.float32)
                local.push(sid, clip)
                remote.push(sid, clip)
        lf = dict(local.flush())
        rf = dict(remote.flush())
        assert lf.keys() == rf.keys()
        for sid in lf:
            assert lf[sid] == pytest.approx(rf[sid], abs=1e-6)
        le = local.end_streams(local.streams())
        re_ = remote.end_streams(remote.streams())
        assert le.keys() == re_.keys()
        for sid in le:
            assert le[sid] == pytest.approx(re_[sid], abs=1e-6)
    finally:
        b.shutdown()


def test_worker_jsonl_protocol_through_backend(tmp_path):
    """serve_jsonl on a worker scorer: the full JSONL protocol runs against
    the backend (flush replies, end_all terminator)."""
    from lstc_vad_tpu.serving import serve_jsonl

    _, _, params, apply_fn = _tiny_model()
    sock = str(tmp_path / "b.sock")
    b = BatchingBackend(apply_fn, params, D, max_batch=8, window_ms=0.0)
    b.start(sock)
    try:
        scorer = make_worker_scorer(sock, part_len=3, n_patch=4, d_model=D,
                                    max_streams=4)
        rng = np.random.default_rng(1)
        lines = []
        for _ in range(3):
            clip = rng.standard_normal((4, D)).astype(np.float32)
            lines.append(json.dumps(
                {"op": "push", "stream": "s0", "feat": clip.tolist()}))
        lines += [json.dumps({"op": "flush"}),
                  json.dumps({"op": "end_all"})]
        out = io.StringIO()
        n_push, n_scores = serve_jsonl(scorer,
                                       io.StringIO("\n".join(lines) + "\n"),
                                       out)
        assert (n_push, n_scores) == (3, 1)
        replies = [json.loads(ln) for ln in out.getvalue().splitlines()]
        assert {"flushed": 1} in replies
        assert replies[-1] == {"ended_streams": 0} or \
            any(r.get("ended_streams") == 0 for r in replies)
        scored = [r for r in replies if "score" in r]
        assert len(scored) == 1 and 0.0 <= scored[0]["score"] <= 1.0
    finally:
        b.shutdown()


def test_remote_apply_survives_backend_restart(tmp_path):
    """A backend bounce must not strand long-lived workers: RemoteApply
    reconnects once and retries the in-flight request."""
    sock = str(tmp_path / "b.sock")
    b1 = BatchingBackend(_fake_apply, None, D, max_batch=8, window_ms=0.0)
    b1.start(sock)
    client = RemoteApply(sock, D)
    tokens = np.ones((2, 3, D), np.float32)
    np.testing.assert_allclose(client(None, tokens), 3 * D, rtol=1e-6)
    b1.shutdown()

    b2 = BatchingBackend(_fake_apply, None, D, max_batch=8, window_ms=0.0)
    b2.start(sock)
    try:
        out = client(None, tokens)  # old socket is dead -> reconnect path
        np.testing.assert_allclose(out, 3 * D, rtol=1e-6)
    finally:
        b2.shutdown()
        client.close()


def test_bench_serving_mp_probe_smoke(monkeypatch):
    """bench.py's serving_mp probe wiring, at tiny dims (the real run uses
    the flagship preset on the chip)."""
    from lstc_vad_tpu import benchmark, config

    tiny = config.preset("sht_ltn", **{
        "encoder.d_model": 8, "encoder.d_inner": 16, "encoder.n_head": 2,
        "encoder.d_k": 4, "encoder.d_v": 4, "encoder.n_layers": 1,
        "encoder.attn_impl": "xla", "head.d_model": 8, "head.hidden_dim": 8,
        "data.n_patch": 4, "data.d_model": 8, "data.part_len": 3,
        "encoder.window_depth": 3})
    monkeypatch.setattr(config, "preset", lambda name, **kw: tiny)
    rate, p50 = benchmark._serving_mp_probe(np.random.default_rng(0),
                                            n_rows=4, n_calls=5)
    assert rate > 0 and p50 > 0


@pytest.mark.slow
def test_worker_imports_are_jax_free():
    """The whole worker-side import surface (protocol, buffers, remote
    apply, config presets) must not pull in jax: worker fan-out is supposed
    to cost no jax startup and no device grant."""
    code = ("import sys\n"
            "assert 'jax' not in sys.modules  # clean interpreter\n"
            "from lstc_vad_tpu.serving_mp import make_worker_scorer\n"
            "from lstc_vad_tpu.serving import serve_jsonl\n"
            "from lstc_vad_tpu.config import preset\n"
            "preset('sht_ltn')\n"
            "assert 'jax' not in sys.modules, 'worker path imported jax'\n"
            "print('JAXFREE_OK')\n")
    env = {k: v for k, v in os.environ.items()
           if k not in ("LSTC_VAD_PLATFORM",)}  # the knob itself imports jax
    # this box's sitecustomize (axon backend registration) imports jax at
    # interpreter startup; measure OUR import surface without it
    env["PYTHONPATH"] = "/root/repo"
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, timeout=120)
    assert r.returncode == 0 and "JAXFREE_OK" in r.stdout, r.stderr[-800:]


@pytest.mark.slow
@pytest.mark.skipif(os.environ.get("LSTC_SKIP_SUBPROC") == "1",
                    reason="subprocess test disabled")
def test_cli_multiprocess_serving(tmp_path):
    """The real thing: a serve-backend subprocess + two jax-free
    `serve --backend` worker subprocesses over pipes; both workers' streams
    score through the one device owner."""
    sock = str(tmp_path / "mp.sock")
    small = []
    for kv in ("encoder.d_model=8 encoder.d_inner=16 encoder.n_head=2 "
               "encoder.d_k=4 encoder.d_v=4 encoder.n_layers=1 "
               "encoder.attn_impl=xla head.d_model=8 head.hidden_dim=8 "
               "data.n_patch=4 data.d_model=8 data.part_len=3 "
               "encoder.window_depth=3").split():
        small += ["--set", kv]
    env = dict(os.environ, LSTC_VAD_PLATFORM="cpu",
               PYTHONPATH="/root/repo:/root/.axon_site")
    backend = subprocess.Popen(
        [sys.executable, "-m", "lstc_vad_tpu", "serve-backend",
         "--preset", "sht_ltn", "--socket", sock, "--max-batch", "8",
         "--window-ms", "5"] + small,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
    try:
        ready = backend.stdout.readline()  # blocks until the ready JSON line
        assert json.loads(ready)["listening"] == sock, ready

        rng = np.random.default_rng(2)

        def run_worker(sid):
            lines = []
            for _ in range(3):
                clip = rng.standard_normal((4, 8)).astype(np.float32)
                lines.append(json.dumps(
                    {"op": "push", "stream": sid, "feat": clip.tolist()}))
            lines.append(json.dumps({"op": "flush"}))
            r = subprocess.run(
                [sys.executable, "-m", "lstc_vad_tpu", "serve",
                 "--preset", "sht_ltn", "--backend", sock,
                 "--max-streams", "4"] + small,
                input="\n".join(lines) + "\n", capture_output=True,
                text=True, env=env, timeout=120)
            assert r.returncode == 0, r.stderr[-800:]
            return [json.loads(ln) for ln in r.stdout.splitlines()]

        outs = [run_worker("w0"), run_worker("w1")]
        for sid, replies in zip(("w0", "w1"), outs):
            scored = [r for r in replies if "score" in r]
            assert len(scored) == 1 and scored[0]["stream"] == sid
            assert 0.0 <= scored[0]["score"] <= 1.0
            assert {"flushed": 1} in replies
    finally:
        backend.terminate()
        backend.wait(timeout=30)
