"""Streaming scorer: online part scores == offline PartScorer scores."""

import jax
import numpy as np
import pytest

from lstc_vad_tpu.config import EncoderConfig
from lstc_vad_tpu.evaluation.scoring import PartScorer
from lstc_vad_tpu.models import Encoder, make_head
from lstc_vad_tpu.serving import StreamingScorer

SMALL = dict(d_model=16, d_inner=24, n_head=2, d_k=8, d_v=8, n_layers=1,
             attn_impl="xla")


@pytest.fixture(scope="module")
def model():
    cfg = EncoderConfig(relative_pe=True, window_size=4, window_depth=3,
                        mha_layernorm=True, ffn_layernorm=True, **SMALL)
    enc = Encoder(cfg)
    head = make_head("classifier", 16, 8)
    params = {
        "encoder": enc.init(jax.random.PRNGKey(0),
                            np.zeros((1, 12, 16), np.float32))["params"],
        "head": head.init(jax.random.PRNGKey(1),
                          np.zeros((1, 16), np.float32))["params"]}
    return enc, head, params


def test_online_matches_offline(model, rng):
    enc, head, params = model
    part_len, n_patch, d = 3, 4, 16
    video = rng.standard_normal((9, n_patch, d)).astype(np.float32)

    offline = PartScorer(enc, head, part_len, n_patch)
    off_scores, counts = offline.score_video(params, video)

    scorer = StreamingScorer(enc, head, params, part_len, n_patch, d,
                             max_streams=4)
    online = []
    for clip in video:
        scorer.push("cam0", clip)
        for _, s in scorer.flush():
            online.append(s)
    assert len(online) == 3
    np.testing.assert_allclose(online, off_scores, atol=1e-5)


def test_many_streams_one_call(model, rng):
    enc, head, params = model
    part_len, n_patch, d = 3, 4, 16
    scorer = StreamingScorer(enc, head, params, part_len, n_patch, d,
                             max_streams=8)
    videos = {f"cam{i}": rng.standard_normal((part_len, n_patch, d))
              .astype(np.float32) for i in range(5)}
    for sid, v in videos.items():
        for clip in v:
            scorer.push(sid, clip)
    results = dict(scorer.flush())
    assert set(results) == set(videos)
    # each matches its own offline score
    offline = PartScorer(enc, head, part_len, n_patch)
    for sid, v in videos.items():
        expected, _ = offline.score_video(params, v)
        assert results[sid] == pytest.approx(float(expected[0]), abs=1e-5)


def test_push_shape_validation(model):
    enc, head, params = model
    scorer = StreamingScorer(enc, head, params, 3, 4, 16)
    with pytest.raises(ValueError):
        scorer.push("cam0", np.zeros((2, 16), np.float32))


def test_end_stream_scores_short_tail(model, rng):
    enc, head, params = model
    part_len, n_patch, d = 3, 4, 16
    scorer = StreamingScorer(enc, head, params, part_len, n_patch, d)
    video = rng.standard_normal((5, n_patch, d)).astype(np.float32)
    for clip in video:
        scorer.push("cam0", clip)
    scorer.flush()  # consumes first 3 clips
    tail_scores = scorer.end_stream("cam0")
    assert len(tail_scores) == 1
    # equals a direct short-part forward on the last 2 clips
    tokens = video[3:].reshape(1, -1, d)
    h = enc.apply({"params": params["encoder"]}, tokens, deterministic=True)
    expected = float(head.apply({"params": params["head"]}, h[:, 0, :],
                                deterministic=True)[0, 1])
    assert tail_scores[0] == pytest.approx(expected, abs=1e-6)
    assert scorer.end_stream("cam0") == []


def test_end_stream_with_multiple_buffered_parts(model, rng):
    # 7 clips buffered, never flushed: end_stream emits 2 full parts + tail
    enc, head, params = model
    part_len, n_patch, d = 3, 4, 16
    scorer = StreamingScorer(enc, head, params, part_len, n_patch, d)
    video = rng.standard_normal((7, n_patch, d)).astype(np.float32)
    for clip in video:
        scorer.push("cam0", clip)
    scores = scorer.end_stream("cam0")
    assert len(scores) == 3  # parts [0:3], [3:6], short [6:7]
    offline = PartScorer(enc, head, part_len, n_patch, tail_rewindow=False)
    expected, _ = offline.score_video(params, video)
    np.testing.assert_allclose(scores, expected, atol=1e-5)


def test_end_streams_batched_calls(model, rng):
    """Ending many streams costs one padded call per max_streams group of
    full parts + one per distinct tail length — never one per part."""
    enc, head, params = model
    part_len, n_patch, d = 3, 4, 16
    scorer = StreamingScorer(enc, head, params, part_len, n_patch, d,
                             max_streams=16)
    calls = []
    inner = scorer._apply
    scorer._apply = lambda p, t: (calls.append(t.shape), inner(p, t))[1]

    # 6 streams: lengths 7,7,8,5,3,4 -> 8 full parts; tails of 1 clip (x2),
    # 2 clips (x3)
    lengths = {"a": 7, "b": 7, "c": 8, "d": 5, "e": 3, "f": 4}
    videos = {sid: rng.standard_normal((n, n_patch, d)).astype(np.float32)
              for sid, n in lengths.items()}
    for sid, v in videos.items():
        for clip in v:
            scorer.push(sid, clip)
    out = scorer.end_streams(list(videos))

    # one call for all 8 full parts, one for the 1-clip tails, one for the
    # 2-clip tails
    assert len(calls) == 3, calls
    assert calls[0] == (16, part_len * n_patch, d)
    assert sorted(c[1] for c in calls[1:]) == [1 * n_patch, 2 * n_patch]

    offline = PartScorer(enc, head, part_len, n_patch, tail_rewindow=False)
    for sid, v in videos.items():
        expected, _ = offline.score_video(params, v)
        np.testing.assert_allclose(out[sid], expected, atol=1e-5)


def test_serving_from_artifact_matches_live(model, rng, tmp_path):
    """StreamingScorer.from_artifact: flush + tail scores are identical to
    the flax-backed scorer (the artifact bakes the flush and tail
    programs)."""
    from lstc_vad_tpu.export import save_scorer_artifact

    enc, head, params = model
    part_len, n_patch, d = 3, 4, 16
    art = str(tmp_path / "artifact")
    save_scorer_artifact(art, enc, head, "classifier", params,
                         part_len * n_patch, d, platforms=("cpu",),
                         extra_token_lens=(n_patch, 2 * n_patch),
                         extra_meta={"n_patch": n_patch,
                                     "part_len": part_len})

    live = StreamingScorer(enc, head, params, part_len, n_patch, d,
                           max_streams=4)
    aot = StreamingScorer.from_artifact(art, max_streams=4)
    assert (aot.part_len, aot.n_patch, aot.d_model) == (part_len, n_patch, d)

    video = rng.standard_normal((8, n_patch, d)).astype(np.float32)  # tail 2
    for s in (live, aot):
        for clip in video:
            s.push("cam0", clip)
    live_flush = [x for _, x in live.flush()]
    aot_flush = [x for _, x in aot.flush()]
    np.testing.assert_allclose(aot_flush, live_flush, atol=1e-6)
    live_tail = live.end_stream("cam0")
    aot_tail = aot.end_stream("cam0")
    np.testing.assert_allclose(aot_tail, live_tail, atol=1e-6)


def test_from_artifact_rejects_l2(model, tmp_path):
    from lstc_vad_tpu.export import save_scorer_artifact

    enc, head, params = model
    art = str(tmp_path / "l2_artifact")
    save_scorer_artifact(art, enc, head, "classifier", params, 12, 16,
                         l2_normalize=True, platforms=("cpu",),
                         extra_meta={"n_patch": 4, "part_len": 3})
    with pytest.raises(ValueError, match="exported with --l2"):
        StreamingScorer.from_artifact(art)


def test_streaming_scorer_bf16_wire(model):
    """transfer_dtype='bfloat16': buffers and flush batches are bf16 (half
    RAM + half H2D bytes); scores match the f32 wire to bf16 rounding."""
    import ml_dtypes

    enc, head, params = model
    kw = dict(part_len=3, n_patch=4, d_model=16, max_streams=4)
    f32 = StreamingScorer(enc, head, params, **kw)
    bf16 = StreamingScorer(enc, head, params, transfer_dtype="bfloat16",
                           **kw)
    rng = np.random.default_rng(7)
    clips = [rng.standard_normal((4, 16)).astype(np.float32)
             for _ in range(7)]
    for c in clips:
        f32.push("s", c)
        bf16.push("s", c)
    assert bf16._buffers["s"][0].dtype == np.dtype(ml_dtypes.bfloat16)
    a = f32.end_stream("s")
    b = bf16.end_stream("s")
    assert len(a) == len(b) == 3  # 2 full parts + 1-clip tail
    np.testing.assert_allclose(a, b, atol=2e-2)


def _serve(model, script, flush_every=0, max_streams=4):
    """Run serve_jsonl over a list of request dicts (or raw lines); returns
    (replies as parsed dicts, (n_push, n_scores))."""
    import io
    import json

    from lstc_vad_tpu.serving import serve_jsonl

    enc, head, params = model
    scorer = StreamingScorer(enc, head, params, 3, 4, 16,
                             max_streams=max_streams)
    lines = [s if isinstance(s, str) else json.dumps(s) for s in script]
    out = io.StringIO()
    counts = serve_jsonl(scorer, io.StringIO("\n".join(lines) + "\n"), out,
                         flush_every=flush_every)
    return [json.loads(ln) for ln in out.getvalue().splitlines()], counts


def test_serve_jsonl_protocol_matches_offline(model, rng):
    """push (list AND base64 feats) -> flush -> end: scores equal the
    offline PartScorer part semantics."""
    import base64

    part_len, n_patch, d = 3, 4, 16
    video = rng.standard_normal((5, n_patch, d)).astype(np.float32)

    def feat(i):
        if i % 2:  # alternate both wire encodings
            return base64.b64encode(
                video[i].astype("<f4").tobytes()).decode()
        return video[i].tolist()

    script = ([{"op": "push", "stream": "cam", "feat": feat(i)}
               for i in range(3)]
              + [{"op": "flush"}]
              + [{"op": "push", "stream": "cam", "feat": feat(i)}
                 for i in range(3, 5)]
              + [{"op": "end", "stream": "cam"}])
    replies, (n_push, n_scores) = _serve(model, script)
    assert (n_push, n_scores) == (5, 2)  # 1 flushed part + 1 ended tail

    enc, head, params = model
    offline = PartScorer(enc, head, part_len, n_patch)
    expected, _ = offline.score_video(params, video)

    flush_scores = [r["score"] for r in replies if "score" in r]
    assert flush_scores == [pytest.approx(float(expected[0]), abs=1e-5)]
    assert {"flushed": 1} in replies
    (end,) = [r for r in replies if r.get("ended")]
    assert end["stream"] == "cam"
    # end scores the buffered 2-clip tail at true length (no re-window)
    tail = StreamingScorer(enc, head, params, part_len, n_patch, d)
    for c in video[3:]:
        tail.push("cam", c)
    assert end["scores"] == pytest.approx(tail.end_stream("cam"), abs=1e-6)


def test_serve_jsonl_errors_do_not_kill_the_loop(model, rng):
    v = rng.standard_normal((4, 16)).astype(np.float32)
    script = ["not json",
              {"op": "push", "stream": "a", "feat": [[1.0]]},   # bad shape
              {"op": "push", "stream": "a", "feat": "AAAA"},    # short b64
              {"op": "nope"},
              {"op": "push", "stream": "a", "feat": v.tolist()}]
    replies, (n_push, _) = _serve(model, script)
    errors = [r["error"] for r in replies if "error" in r]
    assert len(errors) == 4
    assert any("feat shape" in e for e in errors)
    assert any("bytes, expected" in e for e in errors)
    assert any("unknown op" in e for e in errors)
    assert n_push == 1  # the good push after the errors still landed
    # EOF implicitly ends the surviving stream
    (end,) = [r for r in replies if r.get("ended")]
    assert end["stream"] == "a" and len(end["scores"]) == 1


def test_serve_jsonl_flush_every_and_end_all(model, rng):
    clips = rng.standard_normal((6, 4, 16)).astype(np.float32)
    script = [{"op": "push", "stream": f"s{i % 2}", "feat": clips[i].tolist()}
              for i in range(6)] + [{"op": "end_all"}]
    replies, (n_push, n_scores) = _serve(model, script, flush_every=3)
    assert n_push == 6
    # after the 6th push both streams hold a full 3-clip part -> auto-flush
    assert {"flushed": 2} in replies
    # the auto-flush drained both streams AND dropped their buffer entries
    # (no empty-buffer leak), so end_all has nothing left to finish
    assert not [r for r in replies if r.get("ended")]
    assert n_scores == 2


def test_from_artifact_rejects_part_len_mismatch(model, tmp_path):
    """A part_len override that disagrees with the artifact's baked meta
    would recompute n_patch and silently truncate every pushed clip."""
    from lstc_vad_tpu.export import save_scorer_artifact

    enc, head, params = model
    art = str(tmp_path / "artifact")
    save_scorer_artifact(art, enc, head, "classifier", params, 12, 16,
                         platforms=("cpu",),
                         extra_meta={"n_patch": 4, "part_len": 3})
    with pytest.raises(ValueError, match="exported with part_len=3"):
        StreamingScorer.from_artifact(art, part_len=2)  # 12 % 2 == 0, but...
    # equal override is fine
    s = StreamingScorer.from_artifact(art, part_len=3)
    assert (s.part_len, s.n_patch) == (3, 4)


def test_flush_restores_buffers_on_device_error(model, rng):
    """A device/transfer error mid-flush must not lose buffered clips: the
    popped parts are re-prepended so a retry rescores the same state."""
    enc, head, params = model
    part_len, n_patch, d = 3, 4, 16
    scorer = StreamingScorer(enc, head, params, part_len, n_patch, d,
                             max_streams=1)  # 2 ready streams -> 2 groups
    videos = {sid: rng.standard_normal((4, n_patch, d)).astype(np.float32)
              for sid in ("a", "b")}
    for sid, v in videos.items():
        for clip in v:
            scorer.push(sid, clip)

    good = scorer._apply
    calls = []

    def bad_apply(p, t):
        calls.append(t.shape)
        raise RuntimeError("tunnel died")

    scorer._apply = bad_apply
    with pytest.raises(RuntimeError, match="tunnel died"):
        scorer.flush()
    assert calls  # the failure happened after parts were popped
    assert {sid: len(buf) for sid, buf in scorer._buffers.items()} == \
        {"a": 4, "b": 4}  # every clip restored

    scorer._apply = good  # retry scores the exact same parts
    retry = dict(scorer.flush())
    offline = PartScorer(enc, head, part_len, n_patch)
    for sid, v in videos.items():
        expected, _ = offline.score_video(params, v)
        assert retry[sid] == pytest.approx(float(expected[0]), abs=1e-5)

    scorer._apply = bad_apply  # end_streams restores too
    with pytest.raises(RuntimeError):
        scorer.end_streams(["a", "b"])
    assert {sid: len(buf) for sid, buf in scorer._buffers.items()} == \
        {"a": 1, "b": 1}  # the flushed-off tails survived the failed end
    scorer._apply = good
    ended = scorer.end_streams(["a", "b"])
    assert len(ended["a"]) == 1 and len(ended["b"]) == 1


def test_serve_jsonl_flush_drains_backlog(model, rng):
    """One flush request drains EVERY buffered full part (a server behind
    the push rate must catch up, not retain one part per cycle)."""
    clips = rng.standard_normal((7, 4, 16)).astype(np.float32)
    script = [{"op": "push", "stream": "cam", "feat": c.tolist()}
              for c in clips] + [{"op": "flush"}]
    replies, (n_push, n_scores) = _serve(model, script)
    assert n_push == 7
    assert {"flushed": 2} in replies  # both 3-clip parts in ONE flush
    scores = [r for r in replies if "score" in r]
    assert len(scores) == 2
    (end,) = [r for r in replies if r.get("ended")]  # EOF ends the 1-clip tail
    assert len(end["scores"]) == 1
    assert n_scores == 3


def test_rejected_push_leaks_no_buffer(model):
    """A shape-rejected push must not create an empty buffer entry (a
    long-running server fed bad stream ids would grow without bound and
    emit spurious ended-replies for streams that never held a clip)."""
    enc, head, params = model
    scorer = StreamingScorer(enc, head, params, 3, 4, 16)
    for i in range(5):
        with pytest.raises(ValueError):
            scorer.push(f"bad{i}", np.zeros((2, 16), np.float32))
    assert scorer.streams() == []


def test_serving_shares_eval_apply_cache(model):
    """StreamingScorer compiles NOTHING new when an offline scorer for the
    same (encoder, head, kind) config already exists: both resolve to the
    same process-level cached program (evaluation.scoring.get_apply)."""
    enc, head, params = model
    offline = PartScorer(enc, head, 3, 4)
    online = StreamingScorer(enc, head, params, 3, 4, 16)
    assert online._apply is offline.scorer._apply


def test_end_all_emits_terminator(model):
    """end_all's burst ends with {"ended_streams": N} — with zero buffered
    streams a pipe peer still gets exactly one reply line, not silence."""
    import io
    import json

    from lstc_vad_tpu.serving import serve_jsonl

    enc, head, params = model
    scorer = StreamingScorer(enc, head, params, 3, 4, 16)
    out = io.StringIO()
    serve_jsonl(scorer, io.StringIO('{"op": "end_all"}\n'), out)
    replies = [json.loads(ln) for ln in out.getvalue().splitlines()]
    assert replies == [{"ended_streams": 0}]


def test_eof_end_failure_reported_not_raised(model, rng):
    """A failing implicit EOF end (e.g. an AOT artifact without tail
    programs) must emit an error reply and return the counts — never
    crash serve_jsonl with an uncaught traceback."""
    import io
    import json

    from lstc_vad_tpu.serving import serve_jsonl

    enc, head, params = model
    scorer = StreamingScorer(enc, head, params, 3, 4, 16)

    def failing_end(sids):
        raise ValueError("no program for token_len 4")

    scorer.end_streams = failing_end
    clip = rng.standard_normal((4, 16)).astype(np.float32)
    req = json.dumps({"op": "push", "stream": "cam0",
                      "feat": clip.tolist()}) + "\n"
    out = io.StringIO()
    n_push, n_scores = serve_jsonl(scorer, io.StringIO(req), out)
    assert (n_push, n_scores) == (1, 0)
    replies = [json.loads(ln) for ln in out.getvalue().splitlines()]
    assert any("no program for token_len" in r.get("error", "")
               for r in replies)
