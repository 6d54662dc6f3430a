"""CLI: one entry point per reference command (README.md:22-59).

    python -m lstc_vad_tpu train      --preset sht_stn  --h5 ... --train-txt ...
    python -m lstc_vad_tpu train      --preset sht_ltn  --pseudo-labels stn.npy ...
    python -m lstc_vad_tpu gen-pseudo --kind stn --threshold 0.9 --ckpt ... --out ...
    python -m lstc_vad_tpu evaluate   --preset sht_ltn --encoder-ckpt ... --head-ckpt ...
    python -m lstc_vad_tpu coteach    --rounds 4 ...
    python -m lstc_vad_tpu benchmark

Reference-script equivalence:
  train --preset {sht,ucf,ubnormal}_{stn,ltn}  ~  Train/{spatio,temporal}_transformer_<ds>.py
  gen-pseudo --kind {stn,ltn}                  ~  Train/pseudo_labels_generator_{spatio,temporal}.py
  evaluate                                     ~  Test/evaluation_*.py
  coteach                                      ~  Train/spatio_transformer_MIL_CE.py + README pipeline

Arbitrary config fields can be overridden with --set path=value (typed by the
dataclass field), e.g. --set optim.lr_encoder=3e-4 --set encoder.n_layers=2.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import typing

from ..config import PRESETS, TrainConfig, preset, replace
from ..utils.logging import get_logger, log_config


def _maybe_force_platform():
    """LSTC_VAD_PLATFORM=cpu|tpu: force the jax platform from the
    environment.  Needed because some site configurations override
    JAX_PLATFORMS in sitecustomize — jax.config wins over the env var."""
    import os

    p = os.environ.get("LSTC_VAD_PLATFORM")
    if p:
        import jax

        jax.config.update("jax_platforms", p)


def _maybe_enable_compile_cache():
    """Opt-in persistent XLA compilation cache: LSTC_VAD_COMPILE_CACHE=<dir>.

    First compiles of the full-dims programs cost minutes on remote-attached
    TPUs; with the cache, every later CLI invocation (train/evaluate/
    gen-pseudo/coteach rounds in separate processes) reuses the lowered
    binaries instead of recompiling per process."""
    import os

    path = os.environ.get("LSTC_VAD_COMPILE_CACHE")
    if not path or path.lower() in ("0", "off", "false"):
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def _valid_paths(cfg) -> list:
    out = []

    def walk(node, prefix):
        for f in dataclasses.fields(node):
            val = getattr(node, f.name)
            if dataclasses.is_dataclass(val):
                walk(val, f"{prefix}{f.name}.")
            else:
                out.append(f"{prefix}{f.name}")

    walk(cfg, "")
    return out


def _parse_typed(raw: str, t, path: str):
    import types

    origin = typing.get_origin(t)
    # Optional[...] — both typing.Union and PEP 604 `X | None` spellings
    if origin is typing.Union or origin is getattr(types, "UnionType", None):
        if raw == "None":
            return None
        inner = [a for a in typing.get_args(t) if a is not type(None)]
        return _parse_typed(raw, inner[0], path)
    if t is bool:
        low = raw.lower()
        if low in ("1", "true", "yes", "on"):
            return True
        if low in ("0", "false", "no", "off"):
            return False
        raise SystemExit(f"--set {path}: expected a bool, got {raw!r}")
    if t in (int, float):
        try:
            return t(raw)
        except ValueError:
            raise SystemExit(f"--set {path}: expected {t.__name__}, "
                             f"got {raw!r}") from None
    if t is str:
        return raw
    if origin is tuple:
        args = typing.get_args(t)
        items = [s for s in raw.strip("()[] ").replace(",", " ").split() if s]
        if len(args) == 2 and args[1] is Ellipsis:
            elem_types = [args[0]] * len(items)
        else:
            if len(items) != len(args):
                raise SystemExit(f"--set {path}: expected {len(args)} "
                                 f"tuple elements, got {len(items)}")
            elem_types = args
        return tuple(_parse_typed(s, et, path)
                     for s, et in zip(items, elem_types))
    raise SystemExit(f"--set {path}: unsupported field type {t}")


def _coerce(cfg, path: str, raw: str):
    """Parse ``raw`` against the dataclass field's resolved annotation.
    Unknown paths fail at parse time with the full list of valid ones —
    not as a confusing downstream error (cf. the ~60-flag argparse surface
    this replaces, Train/temporal_transformer_shanghaitech.py:257-323)."""
    node = cfg
    parts = path.split(".")
    try:
        for p in parts[:-1]:
            node = getattr(node, p)
        hints = typing.get_type_hints(type(node))
        t = hints[parts[-1]]
    except (AttributeError, KeyError, TypeError):
        raise SystemExit(
            f"--set: unknown config path {path!r}.\nValid paths: "
            + ", ".join(_valid_paths(cfg))) from None
    return _parse_typed(raw, t, path)


def _apply_common(cfg: TrainConfig, args) -> TrainConfig:
    kw = {}
    mapping = {
        "h5": "data.h5_path", "train_txt": "data.train_txt",
        "test_txt": "data.test_txt", "mask_dir": "data.test_mask_dir",
        "mask_h5": "data.test_mask_h5",
        "pseudo_labels": "data.pseudo_labels_path",
        "batch_size": "data.batch_size", "seed": "data.seed",
        "epochs": "epochs", "save_dir": "model_save_dir",
        "metrics_jsonl": "metrics_jsonl",
    }
    if getattr(args, "seed", None) is not None:
        kw["seed"] = args.seed  # param-init + dropout PRNG, like set_seeds
    for arg_name, cfg_path in mapping.items():
        val = getattr(args, arg_name, None)
        if val is not None:
            kw[cfg_path] = val
    cfg = replace(cfg, **kw) if kw else cfg
    for item in args.set or []:
        path, _, raw = item.partition("=")
        cfg = replace(cfg, **{path: _coerce(cfg, path, raw)})
    return cfg


def _add_common(p):
    p.add_argument("--preset", required=True, choices=sorted(PRESETS))
    p.add_argument("--h5")
    p.add_argument("--train-txt", dest="train_txt")
    p.add_argument("--test-txt", dest="test_txt")
    p.add_argument("--mask-dir", dest="mask_dir")
    p.add_argument("--mask-h5", dest="mask_h5")
    p.add_argument("--pseudo-labels", dest="pseudo_labels")
    p.add_argument("--batch-size", dest="batch_size", type=int)
    p.add_argument("--seed", type=int)
    p.add_argument("--epochs", type=int)
    p.add_argument("--save-dir", dest="save_dir")
    p.add_argument("--log-dir", dest="log_dir",
                   help="write a log file here (train/evaluate/gen-pseudo; "
                        "other commands report on stderr/stdout only)")
    p.add_argument("--metrics-jsonl", dest="metrics_jsonl",
                   help="append structured per-epoch/eval metrics (one JSON "
                        "line each) to this file")
    p.add_argument("--set", action="append", metavar="PATH=VALUE",
                   help="override any config field, e.g. optim.lr_encoder=3e-4")


def _build_mesh(spec: str, n_head: int):
    """--mesh 'auto' (factor all visible devices into dp x tp) or 'DPxTP'
    (e.g. 2x4).  Returns a ('data','model') jax Mesh; XLA GSPMD inserts the
    gradient all-reduce over 'data' and activation collectives over 'model'
    (parallel/mesh.py)."""
    import re as _re

    import jax

    from ..parallel.mesh import factor_devices, make_mesh

    if spec == "auto":
        dp, tp = factor_devices(len(jax.devices()), n_head)
    else:
        m = _re.fullmatch(r"(\d+)x(\d+)", spec)
        if not m:
            raise SystemExit(
                f"--mesh must be 'auto' or 'DPxTP' (e.g. 2x4), got {spec!r}")
        dp, tp = int(m.group(1)), int(m.group(2))
        if tp > 1 and n_head % tp:
            raise SystemExit(f"--mesh model axis {tp} must divide the head "
                             f"count {n_head}")
        if dp * tp > len(jax.devices()):
            raise SystemExit(f"--mesh {dp}x{tp} needs {dp * tp} devices, "
                             f"have {len(jax.devices())}")
    return make_mesh(dp, tp)


def _mesh_from_args(args, n_head: int):
    return (_build_mesh(args.mesh, n_head)
            if getattr(args, "mesh", None) else None)


def _multihost_mesh(args, n_head: int, logger=None):
    """--multihost: jax.distributed init (BEFORE any other jax use) + the
    global ('data','model') mesh over all hosts' devices."""
    if getattr(args, "mesh", None):
        raise SystemExit("--multihost builds the global mesh itself (model "
                         "axis auto-factored per host); drop --mesh")
    from ..parallel.distributed import (initialize_multihost,
                                        make_global_mesh)

    if args.multihost == "auto":
        initialize_multihost()  # pod env auto-detection
    else:
        if args.num_processes is None or args.process_id is None:
            raise SystemExit("--multihost COORD:PORT needs "
                             "--num-processes and --process-id")
        initialize_multihost(args.multihost, args.num_processes,
                             args.process_id)
    mesh = make_global_mesh(n_head)
    if logger is not None:
        import jax

        logger.info("multihost: process %d/%d, global mesh data=%d model=%d",
                    jax.process_index(), jax.process_count(),
                    mesh.shape["data"], mesh.shape["model"])
    return mesh


def _ucf_final_eval_shapes(cfg):
    """The UCF LTN final eval builds the encoder at part_len=2 and its
    ckpts carry the window_depth=2 RPE table (Test/evaluation_UCF.py:33,42 +
    README command --part_len 2) — evaluate and export-aot share this
    override."""
    if cfg.data.dataset == "UCF" and not cfg.model.startswith("stn"):
        return replace(cfg, **{"encoder.window_depth": 2,
                               "data.part_len": 2})
    return cfg


def _eval_token_len(cfg) -> int:
    """Sequence length of one eval part: a single clip's patches for STN,
    part_len clips for LTN."""
    return (cfg.data.n_patch if cfg.model.startswith("stn")
            else cfg.data.part_len * cfg.data.n_patch)


def _load_eval_artifact(path: str, cfg, need_len: int):
    """Load an AOT scorer artifact and fail fast on head-kind / d_model /
    token-length mismatches (a mid-run ValueError would waste the whole
    data-loading/compile setup on remote-attached TPUs)."""
    from ..export import load_scorer

    loaded = load_scorer(path)
    if loaded.meta["kind"] != cfg.head.kind:
        raise SystemExit(
            f"artifact head kind {loaded.meta['kind']!r} does "
            f"not match the preset's {cfg.head.kind!r}")
    if loaded.meta["d_model"] != cfg.encoder.d_model:
        raise SystemExit(
            f"artifact d_model {loaded.meta['d_model']} != "
            f"preset encoder.d_model {cfg.encoder.d_model}")
    if need_len not in loaded.token_lens:
        raise SystemExit(
            f"artifact has no program for {need_len}-token parts "
            f"(token_lens={loaded.token_lens}); re-export with "
            "the matching preset/--set shapes")
    return loaded


def _check_artifact_tails(loaded, cfg, cmd: str):
    """No-rewindow LTN paths score tails at their TRUE length: the artifact
    needs a program per possible tail length (export-aot --tails), checked
    BEFORE any store walk — a missing tail program would otherwise die
    mid-run after minutes of scoring."""
    d = cfg.data
    if d.dataset == "UCF":
        # fixed max_clips bins: the one possible tail length is known
        tails = {(cfg.max_clips % d.part_len) * d.n_patch} - {0}
    else:
        tails = set(range(d.n_patch, _eval_token_len(cfg), d.n_patch))
    missing = sorted(tails - set(loaded.token_lens))
    if missing:
        msg = (f"artifact lacks programs for tail parts of "
               f"{missing} tokens; re-export with --tails")
        if d.dataset == "UCF":
            # max_clips % part_len != 0: a tail part ALWAYS occurs
            raise SystemExit(msg)
        print(f"[{cmd}] warning: {msg} — videos whose clip count is not a "
              "part_len multiple will fail", file=sys.stderr)


def _warn_if_random_init(args, cmd: str):
    """evaluate/gen-pseudo with no checkpoint flags score fresh random-init
    params — legitimate only for smoke tests, so say so loudly (a silent
    'auc = 0.5x' or a garbage pseudo-label artifact poisoning the next
    co-teaching round looks real otherwise)."""
    if not (getattr(args, "ckpt", None) or args.torch_ckpt
            or args.encoder_ckpt or args.head_ckpt):
        print(f"[{cmd}] no --ckpt/--torch-ckpt/--artifact: scoring with "
              "fresh RANDOM-INIT params (smoke-test mode)", file=sys.stderr)


def _wrap_artifact(scorer, loaded, expect_l2: bool):
    """Slot the artifact's serialized programs into a scorer's inner
    VideoScorer (evaluation/scoring.py::ArtifactVideoScorer)."""
    if loaded.meta.get("l2_normalize", False) != expect_l2:
        raise SystemExit(
            f"this path needs l2_normalize={expect_l2} baked into the "
            "artifact (export-aot --l2 for the UCF final eval, without it "
            "otherwise)")
    from ..evaluation.scoring import ArtifactVideoScorer

    scorer.scorer = ArtifactVideoScorer(loaded)
    return scorer


def _load_params(args, trainer):
    """Load checkpoints over the fresh params.

    - torch state_dicts: --torch-ckpt with BOTH --encoder-ckpt/--head-ckpt
    - Orbax: --ckpt DIR (one directory holds the full {'encoder','head'} tree)
    """
    params = trainer.state.params
    if args.torch_ckpt:
        if not (args.encoder_ckpt and args.head_ckpt):
            raise SystemExit("--torch-ckpt needs both --encoder-ckpt and "
                             "--head-ckpt (the reference saves two files)")
        from ..ckpt.torch_import import import_torch_checkpoint

        params, report = import_torch_checkpoint(
            args.encoder_ckpt, args.head_ckpt, params)
        if report["skipped"]:
            print(f"[ckpt] skipped keys: {report['skipped']}",
                  file=sys.stderr)
    elif args.encoder_ckpt or args.head_ckpt:
        raise SystemExit("--encoder-ckpt/--head-ckpt are for torch "
                         "state_dicts (add --torch-ckpt); Orbax checkpoints "
                         "hold both submodules — pass --ckpt DIR")
    elif getattr(args, "ckpt", None):
        params = _load_orbax_params(args.ckpt, trainer.state)
    trainer.state = trainer.state.replace(params=params)
    return trainer


def cmd_train(args):
    cfg = _apply_common(preset(args.preset), args)
    logger = get_logger("train", log_dir=args.log_dir)
    log_config(logger, cfg)
    from ..train.driver import Trainer

    if getattr(args, "multihost", None):
        mesh = _multihost_mesh(args, cfg.encoder.n_head, logger)
    else:
        mesh = _mesh_from_args(args, cfg.encoder.n_head)
        if mesh is not None:
            logger.info("mesh: data=%d model=%d",
                        mesh.shape["data"], mesh.shape["model"])
    trainer = Trainer(cfg, logger=logger, mesh=mesh)
    if args.resume:
        trainer.restore_state(args.resume)
        logger.info("resumed from %s at step %d", args.resume,
                    int(trainer.state.step))
    result = trainer.fit(epochs=args.epochs)
    if args.save_state:
        trainer.save_state(args.save_state)
        logger.info("saved full train state to %s", args.save_state)
    if args.save_best:
        # the reference keeps the checkpoint from the best-AUC epoch, not
        # the last one (spatio_transformer_shanghaitech.py:177-191 saves on
        # improvement); best_params is that snapshot.  Falls back to final
        # params when no eval ever ran (inter_epoch > epochs).
        from ..ckpt import save_checkpoint

        best = (trainer.best_params if trainer.best_params is not None
                else trainer.state.params)
        save_checkpoint(args.save_best, best)
        gate_auc, gate_ep = ((result.best_train_auc,
                              result.best_train_epoch)
                             if cfg.eval_train_split else
                             (result.best_test_auc,
                              result.best_test_epoch))
        logger.info("saved best-gate params to %s (gate AUC %.4f @%d)",
                    args.save_best, gate_auc, gate_ep)
    logger.info("best test AUC %.4f @%d, best train AUC %.4f @%d",
                result.best_test_auc, result.best_test_epoch,
                result.best_train_auc, result.best_train_epoch)
    return 0


def cmd_gen_pseudo(args):
    cfg = _apply_common(preset(args.preset), args)
    from ..data.datasets import load_train_records
    from ..evaluation.scoring import (ClipScorer, PartScorer,
                                      UCFBinnedScorer)
    from ..pseudo import (generate_ltn_pseudo_labels,
                          generate_stn_pseudo_labels, save_pseudo_labels)
    from ..train.driver import Trainer

    if args.threshold is None:
        args.threshold = 0.9 if args.kind == "stn" else 0.65
    if (args.kind == "stn") != cfg.model.startswith("stn"):
        # the scorer kind keys the artifact token-length fail-fast AND the
        # scorer construction below off the preset's shapes: a mismatch
        # passes the pre-checks against the wrong length and dies mid-run
        raise SystemExit(
            f"--kind {args.kind} does not match the preset's model "
            f"{cfg.model!r} — pseudo labels are generated with the preset's "
            "encoder/head (pick the matching preset)")
    mesh = _mesh_from_args(args, cfg.encoder.n_head)
    loaded_artifact = None
    if getattr(args, "artifact", None):
        if args.torch_ckpt or args.ckpt or args.encoder_ckpt \
                or args.head_ckpt:
            raise SystemExit("--artifact already contains the params — drop "
                             "--ckpt/--torch-ckpt/--encoder-ckpt/--head-ckpt")
        if mesh is not None:
            raise SystemExit("--mesh shards the live flax scorer; AOT "
                             "artifacts run their own serialized "
                             "partitioning — drop one")
        loaded_artifact = _load_eval_artifact(args.artifact, cfg,
                                              _eval_token_len(cfg))
    logger = get_logger("gen-pseudo", log_dir=args.log_dir) \
        if args.log_dir else None
    trainer = Trainer(cfg, eval_only=True, mesh=mesh, logger=logger)
    if loaded_artifact is None:
        _warn_if_random_init(args, "gen-pseudo")
        trainer = _load_params(args, trainer)
    d = cfg.data
    store = trainer.store
    if d.ten_crop:
        if d.eval_crop is None:
            raise SystemExit("tenCrop pseudo generation needs "
                             "--set data.eval_crop=<0-9>")
        from ..data.feature_store import CropView

        store = CropView(store, d.eval_crop)
    records = load_train_records(d.dataset, d.train_txt)
    if args.kind == "stn":
        scorer = ClipScorer(trainer.eval_encoder, trainer.head, d.n_patch,
                            kind=cfg.head.kind, sharding=trainer.sharding,
                            transfer_dtype=d.eval_transfer_dtype)
        if loaded_artifact is not None:
            scorer = _wrap_artifact(scorer, loaded_artifact, expect_l2=False)
        pseudo = generate_stn_pseudo_labels(trainer.state.params, scorer,
                                            store, records,
                                            args.threshold)
    else:
        if d.dataset == "UCF":
            # max_clips: the reference generator hardcodes 32 bins
            # (Train/pseudo_labels_generator_temporal.py:70); cfg.max_clips
            # defaults to that and a --set override stays consistent with
            # the eval path's
            scorer = UCFBinnedScorer(trainer.eval_encoder, trainer.head,
                                     d.part_len, d.n_patch,
                                     max_clips=cfg.max_clips,
                                     l2_normalize=False, tail_rewindow=False,
                                     sharding=trainer.sharding,
                                     transfer_dtype=d.eval_transfer_dtype)
        else:
            scorer = PartScorer(trainer.eval_encoder, trainer.head,
                                d.part_len, d.n_patch, tail_rewindow=False,
                                sharding=trainer.sharding,
                                transfer_dtype=d.eval_transfer_dtype)
        if loaded_artifact is not None:
            _check_artifact_tails(loaded_artifact, cfg, "gen-pseudo")
            scorer = _wrap_artifact(scorer, loaded_artifact, expect_l2=False)
        pseudo = generate_ltn_pseudo_labels(trainer.state.params, scorer,
                                            store, records,
                                            args.threshold,
                                            dataset=d.dataset,
                                            segment_len=d.segment_len)
    save_pseudo_labels(args.out, pseudo)
    print(f"pseudo labels ({args.kind}, threshold {args.threshold}) "
          f"-> {args.out}")
    return 0


def cmd_evaluate(args):
    cfg = _ucf_final_eval_shapes(_apply_common(preset(args.preset), args))
    from ..evaluation.drivers import (evaluate_ltn, evaluate_multicrop_mean,
                                      evaluate_stn, evaluate_ucf_ltn,
                                      evaluate_ucf_stn)
    from ..evaluation.scoring import UCFBinnedScorer
    from ..train.driver import Trainer

    if args.eval_crop and args.eval_crop != "mean":
        try:
            crop = int(args.eval_crop)
        except ValueError:
            raise SystemExit(f"--eval-crop must be 0-9 or 'mean', got "
                             f"{args.eval_crop!r}") from None
        if not 0 <= crop <= 9:
            raise SystemExit(f"--eval-crop index out of range 0-9: {crop}")
        cfg = replace(cfg, **{"data.eval_crop": crop})
    if args.dump_scores and args.per_class:
        raise SystemExit("--dump-scores exports per-video eval scores; it "
                         "cannot be combined with --per-class")
    if args.bootstrap is not None:
        if args.bootstrap < 1:
            raise SystemExit(f"--bootstrap needs N >= 1, got {args.bootstrap}")
        if args.per_class:
            raise SystemExit("--bootstrap applies to the per-video eval; it "
                             "cannot be combined with --per-class")
    mesh = _mesh_from_args(args, cfg.encoder.n_head)
    if mesh is not None and args.artifact:
        raise SystemExit("--mesh shards the live flax scorer; AOT artifacts "
                         "run their own serialized partitioning — drop one")
    logger = get_logger("evaluate", log_dir=args.log_dir) \
        if args.log_dir else None
    trainer = Trainer(cfg, eval_only=True, mesh=mesh, logger=logger)
    loaded_artifact = None
    if args.artifact:
        if args.torch_ckpt or args.ckpt or args.encoder_ckpt \
                or args.head_ckpt:
            raise SystemExit("--artifact already contains the params — drop "
                             "--ckpt/--torch-ckpt/--encoder-ckpt/--head-ckpt")
        loaded_artifact = _load_eval_artifact(args.artifact, cfg,
                                              _eval_token_len(cfg))
        # UCF LTN final eval ONLY uses ucf_final_scorer() (l2 baked in);
        # every other path scores through the Trainer's scorer (no l2)
        if cfg.data.dataset != "UCF" or cfg.model.startswith("stn"):
            if not cfg.model.startswith("stn") \
                    and not cfg.eval_tail_rewindow:
                # no-rewindow LTN eval scores tails at true length — same
                # fail-fast gen-pseudo has, before minutes of scoring
                _check_artifact_tails(loaded_artifact, cfg, "evaluate")
            trainer.scorer = _wrap_artifact(trainer.scorer, loaded_artifact,
                                            expect_l2=False)
    else:
        _warn_if_random_init(args, "evaluate")
        trainer = _load_params(args, trainer)
    params = trainer.state.params
    d = cfg.data

    def ucf_final_scorer():
        # final-eval flags (Test/evaluation_UCF.py): part_len 2, fixed 32
        # bins from n_frames//16, L2-normalized features — shared by the
        # headline AUC and the per-class table
        scorer = UCFBinnedScorer(trainer.eval_encoder, trainer.head,
                                 part_len=2,
                                 n_patch=d.n_patch, max_clips=cfg.max_clips,
                                 l2_normalize=True, tail_rewindow=True,
                                 sharding=trainer.sharding,
                                 transfer_dtype=d.eval_transfer_dtype)
        if loaded_artifact is not None:
            scorer = _wrap_artifact(scorer, loaded_artifact, expect_l2=True)
        return scorer

    if args.per_class:
        # per-anomaly-class table (reference eval_utils.py:97-122)
        if d.dataset != "UCF" or cfg.model.startswith("stn"):
            raise SystemExit("--per-class is the UCF per-anomaly-class "
                             "breakdown (LTN presets)")
        from ..data.annotations import parse_ucf_test
        from ..evaluation.drivers import evaluate_ucf_per_class

        classes = [r.class_name for r in parse_ucf_test(d.test_txt)]
        items = [(trainer._lazy_feat(v), v.anno, v.n_frames // d.segment_len)
                 for v in trainer.test_videos]
        far, mean_ap = evaluate_ucf_per_class(
            params, ucf_final_scorer(), items, classes, d.segment_len,
            n_anomaly_classes=args.n_anomaly_classes)
        print(f"Normal FAR {far:.4f}, mean PR-AUC {mean_ap:.4f}")
        trainer._emit_metrics({"kind": "per_class_eval", "far": float(far),
                               "mean_pr_auc": float(mean_ap),
                               "dataset": d.dataset})
        return 0
    rl = bool(args.bootstrap)
    want = dict(return_scores=bool(args.dump_scores), return_labels=rl)
    extra_record = {}
    if args.eval_crop == "mean":
        # 10-crop averaged eval over the tenCrop test loaders
        if not d.ten_crop:
            raise SystemExit("--eval-crop mean needs a tenCrop store "
                             "(--set data.ten_crop=true)")
        if d.dataset == "UCF":
            raise SystemExit(
                "tenCrop eval semantics exist for SHT/UBnormal only "
                "(utils/load_dataset.py:338-362,731-755; the reference's "
                "UCF_test_tenCrop at :494-509 is an identical copy of "
                "UCF_test with no crop axis)")
        # crop-major iteration with per-crop lazy reads: each crop pass
        # re-reads one video at a time through the lazy handles and the
        # 4-D array is freed as soon as its crop slice is copied out — peak
        # RSS stays near ONE video (x10 reads), instead of pinning every
        # video's whole 10-crop array for the full eval (the reference
        # tenCrop loaders were eager, utils/load_dataset.py:338-362)

        def items_for_crop(c):
            return [((lambda v=v, c=c: v.feat[:, c]), v.anno)
                    for v in trainer.test_videos]

        fn = evaluate_stn if cfg.model.startswith("stn") else evaluate_ltn
        result = evaluate_multicrop_mean(fn, params, trainer.scorer,
                                         items_for_crop, d.segment_len,
                                         **want)
        extra_record = {"eval_crop": "mean"}
    elif d.dataset == "UCF":
        items = [(trainer._lazy_feat(v), v.anno,
                  v.n_frames // d.segment_len)
                 for v in trainer.test_videos]
        if cfg.model.startswith("stn"):
            # same scorer the Trainer built (UCFClipBinScorer)
            result = evaluate_ucf_stn(params, trainer.scorer, items,
                                      d.segment_len, **want)
        else:
            result = evaluate_ucf_ltn(params, ucf_final_scorer(), items,
                                      d.segment_len, **want)
    else:
        # SHT/UBnormal final eval == the in-training eval semantics; reuse
        # the Trainer's scorer and item building
        items = trainer._test_items()
        if cfg.model.startswith("stn"):
            result = evaluate_stn(params, trainer.scorer, items,
                                  d.segment_len, **want)
        else:
            result = evaluate_ltn(params, trainer.scorer, items,
                                  d.segment_len, **want)
    per_video = per_labels = None
    if rl:
        auc, per_video, per_labels = result
    elif args.dump_scores:
        auc, per_video = result
    else:
        auc = result
    if args.dump_scores:
        import numpy as np

        np.savez(args.dump_scores,
                 **{v.key: s for v, s in zip(trainer.test_videos, per_video)})
        print(f"frame scores -> {args.dump_scores}")
    print(f"auc = {auc}")
    record = {"kind": "final_eval", "auc": float(auc),
              "dataset": d.dataset, "model": cfg.model, **extra_record}
    if rl:
        from ..evaluation.metrics import bootstrap_auc_ci

        lo, hi = bootstrap_auc_ci(per_video, per_labels,
                                  n_boot=args.bootstrap)
        print(f"95% CI [{lo:.4f}, {hi:.4f}] "
              f"({args.bootstrap} video-level bootstrap resamples)")
        record |= {"auc_ci_lo": lo, "auc_ci_hi": hi,
                   "n_bootstrap": args.bootstrap}
    trainer._emit_metrics(record)
    return 0


def cmd_coteach(args):
    stn_cfg = _apply_common(preset(args.stn_preset), args)
    ltn_cfg = _apply_common(preset(args.ltn_preset), args)
    from ..pseudo import CoTeachingDriver

    if getattr(args, "multihost", None):
        mesh = _multihost_mesh(args, stn_cfg.encoder.n_head)
    else:
        mesh = _mesh_from_args(args, stn_cfg.encoder.n_head)
    driver = CoTeachingDriver(stn_cfg, ltn_cfg, args.workdir,
                              stn_threshold=args.stn_threshold,
                              ltn_threshold=args.ltn_threshold, mesh=mesh)
    driver.run(args.rounds, args.stn_epochs, args.ltn_epochs)
    return 0


def cmd_info(_args):
    """Operator diagnostics: package/jax versions, visible devices and their
    memory, the mesh `--mesh auto` would build, and cache/env knobs — the
    first thing to ask for when a remote-attached TPU misbehaves."""
    import os

    import jax

    from .. import __version__
    from ..parallel.mesh import factor_devices

    print(f"lstc_vad_tpu {__version__} | jax {jax.__version__} | "
          f"backend {jax.default_backend()}")
    devices = jax.devices()
    print(f"process {jax.process_index()}/{jax.process_count()}, "
          f"{len(devices)} visible device(s):")
    for dev in devices:
        line = f"  [{dev.id}] {dev.platform}:{dev.device_kind}"
        stats = getattr(dev, "memory_stats", lambda: None)()
        if stats and "bytes_limit" in stats:
            used = stats.get("bytes_in_use", 0) / 1e9
            limit = stats["bytes_limit"] / 1e9
            line += f"  {used:.2f}/{limit:.2f} GB HBM in use"
        print(line)
    n_head = 8  # default preset head count; --mesh auto uses the real one
    dp, tp = factor_devices(len(devices), n_head)
    print(f"--mesh auto would build data={dp} x model={tp}")
    for var in ("LSTC_VAD_COMPILE_CACHE", "LSTC_VAD_PLATFORM"):
        print(f"{var}={os.environ.get(var, '<unset>')}")
    print(f"presets: {', '.join(sorted(PRESETS))}")
    return 0


def cmd_pack(args):
    from ..data.packed import pack_h5

    pack_h5(args.h5, args.out)
    print(f"packed {args.h5} -> {args.out}")
    return 0


def cmd_benchmark(_args):
    from ..benchmark import main as bench_main

    bench_main()
    return 0


def _load_orbax_params(ckpt_dir: str, state):
    """Orbax checkpoints come in two layouts: AUC-gated saves hold bare
    params (Trainer.fit), --save-state artifacts hold the full TrainState."""
    from ..ckpt import load_checkpoint

    try:
        return load_checkpoint(ckpt_dir, state.params)
    except (ValueError, KeyError):
        return load_checkpoint(ckpt_dir, state).params


def cmd_export_torch(args):
    """Export an Orbax checkpoint as the two reference-format torch
    state_dict files (encoder + head), so TPU-trained weights can be scored
    by the reference's own scripts
    (Test/evaluation_shanghaitech_ubnormal.py:35-62)."""
    cfg = _apply_common(preset(args.preset), args)
    from ..ckpt.torch_export import save_torch_checkpoint
    from ..train.state import create_train_state

    state, _, _, _ = create_train_state(cfg)
    params = _load_orbax_params(args.ckpt, state)
    save_torch_checkpoint(params, args.encoder_out, args.head_out,
                          cfg.head.kind, cfg.encoder)
    print(f"wrote {args.encoder_out} and {args.head_out}")
    return 0


def cmd_profile(args):
    """Capture a device trace (TensorBoard/XProf) of the jitted train or
    eval step at the preset's real shapes on synthetic data — compile and
    warm-up excluded, only steady-state steps traced."""
    import numpy as np

    cfg = _apply_common(preset(args.preset), args)
    from ..train.state import create_train_state
    from ..utils.profiling import trace

    state, encoder, head, tx = create_train_state(cfg)
    d, dd = cfg.encoder.d_model, cfg.data
    rng = np.random.default_rng(0)
    import jax

    if args.mode == "train":
        from ..train import steps as steps_mod

        maker = {"stn": steps_mod.make_stn_train_step,
                 "stn_bce": steps_mod.make_stn_bce_train_step,
                 "ltn": steps_mod.make_ltn_train_step}[cfg.model]
        step_fn = maker(encoder, head, cfg, tx)
        fshape = (dd.batch_size, dd.part_num * dd.part_len, dd.n_patch, d)
        norm = jax.device_put(rng.standard_normal(fshape).astype(np.float32))
        abnorm = jax.device_put(
            rng.standard_normal(fshape).astype(np.float32))
        labs = jax.device_put(
            rng.random((dd.batch_size, dd.part_num * dd.part_len))
            .astype(np.float32))

        def one_step():
            nonlocal state
            state, m = step_fn(state, norm, labs, abnorm, labs)
            return m["loss"]
    else:
        tokens = _eval_token_len(cfg)

        @jax.jit
        def apply(params, x):
            h = encoder.apply({"params": params["encoder"]}, x,
                              deterministic=True)
            return head.apply({"params": params["head"]}, h[:, 0, :],
                              deterministic=True)

        x = jax.device_put(rng.standard_normal(
            (args.eval_batch, tokens, d)).astype(np.float32))
        params = state.params
        one_step = lambda: apply(params, x)  # noqa: E731

    float(np.asarray(one_step()).sum())     # compile
    float(np.asarray(one_step()).sum())     # warm
    with trace(args.out):
        last = None
        for _ in range(args.steps):
            last = one_step()
        float(np.asarray(last).sum())        # drain inside the trace window
    print(f"trace written to {args.out} "
          f"({args.steps} {args.mode} steps; view with TensorBoard/XProf)")
    return 0


def cmd_sweep(args):
    """Grid search over config fields: the reference's workflow of hand-
    tuning ~60 argparse flags across runs
    (Train/temporal_transformer_shanghaitech.py:257-323), automated.  Each
    --grid PATH=v1,v2,... axis is typed like --set; the cartesian product
    trains fresh models and the ranked AUCs are printed and appended as
    JSON lines to --out."""
    import itertools
    import json

    base = _apply_common(preset(args.preset), args)
    axes = []
    for item in args.grid or []:
        path, _, raw = item.partition("=")
        values = [v for v in raw.split(",") if v]
        if not values:
            raise SystemExit(f"--grid {path}: needs at least one value")
        if any(path == seen for seen, _ in axes):
            raise SystemExit(f"--grid {path}: duplicate axis (the later one "
                             "would silently shadow the earlier)")
        axes.append((path, [_coerce(base, path, v) for v in values]))
    if not axes:
        raise SystemExit("sweep needs at least one --grid PATH=v1,v2,...")

    from ..train.driver import Trainer

    mesh = _mesh_from_args(args, base.encoder.n_head)
    results = []
    combos = list(itertools.product(*(vals for _, vals in axes)))
    for i, combo in enumerate(combos):
        overrides = {path: val for (path, _), val in zip(axes, combo)}
        cfg = base
        for path, val in overrides.items():
            cfg = replace(cfg, **{path: val})
        trainer = Trainer(cfg, mesh=mesh)
        r = trainer.fit(epochs=args.epochs)
        gate = (r.best_train_auc if cfg.eval_train_split else r.best_test_auc)
        rec = {"run": i, **overrides, "best_test_auc": r.best_test_auc,
               "best_test_epoch": r.best_test_epoch,
               "best_train_auc": r.best_train_auc, "gate_auc": gate}
        results.append(rec)
        print(f"[sweep {i + 1}/{len(combos)}] {overrides} -> "
              f"test {r.best_test_auc:.4f}")
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")
    # rank by the SAME criterion the preset's model-selection gate uses
    # (train AUC for SHT presets, test AUC otherwise) unless told otherwise —
    # a test-AUC ranking could disagree with which checkpoints actually save
    rank_key = "gate_auc" if args.rank_by == "gate" else "best_test_auc"
    results.sort(key=lambda r: -r[rank_key])
    print(f"rank  {'gate_auc':>8}  test_auc  overrides")
    for rank, rec in enumerate(results, 1):
        overrides = {k: v for k, v in rec.items()
                     if k not in ("run", "best_test_auc", "best_test_epoch",
                                  "best_train_auc", "gate_auc")}
        print(f"{rank:>4}  {rec['gate_auc']:8.4f}  "
              f"{rec['best_test_auc']:.4f}  {overrides}")
    return 0


def cmd_validate_data(args):
    """Walk every data artifact the config points at and report ALL
    inconsistencies (missing keys/masks, shape mismatches, short videos,
    pseudo-label gaps) — instead of the reference's first-KeyError-wins
    (utils/load_dataset.py:42,285-286,409)."""
    cfg = _apply_common(preset(args.preset), args)
    from ..data.validate import validate_data

    problems, stats = validate_data(cfg)
    print("stats: " + ", ".join(f"{k}={v}" for k, v in sorted(stats.items())))
    if problems:
        for p in problems:
            print(f"PROBLEM: {p}")
        print(f"{len(problems)} problem(s) found")
        return 1
    print("ok: all referenced data artifacts are consistent")
    return 0


def cmd_export_aot(args):
    """Serialize the eval scorer (StableHLO program + params) into a
    self-contained deployment artifact — loading needs only jax + numpy,
    no model code/config/retrace (lstc_vad_tpu/export.py)."""
    cfg = _apply_common(preset(args.preset), args)
    if not args.train_shapes:
        cfg = _ucf_final_eval_shapes(cfg)
    # exported artifacts are EVAL programs: f32 compute regardless of the
    # training compute_dtype, remat off (same rule as Trainer eval scorers)
    cfg = replace(cfg, **{"encoder.compute_dtype": "float32",
                          "encoder.remat": False})
    from ..export import save_scorer_artifact
    from ..train.state import create_train_state

    state, encoder, head, _ = create_train_state(cfg)
    params = _load_orbax_params(args.ckpt, state)
    token_len = _eval_token_len(cfg)
    tails = ()
    if args.tails:
        if cfg.model.startswith("stn"):
            raise SystemExit("--tails is for LTN presets (STN scores single "
                             "clips — there are no shorter tail parts)")
        # the no-re-window eval paths score tail parts at their true length
        # (distinct programs: the relative-PE slices by sequence length)
        tails = tuple(range(cfg.data.n_patch, token_len, cfg.data.n_patch))
    save_scorer_artifact(args.out, encoder, head, cfg.head.kind, params,
                         token_len, cfg.encoder.d_model,
                         l2_normalize=args.l2,
                         platforms=tuple(args.platforms.split(",")),
                         extra_token_lens=tails,
                         extra_meta={"n_patch": cfg.data.n_patch,
                                     "part_len": (1 if cfg.model.startswith(
                                         "stn") else cfg.data.part_len)})
    print(f"wrote AOT scorer artifact to {args.out}")
    return 0


def _live_serving_modules(args, cfg, tag):
    """Shared by ``serve``/``serve-backend``: load live params and return
    (encoder, head, params) with the encoder rebuilt as the canonical f32
    eval twin.  Train-only knobs (bf16 compute, remat, cast_sr) must not
    move served scores — and the rebuilt config must equal every other
    eval path's, or ``get_apply``'s shared-program cache key would fork."""
    import types

    from ..train.state import create_train_state

    state, encoder, head, _tx = create_train_state(cfg)
    if not (args.ckpt or args.encoder_ckpt or args.head_ckpt):
        print(f"[{tag}] no --ckpt/--artifact: serving fresh random-init "
              "params (smoke-test mode)", file=sys.stderr)
    holder = types.SimpleNamespace(state=state)
    holder = _load_params(args, holder)
    ec = cfg.encoder
    if ec.compute_dtype != "float32" or ec.remat or ec.cast_sr:
        from ..models import Encoder

        encoder = Encoder(dataclasses.replace(
            ec, compute_dtype="float32", remat=False, cast_sr=False))
    return encoder, head, holder.state.params


def _reject_ckpt_flags_with_artifact(args):
    if args.torch_ckpt or args.ckpt or args.encoder_ckpt or args.head_ckpt:
        raise SystemExit("--artifact already contains the params — drop "
                         "--ckpt/--torch-ckpt/--encoder-ckpt/--head-ckpt")


def cmd_serve(args):
    """Online scoring server over stdin/stdout: JSONL requests in, JSONL
    scores out (serving.serve_jsonl documents the protocol).  Backed by a
    live checkpoint (same loading flags as evaluate) or an AOT artifact —
    the artifact path needs no flax/model code in the serving process.
    Scores follow the offline part semantics exactly (PARITY.md
    'beyond-reference': online == offline parity is tested)."""
    from ..serving import StreamingScorer, serve_jsonl

    cfg = _apply_common(preset(args.preset), args)
    if args.max_streams < 1:
        raise SystemExit(f"--max-streams must be >= 1, got {args.max_streams}")
    # STN presets score single clips (part_len=1 + regressor); LTN scores
    # part_len-clip parts with the classifier's abnormal-class probability
    part_len = 1 if cfg.model.startswith("stn") else cfg.data.part_len
    if args.backend:
        # jax-FREE worker: protocol + stream buffers here, device calls
        # proxied to the serve-backend process (serving_mp.py); fan out one
        # worker per client pipe without N jax startups or device grants
        if args.artifact or args.torch_ckpt or args.ckpt \
                or args.encoder_ckpt or args.head_ckpt:
            raise SystemExit("--backend workers hold no params — they live "
                             "in the serve-backend process; drop "
                             "--ckpt/--torch-ckpt/--encoder-ckpt/"
                             "--head-ckpt/--artifact")
        from ..serving_mp import make_worker_scorer

        scorer = make_worker_scorer(args.backend, part_len, cfg.data.n_patch,
                                    cfg.encoder.d_model,
                                    max_streams=args.max_streams)
        n_push, n_scores = serve_jsonl(scorer, sys.stdin, sys.stdout,
                                       flush_every=args.flush_every)
        print(f"[serve] {n_push} clips in, {n_scores} scores out "
              f"(worker -> {args.backend})", file=sys.stderr)
        return 0
    if args.artifact:
        _reject_ckpt_flags_with_artifact(args)
        # the artifact's OWN baked part_len wins (export-aot records it; a
        # preset override would recompute n_patch and silently truncate
        # every pushed clip); only pre-part_len-meta artifacts fall back to
        # the preset windowing.  meta.json is read up front — loading the
        # artifact twice would deserialize every program and the params.npz
        # a second time just to learn the part_len.
        import json as _json
        import os

        baked = None
        try:
            with open(os.path.join(args.artifact, "meta.json")) as f:
                baked = _json.load(f).get("part_len")
        except (OSError, ValueError):
            pass  # missing/corrupt meta: from_artifact raises the real error
        scorer = StreamingScorer.from_artifact(
            args.artifact, max_streams=args.max_streams,
            part_len=part_len if baked is None else None)
    else:
        encoder, head, params = _live_serving_modules(args, cfg, "serve")
        scorer = StreamingScorer(
            encoder, head, params, part_len, cfg.data.n_patch,
            cfg.encoder.d_model, max_streams=args.max_streams,
            head_kind=cfg.head.kind,
            transfer_dtype=cfg.data.eval_transfer_dtype)
    n_push, n_scores = serve_jsonl(scorer, sys.stdin, sys.stdout,
                                   flush_every=args.flush_every)
    print(f"[serve] {n_push} clips in, {n_scores} scores out",
          file=sys.stderr)
    return 0


def cmd_serve_backend(args):
    """Device-owner half of multi-process serving (serving_mp.py): ONE jax
    process that coalesces token rows from N jax-free ``serve --backend``
    workers into padded device calls.  Params flags mirror ``serve``.
    Prints one JSON ready-line to stdout once listening (a supervisor can
    block on it), then serves until SIGINT/SIGTERM."""
    import json as _json

    import numpy as np

    cfg = _apply_common(preset(args.preset), args)
    if args.max_batch < 1:
        raise SystemExit(f"--max-batch must be >= 1, got {args.max_batch}")
    part_len = 1 if cfg.model.startswith("stn") else cfg.data.part_len
    if args.artifact:
        _reject_ckpt_flags_with_artifact(args)
        from ..export import load_scorer

        loaded = load_scorer(args.artifact)
        if loaded.meta.get("l2_normalize", False):
            raise SystemExit(
                "artifact was exported with --l2 (UCF final-eval feature "
                "normalize); serving uses the plain part semantics — "
                "export without --l2")
        baked_pl = loaded.meta.get("part_len")
        if baked_pl is not None:
            part_len = int(baked_pl)
        d_model = loaded.meta["d_model"]
        token_len = loaded.meta["token_len"]
        if token_len % part_len:
            # same validation as StreamingScorer.from_artifact: a silently
            # truncated n_patch would warm a token length the artifact has
            # no program for and advertise wrong dims on the ready line
            raise SystemExit(f"artifact token_len {token_len} is not "
                             f"divisible by part_len {part_len}")
        n_patch = token_len // part_len
        params = None
        apply_fn = lambda _p, tokens: loaded.score(  # noqa: E731
            np.asarray(tokens, dtype=np.float32))
    else:
        from ..evaluation.scoring import get_apply

        encoder, head, params = _live_serving_modules(args, cfg,
                                                      "serve-backend")
        apply_fn = get_apply(encoder, head, cfg.head.kind, False)
        d_model = cfg.encoder.d_model
        n_patch = cfg.data.n_patch

    from ..serving_mp import BatchingBackend

    backend = BatchingBackend(apply_fn, params, d_model,
                              max_batch=args.max_batch,
                              window_ms=args.window_ms)
    # pre-warm the full-part program so the first worker flush pays no
    # compile (tail lengths compile on first use)
    warm = np.zeros((args.max_batch, part_len * n_patch, d_model),
                    np.float32)
    np.asarray(apply_fn(params, warm))

    def ready():
        print(_json.dumps({"listening": args.socket,
                           "d_model": d_model, "max_batch": args.max_batch,
                           "part_len": part_len, "n_patch": n_patch}),
              flush=True)

    backend.serve_forever(args.socket, ready_fn=ready)
    print(f"[serve-backend] {backend.n_calls} device calls, "
          f"{backend.n_rows} rows", file=sys.stderr)
    return 0


def main(argv=None):
    _maybe_force_platform()
    _maybe_enable_compile_cache()
    parser = argparse.ArgumentParser(prog="lstc_vad_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train", help="train STN or LTN (preset decides)")
    _add_common(p)
    p.add_argument("--mesh", help="'auto' or 'DPxTP' (e.g. 2x4): shard the "
                                  "train step over a data x model device "
                                  "mesh")
    p.add_argument("--multihost", metavar="COORD",
                   help="multi-process training: jax.distributed coordinator "
                        "'host:port' (with --num-processes/--process-id), or "
                        "'auto' for TPU-pod env detection; builds the global "
                        "mesh over ALL hosts' devices (data axis spans DCN)")
    p.add_argument("--num-processes", dest="num_processes", type=int)
    p.add_argument("--process-id", dest="process_id", type=int)
    p.add_argument("--resume", help="restore full train state (Orbax dir)")
    p.add_argument("--save-state", dest="save_state",
                   help="save full train state after fitting")
    p.add_argument("--save-best", dest="save_best",
                   help="save the best-AUC epoch's params (Orbax dir), "
                        "like the reference's AUC-gated checkpoints")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("gen-pseudo", help="generate pseudo labels")
    _add_common(p)
    p.add_argument("--mesh", help="'auto' or 'DPxTP': shard scoring over a "
                                  "device mesh")
    p.add_argument("--kind", choices=("stn", "ltn"), required=True)
    p.add_argument("--threshold", type=float, default=None,
                   help="default: 0.9 for stn, 0.65 for ltn (README.md:27,35)")
    p.add_argument("--out", required=True)
    p.add_argument("--ckpt", help="Orbax params directory (encoder+head)")
    p.add_argument("--encoder-ckpt", dest="encoder_ckpt")
    p.add_argument("--head-ckpt", dest="head_ckpt")
    p.add_argument("--torch-ckpt", dest="torch_ckpt", action="store_true",
                   help="checkpoints are torch state_dicts")
    p.add_argument("--artifact",
                   help="AOT artifact directory (export-aot; use --tails "
                        "for LTN): generate through the serialized programs")
    p.set_defaults(fn=cmd_gen_pseudo)

    p = sub.add_parser("evaluate", help="frame-AUC evaluation")
    _add_common(p)
    p.add_argument("--mesh", help="'auto' or 'DPxTP': shard scoring over a "
                                  "device mesh")
    p.add_argument("--dump-scores", dest="dump_scores",
                   help="write per-video frame scores to this .npz")
    p.add_argument("--per-class", dest="per_class", action="store_true",
                   help="UCF: per-anomaly-class AUC/PR-AUC/FAR table")
    p.add_argument("--n-anomaly-classes", dest="n_anomaly_classes", type=int,
                   default=13, help="anomaly class count for the mean PR-AUC "
                                    "(UCF-Crime: 13)")
    p.add_argument("--eval-crop", dest="eval_crop",
                   help="tenCrop stores: crop index 0-9, or 'mean' for the "
                        "10-crop averaged eval")
    p.add_argument("--ckpt", help="Orbax params directory (encoder+head)")
    p.add_argument("--encoder-ckpt", dest="encoder_ckpt")
    p.add_argument("--head-ckpt", dest="head_ckpt")
    p.add_argument("--torch-ckpt", dest="torch_ckpt", action="store_true")
    p.add_argument("--artifact",
                   help="AOT artifact directory (export-aot): evaluate "
                        "through the serialized programs — params/model "
                        "code not needed")
    p.add_argument("--bootstrap", type=int, metavar="N",
                   help="report a 95%% CI from N video-level bootstrap "
                        "resamples alongside the point AUC")
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("coteach", help="alternating co-teaching rounds")
    _add_common_coteach(p)
    p.set_defaults(fn=cmd_coteach)

    p = sub.add_parser("benchmark", help="run bench.py")
    p.set_defaults(fn=cmd_benchmark)

    p = sub.add_parser("export-torch",
                       help="export an Orbax checkpoint as reference-format "
                            "torch state_dicts (encoder + head)")
    _add_common(p)
    p.add_argument("--ckpt", required=True,
                   help="Orbax directory (bare params or full train state)")
    p.add_argument("--encoder-out", dest="encoder_out", required=True)
    p.add_argument("--head-out", dest="head_out", required=True)
    p.set_defaults(fn=cmd_export_torch)

    p = sub.add_parser("profile",
                       help="capture a TensorBoard/XProf device trace of the "
                            "jitted train or eval step at preset shapes")
    _add_common(p)
    p.add_argument("--mode", choices=("train", "eval"), default="train")
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--eval-batch", dest="eval_batch", type=int, default=1024)
    p.add_argument("--out", required=True, help="trace log directory")
    p.set_defaults(fn=cmd_profile)

    p = sub.add_parser("sweep",
                       help="grid search: train every combination of "
                            "--grid PATH=v1,v2,... overrides, rank by AUC")
    _add_common(p)
    p.add_argument("--grid", action="append", metavar="PATH=V1,V2,...",
                   help="config axis to sweep (typed like --set); repeat "
                        "for a cartesian product")
    p.add_argument("--mesh", help="'auto' or 'DPxTP': shard every run")
    p.add_argument("--out", help="append one JSON line per run")
    p.add_argument("--rank-by", dest="rank_by", choices=("gate", "test"),
                   default="gate",
                   help="ranking criterion: 'gate' = the preset's model-"
                        "selection AUC (train split for SHT), 'test' = best "
                        "test AUC")
    p.set_defaults(fn=cmd_sweep)

    p = sub.add_parser("validate-data",
                       help="check h5/pack, annotation txts, frame masks and "
                            "pseudo labels for consistency (metadata-only, "
                            "reports every problem)")
    _add_common(p)
    p.set_defaults(fn=cmd_validate_data)

    p = sub.add_parser("export-aot",
                       help="serialize the eval scorer (StableHLO + params) "
                            "into a self-contained deployment artifact")
    _add_common(p)
    p.add_argument("--ckpt", required=True,
                   help="Orbax directory (bare params or full train state)")
    p.add_argument("--out", required=True, help="artifact directory")
    p.add_argument("--l2", action="store_true",
                   help="bake in the UCF eval-only L2 feature normalize "
                        "(Test/evaluation_UCF.py:77)")
    p.add_argument("--tails", action="store_true",
                   help="LTN: also bake programs for tail parts of 1.."
                        "part_len-1 clips (the no-re-window eval semantics)")
    p.add_argument("--train-shapes", dest="train_shapes", action="store_true",
                   help="UCF LTN: export at the TRAINING part shapes "
                        "(part_len from the preset) instead of the final-eval "
                        "override (part_len=2, Test/evaluation_UCF.py:42) — "
                        "required for gen-pseudo --artifact on UCF")
    p.add_argument("--platforms", default="tpu,cpu",
                   help="comma-separated lowering platforms")
    p.set_defaults(fn=cmd_export_aot)

    p = sub.add_parser("serve",
                       help="online scoring server: JSONL requests on stdin "
                            "(push/flush/end), JSONL scores on stdout")
    _add_common(p)
    p.add_argument("--ckpt", help="Orbax params directory (encoder+head)")
    p.add_argument("--encoder-ckpt", dest="encoder_ckpt")
    p.add_argument("--head-ckpt", dest="head_ckpt")
    p.add_argument("--torch-ckpt", dest="torch_ckpt", action="store_true",
                   help="checkpoints are torch state_dicts")
    p.add_argument("--artifact",
                   help="AOT artifact directory (export-aot, no --l2): "
                        "serve through the serialized programs — flax/model "
                        "code not needed")
    p.add_argument("--max-streams", dest="max_streams", type=int, default=64,
                   help="streams scored per device call (the compiled batch "
                        "shape)")
    p.add_argument("--flush-every", dest="flush_every", type=int, default=0,
                   metavar="K",
                   help="also flush after every K pushes (default: only on "
                        "explicit {\"op\": \"flush\"} requests)")
    p.add_argument("--backend", metavar="SOCKET",
                   help="run as a jax-FREE protocol worker: buffer streams "
                        "here, proxy device calls to a serve-backend unix "
                        "socket (fan out one worker per client pipe)")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("serve-backend",
                       help="multi-process serving device owner: batch "
                            "token rows from N 'serve --backend' workers "
                            "into padded device calls over a unix socket")
    _add_common(p)
    p.add_argument("--socket", required=True,
                   help="unix socket path to listen on")
    p.add_argument("--ckpt", help="Orbax params directory (encoder+head)")
    p.add_argument("--encoder-ckpt", dest="encoder_ckpt")
    p.add_argument("--head-ckpt", dest="head_ckpt")
    p.add_argument("--torch-ckpt", dest="torch_ckpt", action="store_true",
                   help="checkpoints are torch state_dicts")
    p.add_argument("--artifact",
                   help="AOT artifact directory (export-aot, no --l2)")
    p.add_argument("--max-batch", dest="max_batch", type=int, default=128,
                   help="rows per coalesced device call (the compiled batch "
                        "shape; every worker's --max-streams must be <= it)")
    p.add_argument("--window-ms", dest="window_ms", type=float, default=2.0,
                   help="coalescing window: how long to wait for more "
                        "workers' rows before dispatching a partial batch")
    p.set_defaults(fn=cmd_serve_backend)

    p = sub.add_parser("info", help="print versions, devices, HBM usage, "
                                    "auto-mesh factorization and env knobs")
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser("pack", help="convert a reference h5 feature file "
                                    "into the native .lstcpack store")
    p.add_argument("--h5", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_pack)

    args = parser.parse_args(argv)
    return args.fn(args)


def _add_common_coteach(p):
    p.add_argument("--stn-preset", required=True, choices=sorted(PRESETS))
    p.add_argument("--ltn-preset", required=True, choices=sorted(PRESETS))
    p.add_argument("--workdir", required=True)
    p.add_argument("--rounds", type=int, default=4)
    p.add_argument("--stn-epochs", type=int, default=100)
    p.add_argument("--ltn-epochs", type=int, default=100)
    p.add_argument("--stn-threshold", type=float, default=0.9)
    p.add_argument("--ltn-threshold", type=float, default=0.65)
    p.add_argument("--h5")
    p.add_argument("--train-txt", dest="train_txt")
    p.add_argument("--test-txt", dest="test_txt")
    p.add_argument("--mask-dir", dest="mask_dir")
    p.add_argument("--mask-h5", dest="mask_h5")
    p.add_argument("--batch-size", dest="batch_size", type=int)
    p.add_argument("--seed", type=int)
    p.add_argument("--set", action="append", metavar="PATH=VALUE")
    p.add_argument("--mesh", help="'auto' or 'DPxTP': shard every round's "
                                  "step/scoring over a device mesh")
    p.add_argument("--multihost", metavar="COORD",
                   help="multi-process co-teaching: coordinator 'host:port' "
                        "(with --num-processes/--process-id) or 'auto'")
    p.add_argument("--num-processes", dest="num_processes", type=int)
    p.add_argument("--process-id", dest="process_id", type=int)


if __name__ == "__main__":
    sys.exit(main())
