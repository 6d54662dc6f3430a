"""Generic training driver: one loop serves STN and LTN on all 3 datasets.

Replaces the reference's six copy-pasted per-dataset train scripts
(Train/spatio_transformer_*.py, Train/temporal_transformer_*.py) with one
parameterized loop: balanced-pair batches via the prefetching pipeline,
a fused jitted train step, eval every ``inter_epoch`` epochs over the test
(and optionally train) split, AUC-gated checkpoint saving.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, List, Optional

import jax
import numpy as np

from ..utils.profiling import StepTimer

from ..config import TrainConfig
from ..data import (BatchIterator, FeatureStore, PairedTrainDataset,
                    Prefetcher, load_test_videos)
from ..data.datasets import load_pseudo_labels, load_train_records
from ..evaluation.drivers import (evaluate_ltn, evaluate_stn,
                                  evaluate_ucf_ltn, evaluate_ucf_stn)
from ..evaluation.scoring import (ClipScorer, PartScorer, UCFBinnedScorer,
                                  UCFClipBinScorer)
from ..ckpt import save_checkpoint
from ..utils.logging import get_logger
from .state import create_train_state
from .steps import (make_ltn_train_step, make_stn_bce_train_step,
                    make_stn_train_step)


@dataclasses.dataclass
class TrainResult:
    best_test_auc: float = 0.0
    best_test_epoch: int = 0
    best_train_auc: float = 0.0
    best_train_epoch: int = 0
    history: List[Dict] = dataclasses.field(default_factory=list)
    steps: int = 0


class Trainer:
    """Owns dataset, state, step fn and eval scorers for one config."""

    def __init__(self, cfg: TrainConfig, logger=None, sharding=None,
                 mesh=None, eval_only: bool = False, store=None,
                 test_videos=None):
        """``mesh``: a ('data','model') jax Mesh — the train state is laid
        out with the tensor-parallel rules (parallel/mesh.py) and batches
        arrive sharded on the data axis; XLA GSPMD handles the collectives.
        ``sharding`` alone just shards input batches (pure dp).
        ``eval_only``: skip training-dataset construction and the train-step
        build (for the evaluate / gen-pseudo CLI paths).
        ``store`` / ``test_videos``: reuse a previous Trainer's feature store
        and test split — co-teaching holds every round's Trainer alive, so
        without sharing each round adds a full eager train cache plus a
        memoized test split to host RSS (pseudo/coteach.py)."""
        self.cfg = cfg
        self.logger = logger or get_logger()
        self.mesh = mesh
        self.sharding = sharding
        self.eval_only = eval_only
        self.timer = StepTimer()
        self.best_params = None  # snapshot at the best gate AUC (fit)
        d = cfg.data

        records = (load_train_records(d.dataset, d.train_txt)
                   if d.train_txt else [])
        if not records and not eval_only:
            raise ValueError("training requires data.train_txt")
        if not eval_only and cfg.eval_train_split:
            # fail fast: the first train-split eval otherwise surfaces this
            # as a FileNotFoundError AFTER inter_epoch epochs of compute
            if d.dataset == "UCF":
                raise ValueError("UCF has no train-split evaluation "
                                 "(set eval_train_split=False)")
            if not d.test_mask_dir:
                raise ValueError(
                    "eval_train_split=True scores abnormal train videos "
                    "against frame masks (Train/spatio_transformer_"
                    "shanghaitech.py:148-168): set data.test_mask_dir or "
                    "eval_train_split=False")
        if store is not None:
            self.store = store
        elif d.pack_path:
            from .. data.packed import PackedStore
            self.store = PackedStore(d.pack_path, ten_crop=d.ten_crop,
                                     n_patch=d.n_patch, d_model=d.d_model)
        else:
            eager_keys = ([r.key for r in records]
                          if records and d.eager and not eval_only else None)
            self.store = FeatureStore(d.h5_path, eager_keys=eager_keys,
                                      ten_crop=d.ten_crop, n_patch=d.n_patch,
                                      d_model=d.d_model)
        if eval_only:
            self.dataset = None
        else:
            pseudo = (load_pseudo_labels(d.pseudo_labels_path)
                      if d.pseudo_labels_path else None)
            self.dataset = PairedTrainDataset(
                records, self.store, part_num=d.part_num, part_len=d.part_len,
                n_patch=d.n_patch, sample=d.sample, pseudo_labels=pseudo,
                ten_crop=d.ten_crop, double_short=(d.dataset == "UCF"),
                crop_per_video=(d.dataset == "UCF"), seed=d.seed)
        self.train_records = records

        # in-training eval re-scores the split every inter_epoch epochs:
        # with data.eager (SHT/UBnormal presets) memoize features after the
        # first read; UCF (eager=False) and one-shot eval_only runs stream
        if test_videos is not None:
            self.test_videos = test_videos
        else:
            self.test_videos = load_test_videos(
                d.dataset, d.test_txt, self.store, mask_dir=d.test_mask_dir,
                mask_h5=d.test_mask_h5,
                cache=d.eager and not eval_only) if d.test_txt else []

        self.state, self.encoder, self.head, self.tx = create_train_state(cfg)
        self.multiprocess = False
        if mesh is not None:
            from ..parallel.mesh import batch_sharding, state_shardings
            from ..parallel.multihost import is_multiprocess, to_global

            shardings = state_shardings(self.state, mesh)
            if is_multiprocess(mesh):
                # global mesh across processes: every process runs this same
                # code on identical seeds; each contributes its local shards
                self.multiprocess = True
                self.state = to_global(
                    jax.tree.map(np.asarray, self.state), shardings)
            else:
                self.state = jax.device_put(self.state, shardings)
            if self.sharding is None:
                self.sharding = batch_sharding(mesh)
        if eval_only:
            self.step_fn = None
        elif cfg.model == "stn_bce":
            # co-teaching STN round: MIL + weighted BCE on LTN pseudo labels
            self.step_fn = make_stn_bce_train_step(self.encoder, self.head,
                                                   cfg, self.tx)
        elif cfg.model == "stn":
            self.step_fn = make_stn_train_step(self.encoder, self.head, cfg,
                                               self.tx)
        else:
            self.step_fn = make_ltn_train_step(self.encoder, self.head, cfg,
                                               self.tx)
        self._build_scorers()

    def _make_eval_encoder(self):
        """Evaluation/pseudo-gen compute stays f32 whatever the training
        compute_dtype: the reference's eval scripts are plain torch f32
        (Test/evaluation_shanghaitech_ubnormal.py:24-97), so the bf16 TRAIN
        step (the recommended throughput config, docs/ARCHITECTURE.md) must
        never move eval AUC.  remat is a train-memory knob — off for
        inference.  Params are structurally identical either way, so the
        train state drops straight in."""
        ec = self.cfg.encoder
        if ec.compute_dtype == "float32" and not ec.remat and not ec.cast_sr:
            return self.encoder
        from ..models import Encoder

        return Encoder(dataclasses.replace(ec, compute_dtype="float32",
                                           remat=False, cast_sr=False))

    def _build_scorers(self):
        cfg, d = self.cfg, self.cfg.data
        sh = self.sharding  # eval batches data-sharded when a mesh is set
        # eval wire dtype is DECOUPLED from data.transfer_dtype: the train
        # throughput knob must not silently change eval scores; bf16 eval
        # wires are their own opt-in (data.eval_transfer_dtype)
        td = d.eval_transfer_dtype
        self.eval_encoder = enc = self._make_eval_encoder()
        if cfg.model.startswith("stn"):
            if d.dataset == "UCF":
                self.scorer = UCFClipBinScorer(enc, self.head,
                                               d.n_patch, cfg.max_clips,
                                               sharding=sh, transfer_dtype=td)
            else:
                # kind: an n_layers==1 classifier head scores P(abnormal)
                # (the pseudo-generator switch) — out[:, 0] would be the
                # NORMAL-class probability, inverting every score
                self.scorer = ClipScorer(enc, self.head, d.n_patch,
                                         kind=cfg.head.kind,
                                         sharding=sh, transfer_dtype=td)
        else:
            if d.dataset == "UCF":
                # in-training eval flags (Train/temporal_transformer_UCF.py)
                self.scorer = UCFBinnedScorer(
                    enc, self.head, d.part_len, d.n_patch,
                    max_clips=cfg.max_clips, l2_normalize=False,
                    tail_rewindow=False, adaptive_bins=True, sharding=sh,
                    transfer_dtype=td)
            else:
                self.scorer = PartScorer(enc, self.head, d.part_len,
                                         d.n_patch,
                                         tail_rewindow=cfg.eval_tail_rewindow,
                                         sharding=sh, transfer_dtype=td)

    # ---------------------------------------------------------------- eval

    def _eval_feat(self, feat):
        """tenCrop stores yield 4-D [n_clips, 10, n_patch, d] features; the
        reference ships no tenCrop eval script, so evaluation requires an
        explicit crop choice (data.eval_crop)."""
        if self.cfg.data.ten_crop:
            crop = self.cfg.data.eval_crop
            if crop is None:
                raise ValueError(
                    "tenCrop evaluation needs data.eval_crop (0-9): the "
                    "reference has no committed tenCrop eval semantics")
            return feat[:, crop]
        return feat

    def _lazy_feat(self, v):
        """Zero-arg feature loader: the scorers stream one video at a time
        (evaluation/scoring.py _resolve), so the test split is never
        materialized in RAM at once."""
        return lambda: self._eval_feat(v.feat)

    def _test_items(self):
        d = self.cfg.data
        if d.dataset == "UCF":
            if self.cfg.model.startswith("stn"):
                # STN in-training eval bins from the annotation frame count
                # (Train/spatio_transformer_UCF.py:121-122)
                return [(self._lazy_feat(v), v.anno,
                         v.n_frames // d.segment_len)
                        for v in self.test_videos]
            # LTN in-training eval uses the feature-array clip count
            # (Train/temporal_transformer_UCF.py:143-145)
            return [(self._lazy_feat(v), v.anno, v.n_clips)
                    for v in self.test_videos]
        return [(self._lazy_feat(v), v.anno) for v in self.test_videos]

    def _train_items(self):
        """Train-split eval: abnormal videos use the frame mask GT
        (Train/spatio_transformer_shanghaitech.py:148-168).  SHT/UBnormal
        only — the reference UCF scripts never evaluate the train split."""
        d = self.cfg.data
        if d.dataset == "UCF":
            raise ValueError("UCF has no train-split evaluation "
                             "(set eval_train_split=False)")
        if not hasattr(self, "_train_masks"):
            self._train_masks = {}
        items = []
        for r in self.train_records:
            feat = (lambda key=r.key: self._eval_feat(self.store.get(key)))
            anno = None
            if r.is_abnormal:
                # cached like the test split's TestVideo.anno: with SHT
                # defaults fit() evaluates the train split ~1800 times and
                # must not re-read every mask .npy each time.  Same np.load
                # semantics as load_test_videos (allow_pickle=False).
                anno = self._train_masks.get(r.key)
                if anno is None:
                    anno = self._train_masks[r.key] = np.load(
                        os.path.join(d.test_mask_dir, r.key + ".npy"))
            items.append((feat, anno))
        return items

    def evaluate(self, split: str = "test") -> float:
        cfg, d = self.cfg, self.cfg.data
        params = self.state.params
        items = self._test_items() if split == "test" else self._train_items()
        if cfg.model.startswith("stn"):
            if d.dataset == "UCF":
                return evaluate_ucf_stn(params, self.scorer, items,
                                        d.segment_len)
            return evaluate_stn(params, self.scorer, items, d.segment_len)
        if d.dataset == "UCF":
            return evaluate_ucf_ltn(params, self.scorer, items, d.segment_len)
        return evaluate_ltn(params, self.scorer, items, d.segment_len)

    # ---------------------------------------------------------------- train

    def train_epoch(self) -> Dict[str, float]:
        d = self.cfg.data
        feature_dtype = None
        if d.transfer_dtype != "float32":
            from ..utils.misc import resolve_np_dtype

            feature_dtype = resolve_np_dtype(d.transfer_dtype)
        batches = Prefetcher(
            BatchIterator(self.dataset, d.batch_size, drop_last=True),
            sharding=self.sharding, feature_dtype=feature_dtype,
            multiprocess=self.multiprocess)
        snippets_per_batch = 2 * d.batch_size * d.part_num * d.part_len
        metrics = {}
        log_every = self.cfg.log_every_step
        with StepTimer() as timer_total:
            n = 0
            for batch in batches:
                self.state, metrics = self.step_fn(self.state, *batch)
                n += 1
                if log_every and n % log_every == 0:
                    # per-iteration loss lines like the reference
                    # (spatio_transformer_shanghaitech.py:111-112); forces a
                    # device sync, so off by default
                    self.logger.info(
                        "[iter %d] %s", int(self.state.step),
                        {k: round(float(v), 4) for k, v in metrics.items()})
            if metrics:
                # the host fetch IS the sync barrier: block_until_ready may
                # return before remote-attached TPU work drains (CLAUDE.md),
                # so fetching the scalars must happen INSIDE the timer or
                # the logged snippets_per_sec excludes queued step time
                metrics = {k: float(v) for k, v in metrics.items()}
        self.dataset.shuffle_keys()
        self.timer.steps += n
        self.timer.items += n * snippets_per_batch
        self.timer.seconds += timer_total.seconds
        out = dict(metrics)
        if n:
            out["snippets_per_sec"] = n * snippets_per_batch / \
                max(timer_total.seconds, 1e-9)
        return out | {"batches": n}

    def _emit_metrics(self, record: Dict):
        """Structured observability: one JSON line per record (the reference
        only has free-text log lines, utils/utils.py:72-96).  Off unless
        cfg.metrics_jsonl is set.  Under a multi-process global mesh every
        process computes identical records over a shared filesystem (the same
        setup the checkpoint path requires) — only process 0 writes, like
        the process-0-only checkpoint/pseudo-label saves."""
        path = self.cfg.metrics_jsonl
        if not path:
            return
        if self.multiprocess and jax.process_index() != 0:
            return
        import json
        import time

        with open(path, "a") as f:
            f.write(json.dumps({"ts": round(time.time(), 3), **record}) + "\n")

    # ------------------------------------------------------------ ckpt

    def save_state(self, path: str, asynchronous: bool = False):
        """Full resumable state: params + optimizer accumulators + step +
        PRNG key (the reference saves bare state_dicts and restarts its
        schedule on resume — SURVEY §5 checkpoint/resume).

        ``asynchronous``: return after the device->host copy; serialization
        and writes continue in the background (ckpt/orbax_io.py) — used by
        the periodic autosave so training keeps stepping."""
        save_checkpoint(path, self.state, asynchronous=asynchronous)

    def restore_state(self, path: str):
        from ..ckpt import load_checkpoint, wait_for_saves

        wait_for_saves()  # a pending autosave may still be writing ``path``
        self.state = load_checkpoint(path, self.state)

    def fit(self, epochs: Optional[int] = None,
            on_eval: Optional[Callable] = None,
            autosave_every: Optional[int] = None) -> TrainResult:
        """``autosave_every``: save the full resumable state every N epochs
        (failure recovery — restart with restore_state and continue exactly;
        the reference has no such story, SURVEY §5)."""
        cfg = self.cfg
        result = TrainResult()
        epochs = cfg.epochs if epochs is None else epochs
        for epoch in range(epochs):
            if autosave_every and epoch and epoch % autosave_every == 0:
                self.save_state(os.path.join(cfg.model_save_dir, "autosave"),
                                asynchronous=True)
            m = self.train_epoch()
            result.steps += m.pop("batches")
            self.logger.info("[epoch %d] %s", epoch,
                             {k: round(v, 4) for k, v in m.items()})
            self._emit_metrics({"kind": "train", "epoch": epoch,
                                "step": int(self.state.step), **m})
            if epoch % cfg.inter_epoch == 0 or epoch == epochs - 1:
                auc_test = self.evaluate("test") if self.test_videos else 0.0
                auc_train = (self.evaluate("train")
                             if cfg.eval_train_split else 0.0)
                entry = {"epoch": epoch, "auc_test": auc_test,
                         "auc_train": auc_train, **m}
                result.history.append(entry)
                self._emit_metrics({"kind": "eval", **entry})
                # the reference gates saving on the train-split AUC for SHT
                # (spatio_transformer_shanghaitech.py:177-191) and on test AUC
                # for UCF (spatio_transformer_UCF.py:139-149)
                gate = auc_train if cfg.eval_train_split else auc_test
                prev_best = (result.best_train_auc if cfg.eval_train_split
                             else result.best_test_auc)
                improved = gate > prev_best
                if auc_test > result.best_test_auc:
                    result.best_test_auc = auc_test
                    result.best_test_epoch = epoch
                if auc_train > result.best_train_auc:
                    result.best_train_auc = auc_train
                    result.best_train_epoch = epoch
                if improved:
                    # co-teaching regenerates pseudo labels from the BEST
                    # weights, like the reference reloading its saved
                    # checkpoint (spatio_transformer_MIL_CE.py:392-396).
                    # Copy: the donated train step would invalidate these
                    # buffers on the next epoch otherwise.
                    self.best_params = jax.tree.map(lambda x: x.copy(),
                                                    self.state.params)
                if improved and gate > cfg.save_threshold:
                    path = os.path.join(
                        cfg.model_save_dir,
                        f"{cfg.data.dataset}_{cfg.model}_{gate:.4f}")
                    self.logger.info("saving model to %s", path)
                    save_checkpoint(path, self.state.params)
                self.logger.info(
                    "[epoch %d] test AUC %.4f (best %.4f @%d) "
                    "train AUC %.4f (best %.4f @%d)", epoch, auc_test,
                    result.best_test_auc, result.best_test_epoch, auc_train,
                    result.best_train_auc, result.best_train_epoch)
                if on_eval is not None:
                    on_eval(self, result, entry)
        from ..ckpt import wait_for_saves

        wait_for_saves()  # commit any in-flight autosave before returning
        return result


def train(cfg: TrainConfig, epochs: Optional[int] = None,
          logger=None) -> TrainResult:
    return Trainer(cfg, logger=logger).fit(epochs)
