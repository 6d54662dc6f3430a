"""Co-teaching driver: alternate STN/LTN training, each supervising the other
through thresholded pseudo labels.

Reproduces the README pipeline (README.md:22-35) as one driver instead of
four manual script invocations, and the committed round driver's semantics
(Train/spatio_transformer_MIL_CE.py: even rounds retrain the STN with
MIL + weighted BCE on the LTN's pseudo labels and regenerate LTN targets;
odd rounds retrain the LTN with MIL + soft CE and regenerate STN targets).

Artifacts land in ``workdir``: stn_pseudo.npy / ltn_pseudo.npy (np.save dict
format, loadable by the reference's datasets too).
"""

from __future__ import annotations

import os
from typing import Optional

from ..config import TrainConfig, replace
from ..evaluation.scoring import ClipScorer, PartScorer, UCFBinnedScorer
from ..train.driver import Trainer
from ..utils.logging import get_logger
from .generator import (generate_ltn_pseudo_labels, generate_stn_pseudo_labels,
                        save_pseudo_labels)


class CoTeachingDriver:
    def __init__(self, stn_cfg: TrainConfig, ltn_cfg: TrainConfig,
                 workdir: str, stn_threshold: float = 0.9,
                 ltn_threshold: float = 0.65, logger=None, mesh=None):
        """``mesh``: optional ('data','model') jax Mesh — every round's
        Trainer shards its step/scoring over it (train/driver.py)."""
        self.stn_cfg = stn_cfg
        self.ltn_cfg = ltn_cfg
        self.mesh = mesh
        self.workdir = workdir
        self.stn_threshold = stn_threshold
        self.ltn_threshold = ltn_threshold
        self.logger = logger or get_logger("coteach")
        os.makedirs(workdir, exist_ok=True)
        self.stn_pseudo_path = os.path.join(workdir, "stn_pseudo.npy")
        self.ltn_pseudo_path = os.path.join(workdir, "ltn_pseudo.npy")
        self.last_stn: Optional[Trainer] = None
        self.last_ltn: Optional[Trainer] = None
        # shared across rounds: run() keeps every round's Trainer alive (the
        # caller scores them afterwards), so each round would otherwise add
        # a full eager train cache + memoized test split to host RSS
        self._store = self._test_videos = None
        self._store_sig = self._tv_sig = ()

    def _trainer(self, cfg: TrainConfig) -> Trainer:
        """Build a round's Trainer, reusing the previous round's feature
        store / test split when the data config still matches."""
        d = cfg.data
        store_sig = (d.pack_path, d.h5_path, d.ten_crop, d.n_patch,
                     d.d_model, d.eager)
        tv_sig = store_sig + (d.dataset, d.test_txt, d.test_mask_dir,
                              d.test_mask_h5)
        trainer = Trainer(
            cfg, logger=self.logger, mesh=self.mesh,
            store=self._store if store_sig == self._store_sig else None,
            test_videos=(self._test_videos
                         if tv_sig == self._tv_sig else None))
        self._store, self._store_sig = trainer.store, store_sig
        self._test_videos, self._tv_sig = trainer.test_videos, tv_sig
        return trainer

    # ------------------------------------------------------------ phases

    def train_stn(self, epochs: int, use_ltn_pseudo: bool) -> Trainer:
        """Bootstrap round: pure MIL.  Later rounds: MIL + BCE on the LTN's
        pseudo labels (spatio_transformer_MIL_CE.py:166-181)."""
        cfg = self.stn_cfg
        if use_ltn_pseudo:
            kw = {"data.pseudo_labels_path": self.ltn_pseudo_path}
            if cfg.data.dataset == "UCF":
                # the MIL_CE even-round UCF eval hardcodes 21 bins
                # (spatio_transformer_MIL_CE.py:230), unlike the standalone
                # STN script's 32
                kw["max_clips"] = 21
            cfg = replace(cfg, model="stn_bce", **kw)
        trainer = self._trainer(cfg)
        trainer.fit(epochs=epochs)
        self.last_stn = trainer
        return trainer

    def train_ltn(self, epochs: int) -> Trainer:
        """LTN round: MIL + soft CE on the STN's pseudo labels
        (temporal_transformer_shanghaitech.py:103-134)."""
        # the committed round driver's eval feeds short tails without
        # re-windowing (Train/spatio_transformer_MIL_CE.py:296)
        cfg = replace(self.ltn_cfg, eval_tail_rewindow=False,
                      **{"data.pseudo_labels_path": self.stn_pseudo_path})
        trainer = self._trainer(cfg)
        trainer.fit(epochs=epochs)
        self.last_ltn = trainer
        return trainer

    def _pseudo_store(self, trainer: Trainer):
        """tenCrop stores need a fixed crop for deterministic pseudo labels
        (no committed reference tenCrop generator semantics)."""
        d = trainer.cfg.data
        if d.ten_crop:
            if d.eval_crop is None:
                raise ValueError("tenCrop co-teaching needs data.eval_crop")
            from ..data.feature_store import CropView

            return CropView(trainer.store, d.eval_crop)
        return trainer.store

    def generate_stn_pseudo(self, trainer: Trainer):
        d = trainer.cfg.data
        records = trainer.train_records
        # eval_encoder: pseudo-label scoring is inference — f32 compute even
        # when the round trained in bf16 (train/driver.py _make_eval_encoder).
        # kind: a classifier head must score P(abnormal), not out[:, 0]
        # (the reference's n_layers==1 switch, generator.py docstring)
        scorer = ClipScorer(trainer.eval_encoder, trainer.head, d.n_patch,
                            kind=trainer.cfg.head.kind,
                            sharding=trainer.sharding,
                            transfer_dtype=d.eval_transfer_dtype)
        params = (trainer.best_params if trainer.best_params is not None
                  else trainer.state.params)
        pseudo = generate_stn_pseudo_labels(
            params, scorer, self._pseudo_store(trainer),
            records, self.stn_threshold)
        self._save_pseudo(self.stn_pseudo_path, pseudo,
                          trainer.multiprocess)
        self.logger.info("STN pseudo labels -> %s", self.stn_pseudo_path)

    def generate_ltn_pseudo(self, trainer: Trainer):
        d = trainer.cfg.data
        records = trainer.train_records  # already parsed by Trainer.__init__
        if d.dataset == "UCF":
            # max_clips from the round's config (reference generator
            # hardcodes 32, Train/pseudo_labels_generator_temporal.py:70 —
            # the config default; an override stays consistent with eval)
            scorer = UCFBinnedScorer(trainer.eval_encoder, trainer.head,
                                     d.part_len, d.n_patch,
                                     max_clips=trainer.cfg.max_clips,
                                     l2_normalize=False, tail_rewindow=False,
                                     sharding=trainer.sharding,
                                     transfer_dtype=d.eval_transfer_dtype)
        else:
            scorer = PartScorer(trainer.eval_encoder, trainer.head,
                                d.part_len, d.n_patch, tail_rewindow=False,
                                sharding=trainer.sharding,
                                transfer_dtype=d.eval_transfer_dtype)
        params = (trainer.best_params if trainer.best_params is not None
                  else trainer.state.params)
        pseudo = generate_ltn_pseudo_labels(
            params, scorer, self._pseudo_store(trainer),
            records, self.ltn_threshold, dataset=d.dataset,
            segment_len=d.segment_len)
        self._save_pseudo(self.ltn_pseudo_path, pseudo,
                          trainer.multiprocess)
        self.logger.info("LTN pseudo labels -> %s", self.ltn_pseudo_path)

    def _save_pseudo(self, path: str, pseudo, multiprocess: bool):
        """On a multi-process global mesh every process computes the SAME
        dict (allgathered scorers over seed-identical pipelines); only
        process 0 writes the shared artifact, and everyone barriers before
        the next round's Trainer loads it.  ``multiprocess`` comes from the
        round's Trainer (the single source of the mesh-spans-processes
        decision)."""
        if not multiprocess:
            save_pseudo_labels(path, pseudo)
            return
        import jax
        from jax.experimental import multihost_utils

        if jax.process_index() == 0:
            save_pseudo_labels(path, pseudo)
        multihost_utils.sync_global_devices(f"pseudo_saved:{path}")

    # ------------------------------------------------------------ loop

    def run(self, rounds: int, stn_epochs: int, ltn_epochs: int):
        """round 0: STN(MIL) -> STN pseudo; round 1: LTN -> LTN pseudo;
        round 2: STN(MIL+BCE) -> STN pseudo; round 3: LTN -> ...; etc."""
        results = []
        for round_i in range(rounds):
            if round_i % 2 == 0:
                trainer = self.train_stn(stn_epochs,
                                         use_ltn_pseudo=(round_i > 0))
                self.generate_stn_pseudo(trainer)
            else:
                trainer = self.train_ltn(ltn_epochs)
                self.generate_ltn_pseudo(trainer)
            results.append(trainer)
            self.logger.info("co-teaching round %d complete", round_i)
        return results
