"""validate-data soundness fuzz: on randomly corrupted datasets, a PASSING
validation must imply the training + eval pipeline runs without crashing,
and every injected corruption class must be NAMED by validate (never a
clean report followed by a runtime crash — the exact failure mode the
command exists to pre-empt, see lstc_vad_tpu/data/validate.py docstring)."""

import os
from dataclasses import replace

import h5py
import numpy as np
import pytest

from lstc_vad_tpu.config import preset
from lstc_vad_tpu.data.validate import validate_data

from fixtures import make_sht_like

SMALL = {
    "encoder.d_model": 16, "encoder.d_inner": 32, "encoder.n_head": 2,
    "encoder.d_k": 8, "encoder.d_v": 8, "encoder.n_layers": 1,
    "encoder.attn_impl": "xla", "encoder.window_depth": 3,
    "head.d_model": 16, "head.hidden_dim": 8,
    "data.n_patch": 4, "data.d_model": 16, "data.part_num": 4,
    "data.part_len": 3, "data.batch_size": 2,
    "epochs": 1, "inter_epoch": 1, "save_threshold": 2.0,
    "eval_train_split": False,
}


def _corrupt(rng, h5, train_txt, test_txt, mask_dir):
    """Inject one random corruption; returns its description."""
    kind = rng.integers(0, 6)
    if kind == 0:  # ghost key in the train txt
        with open(train_txt, "a") as f:
            f.write("01_ghost,0\n")
        return "ghost train key"
    if kind == 1:  # wrong d_model for one stored video
        with h5py.File(h5, "a") as f:
            victim = list(f.keys())[int(rng.integers(0, len(f)))]
            del f[victim]
            f[victim] = np.zeros((5, 4, 8), np.float32)
        return "wrong d_model"
    if kind == 2:  # missing abnormal mask
        victims = [m for m in os.listdir(mask_dir)]
        os.remove(os.path.join(mask_dir, victims[0]))
        return "missing mask"
    if kind == 3:  # video shorter than part_len (non-UCF: fatal)
        with h5py.File(h5, "a") as f:
            victim = list(f.keys())[int(rng.integers(0, len(f)))]
            del f[victim]
            f[victim] = np.zeros((2, 4, 16), np.float32)
        return "short video"
    if kind == 4:  # single-class train split
        with open(train_txt) as f:
            lines = f.read().splitlines()
        with open(train_txt, "w") as f:
            f.write("\n".join(ln.rsplit(",", 1)[0] + ",0"
                              for ln in lines) + "\n")
        return "single-class train split"
    # object-array (pickled) mask
    victims = sorted(os.listdir(mask_dir))
    path = os.path.join(mask_dir, victims[0])
    frames = np.load(path).tolist()
    np.save(path, np.array([frames], dtype=object), allow_pickle=True)
    return "pickled mask"


@pytest.mark.parametrize("trial", range(8))
def test_validate_pass_implies_pipeline_runs(tmp_path, trial):
    """Half the trials keep the dataset clean (validate must pass AND a
    1-epoch train + eval must complete); half inject one corruption
    (validate must NAME a problem — no silent pass)."""
    rng = np.random.default_rng(100 + trial)
    h5, train_txt, test_txt, mask_dir = make_sht_like(
        str(tmp_path), n_patch=4, d_model=16,
        n_clips=(int(rng.integers(10, 16)), int(rng.integers(20, 34))),
        seed=trial)
    cfg = preset("sht_ltn", **SMALL)
    cfg = replace(cfg, data=replace(
        cfg.data, h5_path=h5, train_txt=train_txt, test_txt=test_txt,
        test_mask_dir=mask_dir + "/"),
        model_save_dir=str(tmp_path / "ckpt"))

    corrupted = trial % 2 == 1
    desc = ""
    if corrupted:
        desc = _corrupt(rng, h5, train_txt, test_txt, mask_dir)

    problems, _ = validate_data(cfg)
    if corrupted:
        assert problems, f"validate passed a dataset with {desc!r}"
        return
    assert problems == []
    # the soundness half: a clean validation must mean the pipeline runs
    from lstc_vad_tpu.train.driver import Trainer

    trainer = Trainer(cfg)
    trainer.fit(epochs=1)
    auc = trainer.evaluate("test")
    assert 0.0 <= auc <= 1.0
