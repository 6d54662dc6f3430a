"""bf16 training-quality study (VERDICT r3 #1).

Question: does training with ``encoder.compute_dtype=bfloat16`` (the 65.2%-MFU
train step, docs/ARCHITECTURE.md) change the converged frame AUC vs f32?
Evaluation compute is ALWAYS f32 (train/driver.py _make_eval_encoder), so any
AUC difference is attributable to the trained parameters alone.

Two parts:

- ``cpu-golden``: the frozen SHT golden co-teaching pipeline
  (tests/test_golden_pipeline.py) re-run with bf16 TRAIN compute on CPU;
  reports the AUC delta of every round vs the committed f32 goldens.  This
  pins every quirk site (MIL slices, soft-CE-on-probs, pseudo thresholds,
  two-group Adagrad) under bf16 — reference objective semantics survive
  (Train/temporal_transformer_shanghaitech.py:103-134).
- ``tpu-convergence``: a 30-epoch SHT LTN convergence run at FLAGSHIP
  dimensions (d_model 2048, 8 heads, 3 layers, part_len 3 — the preset the
  benchmark measures) on a synthetic dataset with injected anomaly signal,
  3 seeds x {float32, bfloat16}: the f32-vs-bf16 AUC gap is compared against
  the seed-to-seed spread.

Results append to docs/BF16_STUDY.jsonl (one JSON line per completed run, so
an interrupted study keeps its finished arms); the summary table lives in
docs/ARCHITECTURE.md.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bf16_quality_study.py cpu-golden
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bf16_quality_study.py tpu-convergence
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "docs", "BF16_STUDY.jsonl")


def emit(record: dict):
    record = {"ts": round(time.time(), 1), **record}
    with open(OUT, "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record), flush=True)


# --------------------------------------------------------------- cpu-golden

def run_cpu_golden():
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import test_golden_pipeline as tg
    from fixtures import make_sht_like
    from lstc_vad_tpu.config import replace
    from lstc_vad_tpu.pseudo import CoTeachingDriver

    with tempfile.TemporaryDirectory() as tmp:
        fixture = make_sht_like(os.path.join(tmp, "data"), n_patch=4,
                                d_model=16, n_clips=(14, 30), seed=7)

        class P:  # pathlib stand-in for the test helper
            def __truediv__(self, name):
                return os.path.join(tmp, name)

        bf16 = {"encoder.compute_dtype": "bfloat16"}
        driver = CoTeachingDriver(
            replace(tg._cfg("stn", fixture, P()), **bf16),
            replace(tg._cfg("ltn", fixture, P()), **bf16),
            os.path.join(tmp, "work"), stn_threshold=0.5, ltn_threshold=0.4)
        trainers = driver.run(rounds=4, stn_epochs=2, ltn_epochs=2)
        got = {
            "stn_round0": trainers[0].evaluate("test"),
            "ltn_round1": trainers[1].evaluate("test"),
            "stn_bce_round2": trainers[2].evaluate("test"),
            "ltn_round3": trainers[3].evaluate("test"),
        }
    deltas = {k: got[k] - tg.GOLDEN[k] for k in got}
    emit({"part": "cpu-golden", "bf16_auc": got, "f32_golden": tg.GOLDEN,
          "delta": deltas, "max_abs_delta": max(abs(v) for v in
                                                deltas.values())})


# --------------------------------------------------------- tpu-convergence

D_MODEL, N_PATCH, PART_LEN = 2048, 16, 3
CLIPS = 60          # per video; multiple of part_len -> one bucket shape
TRAIN_N, TRAIN_A = 40, 40
TEST_N, TEST_A = 8, 8
AMP = 0.5           # anomaly mean-shift amplitude along a fixed direction
EPOCHS, INTER = 30, 5
SEEDS = (0, 1, 2)


def _make_signal_dataset(root: str, data_seed: int):
    """SHT-format synthetic dataset with LEARNABLE anomaly signal: anomalous
    clips are mean-shifted by AMP along a fixed random direction; abnormal
    videos carry 1-3 anomalous segments covering ~40% of clips.  Pseudo
    labels emulate a good-but-imperfect STN: anomalous clips score ~0.85
    (10% missed), normal clips ~0.1, thresholded at 0.65 like the README
    pipeline (README.md:35)."""
    import h5py

    rng = np.random.default_rng(data_seed)
    u = np.random.default_rng(12345).standard_normal(D_MODEL)
    u = (u / np.linalg.norm(u)).astype(np.float32)

    os.makedirs(root, exist_ok=True)
    h5_path = os.path.join(root, "feats.h5")
    train_txt = os.path.join(root, "train.txt")
    test_txt = os.path.join(root, "test.txt")
    mask_dir = os.path.join(root, "masks")
    pseudo_path = os.path.join(root, "pseudo.npy")
    os.makedirs(mask_dir, exist_ok=True)

    def anomaly_mask(abnormal: bool) -> np.ndarray:
        m = np.zeros(CLIPS, bool)
        if abnormal:
            for _ in range(int(rng.integers(1, 4))):
                seg = int(rng.integers(6, 14))
                beg = int(rng.integers(0, CLIPS - seg))
                m[beg:beg + seg] = True
        return m

    pseudo = {}
    rows = {"train": [], "test": []}
    with h5py.File(h5_path, "w") as h5:
        for split, n_norm, n_abn in (("train", TRAIN_N, TRAIN_A),
                                     ("test", TEST_N, TEST_A)):
            for i in range(n_norm + n_abn):
                abnormal = i >= n_norm
                key = f"{split}_{'02' if abnormal else '01'}_{i:03d}"
                feat = rng.standard_normal(
                    (CLIPS, N_PATCH, D_MODEL)).astype(np.float32)
                m = anomaly_mask(abnormal)
                feat[m] += AMP * u
                h5[key + ".npy"] = feat
                rows[split].append((key, int(abnormal)))
                if split == "train":
                    scores = np.where(
                        m, np.clip(0.85 + 0.1 * rng.standard_normal(CLIPS),
                                   0, 0.99),
                        np.clip(0.1 + 0.05 * rng.standard_normal(CLIPS),
                                0, 0.99)).astype(np.float32)
                    scores[rng.random(CLIPS) < 0.10] = 0.0  # missed by STN
                    pseudo[key + ".npy"] = np.where(scores > 0.65, scores,
                                                    0.0).astype(np.float32)
                elif abnormal:
                    np.save(os.path.join(mask_dir, key + ".npy"),
                            np.repeat(m, 16).astype(np.float64))

    with open(train_txt, "w") as f:
        for k, lab in rows["train"]:
            f.write(f"{k},{lab}\n")
    with open(test_txt, "w") as f:
        for k, lab in rows["test"]:
            f.write(f"{k},{lab},{-1 if lab else CLIPS * 16}\n")
    np.save(pseudo_path, pseudo)
    return h5_path, train_txt, test_txt, mask_dir, pseudo_path


def run_tpu_convergence(epochs: int = EPOCHS, dtypes=("float32", "bfloat16"),
                        seeds=SEEDS):
    """Run arms ONE PROCESS PER ARM when possible: host RSS grows ~20+ GB
    per completed Trainer in-process (JAX/tunnel caches are never freed), and
    a 6-arm 60-epoch run was OOM-killed at 130 GB.  The CLI accepts
    ``tpu-convergence <epochs> [dtype] [seed]`` so a driver loop can isolate
    each arm; results append to the JSONL either way."""
    from lstc_vad_tpu.config import preset
    from lstc_vad_tpu.train.driver import Trainer

    with tempfile.TemporaryDirectory() as tmp:
        data_root = os.path.join(tmp, "data")
        h5, train_txt, test_txt, mask_dir, pseudo = _make_signal_dataset(
            data_root, data_seed=99)
        emit({"part": "tpu-convergence", "event": "dataset_ready",
              "train_videos": TRAIN_N + TRAIN_A, "clips": CLIPS})
        for dtype in dtypes:
            for seed in seeds:
                # 'bfloat16_sr': the VERDICT r4 #6 probe arm — bf16 matmuls
                # with stochastically-rounded casts (encoder.cast_sr)
                compute = dtype.removesuffix("_sr")
                cfg = preset("sht_ltn", seed=seed, epochs=epochs,
                             inter_epoch=INTER, save_threshold=2.0,
                             eval_train_split=False,
                             model_save_dir=os.path.join(tmp, "ckpt"), **{
                                 "encoder.cast_sr": dtype.endswith("_sr"),
                                 "encoder.compute_dtype": compute,
                                 "data.h5_path": h5,
                                 "data.train_txt": train_txt,
                                 "data.test_txt": test_txt,
                                 "data.test_mask_dir": mask_dir + "/",
                                 "data.pseudo_labels_path": pseudo,
                                 "data.batch_size": 8,
                                 "data.seed": 100 + seed,
                             })
                t0 = time.time()
                trainer = Trainer(cfg)
                result = trainer.fit()
                emit({"part": "tpu-convergence", "dtype": dtype,
                      "seed": seed, "epochs": epochs,
                      "best_test_auc": result.best_test_auc,
                      "final_test_auc": result.history[-1]["auc_test"],
                      "auc_curve": [round(h["auc_test"], 5)
                                    for h in result.history],
                      # None, not NaN: json.dumps would emit a bare NaN
                      # token strict JSONL consumers reject
                      "final_loss": (round(result.history[-1]["loss"], 5)
                                     if "loss" in result.history[-1]
                                     else None),
                      "wall_s": round(time.time() - t0, 1)})


if __name__ == "__main__":
    part = sys.argv[1] if len(sys.argv) > 1 else "all"
    if part not in ("cpu-golden", "tpu-convergence", "all"):
        # a typo'd part must not be a silent no-op exiting 0 — a driver
        # loop isolating arms per process would believe the arm completed
        raise SystemExit(f"unknown part {part!r}: expected 'cpu-golden', "
                         "'tpu-convergence' or 'all'")
    if part in ("cpu-golden", "all"):
        run_cpu_golden()
    if part in ("tpu-convergence", "all"):
        epochs = int(sys.argv[2]) if len(sys.argv) > 2 else EPOCHS
        dtypes = (sys.argv[3],) if len(sys.argv) > 3 else ("float32",
                                                           "bfloat16")
        seeds = ((int(sys.argv[4]),) if len(sys.argv) > 4 else SEEDS)
        run_tpu_convergence(epochs, dtypes, seeds)
