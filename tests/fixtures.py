"""Synthetic dataset fixtures: tiny HDF5 feature files + annotation txts
covering every reference format (SURVEY §2.7), for CPU-runnable tests."""

import os

import h5py
import numpy as np


def make_sht_like(root, n_normal=4, n_abnormal=3, n_clips=(12, 30), n_patch=4,
                  d_model=16, seed=0, ten_crop=False):
    """Returns (h5_path, train_txt, test_txt, mask_dir)."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    h5_path = os.path.join(root, "feats.h5")
    train_txt = os.path.join(root, "train.txt")
    test_txt = os.path.join(root, "test.txt")
    mask_dir = os.path.join(root, "masks")
    os.makedirs(mask_dir, exist_ok=True)

    keys, labels, clip_counts = [], [], []
    with h5py.File(h5_path, "w") as h5:
        for i in range(n_normal + n_abnormal):
            key = f"{'01' if i < n_normal else '02'}_{i:03d}"
            abnormal = i >= n_normal
            clips = int(rng.integers(n_clips[0], n_clips[1]))
            if ten_crop:
                # stored flat; loaders reshape to (-1, 10, n_patch, d_model)
                shape = (clips * 10, n_patch, d_model)
            else:
                shape = (clips, n_patch, d_model)
            h5[key + ".npy"] = rng.standard_normal(shape).astype(np.float32)
            keys.append(key)
            labels.append(int(abnormal))
            clip_counts.append(shape[0])  # stored rows (clips*10 tenCrop)
            if abnormal:
                mask = (rng.random(clips * 16) < 0.4).astype(np.float64)
                np.save(os.path.join(mask_dir, key + ".npy"), mask)

    with open(train_txt, "w") as f:
        for k, lab in zip(keys, labels):
            f.write(f"{k},{lab}\n")
    with open(test_txt, "w") as f:
        for k, lab, clips in zip(keys, labels, clip_counts):
            n_frames = -1 if lab else clips * 16
            f.write(f"{k},{lab},{n_frames}\n")
    return h5_path, train_txt, test_txt, mask_dir


def make_ucf_like(root, n_normal=3, n_abnormal=3, n_clips=(3, 40), n_patch=3,
                  d_model=16, seed=1):
    """Returns (h5_path, train_txt, test_txt, gt_h5)."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    h5_path = os.path.join(root, "ucf.h5")
    train_txt = os.path.join(root, "Train_Annotation.txt")
    test_txt = os.path.join(root, "Test_Annotation.txt")
    gt_h5 = os.path.join(root, "gt.h5")

    entries = []
    with h5py.File(h5_path, "w") as h5, h5py.File(gt_h5, "w") as gt:
        for i in range(n_normal + n_abnormal):
            normal = i < n_normal
            key = (f"Normal_Videos_{i:03d}" if normal else f"Arson{i:03d}")
            clips = int(rng.integers(n_clips[0], n_clips[1]))
            n_frames = clips * 16 + int(rng.integers(0, 16))
            h5[key + ".npy"] = rng.standard_normal(
                (clips, n_patch, d_model)).astype(np.float32)
            cls = "Normal" if normal else "Arson"
            if normal:
                ev = (-1, -1, -1, -1)
            else:
                s1 = int(rng.integers(0, n_frames // 2))
                e1 = int(rng.integers(s1 + 1, n_frames))
                ev = (s1, e1, -1, -1)
                mask = np.zeros(n_frames)
                mask[s1:e1] = 1
                gt[key + ".npy"] = mask
            entries.append((key, n_frames, cls, ev))

    with open(train_txt, "w") as f:
        for key, n_frames, cls, _ in entries:
            f.write(f"{cls}/{key}.mp4 {n_frames}\n")
    with open(test_txt, "w") as f:
        for key, n_frames, cls, ev in entries:
            f.write(f"{cls}/{key}.mp4 {n_frames} {cls} "
                    f"{ev[0]} {ev[1]} {ev[2]} {ev[3]}\n")
    return h5_path, train_txt, test_txt, gt_h5


def make_ubnormal_like(root, n_normal=3, n_abnormal=3, n_clips=(8, 20),
                       n_patch=4, d_model=8, seed=2):
    """Returns (h5_path, train_txt, test_txt, mask_dir)."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    h5_path = os.path.join(root, "ub.h5")
    train_txt = os.path.join(root, "train_video_names_frames.txt")
    test_txt = os.path.join(root, "test_video_names_frames.txt")
    mask_dir = os.path.join(root, "masks")
    os.makedirs(mask_dir, exist_ok=True)

    entries = []
    with h5py.File(h5_path, "w") as h5:
        for i in range(n_normal + n_abnormal):
            normal = i < n_normal
            key = f"{'normal' if normal else 'abnormal'}_scene_{i}"
            clips = int(rng.integers(n_clips[0], n_clips[1]))
            n_frames = clips * 16
            h5[key + ".npy"] = rng.standard_normal(
                (clips, n_patch, d_model)).astype(np.float32)
            if not normal:
                mask = (rng.random(n_frames) < 0.5).astype(np.float64)
                np.save(os.path.join(mask_dir, key + ".npy"), mask)
            entries.append((key, n_frames))

    for path in (train_txt, test_txt):
        with open(path, "w") as f:
            for key, n_frames in entries:
                f.write(f"{key},{n_frames}\n")
    return h5_path, train_txt, test_txt, mask_dir
