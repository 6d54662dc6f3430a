"""validate-data: clean fixtures pass; every class of corruption is named."""

import h5py
import numpy as np

from lstc_vad_tpu.cli.main import main
from lstc_vad_tpu.config import preset
from lstc_vad_tpu.data.validate import validate_data

from fixtures import make_sht_like, make_ucf_like

from dataclasses import replace


def _sht_cfg(fixture, **data_kw):
    h5, train_txt, test_txt, mask_dir = fixture
    cfg = preset("sht_stn")
    data = replace(cfg.data, h5_path=h5, train_txt=train_txt,
                   test_txt=test_txt, test_mask_dir=mask_dir + "/",
                   n_patch=4, d_model=16, part_len=3, **data_kw)
    return replace(cfg, data=data)


def test_clean_sht_fixture_validates(tmp_path):
    cfg = _sht_cfg(make_sht_like(str(tmp_path), n_patch=4, d_model=16))
    problems, stats = validate_data(cfg)
    assert problems == []
    assert stats["train_videos"] == 7 and stats["test_videos"] == 7
    assert stats["train_normal"] == 4 and stats["train_abnormal"] == 3


def test_missing_key_and_mask_and_shape(tmp_path):
    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16)
    h5, train_txt, test_txt, mask_dir = fixture
    # key in txt but not in store
    with open(train_txt, "a") as f:
        f.write("01_ghost,0\n")
    # wrong d_model for one stored video
    with h5py.File(h5, "a") as f:
        del f["01_000.npy"]
        f["01_000.npy"] = np.zeros((5, 4, 8), np.float32)
    # missing mask for an abnormal test video
    import os
    os.remove(os.path.join(mask_dir, "02_004.npy"))

    problems, _ = validate_data(_sht_cfg(fixture))
    text = "\n".join(problems)
    assert "'01_ghost' not in the feature store" in text
    assert "d_model 8 != data.d_model=16" in text
    assert "missing frame mask" in text and "02_004" in text


def test_short_video_and_single_class(tmp_path):
    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16)
    h5, train_txt, _, _ = fixture
    with h5py.File(h5, "a") as f:
        del f["01_001.npy"]
        f["01_001.npy"] = np.zeros((2, 4, 16), np.float32)  # < part_len=3
    problems, _ = validate_data(_sht_cfg(fixture))
    assert any("2 clips < part_len=3" in p for p in problems)

    # all-normal train txt: pairing impossible
    with open(train_txt, "w") as f:
        f.write("01_000,0\n01_001,0\n")
    problems, _ = validate_data(_sht_cfg(fixture))
    assert any("balanced pairing" in p for p in problems)


def test_pseudo_label_gaps(tmp_path):
    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16)
    h5, *_ = fixture
    with h5py.File(h5, "r") as f:
        n0 = f["01_000.npy"].shape[0]
    pseudo = {"01_000.npy": np.zeros(n0 + 5, np.float32)}  # wrong length
    path = str(tmp_path / "pseudo.npy")
    np.save(path, pseudo)
    problems, _ = validate_data(_sht_cfg(fixture, pseudo_labels_path=path))
    text = "\n".join(problems)
    assert f"has {n0 + 5} entries, expected {n0}" in text
    assert "no entry for train video" in text  # the other six videos


def test_ucf_gt_h5_checks(tmp_path):
    h5, train_txt, test_txt, gt_h5 = make_ucf_like(str(tmp_path))
    cfg = preset("ucf_ltn")
    data = replace(cfg.data, h5_path=h5, train_txt=train_txt,
                   test_txt=test_txt, test_mask_h5=gt_h5, n_patch=3,
                   d_model=16)
    problems, stats = validate_data(replace(cfg, data=data))
    assert problems == []
    # drop one abnormal mask row
    with h5py.File(gt_h5, "a") as f:
        victim = [k for k in f.keys()][0]
        del f[victim]
    problems, _ = validate_data(replace(cfg, data=data))
    assert any("no frame mask for abnormal" in p for p in problems)
    # no GT h5 configured at all
    data2 = replace(data, test_mask_h5="")
    problems, _ = validate_data(replace(cfg, data=data2))
    assert any("no data.test_mask_h5" in p for p in problems)


def test_cli_validate_data(tmp_path, capsys):
    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16)
    h5, train_txt, test_txt, mask_dir = fixture
    args = ["validate-data", "--preset", "sht_stn", "--h5", h5,
            "--train-txt", train_txt, "--test-txt", test_txt,
            "--mask-dir", mask_dir + "/", "--set", "data.n_patch=4",
            "--set", "data.d_model=16", "--set", "data.part_len=3"]
    assert main(args) == 0
    assert "ok: all referenced" in capsys.readouterr().out
    with open(train_txt, "a") as f:
        f.write("01_ghost,0\n")
    assert main(args) == 1
    assert "PROBLEM" in capsys.readouterr().out


def test_zero_clip_video_reported_not_hung(tmp_path):
    """A 0-clip UCF video with pseudo labels configured must be reported
    (previously the short-video doubling loop never terminated)."""
    h5, train_txt, test_txt, gt_h5 = make_ucf_like(str(tmp_path))
    with h5py.File(h5, "a") as f:
        victim = [k for k in f.keys()][0][:-4]
        del f[victim + ".npy"]
        f[victim + ".npy"] = np.zeros((0, 3, 16), np.float32)
    pseudo_path = str(tmp_path / "pseudo.npy")
    with h5py.File(h5, "r") as f:
        np.save(pseudo_path, {k: np.zeros(max(f[k].shape[0], 1), np.float32)
                              for k in f.keys()})
    cfg = preset("ucf_ltn")
    data = replace(cfg.data, h5_path=h5, train_txt=train_txt,
                   test_txt=test_txt, test_mask_h5=gt_h5, n_patch=3,
                   d_model=16, pseudo_labels_path=pseudo_path)
    problems, _ = validate_data(replace(cfg, data=data))
    assert any("0 stored clips" in p for p in problems)


def test_suffixless_dataset_reported_not_crash(tmp_path):
    """A dataset stored without the '.npy' suffix is a PROBLEM line, not an
    uncaught KeyError."""
    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16)
    h5, *_ = fixture
    with h5py.File(h5, "a") as f:
        arr = f["01_000.npy"][:]
        del f["01_000.npy"]
        f["01_000"] = arr
    problems, _ = validate_data(_sht_cfg(fixture))
    assert any("without the '.npy' dataset suffix" in p for p in problems)


def test_pseudo_doubling_at_exactly_part_len(tmp_path):
    """A UCF video with EXACTLY part_len clips is doubled by the runtime
    (sampler doubles while <= part_len); validate must expect the doubled
    pseudo entry count, not flag a consistent dataset."""
    h5, train_txt, test_txt, gt_h5 = make_ucf_like(str(tmp_path))
    cfg = preset("ucf_ltn")
    part_len = cfg.data.part_len
    with h5py.File(h5, "a") as f:
        victim = [k for k in f.keys()][0]
        del f[victim]
        f[victim] = np.zeros((part_len, 3, 16), np.float32)
    pseudo_path = str(tmp_path / "pseudo.npy")
    with h5py.File(h5, "r") as f:
        from lstc_vad_tpu.data.sampler import maybe_double_short
        np.save(pseudo_path,
                {k: np.zeros(maybe_double_short(f[k][:], part_len).shape[0],
                             np.float32) for k in f.keys()})
    data = replace(cfg.data, h5_path=h5, train_txt=train_txt,
                   test_txt=test_txt, test_mask_h5=gt_h5, n_patch=3,
                   d_model=16, pseudo_labels_path=pseudo_path)
    problems, _ = validate_data(replace(cfg, data=data))
    assert problems == []


def test_pickled_mask_rejected_like_runtime(tmp_path):
    """validate loads masks with the runtime's np.load semantics
    (allow_pickle=False): an object-array mask is a PROBLEM line, not a
    clean validation followed by a crash at eval startup."""
    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16)
    _, _, _, mask_dir = fixture
    import os
    victim = os.path.join(mask_dir, "02_004.npy")
    frames = np.load(victim).tolist()
    np.save(victim, np.array([frames], dtype=object), allow_pickle=True)
    problems, _ = validate_data(_sht_cfg(fixture))
    assert any("allow_pickle=False" in p and "02_004" in p for p in problems)


def test_ubnormal_missing_frame_count_caught(tmp_path):
    """A UBnormal test line without ',n_frames' is tolerated by the parser
    (train never uses it) but fatal for normal test videos: validate names
    it, and load_test_videos raises a clean ValueError, not a TypeError."""
    import pytest

    from fixtures import make_ubnormal_like
    from lstc_vad_tpu.data.datasets import load_test_videos
    from lstc_vad_tpu.data.feature_store import FeatureStore

    h5, train_txt, test_txt, mask_dir = make_ubnormal_like(str(tmp_path))
    with open(test_txt) as f:
        lines = f.read().splitlines()
    lines[0] = lines[0].split(",")[0]  # normal video, frame count dropped
    with open(test_txt, "w") as f:
        f.write("\n".join(lines) + "\n")

    cfg = preset("ubnormal_ltn")
    data = replace(cfg.data, h5_path=h5, train_txt=train_txt,
                   test_txt=test_txt, test_mask_dir=mask_dir + "/",
                   n_patch=4, d_model=8)
    problems, _ = validate_data(replace(cfg, data=data))
    assert any("no frame count" in p for p in problems)

    store = FeatureStore(h5, n_patch=4, d_model=8)
    with pytest.raises(ValueError, match="no frame count"):
        load_test_videos("UBnormal", test_txt, store, mask_dir=mask_dir + "/")
    store.close()
