"""Data-layer tests: synthetic frame datasets (dir + zip), samplers, loader.

Includes the reference's only formal test (remove_root,
reference tests/test_data_utils.py) plus much more.
"""
import json
import os
import zipfile

import numpy as np
import PIL.Image
import pytest

from stylegan_v_tpu.data import (
    ImageFolderDataset, TrainingDataLoader, VideoFramesFolderDataset,
    infinite_indices, remove_root, sample_frames,
)
from stylegan_v_tpu.models.config import SamplingConfig


def build_video_dataset_dir(root, num_videos=4, frames_per_video=24, res=16,
                            labels=None):
    ds_dir = os.path.join(root, "dataset")
    os.makedirs(ds_dir, exist_ok=True)
    label_entries = []
    for v in range(num_videos):
        vdir = os.path.join(ds_dir, f"video{v:04d}")
        os.makedirs(vdir, exist_ok=True)
        for f in range(frames_per_video):
            arr = np.full((res, res, 3), (v * 37 + f) % 256, np.uint8)
            fname = os.path.join(vdir, f"{f:06d}.png")
            PIL.Image.fromarray(arr).save(fname)
            if labels is not None:
                label_entries.append(
                    [f"video{v:04d}/{f:06d}.png", labels[v]])
    if labels is not None:
        with open(os.path.join(ds_dir, "dataset.json"), "w") as fp:
            json.dump({"labels": label_entries}, fp)
    return ds_dir


def build_video_dataset_zip(root, **kw):
    ds_dir = build_video_dataset_dir(root, **kw)
    zpath = os.path.join(root, "dataset.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _dirs, files in os.walk(ds_dir):
            for f in files:
                full = os.path.join(dirpath, f)
                z.write(full, os.path.relpath(full, ds_dir))
    return zpath


SAMPLING = SamplingConfig(num_frames_per_video=3, max_num_frames=16,
                          total_dists=(1, 2, 4, 8), max_dist=8)


def test_remove_root():
    # The reference's entire formal test suite (tests/test_data_utils.py:1-11).
    assert remove_root("", "a") == ""
    assert remove_root("a", "a") == ""
    assert remove_root("/a", "a") == ""
    assert remove_root("a/b", "a") == "b"
    assert remove_root("b/a", "a") == "b/a"
    assert remove_root("a/b/c", "a") == "b/c"


@pytest.mark.parametrize("kind", ["dir", "zip"])
def test_video_dataset_training_mode(tmp_path, kind):
    path = (build_video_dataset_dir if kind == "dir" else build_video_dataset_zip)(
        str(tmp_path))
    ds = VideoFramesFolderDataset(path, sampling=SAMPLING, max_num_frames=16)
    assert len(ds) == 4
    assert ds.resolution == 16
    item = ds[0]
    assert item["image"].shape == (3, 16, 16, 3)      # [F, H, W, C]
    assert item["image"].dtype == np.uint8
    assert item["times"].shape == (3,)
    assert (np.diff(item["times"]) > 0).all()
    assert item["video_len"] == 16
    # frame pixel values encode (video*37+abs_frame)%256; times are RELATIVE
    # to the random sampling window (reference dataset.py:449), so all frames
    # must share one window offset consistent with their pixels.
    v_raw = int(ds._raw_idx[0])
    offsets = {int(item["image"][k, 0, 0, 0]) - (v_raw * 37 + int(t)) % 256
               for k, t in enumerate(item["times"])}
    assert len(offsets) == 1
    assert 0 <= offsets.pop() <= 24 - 16


def test_video_dataset_eval_mode(tmp_path):
    path = build_video_dataset_dir(str(tmp_path))
    ds = VideoFramesFolderDataset(path, load_n_consecutive=4,
                                  load_n_consecutive_random_offset=False,
                                  subsample_factor=2, discard_short_videos=True)
    item = ds[0]
    assert item["image"].shape == (4, 16, 16, 3)
    np.testing.assert_array_equal(item["times"], [0, 2, 4, 6])


def test_video_dataset_labels_and_onehot(tmp_path):
    path = build_video_dataset_dir(str(tmp_path), labels=[0, 1, 2, 1])
    ds = VideoFramesFolderDataset(path, sampling=SAMPLING, use_labels=True)
    assert ds.label_dim == 3
    lab = ds.get_label(1)
    np.testing.assert_array_equal(lab, [0, 1, 0])


def test_xflip_doubles_dataset(tmp_path):
    path = build_video_dataset_dir(str(tmp_path))
    ds = VideoFramesFolderDataset(path, sampling=SAMPLING, xflip=True)
    assert len(ds) == 8


def test_image_folder_dataset(tmp_path):
    path = build_video_dataset_dir(str(tmp_path), num_videos=2, frames_per_video=5)
    ds = ImageFolderDataset(path)
    assert len(ds) == 10                              # frames-as-images (FID path)
    item = ds[0]
    assert item["image"].shape == (16, 16, 3)


def test_sample_frames_policies():
    rng = np.random.RandomState(0)
    for _ in range(50):
        t = sample_frames(SAMPLING, total_video_len=16, rng=rng)
        assert len(t) == 3
        assert (np.diff(t) > 0).all()
        assert t[-1] - t[0] <= 8 and t[-1] < 16 and t[0] >= 0
    uni = SamplingConfig(type="uniform", num_frames_per_video=3, max_num_frames=16,
                         max_dist=4)
    for _ in range(50):
        t = sample_frames(uni, total_video_len=16, rng=rng)
        d = np.diff(t)
        assert (d == d[0]).all() and 1 <= d[0] <= 4
    # fractional offsets
    tf = sample_frames(SAMPLING, total_video_len=16, use_fractional_t=True, rng=rng)
    assert tf.dtype.kind == "f"


def test_infinite_indices_rank_partition():
    """Two ranks together cover the index stream disjointly (DP sharding)."""
    it0 = infinite_indices(10, rank=0, num_replicas=2, seed=3)
    it1 = infinite_indices(10, rank=1, num_replicas=2, seed=3)
    a = [next(it0) for _ in range(20)]
    b = [next(it1) for _ in range(20)]
    assert all(0 <= x < 10 for x in a + b)
    # deterministic given seed
    it0b = infinite_indices(10, rank=0, num_replicas=2, seed=3)
    assert [next(it0b) for _ in range(20)] == a
    # both ranks eventually see most of the data
    assert len(set(a)) >= 8 and len(set(b)) >= 8


def test_training_loader_batch_contract(tmp_path):
    path = build_video_dataset_dir(str(tmp_path), num_videos=6)
    ds = VideoFramesFolderDataset(path, sampling=SAMPLING)
    loader = TrainingDataLoader(ds, batch_size=4, num_workers=2, prefetch=2,
                                use_fractional_t=True)
    try:
        for _ in range(3):
            batch = next(loader)
            assert batch["real_img"].shape == (4, 3, 16, 16, 3)
            assert batch["real_img"].dtype == np.uint8
            assert batch["real_t"].shape == (4, 3)
            assert batch["gen_t"].shape == (4, 3, 3)
            assert batch["gen_c"].shape == (4, 3, 0)
            assert (np.diff(batch["gen_t"], axis=-1) > 0).all()
    finally:
        loader.close()


def test_zip_dataset_with_labels(tmp_path):
    """Label loading through the ZIP path (dataset.json inside the archive)."""
    import zipfile
    ds_dir = build_video_dataset_dir(str(tmp_path), num_videos=3,
                                     frames_per_video=6, labels=[2, 0, 1])
    zpath = os.path.join(str(tmp_path), "ds.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _dirs, files in os.walk(ds_dir):
            for f in files:
                full = os.path.join(dirpath, f)
                z.write(full, os.path.relpath(full, ds_dir))
    ds = VideoFramesFolderDataset(zpath, sampling=SAMPLING, max_num_frames=6,
                                  use_labels=True)
    assert ds.label_dim == 3
    np.testing.assert_array_equal(ds.get_label(0), [0, 0, 1])
    np.testing.assert_array_equal(ds.get_label(1), [1, 0, 0])


def test_short_video_discard_error_is_informative(tmp_path):
    path = build_video_dataset_dir(str(tmp_path), frames_per_video=8)
    with pytest.raises(IOError, match="shorter than the required 16"):
        VideoFramesFolderDataset(path, load_n_consecutive=16,
                                 discard_short_videos=True)
