"""Procedural moving-pattern dataset generator (scripts/make_moving_dataset.py):
layout readable by VideoFramesFolderDataset, deterministic, has real motion."""
import importlib.util
import os
import sys

import numpy as np
import pytest

_spec = importlib.util.spec_from_file_location(
    "make_moving_dataset",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "make_moving_dataset.py"))
mmd = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(mmd)

from stylegan_v_tpu.data.dataset import VideoFramesFolderDataset
from stylegan_v_tpu.models.config import SamplingConfig


def test_render_deterministic_and_moving():
    v1 = mmd.render_video(np.random.RandomState(7), res=32, frames=8)
    v2 = mmd.render_video(np.random.RandomState(7), res=32, frames=8)
    assert v1.shape == (8, 32, 32, 3) and v1.dtype == np.uint8
    np.testing.assert_array_equal(v1, v2)
    # consecutive frames differ (sprites move every frame)
    diffs = [np.abs(v1[t + 1].astype(int) - v1[t].astype(int)).mean()
             for t in range(7)]
    assert min(diffs) > 0.05


@pytest.mark.parametrize("as_zip", [True, False])
def test_written_dataset_loads(tmp_path, as_zip):
    out = str(tmp_path / ("mv.zip" if as_zip else "mv"))
    mmd.write_dataset(out, num_videos=4, frames=10, res=32, seed=1)
    sampling = SamplingConfig(num_frames_per_video=3, max_num_frames=8,
                              total_dists=(1, 2, 4), max_dist=4)
    ds = VideoFramesFolderDataset(path=out, sampling=sampling,
                                  max_num_frames=8)
    assert len(ds) == 4
    item = ds[0]
    img = item["image"]
    assert img.shape == (3, 32, 32, 3) and img.dtype == np.uint8
    assert img.std() > 5            # not a constant frame
