"""End-to-end CLI tests for scripts/generate.py against a native snapshot.

(The reference-.pkl import path of the same CLI is covered in
test_legacy_import.py; here we cover the orbax path, best-checkpoint
selection via metric jsonls, mp4/grid/frames writers, and slow-mo.)
"""
import json
import os
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from stylegan_v_tpu.io import save_snapshot
from stylegan_v_tpu.models import Discriminator, Generator
from stylegan_v_tpu.training import OptimizerConfig, TrainingConfig, init_train_state

from test_models import small_disc_cfg, small_gen_cfg


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("gen_run"))
    G, D = Generator(small_gen_cfg()), Discriminator(small_disc_cfg())
    state = init_train_state(jax.random.PRNGKey(0), G, D,
                             OptimizerConfig(), OptimizerConfig(),
                             TrainingConfig(batch_size=4))
    save_snapshot(d, state, cur_nimg=0, configs={"G": G.cfg, "D": D.cfg})
    state2 = state.replace(step=state.step + 1)
    save_snapshot(d, state2, cur_nimg=2000, configs={"G": G.cfg, "D": D.cfg})
    return d


def run_cli(monkeypatch, argv):
    monkeypatch.setattr(sys, "argv", ["generate.py"] + argv)
    import generate
    generate.main()


def test_generate_mp4s(run_dir, tmp_path, monkeypatch):
    out = str(tmp_path / "out")
    run_cli(monkeypatch, ["--networks-dir", run_dir, "-o", out,
                          "--num-videos", "2", "--video-len", "5"])
    files = sorted(os.listdir(out))
    assert files == ["video0000.mp4", "video0001.mp4"]
    import cv2
    cap = cv2.VideoCapture(os.path.join(out, files[0]))
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame)
    cap.release()
    assert len(frames) == 5
    assert frames[0].shape == (32, 32, 3)
    assert np.asarray(frames).std() > 0            # non-black output


def test_generate_grid_and_frames(run_dir, tmp_path, monkeypatch):
    out = str(tmp_path / "grid")
    run_cli(monkeypatch, ["--networks-dir", run_dir, "-o", out,
                          "--num-videos", "4", "--video-len", "3",
                          "--as-grids"])
    assert os.path.exists(os.path.join(out, "grid.mp4"))

    out2 = str(tmp_path / "frames")
    run_cli(monkeypatch, ["--networks-dir", run_dir, "-o", out2,
                          "--num-videos", "2", "--video-len", "3",
                          "--save-as-frames", "--slowmo", "2.0"])
    for i in range(2):
        vdir = os.path.join(out2, f"video{i:04d}")
        assert sorted(os.listdir(vdir)) == [
            "000000.jpg", "000001.jpg", "000002.jpg"]


def test_generate_picks_best_by_metric_jsonl(run_dir, tmp_path, monkeypatch,
                                             capsys):
    # best-by-fvd: snapshot 0 scores better than the later snapshot
    with open(os.path.join(run_dir, "metric-fvd2048_16f.jsonl"), "w") as f:
        f.write(json.dumps({"results": {"fvd2048_16f": 10.0},
                            "snapshot": "network-snapshot-000000"}) + "\n")
        f.write(json.dumps({"results": {"fvd2048_16f": 50.0},
                            "snapshot": "network-snapshot-000002"}) + "\n")
    out = str(tmp_path / "best")
    run_cli(monkeypatch, ["--networks-dir", run_dir, "-o", out,
                          "--num-videos", "1", "--video-len", "2"])
    assert "network-snapshot-000000" in capsys.readouterr().out
    os.remove(os.path.join(run_dir, "metric-fvd2048_16f.jsonl"))


def test_generate_moco_decomposition(run_dir, tmp_path, monkeypatch):
    out = str(tmp_path / "moco")
    run_cli(monkeypatch, ["--networks-dir", run_dir, "-o", out,
                          "--num-videos", "4", "--video-len", "2",
                          "--moco-decomposition"])
    assert os.path.exists(os.path.join(out, "grid.mp4"))


def test_generate_rejects_nonsquare_moco(run_dir, tmp_path, monkeypatch):
    out = str(tmp_path / "bad")
    with pytest.raises(AssertionError, match="square num-videos"):
        run_cli(monkeypatch, ["--networks-dir", run_dir, "-o", out,
                              "--num-videos", "3", "--video-len", "2",
                              "--moco-decomposition"])


def test_generate_frame_sharded(run_dir, tmp_path, monkeypatch):
    """--frame-shards 2: one sharded program over a (data x frame) mesh
    (context-parallel analog, SURVEY §5.7) must write the same artifact
    layout as the chunked host loop."""
    out = str(tmp_path / "out_fs")
    run_cli(monkeypatch, ["--networks-dir", run_dir, "-o", out,
                          "--num-videos", "4", "--video-len", "8",
                          "--frame-shards", "2"])
    files = sorted(os.listdir(out))
    assert files == [f"video{i:04d}.mp4" for i in range(4)]
    import cv2
    cap = cv2.VideoCapture(os.path.join(out, files[0]))
    n, last = 0, None
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        n, last = n + 1, frame
    cap.release()
    assert n == 8 and last.shape == (32, 32, 3)
    assert last.std() > 1.0          # non-degenerate output
