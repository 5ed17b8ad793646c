"""End-to-end CLI test for scripts/calc_metrics.py.

Exercises the full user path: orbax snapshot on disk -> load_any_checkpoint
-> dataset kwargs -> metric registry -> stub detectors (SGV_STUB_DETECTORS
backend) -> jsonl report in the run dir. Uses a tiny registered metric so
the whole flow runs in seconds on the CPU test mesh.
"""
import json
import os
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from stylegan_v_tpu.io import save_snapshot
from stylegan_v_tpu.metrics import metric_main
from stylegan_v_tpu.metrics import frechet_video_distance as fvd_lib
from stylegan_v_tpu.metrics import frechet_inception_distance as fid_lib
from stylegan_v_tpu.models import Discriminator, Generator
from stylegan_v_tpu.training import OptimizerConfig, TrainingConfig, init_train_state

from test_data import build_video_dataset_dir
from test_models import small_disc_cfg, small_gen_cfg


@metric_main.register_metric
def fvd64_4f_tiny(opts):
    return {"fvd64_4f_tiny": fvd_lib.compute_fvd(opts, max_real=8, num_gen=8,
                                                 num_frames=4)}


@metric_main.register_metric
def fid64_tiny(opts):
    return {"fid64_tiny": fid_lib.compute_fid(opts, max_real=16, num_gen=16)}


@pytest.fixture(scope="module")
def snapshot_dir(tmp_path_factory):
    run_dir = str(tmp_path_factory.mktemp("run"))
    G, D = Generator(small_gen_cfg()), Discriminator(small_disc_cfg())
    state = init_train_state(jax.random.PRNGKey(0), G, D,
                             OptimizerConfig(), OptimizerConfig(),
                             TrainingConfig(batch_size=4))
    path = save_snapshot(run_dir, state, cur_nimg=0,
                         configs={"G": G.cfg, "D": D.cfg})
    return path


def test_calc_metrics_cli_end_to_end(snapshot_dir, tmp_path, monkeypatch, capsys):
    data = build_video_dataset_dir(str(tmp_path), num_videos=6,
                                   frames_per_video=12, res=32)
    monkeypatch.setenv("SGV_STUB_DETECTORS", "1")
    monkeypatch.setattr(sys, "argv", [
        "calc_metrics.py", "--network", snapshot_dir, "--data", data,
        "--metrics", "fvd64_4f_tiny,fid64_tiny"])
    import calc_metrics
    calc_metrics.main()
    out = capsys.readouterr().out
    assert "fvd64_4f_tiny" in out and "fid64_tiny" in out

    run_dir = os.path.dirname(os.path.abspath(snapshot_dir))
    reports = [f for f in os.listdir(run_dir) if f.startswith("metric-")]
    assert len(reports) == 2
    for f in reports:
        rec = json.loads(open(os.path.join(run_dir, f)).read().splitlines()[-1])
        (name, value), = rec["results"].items()
        assert value >= 0 and value == value            # finite, non-negative
        assert rec["snapshot"] == os.path.basename(snapshot_dir)


def test_calc_metrics_cli_rejects_unknown_metric(snapshot_dir, tmp_path,
                                                 monkeypatch):
    data = build_video_dataset_dir(str(tmp_path), num_videos=2,
                                   frames_per_video=6, res=32)
    monkeypatch.setattr(sys, "argv", [
        "calc_metrics.py", "--network", snapshot_dir, "--data", data,
        "--metrics", "definitely_not_a_metric"])
    import calc_metrics
    with pytest.raises(SystemExit, match="unknown metric"):
        calc_metrics.main()


def test_calc_metrics_for_dataset_cli(tmp_path, monkeypatch, capsys):
    """Dataset-vs-dataset mode (generator_as_dataset): identical datasets
    must give FVD == 0; disjoint ones must give FVD > 0."""
    real = build_video_dataset_dir(str(tmp_path / "a"), num_videos=6,
                                   frames_per_video=8, res=32)
    fake = build_video_dataset_dir(str(tmp_path / "b"), num_videos=6,
                                   frames_per_video=8, res=32)
    # make 'fake' genuinely different (inverted pixels), not just re-sampled
    import PIL.Image
    import numpy as np
    for dirpath, _dirs, files in os.walk(fake):
        for fn in files:
            p = os.path.join(dirpath, fn)
            img = np.asarray(PIL.Image.open(p))
            PIL.Image.fromarray(255 - img).save(p)
    monkeypatch.setenv("SGV_STUB_DETECTORS", "1")
    monkeypatch.setenv("HOME", str(tmp_path))       # isolate the stats cache
    run_dir = str(tmp_path / "reports")

    @metric_main.register_metric
    def fvd_ds_tiny(opts):
        return {"fvd_ds_tiny": fvd_lib.compute_fvd(opts, max_real=6, num_gen=6,
                                                   num_frames=4)}

    import calc_metrics_for_dataset as cli
    monkeypatch.setattr(sys, "argv", [
        "x", "--real-data", real, "--fake-data", real,
        "--metrics", "fvd_ds_tiny", "--resolution", "32",
        "--max-num-frames", "8", "--run-dir", run_dir])
    cli.main()
    rec = json.loads(open(os.path.join(
        run_dir, "metric-fvd_ds_tiny.jsonl")).read().splitlines()[-1])
    assert rec["results"]["fvd_ds_tiny"] == pytest.approx(0.0, abs=1e-8)

    monkeypatch.setattr(sys, "argv", [
        "x", "--real-data", real, "--fake-data", fake,
        "--metrics", "fvd_ds_tiny", "--resolution", "32",
        "--max-num-frames", "8", "--run-dir", run_dir])
    cli.main()
    rec = json.loads(open(os.path.join(
        run_dir, "metric-fvd_ds_tiny.jsonl")).read().splitlines()[-1])
    assert rec["results"]["fvd_ds_tiny"] > 0
