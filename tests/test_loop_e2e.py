"""End-to-end training-loop smoke test on the CPU mesh: artifacts, telemetry,
snapshot/resume round trip (SURVEY §4 test-pyramid level 4)."""
import json
import os

import numpy as np
import pytest

from stylegan_v_tpu.models.config import SamplingConfig
from stylegan_v_tpu.train_setup import TrainSetup
from stylegan_v_tpu.training.loop import training_loop
from stylegan_v_tpu.training.loss import LossConfig
from stylegan_v_tpu.training.train_step import OptimizerConfig, TrainingConfig
from test_data import build_video_dataset_dir
from test_models import small_disc_cfg, small_gen_cfg


def tiny_setup(tmp_path, run_name, kimg=0.05, resume=None):
    sampling = SamplingConfig(num_frames_per_video=3, max_num_frames=16,
                              total_dists=(1, 2, 4, 8), max_dist=8)
    ds_path = build_video_dataset_dir(str(tmp_path), num_videos=6,
                                      frames_per_video=20, res=32)
    return TrainSetup(
        run_dir=str(tmp_path / run_name), desc="tiny",
        gen_cfg=small_gen_cfg(), disc_cfg=small_disc_cfg(),
        loss_cfg=LossConfig(r1_gamma=0.5, pl_weight=0.0),
        train_cfg=TrainingConfig(batch_size=4, ema_kimg=0.5, ada_target=0.6),
        opt_g=OptimizerConfig(lr=0.002), opt_d=OptimizerConfig(lr=0.002),
        augment_cfg=None, augment_p=0.0,
        dataset_kwargs=dict(path=ds_path, sampling=sampling, max_num_frames=16),
        sampling_cfg=sampling, use_fractional_t=True,
        total_kimg=kimg, kimg_per_tick=0.012, snap_ticks=2,
        metrics=[], seed=0, num_chips=1, resume=resume, freeze_layers=0,
        num_workers=2)


@pytest.mark.slow
def test_loop_artifacts_and_resume(tmp_path):
    setup = tiny_setup(tmp_path, "run")
    result = training_loop(setup, log=lambda *_: None)
    assert result["cur_nimg"] >= 48
    run = tmp_path / "run"
    files = os.listdir(run)
    assert "reals.jpg" in files
    assert "stats.jsonl" in files
    # untrained-G_ema panel at step 0 (reference training_loop.py:283)
    assert "fakes_init.jpg" in files
    assert any(f.startswith("fakes") and f[5].isdigit() and f.endswith(".jpg")
               for f in files)
    assert any(f.startswith("fakes") and f.endswith(".mp4") for f in files)
    snaps = [f for f in files if f.startswith("network-snapshot-")
             and not f.endswith(".json")]
    assert snaps, files
    # stats.jsonl rows carry mean/std/num per stat
    rows = [json.loads(l) for l in open(run / "stats.jsonl")]
    assert rows and "Loss/G/loss" in rows[0]
    assert set(rows[0]["Loss/G/loss"]) == {"mean", "std", "num"}
    # live per-variant timing telemetry (reference Timing/<phase>,
    # training_loop.py:254-262,422-424): the fused-step analog is per
    # program variant; with G/D reg intervals active all variants appear
    # across the run's ticks
    timing_keys = {k for row in rows for k in row if k.startswith("Timing/")}
    assert "Timing/data_fetch" in timing_keys
    assert any(k.startswith("Timing/Gmain_Dmain") for k in timing_keys)

    # resume=latest continues from the recorded nimg
    setup2 = tiny_setup(tmp_path, "run", kimg=0.1, resume="latest")
    result2 = training_loop(setup2, log=lambda *_: None)
    assert result2["cur_nimg"] > result["cur_nimg"]


@pytest.mark.slow
def test_loop_with_ada_augment(tmp_path):
    """The production ADA path through the loop: augment_cfg set -> the loop
    builds the pipe with the mesh's data_shards and the train step runs the
    full bgc pipeline (auto shear executor). Catches wiring typos in the
    loop's augment construction that no unit test sees."""
    import dataclasses
    from stylegan_v_tpu.training.augment import AUGPIPE_SPECS, AugmentConfig
    setup = tiny_setup(tmp_path, "run_ada", kimg=0.02)
    setup = dataclasses.replace(
        setup, augment_cfg=AugmentConfig(**AUGPIPE_SPECS["bgc"]),
        augment_p=0.3)
    result = training_loop(setup, log=lambda *_: None)
    assert result["cur_nimg"] >= 24
    rows = [json.loads(l) for l in
            open(tmp_path / "run_ada" / "stats.jsonl")]
    assert rows and "Progress/augment_p" in rows[0]


@pytest.mark.slow
def test_loop_transfer_from_reference_pkl(tmp_path):
    """resume=<reference pkl> imports weights before training (transfer
    learning); needs /root/reference to build the pickle."""
    if not os.path.isdir("/root/reference/src"):
        pytest.skip("reference repo unavailable")
    import pickle
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ref_shims import install, make_ref_cfg
    install()
    from src.training.networks import Generator as RefG
    RefG_inst = RefG(c_dim=0, w_dim=64, img_resolution=32, img_channels=3,
                     cfg=make_ref_cfg(),
                     mapping_kwargs={"num_layers": 2},
                     synthesis_kwargs={"channel_base": 1024, "channel_max": 64,
                                       "num_fp16_res": 0, "conv_clamp": None})
    pkl = str(tmp_path / "ref.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(dict(G_ema=RefG_inst, G=RefG_inst), f)

    # tiny_setup's small_gen_cfg matches the reference dims except sampling
    setup = tiny_setup(tmp_path, "xfer", kimg=0.02, resume=pkl)
    result = training_loop(setup, log=lambda *_: None)
    assert result["cur_nimg"] > 0


@pytest.mark.slow
def test_loop_in_training_metrics(tmp_path):
    """In-training metric evaluation runs and writes metric jsonl."""
    from stylegan_v_tpu.metrics import metric_main, register_detector
    from test_metrics import stub_video_detector

    register_detector("i3d", stub_video_detector)
    if not metric_main.is_valid_metric("tinyfvd"):
        @metric_main.register_metric
        def tinyfvd(opts):
            from stylegan_v_tpu.metrics.frechet_video_distance import compute_fvd
            return {"tinyfvd": compute_fvd(opts, max_real=4, num_gen=4,
                                           num_frames=4)}

    setup = tiny_setup(tmp_path, "mrun", kimg=0.03)
    setup.metrics = ["tinyfvd"]
    setup = dataclasses_replace_snap(setup)
    logs = []
    training_loop(setup, log=logs.append)
    jsonl = tmp_path / "mrun" / "metric-tinyfvd.jsonl"
    assert jsonl.exists(), "\n".join(str(l) for l in logs[-10:])
    rec = json.loads(open(jsonl).readline())
    assert np.isfinite(rec["results"]["tinyfvd"])


def dataclasses_replace_snap(setup):
    setup.snap_ticks = 1
    return setup


@pytest.mark.slow
def test_loop_zero1_and_resume(tmp_path):
    """training.zero1 through the REAL loop: ZeRO-1 placement on the
    8-device mesh (batch 8 -> dp=8), snapshotting of the sharded state,
    and a resume that re-shards the restored state. Covers the loop's
    zero1 branch end-to-end, not just the step-level unit test."""
    import dataclasses
    setup = tiny_setup(tmp_path, "run_z1")
    setup = dataclasses.replace(
        setup,
        train_cfg=dataclasses.replace(setup.train_cfg, batch_size=8,
                                      zero1=True))
    logs = []
    result = training_loop(setup, log=logs.append)
    assert result["cur_nimg"] >= 48
    assert any("ZeRO-1" in str(l) for l in logs), logs[:8]
    run = tmp_path / "run_z1"
    snaps = [f for f in os.listdir(run) if f.startswith("network-snapshot-")
             and not f.endswith(".json")]
    assert snaps, os.listdir(run)

    setup2 = dataclasses.replace(setup, total_kimg=0.1, resume="latest")
    result2 = training_loop(setup2, log=logs.append)
    assert result2["cur_nimg"] > result["cur_nimg"]
