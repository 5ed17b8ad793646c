"""Config system tests: composition, interpolation, overrides, freeze."""
import os

import pytest

from stylegan_v_tpu.utils import config as cfglib
from stylegan_v_tpu.train_setup import setup_training, UserError

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")


def test_default_composition():
    cfg = cfglib.load_config(CONFIG_DIR)
    assert cfg.model.name == "stylegan-v"
    assert cfg.model.generator.motion.z_dim == 512
    # the motion_z_distance <-> min_period_len coupling (stylegan-v.yaml)
    assert cfg.model.generator.motion.motion_z_distance == \
        cfg.model.generator.time_enc.min_period_len == 16
    assert cfg.sampling.num_frames_per_video == 3
    assert cfg.dataset.name == "ffs_256"
    assert cfg.training.kimg == 25000
    assert cfg.training.metrics[0] == "fvd2048_16f"


def test_group_swap_and_leaf_overrides():
    cfg = cfglib.load_config(CONFIG_DIR, [
        "dataset=sky_timelapse",
        "model.generator.time_enc.min_period_len=256",
        "training.batch_size=32",
        "sampling=uniform",
    ])
    assert cfg.dataset.name == "sky_timelapse_256"
    # interpolation re-resolves after overrides (long-period SkyTimelapse cfg)
    assert cfg.model.generator.motion.motion_z_distance == 256
    assert cfg.training.batch_size == 32
    assert cfg.sampling.type == "uniform"


def test_freeze_roundtrip(tmp_path):
    cfg = cfglib.load_config(CONFIG_DIR, ["training.kimg=7"])
    p = str(tmp_path / "experiment_config.yaml")
    cfglib.save(cfg, p)
    cfg2 = cfglib.load_frozen(p)
    assert cfg2.training.kimg == 7
    assert cfg2.model.generator.motion.motion_z_distance == 16


def test_setup_training_auto_heuristics():
    # config default batch_size=64 wins (same as reference training/base.yaml)
    cfg = cfglib.load_config(CONFIG_DIR)
    setup = setup_training(cfg, dataset_resolution=256, dataset_c_dim=0,
                           run_dir="/tmp/x")
    assert setup.train_cfg.batch_size == 64
    assert abs(setup.loss_cfg.r1_gamma - 0.0002 * 256 ** 2 / 64) < 1e-6
    # with batch_size unset, the auto heuristic kicks in:
    # mb = max(min(1 * min(4096//256, 32), 64), 1) = 16
    cfg2 = cfglib.load_config(CONFIG_DIR, ["training.batch_size=null"])
    setup = setup_training(cfg2, dataset_resolution=256, dataset_c_dim=0,
                           run_dir="/tmp/x")
    assert setup.train_cfg.batch_size == 16
    assert setup.opt_g.lr == 0.0025
    assert setup.gen_cfg.img_resolution == 256
    assert setup.gen_cfg.num_bf16_res == 4
    assert setup.train_cfg.G_reg_interval is None          # pl_weight = 0
    assert setup.train_cfg.D_reg_interval == 16
    assert setup.train_cfg.ada_target == 0.6
    assert setup.augment_cfg is not None                   # bgc pipe


def test_transfer_resume_tweaks():
    """Resuming from a pretrained pkl makes ADA react faster and disables
    EMA rampup (reference train.py:315-317); latest/orbax resume does not."""
    cfg = cfglib.load_config(
        CONFIG_DIR, ["training.batch_size=null",
                     "training.resume=/x/network-snapshot-000100.pkl"])
    setup = setup_training(cfg, dataset_resolution=256, dataset_c_dim=0,
                           run_dir="/tmp/x")
    assert setup.train_cfg.ada_kimg == 100.0
    assert setup.train_cfg.ema_rampup is None

    cfg2 = cfglib.load_config(CONFIG_DIR, ["training.batch_size=null",
                                           "training.resume=latest"])
    setup2 = setup_training(cfg2, dataset_resolution=256, dataset_c_dim=0,
                            run_dir="/tmp/x")
    assert setup2.train_cfg.ada_kimg == 500.0
    assert setup2.train_cfg.ema_rampup is not None


def test_setup_training_fp32_and_noaug():
    cfg = cfglib.load_config(CONFIG_DIR, ["training.fp32=true",
                                          "training.aug=noaug"])
    setup = setup_training(cfg, dataset_resolution=64, dataset_c_dim=0)
    assert setup.gen_cfg.num_bf16_res == 0
    assert setup.gen_cfg.conv_clamp is None
    assert setup.augment_cfg is None


def test_cond_without_labels_raises():
    cfg = cfglib.load_config(CONFIG_DIR, ["training.cond=true"])
    with pytest.raises(UserError):
        setup_training(cfg, dataset_resolution=64, dataset_c_dim=0)


def test_batch_gpu_maps_to_accumulation():
    cfg = cfglib.load_config(CONFIG_DIR, ["training.batch_size=16",
                                          "training.batch_gpu=4"])
    setup = setup_training(cfg, dataset_resolution=64, dataset_c_dim=0)
    assert setup.train_cfg.batch_size == 16
    assert setup.train_cfg.batch_chip == 4
