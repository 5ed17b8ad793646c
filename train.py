#!/usr/bin/env python
"""Training CLI.

Usage (mirrors the reference's Hydra surface, reference src/train.py +
src/infra/launch.py):

    python train.py dataset=ffs dataset.path=/data/ffs_256.zip \\
        training.batch_size=64 training.kimg=25000 exp_suffix=myrun

    python train.py --cfg-path runs/exp/experiment_config.yaml   # frozen config

Composes configs/ groups with dotted overrides, freezes the resolved config
to <run_dir>/experiment_config.yaml (the reference's launch.py:35,64-67 ->
train.py:392 contract, which is what makes resume=latest work), then runs
the training loop.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("overrides", nargs="*", help="group=option or a.b.c=value")
    ap.add_argument("--config-dir", default=os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "configs"))
    ap.add_argument("--cfg-path", default=None,
                    help="frozen experiment_config.yaml (skips composition)")
    args = ap.parse_args()

    from stylegan_v_tpu.parallel import initialize_multihost
    initialize_multihost()

    from stylegan_v_tpu.utils import config as cfglib
    if args.cfg_path:
        cfg = cfglib.load_frozen(args.cfg_path)
        for ov in args.overrides:
            key, val = ov.split("=", 1)
            cfglib.set_by_path(cfg, key, cfglib._parse_value(val))
        run_dir = cfg.get("project_release_dir") if any(
            o.startswith("project_release_dir=") for o in args.overrides) \
            else os.path.dirname(os.path.abspath(args.cfg_path))
        os.makedirs(run_dir, exist_ok=True)
        cfglib.save(cfg, os.path.join(run_dir, "experiment_config.yaml"))
    else:
        cfg = cfglib.load_config(args.config_dir, args.overrides)
        run_dir = cfg.get("project_release_dir", "runs/exp")
        os.makedirs(run_dir, exist_ok=True)
        cfglib.save(cfg, os.path.join(run_dir, "experiment_config.yaml"))

    from stylegan_v_tpu.data import VideoFramesFolderDataset
    from stylegan_v_tpu.train_setup import setup_training, _sampling_from_cfg

    # probe dataset resolution/labels (reference train.py:100-106)
    data_path = cfg.training.get("data", cfg.dataset.path)
    probe = VideoFramesFolderDataset(
        data_path, sampling=_sampling_from_cfg(dict(cfg.sampling)),
        max_num_frames=int(cfg.dataset.get("max_num_frames", 1024)),
        use_labels=bool(cfg.training.get("cond", False)))
    resolution, c_dim = probe.resolution, (probe.label_dim if probe.has_labels else 0)
    probe.close()

    if cfg.training.get("debug_nans"):
        # NaN tracking during debugging (the sanitizer analog, SURVEY 5.2)
        import jax
        jax.config.update("jax_debug_nans", True)

    setup = setup_training(cfg, dataset_resolution=resolution,
                           dataset_c_dim=c_dim, run_dir=run_dir)

    if cfg.training.get("dry_run"):
        print("Dry run: configuration is valid.")
        print(f"  run_dir: {setup.run_dir}")
        print(f"  desc: {setup.desc}")
        print(f"  batch_size: {setup.train_cfg.batch_size}  "
              f"kimg: {setup.total_kimg}  r1_gamma: {setup.loss_cfg.r1_gamma}")
        return

    from stylegan_v_tpu.training.loop import training_loop
    training_loop(setup)


if __name__ == "__main__":
    main()
