#!/usr/bin/env python
"""Hyperparameter-sweep launcher (reference src/infra/slurm_batch_launch.py
re-imagined for TPU VMs).

Reads a sweep file (default configs/experiments.yaml) of the form

    <group>:
      common_args:            # overrides shared by every experiment in the group
        training.batch_size: 16
      experiments:
        <exp_name>: {}        # name only -> exp_suffix
        <exp_name2>:
          model.generator.time_enc.min_period_len: 32

and emits one scripts/launch.py invocation per (dataset x experiment),
merging common_args <- experiment overrides <- --extra overrides
(reference slurm_batch_launch.py:14-45, construct_experiments_args).

    python scripts/batch_launch.py --group ffs --datasets ffs,sky_timelapse \\
        --print-only
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def construct_experiment_args(group_cfg: dict, experiments_list=None,
                              suffix: str = ""):
    """Merge common_args with per-experiment overrides; one dict per
    experiment (reference slurm_batch_launch.py:35-45)."""
    common = dict(group_cfg.get("common_args") or {})
    out = []
    for name, exp_cfg in (group_cfg.get("experiments") or {}).items():
        if experiments_list is not None and name not in experiments_list:
            continue
        merged = {**common, **(exp_cfg or {})}
        merged["exp_suffix"] = f"{name}{suffix}"
        out.append(merged)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sweep-file",
                    default=os.path.join(REPO, "configs", "experiments.yaml"))
    ap.add_argument("--group", required=True,
                    help="top-level group in the sweep file")
    ap.add_argument("--datasets", required=True,
                    help="comma-separated dataset config names")
    ap.add_argument("--experiments", default=None,
                    help="comma-separated subset of experiment names")
    ap.add_argument("--suffix", default="", help="appended to each exp_suffix")
    ap.add_argument("--extra", nargs="*", default=[],
                    help="extra key=value overrides applied to every job")
    ap.add_argument("--print-only", action="store_true")
    ap.add_argument("--allow-dirty", action="store_true")
    args = ap.parse_args()

    import yaml
    with open(args.sweep_file) as f:
        sweep = yaml.safe_load(f)
    if args.group not in sweep:
        raise SystemExit(f"unknown group {args.group!r}; "
                         f"available: {sorted(sweep)}")
    exp_filter = (args.experiments.split(",") if args.experiments else None)
    exp_dicts = construct_experiment_args(sweep[args.group], exp_filter,
                                          args.suffix)
    if not exp_dicts:
        raise SystemExit("no experiments matched")

    launcher = os.path.join(REPO, "scripts", "launch.py")
    for dataset in args.datasets.split(","):
        for exp in exp_dicts:
            overrides = [f"dataset={dataset}"]
            overrides += [f"{k}={v}" for k, v in exp.items()]
            overrides += list(args.extra)
            cmd = [sys.executable, launcher] + overrides
            if args.allow_dirty:
                cmd.append("--allow-dirty")
            if args.print_only:
                print(" ".join(cmd))
            else:
                print(f"[batch_launch] {' '.join(cmd)}")
                ret = subprocess.run(cmd).returncode
                if ret != 0:
                    print(f"[batch_launch] job failed with {ret}; continuing")


if __name__ == "__main__":
    main()
