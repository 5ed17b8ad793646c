#!/usr/bin/env python
"""Experiment launcher (reference src/infra/launch.py re-imagined for TPU VMs).

Creates a git-clean project release dir (code snapshot + frozen
experiment_config.yaml + training_cmd.sh), then either runs training locally
or emits a job sequence: N dependent re-invocations with
`training.resume=latest`, the TPU-pod analog of the reference's SLURM
`--dependency=afterany` chaining for preemptible capacity
(reference launch.py:72-104, slurm_job.py).

    python scripts/launch.py dataset=ffs dataset.path=/data/ffs.zip \\
        exp_suffix=run1 [--print-only] [--jobs 3]
"""
from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def git_is_clean() -> bool:
    try:
        out = subprocess.run(["git", "status", "--porcelain"], cwd=REPO,
                             capture_output=True, text=True, timeout=30)
        return out.returncode == 0 and not out.stdout.strip()
    except Exception:
        return True   # not a git checkout: skip the check


def create_project_dir(cfg, run_dir: str) -> None:
    """Code snapshot + frozen config (reference infra/utils.py:56-82)."""
    from stylegan_v_tpu.utils import config as cfglib
    os.makedirs(run_dir, exist_ok=True)
    code_dir = os.path.join(run_dir, "code")
    if not os.path.exists(code_dir):
        os.makedirs(code_dir)
        for item in ("stylegan_v_tpu", "scripts", "configs", "train.py",
                     "bench.py"):
            src = os.path.join(REPO, item)
            dst = os.path.join(code_dir, item)
            if os.path.isdir(src):
                shutil.copytree(src, dst,
                                ignore=shutil.ignore_patterns("__pycache__"))
            elif os.path.exists(src):
                shutil.copyfile(src, dst)
    cfglib.save(cfg, os.path.join(run_dir, "experiment_config.yaml"))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("overrides", nargs="*")
    ap.add_argument("--config-dir", default=os.path.join(REPO, "configs"))
    ap.add_argument("--jobs", type=int, default=None,
                    help="job sequence length (default: infra.job_sequence_length)")
    ap.add_argument("--print-only", action="store_true",
                    help="print commands without executing (reference print_only)")
    ap.add_argument("--allow-dirty", action="store_true")
    args = ap.parse_args()

    from stylegan_v_tpu.utils import config as cfglib
    cfg = cfglib.load_config(args.config_dir, args.overrides)
    run_dir = cfg.get("project_release_dir", "runs/exp")

    if not args.allow_dirty and not git_is_clean():
        raise SystemExit(
            "Refusing to launch from a dirty git checkout (the release dir "
            "must be reproducible; reference infra/utils.py:64-68). "
            "Commit your changes or pass --allow-dirty.")

    create_project_dir(cfg, run_dir)
    n_jobs = args.jobs or int(cfg.get("infra", {}).get("job_sequence_length", 1))

    cmds = []
    cfg_path = os.path.join(run_dir, "experiment_config.yaml")
    base = [sys.executable, os.path.join(run_dir, "code", "train.py"),
            "--cfg-path", cfg_path]
    cmds.append(base)
    for _ in range(1, n_jobs):
        cmds.append(base + ["training.resume=latest"])   # preemption recovery

    with open(os.path.join(run_dir, "training_cmd.sh"), "w") as f:
        f.write("#!/bin/sh\n" + "\n".join(" ".join(c) for c in cmds) + "\n")

    if args.print_only or cfg.get("infra", {}).get("print_only"):
        for c in cmds:
            print(" ".join(c))
        return

    for i, c in enumerate(cmds):
        print(f"[launch] job {i + 1}/{len(cmds)}: {' '.join(c)}")
        ret = subprocess.run(c).returncode
        print(f"[launch] job {i + 1} exited with {ret}")


if __name__ == "__main__":
    main()
