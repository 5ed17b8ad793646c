"""End-to-end CLI tests for train.py's config surface (dry-run mode).

Covers the two user entry paths: fresh composition from configs/ with dotted
overrides, and the frozen experiment_config.yaml resume path (--cfg-path),
including CLI overrides applied on top of a frozen config.
"""
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from test_data import build_video_dataset_dir


def run_train_cli(monkeypatch, argv):
    monkeypatch.setattr(sys, "argv", ["train.py"] + argv)
    # load OUR train.py by path: other test modules put /root/reference/src
    # on sys.path, which also has a train.py
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "sgv_train_cli", os.path.join(REPO, "train.py"))
    train = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(train)
    train.main()


@pytest.fixture()
def tiny_data(tmp_path):
    return build_video_dataset_dir(str(tmp_path), num_videos=4,
                                   frames_per_video=24, res=32)


def test_train_dry_run_compose(tiny_data, tmp_path, monkeypatch, capsys):
    run_dir = str(tmp_path / "run")
    run_train_cli(monkeypatch, [
        f"dataset.path={tiny_data}", f"project_release_dir={run_dir}",
        "training.dry_run=true", "training.batch_size=4",
        "training.kimg=1", "model.loss_kwargs.r1_gamma=0.5"])
    out = capsys.readouterr().out
    assert "Dry run: configuration is valid." in out
    assert "batch_size: 4" in out and "r1_gamma: 0.5" in out
    assert os.path.exists(os.path.join(run_dir, "experiment_config.yaml"))


def test_train_dry_run_frozen_config_with_override(tiny_data, tmp_path,
                                                   monkeypatch, capsys):
    run_dir = str(tmp_path / "run")
    run_train_cli(monkeypatch, [
        f"dataset.path={tiny_data}", f"project_release_dir={run_dir}",
        "training.dry_run=true", "training.batch_size=4", "training.kimg=1"])
    capsys.readouterr()

    cfg_path = os.path.join(run_dir, "experiment_config.yaml")
    run_train_cli(monkeypatch, ["--cfg-path", cfg_path,
                                "training.batch_size=8"])
    out = capsys.readouterr().out
    assert "Dry run: configuration is valid." in out
    assert "batch_size: 8" in out                  # override beats frozen value


def test_batch_launch_print_only(tmp_path, monkeypatch, capsys):
    """Sweep-file expansion: (datasets x experiments) launch commands with
    common_args merged under per-experiment overrides."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    sweep = tmp_path / "sweep.yaml"
    sweep.write_text(
        "g1:\n"
        "  common_args:\n"
        "    training.batch_size: 16\n"
        "  experiments:\n"
        "    base: {}\n"
        "    big:\n"
        "      training.batch_size: 32\n")
    monkeypatch.setattr(sys, "argv", [
        "batch_launch.py", "--sweep-file", str(sweep), "--group", "g1",
        "--datasets", "ffs,ucf101", "--print-only"])
    import batch_launch
    batch_launch.main()
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 4                       # 2 datasets x 2 experiments
    assert any("dataset=ffs" in l and "training.batch_size=16" in l
               and "exp_suffix=base" in l for l in lines)
    assert any("dataset=ucf101" in l and "training.batch_size=32" in l
               and "exp_suffix=big" in l for l in lines)

    # per-experiment override must BEAT common_args
    big = [l for l in lines if "exp_suffix=big" in l]
    assert all("training.batch_size=32" in l
               and "training.batch_size=16" not in l for l in big)
