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
    import train
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
