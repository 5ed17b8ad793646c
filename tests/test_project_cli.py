"""End-to-end CLI smoke for scripts/project.py (w+/motion-z inversion)."""
import os
import re
import sys

import jax
import numpy as np
import PIL.Image
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from stylegan_v_tpu.io import save_snapshot
from stylegan_v_tpu.models import Discriminator, Generator
from stylegan_v_tpu.training import OptimizerConfig, TrainingConfig, init_train_state

from test_models import small_disc_cfg, small_gen_cfg


def test_project_cli_smoke(tmp_path, monkeypatch, capsys):
    run_dir = str(tmp_path / "run")
    G, D = Generator(small_gen_cfg()), Discriminator(small_disc_cfg())
    state = init_train_state(jax.random.PRNGKey(0), G, D,
                             OptimizerConfig(), OptimizerConfig(),
                             TrainingConfig(batch_size=4))
    snap = save_snapshot(run_dir, state, cur_nimg=0,
                         configs={"G": G.cfg, "D": D.cfg})

    target_dir = tmp_path / "target"
    target_dir.mkdir()
    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (32, 32, 3)).astype(np.uint8)
    for i in range(4):
        PIL.Image.fromarray(np.roll(base, i, axis=1)).save(
            target_dir / f"{i:04d}.png")

    out = str(tmp_path / "proj")
    monkeypatch.setattr(sys, "argv", [
        "project.py", "--network", snap, "--target-dir", str(target_dir),
        "-o", out, "--num-steps", "30", "--num-frames", "4",
        "--motion-init-trials", "2"])
    import project
    project.main()

    assert os.path.exists(os.path.join(out, "projected.mp4"))
    lat = np.load(os.path.join(out, "projected_latents.npz"))
    assert lat["w"].shape[1] == G.num_ws
    assert np.isfinite(lat["w"]).all() and np.isfinite(lat["motion_z"]).all()

    # optimization must make progress: final loss < motion-init-search loss
    text = capsys.readouterr().out
    init_l = float(re.search(r"best of \d+ -> ([\d.]+)", text).group(1))
    steps = re.findall(r"step\s+\d+\s+loss ([\d.]+)", text)
    assert steps and float(steps[-1]) < init_l


def test_project_cli_with_vgg16_lpips(tmp_path, monkeypatch, capsys):
    """With a TorchScript vgg16.pt present, project.py must optimize the
    REAL LPIPS objective through the host-autograd bridge (reference
    project.py:77-88,139). A tiny scripted stand-in with the reference
    call signature (img 0..255 NCHW, resize_images=, return_lpips=)
    validates the full wiring."""
    import torch

    class FakeVGG(torch.nn.Module):
        def __init__(self):
            super().__init__()
            torch.manual_seed(0)
            self.conv = torch.nn.Conv2d(3, 8, 4, stride=4)

        def forward(self, x, resize_images: bool = False,
                    return_lpips: bool = True):
            y = self.conv(x / 255.0)
            y = torch.nn.functional.relu(y).mean(dim=(2, 3))
            norm = torch.sqrt(torch.sum(y * y, dim=1, keepdim=True) + 1e-8)
            return y / norm

    det_dir = tmp_path / "detectors"
    det_dir.mkdir()
    torch.jit.script(FakeVGG().eval()).save(str(det_dir / "vgg16.pt"))

    run_dir = str(tmp_path / "run")
    G, D = Generator(small_gen_cfg()), Discriminator(small_disc_cfg())
    state = init_train_state(jax.random.PRNGKey(0), G, D,
                             OptimizerConfig(), OptimizerConfig(),
                             TrainingConfig(batch_size=4))
    snap = save_snapshot(run_dir, state, cur_nimg=0,
                         configs={"G": G.cfg, "D": D.cfg})
    target_dir = tmp_path / "target"
    target_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        PIL.Image.fromarray(
            rng.randint(0, 255, (32, 32, 3)).astype(np.uint8)).save(
            target_dir / f"{i:04d}.png")

    out = str(tmp_path / "proj")
    monkeypatch.setattr(sys, "argv", [
        "project.py", "--network", snap, "--target-dir", str(target_dir),
        "-o", out, "--num-steps", "30", "--num-frames", "4",
        "--motion-init-trials", "2", "--detector-dir", str(det_dir)])
    import project
    project.main()

    text = capsys.readouterr().out
    assert "Using VGG16-LPIPS perceptual loss" in text
    init_l = float(re.search(r"best of \d+ -> ([\d.]+)", text).group(1))
    steps = re.findall(r"step\s+\d+\s+loss ([\d.]+)", text)
    assert steps and float(steps[-1]) < init_l   # LPIPS objective decreases
    assert os.path.exists(os.path.join(out, "projected.mp4"))


def test_profile_model_cli_smoke(tmp_path, monkeypatch, capsys):
    """profile_model.py on a snapshot: prints a throughput row per batch."""
    run_dir = str(tmp_path / "run")
    G, D = Generator(small_gen_cfg()), Discriminator(small_disc_cfg())
    state = init_train_state(jax.random.PRNGKey(0), G, D,
                             OptimizerConfig(), OptimizerConfig(),
                             TrainingConfig(batch_size=4))
    snap = save_snapshot(run_dir, state, cur_nimg=0,
                         configs={"G": G.cfg, "D": D.cfg})
    monkeypatch.setattr(sys, "argv", [
        "profile_model.py", "--network", snap, "--frames", "2",
        "--batch-sizes", "1,2", "--iters", "2"])
    import profile_model
    profile_model.main()
    out = capsys.readouterr().out
    rows = [l for l in out.splitlines()
            if l.strip() and l.split()[0] in ("1", "2")]
    assert len(rows) == 2
    for r in rows:
        assert float(r.split()[3]) > 0          # frames/sec positive
