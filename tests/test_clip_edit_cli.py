"""End-to-end CLI test for gradient-based CLIP editing (scripts/clip_edit.py)
with a tiny LOCAL transformers CLIP checkpoint and a TorchScript ArcFace
stand-in — validates the full reference objective wiring (CLIP cosine + w-l2
+ ArcFace identity, reference clip_edit.py:44-110,161-205) with gradients
flowing host<->TPU through the bridge."""
import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from stylegan_v_tpu.io import save_snapshot
from stylegan_v_tpu.models import Discriminator, Generator
from stylegan_v_tpu.training import OptimizerConfig, TrainingConfig, init_train_state

from test_models import small_disc_cfg, small_gen_cfg


def build_tiny_clip(path: str) -> None:
    from transformers import (CLIPConfig, CLIPImageProcessor, CLIPModel,
                              CLIPProcessor, CLIPTokenizer)
    os.makedirs(path, exist_ok=True)
    # minimal byte-ish vocab: single chars + word-final variants
    chars = "abcdefghijklmnopqrstuvwxyz "
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for c in chars:
        vocab.setdefault(c, len(vocab))
        vocab.setdefault(c + "</w>", len(vocab))
    with open(os.path.join(path, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(path, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    tok = CLIPTokenizer(os.path.join(path, "vocab.json"),
                        os.path.join(path, "merges.txt"))
    proc = CLIPProcessor(image_processor=CLIPImageProcessor(), tokenizer=tok)
    proc.save_pretrained(path)

    cfg = CLIPConfig(
        projection_dim=16,
        text_config=dict(hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=2,
                         vocab_size=len(vocab)),
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=224, patch_size=32))
    torch.manual_seed(0)
    CLIPModel(cfg).save_pretrained(path)


class TinyArcFace(torch.nn.Module):
    def __init__(self):
        super().__init__()
        torch.manual_seed(1)
        self.conv = torch.nn.Conv2d(3, 8, 16, stride=16)

    def forward(self, x):                     # [N, 3, 112, 112]
        return self.conv(x).mean(dim=(2, 3))  # [N, 8]


def test_clip_edit_gradient_based(tmp_path, monkeypatch, capsys):
    clip_dir = str(tmp_path / "clip")
    build_tiny_clip(clip_dir)
    arc_path = str(tmp_path / "arcface.pt")
    torch.jit.script(TinyArcFace().eval()).save(arc_path)

    run_dir = str(tmp_path / "run")
    G, D = Generator(small_gen_cfg()), Discriminator(small_disc_cfg())
    state = init_train_state(jax.random.PRNGKey(0), G, D,
                             OptimizerConfig(), OptimizerConfig(),
                             TrainingConfig(batch_size=4))
    snap = save_snapshot(run_dir, state, cur_nimg=0,
                         configs={"G": G.cfg, "D": D.cfg})

    out = str(tmp_path / "edit")
    monkeypatch.setattr(sys, "argv", [
        "clip_edit.py", "--network", snap, "--text", "a smiling face",
        "--clip-path", clip_dir, "--arcface-path", arc_path,
        "-o", out, "--num-steps", "20", "--num-frames", "2", "--lr", "0.05"])
    import clip_edit
    clip_edit.main()

    text = capsys.readouterr().out
    assert "clip" in text and "id" in text
    assert os.path.exists(os.path.join(out, "edited.mp4"))
    lat = np.load(os.path.join(out, "edited_latents.npz"))
    # gradients must actually have moved the latent away from ws_orig
    delta = np.abs(lat["ws"] - lat["ws_orig"]).max()
    assert np.isfinite(lat["ws"]).all()
    assert delta > 1e-4, f"no optimization progress (max delta {delta})"
