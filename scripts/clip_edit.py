#!/usr/bin/env python
"""CLIP-guided latent editing (reference src/scripts/clip_edit.py).

Gradient-based, matching the reference/StyleCLIP structure: the full w+
latent is optimized with Adam under a cosine-ramp lr schedule against
    loss = (1 - CLIP cosine similarity to the prompt)
         + l2_lambda * ||w - w_orig||^2
         + id_lambda * (1 - ArcFace identity cosine)        [--arcface-path]
(reference clip_edit.py:44-110,161-205). The generator synthesizes and
differentiates on TPU; CLIP / ArcFace gradients are routed through torch
autograd on the host via stylegan_v_tpu.metrics.host_bridge (the TPU analog
of backprop through the CUDA torch detectors).

CLIP runs through `transformers` (pass --clip-path to a local
openai/clip-vit-base-patch32 checkout — no egress in this sandbox). Unlike
StyleCLIP's quirk of feeding unnormalized [-1,1] images into CLIP, images are
properly resized to 224 and CLIP-normalized inside the differentiated graph.
ArcFace accepts a TorchScript ir_se50 export; identity features use the
StyleCLIP crop (256-pool -> [35:223, 32:220] -> 112) before embedding.
"""
from __future__ import annotations

import argparse
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_lr(t: float, initial_lr: float, rampdown: float = 0.25,
           rampup: float = 0.05) -> float:
    """Cosine ramp schedule (reference clip_edit.py:44-49)."""
    lr_ramp = min(1.0, (1.0 - t) / rampdown)
    lr_ramp = 0.5 - 0.5 * math.cos(lr_ramp * math.pi)
    lr_ramp = lr_ramp * min(1.0, t / rampup)
    return initial_lr * lr_ramp


def make_clip_embed(clip_path: str):
    """Differentiable CLIP image-embedding fn ([N,H,W,C] in [-1,1] -> [N,D])
    + the normalized text embedding for a prompt."""
    import torch
    from transformers import CLIPModel, CLIPProcessor
    from stylegan_v_tpu.metrics.host_bridge import (make_host_feature_fn,
                                                    probe_out_dim)
    clip = CLIPModel.from_pretrained(clip_path).eval()
    proc = CLIPProcessor.from_pretrained(clip_path)
    mean = torch.tensor([0.48145466, 0.4578275, 0.40821073]).view(1, 3, 1, 1)
    std = torch.tensor([0.26862954, 0.26130258, 0.27577711]).view(1, 3, 1, 1)

    def torch_fn(x):                             # [N, H, W, C] in [-1, 1]
        img = x.permute(0, 3, 1, 2) * 0.5 + 0.5
        img = torch.nn.functional.interpolate(img, size=(224, 224), mode="area")
        img = (img - mean) / std
        return clip.get_image_features(pixel_values=img)

    def text_embed(text: str) -> np.ndarray:
        with torch.no_grad():
            emb = clip.get_text_features(
                **proc(text=[text], return_tensors="pt", padding=True))
            emb = torch.nn.functional.normalize(emb, dim=-1)
        return emb.numpy()[0]

    dim = probe_out_dim(torch_fn)
    return make_host_feature_fn(torch_fn, dim), text_embed


def make_arcface_embed(arcface_path: str):
    """Differentiable ArcFace identity-embedding fn via a TorchScript ir_se50
    export, with the StyleCLIP face crop (reference clip_edit.py:89-95)."""
    import torch
    from stylegan_v_tpu.metrics.host_bridge import make_host_feature_fn
    model = torch.jit.load(arcface_path).eval()

    def torch_fn(x):                             # [N, H, W, C] in [-1, 1]
        img = x.permute(0, 3, 1, 2)
        if img.shape[2] != 256:
            img = torch.nn.functional.adaptive_avg_pool2d(img, (256, 256))
        img = img[:, :, 35:223, 32:220]          # crop interesting region
        img = torch.nn.functional.adaptive_avg_pool2d(img, (112, 112))
        return model(img)

    import torch as _t
    with _t.no_grad():
        dim = int(torch_fn(_t.zeros(1, 256, 256, 3)).shape[-1])
    return make_host_feature_fn(torch_fn, dim)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--network", required=True)
    ap.add_argument("--text", required=True, help="edit prompt, e.g. 'a smiling face'")
    ap.add_argument("--clip-path", required=True,
                    help="local dir with a transformers CLIP checkpoint")
    ap.add_argument("--arcface-path", default=None,
                    help="TorchScript ir_se50 ArcFace for the identity loss; "
                         "omit to fall back to a pixel-space identity term")
    ap.add_argument("--output-dir", "-o", required=True)
    ap.add_argument("--num-steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--id-weight", type=float, default=0.005)
    ap.add_argument("--l2-weight", type=float, default=0.008)
    ap.add_argument("--num-frames", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from generate import load_any_checkpoint
    from stylegan_v_tpu.models.motion import MotionMappingNetwork
    from stylegan_v_tpu.training.video_io import save_video_frames_as_mp4

    clip_embed, text_embed = make_clip_embed(args.clip_path)
    text_emb = jnp.asarray(text_embed(args.text))
    arc_embed = (make_arcface_embed(args.arcface_path)
                 if args.arcface_path else None)

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

    base = jax.lax.stop_gradient(synth(ws0))
    base_id = (jax.lax.stop_gradient(arc_embed(base)) if arc_embed else None)

    def loss_fn(ws):
        frames = synth(ws)                       # [F, H, W, C] in [-1, 1]
        emb = clip_embed(frames)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        c_loss = jnp.sum(1.0 - emb @ text_emb)   # reference: c_loss.sum()
        l2_loss = jnp.sum(jnp.square(ws - ws0))
        if arc_embed is not None:
            gid = arc_embed(frames)
            gid = gid / jnp.linalg.norm(gid, axis=-1, keepdims=True)
            bid = base_id / jnp.linalg.norm(base_id, axis=-1, keepdims=True)
            i_loss = jnp.mean(1.0 - jnp.sum(gid * bid, axis=-1))
        else:
            i_loss = jnp.mean(jnp.square(frames - base))
        return (c_loss + args.l2_weight * l2_loss + args.id_weight * i_loss,
                (c_loss, l2_loss, i_loss))

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    # lr schedule scales the UPDATE (torch Adam param_groups semantics)
    opt = optax.chain(optax.scale_by_adam(), optax.scale(-1.0))
    ws = ws0
    opt_state = opt.init(ws)
    for step in range(args.num_steps):
        lr = get_lr(step / args.num_steps, args.lr)
        (l, (c_l, l2_l, i_l)), grads = grad_fn(ws)
        updates, opt_state = opt.update(grads, opt_state)
        ws = optax.apply_updates(
            ws, jax.tree_util.tree_map(lambda u: lr * u, updates))
        if step % 25 == 0 or step == args.num_steps - 1:
            print(f"step {step:4d}  loss {float(l):.4f}  clip {float(c_l):.4f}  "
                  f"l2 {float(l2_l):.4f}  id {float(i_l):.4f}  lr {lr:.4f}")

    os.makedirs(args.output_dir, exist_ok=True)
    final = np.asarray(synth(ws))
    save_video_frames_as_mp4((final * 0.5 + 0.5).clip(0, 1), 25.0,
                             os.path.join(args.output_dir, "edited.mp4"))
    np.savez(os.path.join(args.output_dir, "edited_latents.npz"),
             ws=np.asarray(ws), ws_orig=np.asarray(ws0))
    print(f"Wrote edited.mp4 + edited_latents.npz to {args.output_dir}")


if __name__ == "__main__":
    main()
