#!/usr/bin/env python
"""Project target video frames into the generator's (w+, motion_z) latent
space (reference src/scripts/project.py:34-223).

Mirrored capabilities: w initialization from the mapping average, learning-
rate ramp up/down schedule, w-noise annealing, motion-z initialization search
(best-of-N by loss), joint optimization of ws and motion trajectories.

Perceptual loss: when the reference's TorchScript `vgg16.pt` (NVIDIA
stylegan2-ada metrics file) is present in SGV_DETECTOR_DIR / ./detectors /
--detector-dir, the EXACT reference objective is optimized — LPIPS features
from the torch module with gradients routed through torch autograd on the
host (stylegan_v_tpu.metrics.host_bridge), reference project.py:77-88,139.
Without the file (no egress here), a multi-scale pixel + Laplacian-pyramid
loss is the documented fallback.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def find_vgg16(detector_dir=None):
    cands = [detector_dir, os.environ.get("SGV_DETECTOR_DIR"),
             os.path.join(os.getcwd(), "detectors")]
    for d in cands:
        if d and os.path.isfile(os.path.join(d, "vgg16.pt")):
            return os.path.join(d, "vgg16.pt")
    return None


def make_lpips_features(vgg_path: str, res: int):
    """Differentiable LPIPS feature fn (JAX [N,H,W,C] in [-1,1] -> [N,D])
    via the host-torch bridge; preprocessing matches reference
    project.py:84-87,136-139: scale to [0,255], area-downsample above 256."""
    import torch
    from stylegan_v_tpu.metrics.host_bridge import (make_host_feature_fn,
                                                    probe_out_dim)
    model = torch.jit.load(vgg_path).eval()

    def torch_fn(x):                          # [N, H, W, C] in [-1, 1]
        img = x.permute(0, 3, 1, 2)
        img = (img + 1.0) * (255.0 / 2.0)
        if img.shape[2] > 256:
            img = torch.nn.functional.interpolate(img, size=(256, 256),
                                                  mode="area")
        return model(img, resize_images=False, return_lpips=True)

    dim = probe_out_dim(torch_fn, h=res, w=res)
    return make_host_feature_fn(torch_fn, dim)


def multiscale_loss(a, b):
    """Pixel + Laplacian-pyramid distance in [-1,1] space (egress-free
    stand-in for VGG16-LPIPS)."""
    import jax.numpy as jnp
    from stylegan_v_tpu.ops import downsample2d, setup_filter
    f = setup_filter([1, 3, 3, 1])
    loss = jnp.mean(jnp.square(a - b))
    for _ in range(3):
        a2 = downsample2d(a, f)
        b2 = downsample2d(b, f)
        loss = loss + jnp.mean(jnp.square(a2 - b2))
        a, b = a2, b2
    return loss


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--network", required=True, help="orbax snapshot dir")
    ap.add_argument("--target-dir", required=True,
                    help="directory of target frames (000000.jpg ...)")
    ap.add_argument("--output-dir", "-o", required=True)
    ap.add_argument("--num-steps", type=int, default=1000)
    ap.add_argument("--num-frames", type=int, default=8)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--lr-rampup", type=float, default=0.05)
    ap.add_argument("--lr-rampdown", type=float, default=0.25)
    ap.add_argument("--w-noise-scale", type=float, default=0.05)
    ap.add_argument("--motion-init-trials", type=int, default=8)
    ap.add_argument("--detector-dir", default=None,
                    help="directory containing vgg16.pt (LPIPS); falls back "
                         "to SGV_DETECTOR_DIR / ./detectors")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    import PIL.Image
    from generate import load_any_checkpoint
    from stylegan_v_tpu.models.motion import MotionMappingNetwork
    from stylegan_v_tpu.training.video_io import save_video_frames_as_mp4

    G, variables = load_any_checkpoint(args.network)
    cfg = G.cfg
    res = cfg.img_resolution

    # ---- load target frames -> [1*F, H, W, C] in [-1, 1] -----------------
    frames = sorted(os.listdir(args.target_dir))[:args.num_frames]
    target = np.stack([
        np.asarray(PIL.Image.open(os.path.join(args.target_dir, f))
                   .resize((res, res), PIL.Image.LANCZOS), dtype=np.float32)
        for f in frames]) / 127.5 - 1.0
    target = jnp.asarray(target)
    F = target.shape[0]
    t = jnp.arange(F, dtype=jnp.float32)[None]

    # ---- w init: mean of many mapping samples (reference project.py:60-72)
    key = jax.random.PRNGKey(args.seed)
    z_avg = jax.random.normal(key, (1000, cfg.z_dim))
    ws_samples = G.apply(variables, z_avg, None,
                         method=lambda g, z, c: g.mapping(z, c))  # [N, num_ws, w]
    w_avg = jnp.mean(ws_samples[:, 0, :], axis=0)              # [w_dim]
    num_ws = G.num_ws
    w_opt0 = jnp.tile(w_avg[None, None, :], (1, num_ws, 1))    # [1, num_ws, w]

    L = MotionMappingNetwork.required_traj_len(cfg, float(F))

    def synth(w_plus, motion_z):
        def call(g, ws, t):
            return g.synthesis(ws, t=t, motion_z=motion_z, noise_mode="none")
        return G.apply(variables, w_plus, t, method=call,
                       rngs={"motion": jax.random.PRNGKey(0)})

    vgg_path = find_vgg16(args.detector_dir)
    if vgg_path:
        print(f"Using VGG16-LPIPS perceptual loss ({vgg_path})")
        lpips = make_lpips_features(vgg_path, res)
        target_features = jax.lax.stop_gradient(lpips(target))
        loss_fn = jax.jit(lambda w, mz: jnp.sum(jnp.square(
            lpips(synth(w, mz)) - target_features)))
    else:
        print("vgg16.pt not found: using multi-scale pixel/Laplacian loss "
              "(see --detector-dir)")
        loss_fn = jax.jit(lambda w, mz: multiscale_loss(synth(w, mz), target))

    # ---- motion-z init search (reference project.py:181-223) -------------
    best_mz, best_l = None, np.inf
    for i in range(args.motion_init_trials):
        mz = jax.random.normal(jax.random.fold_in(key, 100 + i),
                               (1, L, cfg.motion.z_dim))
        l = float(loss_fn(w_opt0, mz))
        if l < best_l:
            best_mz, best_l = mz, l
    print(f"motion init search: best of {args.motion_init_trials} -> {best_l:.4f}")

    # ---- joint optimization ----------------------------------------------
    params = {"w": w_opt0, "mz": best_mz}
    grad_fn = jax.jit(jax.value_and_grad(lambda p: loss_fn(p["w"], p["mz"])))
    # the per-step lr schedule must scale the UPDATE, not the gradient
    # (Adam's m/sqrt(v) direction is invariant to gradient scaling, matching
    # torch Adam param_groups lr semantics, reference project.py:131-134)
    opt = optax.chain(optax.scale_by_adam(), optax.scale(-1.0))
    opt_state = opt.init(params)

    for step in range(args.num_steps):
        frac = step / args.num_steps
        lr_ramp = min(1.0, (1.0 - frac) / args.lr_rampdown)
        lr_ramp = 0.5 - 0.5 * np.cos(lr_ramp * np.pi)
        lr_ramp = lr_ramp * min(1.0, frac / args.lr_rampup)
        lr = args.lr * lr_ramp
        w_noise = args.w_noise_scale * max(0.0, 1.0 - frac / 0.75) ** 2
        noisy = dict(params)
        noisy["w"] = params["w"] + w_noise * jax.random.normal(
            jax.random.fold_in(key, step), params["w"].shape)
        l, grads = grad_fn(noisy)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(
            params, jax.tree_util.tree_map(lambda u: lr * u, updates))
        if step % 100 == 0 or step == args.num_steps - 1:
            print(f"step {step:5d}  loss {float(l):.5f}  lr {lr:.4f}")

    # ---- outputs ----------------------------------------------------------
    os.makedirs(args.output_dir, exist_ok=True)
    final = np.asarray(jnp.clip(synth(params["w"], params["mz"]) * 0.5 + 0.5, 0, 1))
    save_video_frames_as_mp4(final, 25.0, os.path.join(args.output_dir, "projected.mp4"))
    np.savez(os.path.join(args.output_dir, "projected_latents.npz"),
             w=np.asarray(params["w"]), motion_z=np.asarray(params["mz"]))
    print(f"Wrote projected.mp4 + projected_latents.npz to {args.output_dir}")


if __name__ == "__main__":
    main()
