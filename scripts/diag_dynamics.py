#!/usr/bin/env python
"""Adversarial-dynamics probe at demo scale: per-step score telemetry.

Runs the REAL jitted train step (training/train_step.py) on the
moving-pattern dataset and prints D(real)/D(fake) logits every --log-every
steps. Two discriminating modes for the round-4 divergence
(runs/fvd_demo_r4b: Gloss pinned ~3.4-3.8, Dreal 0.98->6.4):

  --freeze-d   sets D's Adam lr to 0: if G cannot push D(fake) logits up
               against a FROZEN random-init D, the G gradient path is
               broken; if it can, the divergence is an equilibrium/regime
               problem (D memorizing small data), not a bug.
  (default)    normal adversarial run with configurable gamma / lr /
               augment to bisect which ingredient restores equilibrium.

Reference dynamics this emulates: src/training/loss.py:74-173 phases under
src/training/training_loop.py:330-410 cadence.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", default="data/moving64.zip")
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--channel-base", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--lr", type=float, default=0.0025)
    ap.add_argument("--d-lr", type=float, default=None,
                    help="override D lr (default: same as --lr)")
    ap.add_argument("--gamma", type=float, default=0.0512)
    ap.add_argument("--augment-p", type=float, default=0.0,
                    help="fixed ADA p (no controller in this probe)")
    ap.add_argument("--augpipe", default="bgc")
    ap.add_argument("--freeze-d", action="store_true")
    ap.add_argument("--dataset-frames", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from stylegan_v_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()

    import jax

    from stylegan_v_tpu.data import TrainingDataLoader, VideoFramesFolderDataset
    from stylegan_v_tpu.models import (Discriminator, DiscriminatorConfig,
                                       Generator, GeneratorConfig)
    from stylegan_v_tpu.models.config import SamplingConfig, replace
    from stylegan_v_tpu.parallel import create_mesh, replicated_sharding, shard_batch
    from stylegan_v_tpu.training.augment import AUGPIPE_SPECS, AugmentConfig, make_augment_pipe
    from stylegan_v_tpu.training.loss import LossConfig
    from stylegan_v_tpu.training.train_step import (OptimizerConfig,
                                                    TrainingConfig,
                                                    init_train_state,
                                                    make_train_step)

    res, B = args.res, args.batch
    sampling = SamplingConfig(num_frames_per_video=3,
                              max_num_frames=args.dataset_frames)
    gen_cfg = replace(GeneratorConfig(), img_resolution=res,
                      channel_base=args.channel_base, sampling=sampling)
    disc_cfg = replace(DiscriminatorConfig(), img_resolution=res,
                       channel_base=args.channel_base, sampling=sampling)
    G, D = Generator(gen_cfg), Discriminator(disc_cfg)

    loss_cfg = LossConfig(r1_gamma=args.gamma, pl_weight=0.0,
                          video_consistent_aug=True)
    tcfg = TrainingConfig(batch_size=B, ema_kimg=2.0, ada_target=None)
    d_lr = 0.0 if args.freeze_d else (args.d_lr if args.d_lr is not None
                                      else args.lr)
    rng = jax.random.PRNGKey(args.seed)
    state = init_train_state(rng, G, D, OptimizerConfig(lr=args.lr),
                             OptimizerConfig(lr=d_lr), tcfg,
                             augment_p=args.augment_p)

    mesh = create_mesh(devices=jax.devices()[:1], frame=1)
    state = jax.device_put(state, replicated_sharding(mesh))
    augment_fn = (make_augment_pipe(AugmentConfig(**AUGPIPE_SPECS[args.augpipe]))
                  if args.augpipe != "none" and args.augment_p > 0 else None)
    step_fn = make_train_step(G, D, loss_cfg, OptimizerConfig(lr=args.lr),
                              OptimizerConfig(lr=d_lr), tcfg,
                              augment_fn=augment_fn, donate=False)

    dataset = VideoFramesFolderDataset(path=args.data, sampling=sampling,
                                       max_num_frames=args.dataset_frames)
    loader = TrainingDataLoader(dataset, batch_size=B, gen_sampling=sampling,
                                use_fractional_t=True, seed=args.seed,
                                num_workers=2)

    mode = "FROZEN-D (G sanity)" if args.freeze_d else "adversarial"
    print(f"mode={mode} lr={args.lr} d_lr={d_lr} gamma={args.gamma} "
          f"p={args.augment_p} pipe={args.augpipe} videos={len(dataset)}",
          flush=True)
    t0 = time.time()
    hist = []
    for step in range(args.steps):
        batch = shard_batch(mesh, next(loader))
        state, stats = step_fn(state, batch, jax.random.fold_in(rng, step),
                               do_gpl=False, do_dr1=(step % 16 == 0))
        if step % args.log_every == 0 or step == args.steps - 1:
            s = {k: float(v) for k, v in stats.items()}
            hist.append((step, s))
            print(f"step {step:4d}  Dreal {s['Loss/scores/real']:+7.3f}  "
                  f"Dfake {s['Loss/scores/fake']:+7.3f}  "
                  f"Gloss {s['Loss/G/loss']:6.3f}  "
                  f"r1 {s.get('Loss/r1_penalty', float('nan')):8.5f}  "
                  f"({time.time() - t0:5.1f}s)", flush=True)
    loader.close()

    first, last = hist[0][1], hist[-1][1]
    d_fake = last["Loss/scores/fake"] - first["Loss/scores/fake"]
    print(f"\nD(fake) logit delta over run: {d_fake:+.3f} "
          f"({'G CAN push logits up' if d_fake > 0.5 else 'G made no progress'})")


if __name__ == "__main__":
    main()
