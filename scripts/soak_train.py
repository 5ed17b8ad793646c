#!/usr/bin/env python
"""Long-running training-stability soak at the production FFS-256 shape.

Runs N outer rounds of (r1_every - 1) main steps + 1 lazy-R1 step, all
inside jitted lax.scan programs (per-dispatch tunnel latency would dominate
a Python step loop — see docs/PERF.md), carrying the full train state
across rounds with live ADA feedback. After each round it reads back a
small stat summary and asserts finiteness — the GAN-equilibrium guard the
reference gets from watching stats.jsonl (reference training_loop.py ticks).

    nohup python -u scripts/soak_train.py --rounds 125 > soak.log 2>&1 &

125 rounds x 16 steps = 2000 steps (~15 min on v5e at the round-3
422 ms/step).
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
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--rounds", type=int, default=125)
    ap.add_argument("--r1-every", type=int, default=16)
    ap.add_argument("--warp-upsample", type=int, default=2, choices=[1, 2])
    args = ap.parse_args()

    import dataclasses
    import jax
    import jax.numpy as jnp
    from stylegan_v_tpu.models import (Discriminator, DiscriminatorConfig,
                                       Generator, GeneratorConfig)
    from stylegan_v_tpu.models.config import replace
    from stylegan_v_tpu.training import (LossConfig, OptimizerConfig,
                                         TrainingConfig, init_train_state,
                                         make_train_step)
    from stylegan_v_tpu.training.augment import (AUGPIPE_SPECS, AugmentConfig,
                                                 make_augment_pipe)

    res, B = args.resolution, args.batch
    gcfg = replace(GeneratorConfig(), img_resolution=res, channel_base=16384)
    dcfg = replace(DiscriminatorConfig(), img_resolution=res,
                   channel_base=16384)
    G, D = Generator(gcfg), Discriminator(dcfg)
    F = gcfg.sampling.num_frames_per_video
    tcfg = TrainingConfig(batch_size=B, ada_target=0.6)
    lcfg = LossConfig(r1_gamma=0.0002 * res ** 2 / B, pl_weight=0.0,
                      video_consistent_aug=True)
    aug = make_augment_pipe(dataclasses.replace(
        AugmentConfig(**AUGPIPE_SPECS["bgc"]),
        warp_upsample=args.warp_upsample))

    print(f"initializing ({res}^2, batch {B}x{F}, "
          f"warp_upsample={args.warp_upsample})...", flush=True)
    state = init_train_state(jax.random.PRNGKey(0), G, D,
                             OptimizerConfig(0.0025), OptimizerConfig(0.0025),
                             tcfg)
    step = make_train_step(G, D, lcfg, OptimizerConfig(0.0025),
                           OptimizerConfig(0.0025), tcfg, augment_fn=aug,
                           donate=False)

    rng = np.random.RandomState(0)
    t = np.sort(rng.randint(0, 128, size=(B, F)).astype(np.float32), axis=1)
    t += np.arange(F)[None] * 0.1
    batch = {
        "real_img": rng.randint(0, 255, (B, F, res, res, 3)).astype(np.uint8),
        "real_c": np.zeros((B, 0), np.float32),
        "real_t": t,
        "gen_c": np.zeros((B, 3, 0), np.float32),
        "gen_t": np.stack([t, t + 1, t + 2], axis=1),
    }
    batch = {k: jax.device_put(v) for k, v in batch.items()}

    # watch scalars: D score means/signs and the live ADA p tell us the
    # adversarial equilibrium is healthy (signs drifting to +-1 with p
    # pinned at 0/limit = collapse; NaN anywhere = numeric failure)
    WATCH = ("Loss/scores/fake", "Loss/scores/real", "Loss/signs/real",
             "Loss/G/loss", "Loss/r1_penalty")

    def summarize(stats):
        return {k: stats[k] for k in WATCH if k in stats}

    @jax.jit
    def round_main(state, keys):
        def body(st, k):
            st, stats = step(st, batch, k)
            return st, None
        st, _ = jax.lax.scan(body, state, keys)
        return st

    @jax.jit
    def round_r1(state, key):
        st, stats = step(state, batch, key, do_dr1=True)
        return st, summarize(stats)

    n_main = args.r1_every - 1
    print("compiling...", flush=True)
    key = jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF)
    t_start = time.time()
    for r in range(args.rounds):
        key, k_r1, *ks = jax.random.split(key, n_main + 2)
        state = round_main(state, jnp.stack(ks))
        state, stats = round_r1(state, k_r1)
        stats = {k: float(v) for k, v in stats.items()}
        p = float(state.augment_p)
        bad = [k for k, v in stats.items() if not np.isfinite(v)]
        assert not bad and np.isfinite(p), f"non-finite at round {r}: {bad}"
        if r % 10 == 0 or r == args.rounds - 1:
            steps_done = (r + 1) * args.r1_every
            dt = time.time() - t_start
            fps = steps_done * B * F / dt
            line = "  ".join(f"{k.split('/')[-1]}={v:+.3f}"
                             for k, v in stats.items())
            print(f"round {r:4d} (step {steps_done:5d}): p={p:.4f}  {line}  "
                  f"[{fps:.1f} f/s incl. compile]", flush=True)
    steps = args.rounds * args.r1_every
    dt = time.time() - t_start
    print(f"SOAK PASS: {steps} steps, zero non-finite stats, final "
          f"ADA p={float(state.augment_p):.4f}, "
          f"{steps * B * F / dt:.1f} frames/s sustained (incl. compile)",
          flush=True)


if __name__ == "__main__":
    main()
