#!/usr/bin/env python
"""Training-step throughput on the attached TPU: the BASELINE config-#3
workload (FFS-256-shaped sparse 3-frame training step).

Reports frames/sec of full training steps (Gmain+Dmain, plus amortized R1)
— directly comparable to the reference's 4xV100 training throughput of
~36 frames/sec/GPU (25000 kimg in ~2 days on 4 GPUs, reference README.md:37).

    python scripts/bench_train.py [--batch 16] [--steps 12]
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
    ap.add_argument("--batch", type=int, default=16, help="videos per step")
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--r1-every", type=int, default=16)
    ap.add_argument("--warp-upsample", type=int, default=2, choices=[1, 2],
                    help="ADA geometric quality/speed mode (see AugmentConfig)")
    args = ap.parse_args()

    import jax
    from stylegan_v_tpu.models import (Discriminator, DiscriminatorConfig,
                                       Generator, GeneratorConfig)
    from stylegan_v_tpu.models.config import replace
    from stylegan_v_tpu.training import (LossConfig, OptimizerConfig,
                                         TrainingConfig, init_train_state,
                                         make_train_step)
    from stylegan_v_tpu.training.augment import (AUGPIPE_SPECS, AugmentConfig,
                                                 make_augment_pipe)

    res = args.resolution
    gcfg = replace(GeneratorConfig(), img_resolution=res,
                   channel_base=16384)          # fmaps=0.5 at 256 (auto spec)
    dcfg = replace(DiscriminatorConfig(), img_resolution=res,
                   channel_base=16384)
    G, D = Generator(gcfg), Discriminator(dcfg)
    F = gcfg.sampling.num_frames_per_video
    B = args.batch
    tcfg = TrainingConfig(batch_size=B, ada_target=0.6)
    lcfg = LossConfig(r1_gamma=0.0002 * res ** 2 / B, pl_weight=0.0,
                      video_consistent_aug=True)
    import dataclasses
    aug = make_augment_pipe(dataclasses.replace(
        AugmentConfig(**AUGPIPE_SPECS["bgc"]), warp_upsample=args.warp_upsample))

    print("initializing...")
    state = init_train_state(jax.random.PRNGKey(0), G, D, OptimizerConfig(0.0025),
                             OptimizerConfig(0.0025), tcfg)
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
    # stage on-device once: the axon tunnel's host->device copy would
    # dominate the step time (a real TPU-VM overlaps DMA with compute)
    batch = {k: jax.device_put(v) for k, v in batch.items()}

    # K steps inside ONE jitted lax.scan per variant (per-call dispatch via
    # the axon tunnel costs seconds/step — a Python step loop measures the
    # tunnel, not the chip); scalar output depends on G/D/EMA/ADA state so
    # no phase is dead-code-eliminated.
    import jax.numpy as jnp

    def scanned(do_dr1, n):
        @jax.jit
        def prog(state, batch, keys):
            def body(st, k):
                st, _ = step(st, batch, k, do_dr1=do_dr1)
                return st, None
            st, _ = jax.lax.scan(body, state, keys)
            leaves = (jax.tree_util.tree_leaves(st.params_G)[:2]
                      + jax.tree_util.tree_leaves(st.params_D)[:2]
                      + jax.tree_util.tree_leaves(st.params_Gema)[:2])
            return sum(jnp.sum(jnp.abs(l).astype(jnp.float32)) for l in leaves) \
                + st.augment_p

        seed = int(time.time()) & 0x7FFFFFFF
        float(prog(state, batch, jax.random.split(jax.random.PRNGKey(seed), n)))
        t0 = time.perf_counter()
        acc = float(prog(state, batch,
                         jax.random.split(jax.random.PRNGKey(seed + 1), n)))
        assert acc == acc, "non-finite training state"
        return (time.perf_counter() - t0) / n

    print("compiling (main + r1 scan variants)...")
    t_main = scanned(False, args.steps)
    t_r1 = scanned(True, 2)
    t_step = ((args.r1_every - 1) * t_main + t_r1) / args.r1_every
    fps = B * F / t_step
    stats_mem = jax.local_devices()[0].memory_stats() or {}
    print(f"batch {B} videos x {F} frames @ {res}^2: "
          f"main {t_main * 1e3:.0f} ms, +R1 {t_r1 * 1e3:.0f} ms, amortized "
          f"{t_step * 1e3:.0f} ms/step, {fps:.1f} frames/sec/chip "
          f"(reference ~36 f/s per V100), peak HBM "
          f"{stats_mem.get('peak_bytes_in_use', 0) / 1e9:.1f}G")


if __name__ == "__main__":
    main()
