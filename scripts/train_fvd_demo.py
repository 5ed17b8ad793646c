#!/usr/bin/env python
"""End-to-end quality demo on procedural data: FVD decreasing over training.

Trains the production G/D at 64^2 on the moving-pattern dataset
(scripts/make_moving_dataset.py) through the REAL pipeline — zip dataset ->
TrainingDataLoader -> training loop (ADA on, lazy R1, EMA) -> in-training
FVD every snapshot tick — and reports the FVD-over-training series.

FVD here uses the production flax I3D architecture under FIXED random
weights (registered via metrics.metric_utils.register_detector): a
random-feature Frechet distance. It is NOT comparable to Kinetics-I3D FVD
numbers, but it is a valid convergence witness — it contracts only when
the generated pixel/motion distribution approaches the data distribution
through the SAME metric stack (sampling, feature extraction, mean/cov,
Frechet) the real metric uses. The real-weight path is unchanged and gated
on the detector files (scripts/fvd_parity.py; no egress in this sandbox —
reference validates against TF1 I3D, reference README.md:144-145).

    python scripts/train_fvd_demo.py --outdir runs/fvd_demo \\
        --total-kimg 100 --kimg-per-tick 8

Run record quoted in docs/PERF.md is produced by the default settings.
"""
from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_maker():
    spec = importlib.util.spec_from_file_location(
        "make_moving_dataset",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "make_moving_dataset.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def register_random_i3d(seed: int, num_frames: int, res: int,
                        resize224: bool) -> None:
    """Override the 'i3d' detector with the flax I3D under fixed random
    weights. resize224=False runs the (fully convolutional) I3D at the
    dataset's native resolution — ~12x cheaper at 64^2 and just as valid
    for a random-feature distance."""
    import jax
    import jax.numpy as jnp
    from stylegan_v_tpu.metrics import metric_utils
    from stylegan_v_tpu.metrics.detectors_flax.i3d import (InceptionI3d,
                                                           i3d_features_fn)

    model = InceptionI3d()
    dummy = jnp.zeros((1, num_frames, 224 if resize224 else res,
                       224 if resize224 else res, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), dummy)

    def builder(rescale: bool = True, resize: bool = True,
                return_features: bool = True, batch_size: int = 16,
                mesh=None, **_):
        return i3d_features_fn(variables, batch_size=batch_size, mesh=mesh,
                               rescale=rescale,
                               resize=resize and resize224,
                               return_features=return_features)

    # The cache_tag makes the dataset-stats cache key specific to THIS
    # random projection — without it, rescoring under a different detector
    # seed silently reuses another seed's cached real stats (caught by the
    # round-5 multi-seed stability check: the stale-cache series was
    # anti-correlated with the in-training one).
    metric_utils.register_detector(
        "i3d", builder,
        cache_tag=f"rand-i3d-s{seed}-f{num_frames}-r{res}"
                  f"-{'224' if resize224 else 'native'}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--outdir", default="runs/fvd_demo")
    ap.add_argument("--data", default="data/moving64.zip")
    ap.add_argument("--videos", type=int, default=512)
    ap.add_argument("--dataset-frames", type=int, default=32)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--channel-base", type=int, default=8192)
    ap.add_argument("--total-kimg", type=float, default=100)
    ap.add_argument("--kimg-per-tick", type=float, default=8.0)
    ap.add_argument("--snap-ticks", type=int, default=1)
    ap.add_argument("--fvd-items", type=int, default=256,
                    help="max_real/num_gen override for the demo-scale FVD")
    ap.add_argument("--resize224", action="store_true",
                    help="run I3D at its native 224^2 input (slower)")
    ap.add_argument("--augpipe", default="bgc",
                    help="ADA augment pipe spec name (training/augment.py "
                         "AUGPIPE_SPECS) or 'none'; 'blit' keeps ADA live "
                         "but drops the geometric warp — useful on hosts "
                         "where the warp graph's XLA:CPU compile dominates "
                         "(the CI miniature run)")
    ap.add_argument("--lr", type=float, default=0.0025)
    ap.add_argument("--gamma", type=float, default=1.0,
                    help="R1 gamma. Pass 0 for the 0.0002*res^2/B auto "
                         "heuristic (reference train.py cfg_specs) — the "
                         "round-5 bisect (scripts/diag_dynamics.py, "
                         "docs/PERF.md) showed the auto value (0.051 at "
                         "64^2/16) lets D run away on this 512-video set; "
                         "gamma=1 + augment p~0.4 restores equilibrium.")
    ap.add_argument("--ada-target", type=float, default=0.6)
    ap.add_argument("--ada-kimg", type=float, default=50.0,
                    help="ADA ramp speed: kimg for p to move one unit. The "
                         "reference default 500 (training_loop.py:121) is "
                         "tuned for 25000-kimg runs; a demo-scale budget "
                         "needs the controller to reach a useful p within "
                         "tens of kimg.")
    ap.add_argument("--augment-p", type=float, default=0.2,
                    help="initial ADA p (the round-4 run started at 0 and "
                         "the controller never caught up with D; see "
                         "scripts/diag_dynamics.py bisect in docs/PERF.md)")
    ap.add_argument("--detector-seed", type=int, default=17)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--resume", default=None,
                    help="'latest' resumes the newest snapshot in --outdir")
    ap.add_argument("--no-compile-cache", action="store_true")
    args = ap.parse_args()

    if not args.no_compile_cache:
        from stylegan_v_tpu.utils.misc import enable_compile_cache
        enable_compile_cache()

    # stall watchdog: periodic all-thread tracebacks to stderr (repeat=True)
    # — over a tunnel attachment a multi-minute silent phase is routine and
    # this is the only way to tell compile from hang after the fact
    import faulthandler
    faulthandler.dump_traceback_later(600, repeat=True)

    if not os.path.exists(args.data):
        maker = _load_maker()
        maker.write_dataset(args.data, args.videos, args.dataset_frames,
                            args.res, seed=args.seed)
        print(f"dataset -> {args.data}", flush=True)

    from stylegan_v_tpu.models.config import (MotionConfig, SamplingConfig,
                                              replace)
    from stylegan_v_tpu.models import DiscriminatorConfig, GeneratorConfig
    from stylegan_v_tpu.train_setup import TrainSetup
    from stylegan_v_tpu.training.augment import AUGPIPE_SPECS, AugmentConfig
    from stylegan_v_tpu.training.loop import training_loop
    from stylegan_v_tpu.training.loss import LossConfig
    from stylegan_v_tpu.training.train_step import (OptimizerConfig,
                                                    TrainingConfig)

    res, B = args.res, args.batch
    num_frames_fvd = 16
    register_random_i3d(args.detector_seed, num_frames_fvd, res,
                        args.resize224)

    sampling = SamplingConfig(num_frames_per_video=3,
                              max_num_frames=args.dataset_frames)
    gen_cfg = replace(GeneratorConfig(), img_resolution=res,
                      channel_base=args.channel_base, sampling=sampling)
    disc_cfg = replace(DiscriminatorConfig(), img_resolution=res,
                       channel_base=args.channel_base, sampling=sampling)
    setup = TrainSetup(
        run_dir=args.outdir, desc="fvd-demo-moving64",
        gen_cfg=gen_cfg, disc_cfg=disc_cfg,
        loss_cfg=LossConfig(
            r1_gamma=(args.gamma if args.gamma > 0
                      else 0.0002 * res ** 2 / B),
            pl_weight=0.0, video_consistent_aug=True),
        train_cfg=TrainingConfig(
            batch_size=B, ema_kimg=2.0, ada_kimg=args.ada_kimg,
            ada_target=None if args.augpipe == "none" else args.ada_target),
        opt_g=OptimizerConfig(lr=args.lr), opt_d=OptimizerConfig(lr=args.lr),
        augment_cfg=(None if args.augpipe == "none"
                     else AugmentConfig(**AUGPIPE_SPECS[args.augpipe])),
        augment_p=(0.0 if args.augpipe == "none" else args.augment_p),
        dataset_kwargs=dict(path=args.data, sampling=sampling,
                            max_num_frames=args.dataset_frames),
        sampling_cfg=sampling, use_fractional_t=True,
        total_kimg=args.total_kimg, kimg_per_tick=args.kimg_per_tick,
        snap_ticks=args.snap_ticks, metrics=["fvd2048_16f"],
        seed=args.seed, num_chips=1, resume=args.resume, freeze_layers=0,
        num_workers=args.workers,
        metric_kwargs=dict(max_real_override=args.fvd_items,
                           num_gen_override=args.fvd_items))
    training_loop(setup)

    # report the FVD series
    path = os.path.join(args.outdir, "metric-fvd2048_16f.jsonl")
    if os.path.exists(path):
        rows = [json.loads(l) for l in open(path)]
        series = [(r.get("snapshot_nimg", -1), r["results"]["fvd2048_16f"])
                  for r in rows]
        print("\nFVD (random-feature I3D) over training:")
        for nimg, fvd in series:
            print(f"  nimg {nimg:>9}: {fvd:10.2f}")
        if len(series) >= 2:
            first, last = series[0][1], series[-1][1]
            print(f"first -> last: {first:.2f} -> {last:.2f} "
                  f"({'DECREASED' if last < first else 'did not decrease'})")


if __name__ == "__main__":
    main()
