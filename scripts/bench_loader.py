"""Input-pipeline throughput benchmark: can the host feed the chip?

Streams the zip-backed VideoFramesFolderDataset through TrainingDataLoader
(threaded decode + prefetch, fastjpeg C++ fast path when buildable) and
reports frames decoded per second — the number that must exceed the training
step's consumption rate (113 f/s/chip x num_frames_per_video at the
production FFS-256 shape; VERDICT r3 task 4 gate: >= 2x). The reference
hides this cost in torch DataLoader worker processes
(reference src/train.py:98, training_loop.py:149-151) and never measures it.

Modes:
  * default         — loader-only: frames/sec out of the loader queue.
  * --train-steps N — loader-FED training steps with host/device overlap:
                      dispatch step k+1's batch transfer while step k runs.
                      Reports end-to-end frames/sec (requires an accelerator;
                      falls back to loader-only on CPU-only hosts).

With no --data, a synthetic 256^2 JPEG zip dataset is generated into a temp
dir (procedural moving patterns, ~the entropy of natural video crops) so the
bench is self-contained.

Prints one JSON line, and appends nothing anywhere (pure measurement).
"""
from __future__ import annotations

import argparse
import io
import json
import os
import sys
import tempfile
import time
import zipfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_synthetic_zip(path: str, num_videos: int = 48, frames: int = 16,
                       res: int = 256, quality: int = 90, seed: int = 0) -> str:
    """Procedural moving-pattern dataset: textured background + moving blobs,
    JPEG-encoded at the production resolution (decode cost is what matters)."""
    from PIL import Image
    rnd = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32) / res
    zpath = os.path.join(path, "bench_dataset.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_STORED) as zf:
        for v in range(num_videos):
            fx, fy = rnd.uniform(2, 8, size=2)
            phase = rnd.uniform(0, np.pi * 2, size=3)
            speed = rnd.uniform(0.02, 0.08)
            tex = rnd.uniform(0, 1, size=(res // 8, res // 8, 3))
            tex = np.kron(tex, np.ones((8, 8, 1)))
            for f in range(frames):
                t = f * speed
                img = np.stack([
                    0.5 + 0.3 * np.sin(2 * np.pi * (fx * xx + t) + phase[0]),
                    0.5 + 0.3 * np.sin(2 * np.pi * (fy * yy - t) + phase[1]),
                    0.5 + 0.3 * np.sin(2 * np.pi * (fx * xx + fy * yy) + phase[2]),
                ], axis=-1)
                arr = np.clip((0.6 * img + 0.4 * tex) * 255, 0, 255).astype(np.uint8)
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
                zf.writestr(f"video{v:04d}/frame{f:04d}.jpg", buf.getvalue())
    return zpath


def bench_loader(data_path: str, batch_size: int, num_workers: int,
                 num_batches: int, frames_per_video: int):
    from stylegan_v_tpu.data import TrainingDataLoader, VideoFramesFolderDataset
    from stylegan_v_tpu.models.config import SamplingConfig

    sampling = SamplingConfig(num_frames_per_video=frames_per_video,
                              max_num_frames=1024)
    ds = VideoFramesFolderDataset(path=data_path, sampling=sampling)
    loader = TrainingDataLoader(ds, batch_size=batch_size,
                                num_workers=num_workers, seed=1)
    try:
        # warm: fill pipeline + first-use fastjpeg build
        for _ in range(3):
            next(loader)
        t0 = time.perf_counter()
        n_frames = 0
        for _ in range(num_batches):
            b = next(loader)
            n_frames += b["real_img"].shape[0] * b["real_img"].shape[1]
        dt = time.perf_counter() - t0
    finally:
        loader.close()
        ds.close()
    return n_frames / dt


def bench_train_overlap(data_path: str, batch_size: int, num_workers: int,
                        steps: int, res: int, ada: bool = False):
    """Loader-FED training steps: per-step host->device transfer of the NEXT
    batch is dispatched while the CURRENT step runs (double buffering), the
    production overlap pattern. Returns end-to-end frames/sec.

    ada=True runs the bench.py parity configuration (bgc pipe at fixed
    p=0.5, reference-parity AA warp) so the result is directly comparable
    to BENCH_r*.json train_frames_per_sec, which is measured with the batch
    pre-staged on device."""
    import dataclasses
    import jax
    from stylegan_v_tpu.data import TrainingDataLoader, VideoFramesFolderDataset
    from stylegan_v_tpu.models import (Discriminator, DiscriminatorConfig,
                                       Generator, GeneratorConfig)
    from stylegan_v_tpu.models.config import replace
    from stylegan_v_tpu.training import (LossConfig, OptimizerConfig,
                                         TrainingConfig, init_train_state,
                                         make_train_step)
    from stylegan_v_tpu.training.augment import (AUGPIPE_SPECS, AugmentConfig,
                                                 make_augment_pipe)

    gcfg = replace(GeneratorConfig(), img_resolution=res, channel_base=16384)
    dcfg = replace(DiscriminatorConfig(), img_resolution=res,
                   channel_base=16384)
    G, D = Generator(gcfg), Discriminator(dcfg)
    F = gcfg.sampling.num_frames_per_video
    tcfg = TrainingConfig(batch_size=batch_size, ada_target=None)
    aug = (make_augment_pipe(dataclasses.replace(
               AugmentConfig(**AUGPIPE_SPECS["bgc"]), warp_upsample=2))
           if ada else None)
    state = init_train_state(jax.random.PRNGKey(0), G, D, OptimizerConfig(),
                             OptimizerConfig(), tcfg,
                             augment_p=0.5 if ada else 0.0)
    step = make_train_step(G, D, LossConfig(r1_gamma=1.0, pl_weight=0.0),
                           OptimizerConfig(), OptimizerConfig(), tcfg,
                           augment_fn=aug, donate=False)

    ds = VideoFramesFolderDataset(
        path=data_path,
        sampling=replace(gcfg.sampling, num_frames_per_video=F))
    loader = TrainingDataLoader(ds, batch_size=batch_size,
                                num_workers=num_workers, seed=1)
    try:
        def put(b):
            return {k: jax.device_put(v) for k, v in b.items()}

        # time-seeded: the axon tunnel memoizes IDENTICAL dispatches across
        # processes, so a fixed key would replay a previous run's results
        # (measuring the result cache, not the chip)
        rng = jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF)

        def sync(st):
            # synchronous SCALAR readback: on the axon tunnel
            # block_until_ready returns before execution completes (the
            # probe in docs/PERF.md measured 8 ms "complete" 256^2 steps);
            # only a host-side value forces the chain to finish.
            return float(jax.tree_util.tree_leaves(st.params_G)[0]
                         .astype(jnp.float32).sum())

        import jax.numpy as jnp
        # warm/compile
        state, _ = step(state, put(next(loader)), rng)
        sync(state)

        nxt = put(next(loader))              # prefetched device batch
        t0 = time.perf_counter()
        for i in range(steps):
            cur = nxt
            state, stats = step(state, cur, jax.random.fold_in(rng, i))
            # overlap: host decode + H2D of the next batch ride under the
            # async dispatched step
            nxt = put(next(loader))
        sync(state)
        dt = time.perf_counter() - t0

        # control: the IDENTICAL program fed a device-resident batch (no
        # decode, no H2D) — the loader-fed/pre-staged ratio isolates what
        # the input pipeline costs the step. The state advances every step,
        # so dispatches are unique and the axon result cache cannot fire.
        t0 = time.perf_counter()
        for i in range(steps):
            state, stats = step(state, nxt, jax.random.fold_in(rng, 10_000 + i))
        sync(state)
        dt_pre = time.perf_counter() - t0
    finally:
        loader.close()
        ds.close()
    n = steps * batch_size * F
    return n / dt, n / dt_pre


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None, help="frames dir/zip; default: synthetic 256^2 zip")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--num-workers", type=int, default=8)
    ap.add_argument("--num-batches", type=int, default=40)
    ap.add_argument("--frames-per-video", type=int, default=3)
    ap.add_argument("--train-steps", type=int, default=0,
                    help="also run N loader-fed training steps with overlap")
    ap.add_argument("--ada", action="store_true",
                    help="train-steps in the bench.py parity config (bgc "
                         "pipe, fixed p=0.5, AA warp) for direct comparison "
                         "with BENCH_r*.json train_frames_per_sec")
    ap.add_argument("--res", type=int, default=256)
    args = ap.parse_args()

    tmp = None
    data = args.data
    if data is None:
        tmp = tempfile.mkdtemp(prefix="sgv_bench_loader_")
        print(f"generating synthetic dataset in {tmp} ...", file=sys.stderr)
        data = make_synthetic_zip(tmp, res=args.res)

    out = {"metric": "loader_frames_per_sec", "unit": "frames/sec"}
    fps = bench_loader(data, args.batch_size, args.num_workers,
                       args.num_batches, args.frames_per_video)
    out["value"] = round(fps, 1)
    out["num_workers"] = args.num_workers
    # the production consumption rate: 113.8 f/s/chip at FFS-256 ADA-parity
    # training (BENCH_r04 train_frames_per_sec) -> the >=2x gate
    out["consumption_frames_per_sec"] = 113.8 * 1.0
    out["headroom_x"] = round(fps / 113.8, 2)
    from stylegan_v_tpu.native import fastjpeg
    out["fastjpeg"] = bool(fastjpeg.is_available())

    if args.train_steps > 0:
        try:
            e2e, pre = bench_train_overlap(data, args.batch_size,
                                           args.num_workers,
                                           args.train_steps, args.res,
                                           ada=args.ada)
            out["train_fed_frames_per_sec"] = round(e2e, 2)
            out["train_prestaged_frames_per_sec"] = round(pre, 2)
            out["loader_overhead_pct"] = round(100.0 * (pre - e2e) / pre, 2)
            out["train_fed_ada"] = bool(args.ada)
        except Exception as e:  # noqa: BLE001
            out["train_fed_error"] = repr(e)[:300]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
