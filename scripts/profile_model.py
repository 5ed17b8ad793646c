#!/usr/bin/env python
"""Generator throughput harness (reference src/scripts/profile_model.py:45-100):
warmup + timed iterations per batch size, reports s/it and frames/sec.

On this TPU attachment, timing uses an on-chip lax.scan reduced to a scalar
(see bench.py) so results reflect chip throughput, not tunnel latency.
"""
from __future__ import annotations

import argparse
import os
import sys
import time


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def profile_for_batch_size(G, variables, videos: int, frames: int,
                           iters: int = 10):
    import jax
    import jax.numpy as jnp

    t = jnp.tile(jnp.arange(frames, dtype=jnp.float32)[None], (videos, 1))
    key = jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF)

    @jax.jit
    def synth_many(variables, zs, t):
        def body(acc, z):
            img = G.apply(variables, z, None, t, noise_mode="const",
                          rngs={"motion": jax.random.PRNGKey(0)})
            return acc + jnp.sum(jnp.abs(img)), None
        return jax.lax.scan(body, 0.0, zs)[0]

    zs = jax.random.normal(key, (iters, videos, G.cfg.z_dim))
    float(synth_many(variables, zs, t))          # compile + warmup
    zs2 = jax.random.normal(jax.random.fold_in(key, 1), (iters, videos, G.cfg.z_dim))
    start = time.perf_counter()
    float(synth_many(variables, zs2, t))
    elapsed = time.perf_counter() - start
    return dict(sec_per_iter=elapsed / iters,
                frames_per_sec=iters * videos * frames / elapsed)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--network", default=None, help="orbax snapshot (default: fresh init)")
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--batch-sizes", default="4,8,16,32")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--trace-dir", default=None,
                    help="write a jax.profiler trace (view with TensorBoard)")
    args = ap.parse_args()

    import jax
    from functools import partial

    if args.network:
        from generate import load_any_checkpoint
        G, variables = load_any_checkpoint(args.network)
    else:
        import jax.numpy as jnp
        from stylegan_v_tpu.models import Generator, GeneratorConfig
        from stylegan_v_tpu.models.config import replace
        cfg = replace(GeneratorConfig(), img_resolution=args.resolution)
        G = Generator(cfg)
        z = jnp.zeros((1, cfg.z_dim))
        t = jnp.zeros((1, 2))
        variables = jax.jit(partial(G.init, noise_mode="none"))(
            {"params": jax.random.PRNGKey(0), "motion": jax.random.PRNGKey(1)},
            z, None, t)

    print(f"device: {jax.devices()[0]}  resolution: {G.cfg.img_resolution}")
    print(f"{'videos':>8} {'frames':>7} {'s/iter':>9} {'frames/sec':>12} {'peak-mem':>10}")
    import contextlib
    ctx = (jax.profiler.trace(args.trace_dir) if args.trace_dir
           else contextlib.nullcontext())
    with ctx:
        for bs in [int(b) for b in args.batch_sizes.split(",")]:
            r = profile_for_batch_size(G, variables, bs, args.frames, args.iters)
            stats = jax.local_devices()[0].memory_stats() or {}
            peak = stats.get("peak_bytes_in_use", 0) / 1e9
            print(f"{bs:>8} {args.frames:>7} {r['sec_per_iter']:>9.3f} "
                  f"{r['frames_per_sec']:>12.1f} {peak:>9.2f}G")
    if args.trace_dir:
        print(f"trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
