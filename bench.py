"""Headline benchmark: frames/sec/chip at 256x256 synthesis (BASELINE.md metric).

Mirrors the reference's profile_model.py harness (warmup + timed iters,
imgs/sec) on the flagship StyleGAN-V generator.  Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

Measurement method: N synthesis batches inside ONE jitted `lax.scan` program
reduced to a scalar, timed around a synchronous readback. This is required on
this TPU attachment because (a) the axon platform memoizes identical
dispatches ACROSS processes (fixed inputs would benchmark a result cache) and
(b) per-call dispatch includes tunnel round-trip latency that the scan
amortizes away, giving pure on-chip throughput.

vs_baseline: BASELINE.json target is >=3x a V100 chip; the reference repo
publishes no V100 numbers (BASELINE.md), so we use V100_REF = 250 frames/sec
as the estimate for StyleGAN2-sized 256^2 synthesis on one V100.
vs_baseline = value / (3 * V100_REF); >= 1.0 means the target is met.
"""
from __future__ import annotations

import json
import time

V100_REF_FRAMES_PER_SEC = 250.0
TARGET_MULTIPLIER = 3.0


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from stylegan_v_tpu.models import Generator, GeneratorConfig

    cfg = GeneratorConfig()          # flagship FFS-256 (bf16 top resolutions)
    G = Generator(cfg)

    videos, frames = 32, 8           # 256 frames per batch (throughput-optimal)
    n_batches = 16
    key = jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF)   # defeat result cache
    t = jnp.tile(jnp.arange(frames, dtype=jnp.float32)[None], (videos, 1))
    z0 = jax.random.normal(key, (videos, cfg.z_dim))
    params = jax.jit(partial(G.init, noise_mode="none"))(
        {"params": jax.random.PRNGKey(1), "motion": jax.random.PRNGKey(2)}, z0, None, t)

    @jax.jit
    def synth_many(params, zs, t):
        def body(acc, z):
            img = G.apply(params, z, None, t, noise_mode="none",
                          rngs={"motion": jax.random.PRNGKey(3)})
            return acc + jnp.sum(jnp.abs(img)), None
        acc, _ = jax.lax.scan(body, 0.0, zs)
        return acc

    zs = jax.random.normal(key, (n_batches, videos, cfg.z_dim))
    float(synth_many(params, zs, t))                      # compile + warm
    zs2 = jax.random.normal(jax.random.fold_in(key, 7), (n_batches, videos, cfg.z_dim))
    start = time.perf_counter()
    acc = float(synth_many(params, zs2, t))               # sync scalar readback
    elapsed = time.perf_counter() - start
    assert acc > 0 and acc == acc, "non-finite synthesis output"
    frames_per_sec = n_batches * videos * frames / elapsed

    print(json.dumps({
        "metric": "synthesis_throughput_256",
        "value": round(frames_per_sec, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(frames_per_sec / (TARGET_MULTIPLIER * V100_REF_FRAMES_PER_SEC), 3),
    }))


if __name__ == "__main__":
    main()
