#!/usr/bin/env python
"""Full ADA AA-warp benchmark (fwd and fwd+bwd) at the production FFS-256
shape (Hz_pad=3, B=16 C=9, chunked x4), A/B over the stage executors and the
remat policy. Scan-of-varying-inputs + synchronous scalar readback (see
.claude/skills/verify). Run detached:

    nohup python -u scripts/bench_warp_full.py > warp_ab.log 2>&1 &
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(fn, x, n, label):
    @jax.jit
    def prog(stack):
        def body(acc, x0):
            return acc + jnp.sum(jnp.abs(fn(x0)).astype(jnp.float32)), None
        return jax.lax.scan(body, 0.0, stack)[0]

    key = jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF)
    stack = x[None] + jax.random.normal(key, (n,) + (1,) * x.ndim, x.dtype) * 0.01
    t0 = time.perf_counter()
    c = prog.lower(stack).compile()
    t_compile = time.perf_counter() - t0
    float(c(stack))
    best = np.inf
    for rep in range(3):                      # min-of-3 defeats host jitter
        t0 = time.perf_counter()
        acc = float(c(stack * (1.0001 + rep * 1e-4)))
        best = min(best, (time.perf_counter() - t0) / n * 1000)
    assert np.isfinite(acc)
    print(f"{label:56s} {best:8.2f} ms   (compile {t_compile:.0f}s)",
          flush=True)
    return best


def main():
    from stylegan_v_tpu.ops import setup_filter
    from stylegan_v_tpu.training.augment import (_SYM6, _warp_antialiased,
                                                 rotate2d, scale2d,
                                                 translate2d)
    import stylegan_v_tpu.ops.shear_warp as sw
    B, H, W, C = 16, 256, 256, 9
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    th = jnp.asarray(rng.uniform(-np.pi, np.pi, B).astype(np.float32))
    G = (rotate2d(th)
         @ scale2d(jnp.asarray(rng.uniform(0.7, 1.4, B), jnp.float32),
                   jnp.asarray(rng.uniform(0.7, 1.4, B), jnp.float32))
         @ translate2d(0.1 * jnp.ones(B), -0.2 * jnp.ones(B)))
    Hz = setup_filter(_SYM6)

    def warp(x_):
        return _warp_antialiased(x_, G, Hz, 3, warp_mode="shear",
                                 data_shards=1)

    def warp_grad(x_):
        return jax.grad(lambda y: jnp.sum(jnp.abs(
            _warp_antialiased(y, G, Hz, 3, warp_mode="shear",
                              data_shards=1)).astype(jnp.float32)))(x_)

    # grouped = custom-VJP (transposed-shift backward); grouped_ad = same
    # forward with autodiff backward (the measured 382-431 ms regression);
    # slice/gather = the round-2 executors. Remat measured cost-neutral on
    # every config (158.0->158.9, 206.8->206.5), so it is not swept here.
    # sel sweeps the residual-shift executor: barrel = log2 two-way selects,
    # loop = dense masked accumulate over rmax+1 positions.
    # dense = the round-5 lane-dense barrel (payload packed [B, L, N*C],
    # full 128-lane tiles, no stage-2 transposes, no grouping)
    configs = [("onehot", "dense", "-"),
               ("onehot", "grouped", "barrel"),
               ("onehot", "grouped", "loop"),
               ("onehot", "slice", "-"), ("gather", "slice", "-")]
    for s1, s2, sel in configs:
        sw.STAGE1_IMPL, sw.STAGE2_IMPL = s1, s2
        if sel != "-":
            sw.STAGE2_SELECT = sel
        tag = f"s1={s1} s2={s2} sel={sel}"
        bench(warp, x, 8, f"warp fwd  {tag}")
        bench(warp_grad, x, 4, f"warp f+b  {tag}")


if __name__ == "__main__":
    main()
