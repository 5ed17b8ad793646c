#!/usr/bin/env python
"""Stage-level microbenchmark of the two-pass shear warp executors
(ops/shear_warp.py) at the production FFS-256 ADA shape.

Benchmarks the SHIPPED stage implementations (imported from the package,
same functions the training path calls — no local re-implementations that
could drift): stage 1 take_along_axis vs the MXU one-hot matmul, stage 2
per-line dynamic_slice vs the grouped shift with each residual-select
executor (barrel / dense loop).

Shapes (pass V of the 256^2 AA warp, B=16 videos C=9 folded frames,
chunked x4): canvas 536^2, reflect-padded rows Hp=1072, resampled length
Lz=1060, line payload W*C=4824.

Measurement: scan-of-varying-inputs + synchronous scalar readback (axon
memoizes identical dispatches; tunnel latency must be amortized).
"""
from __future__ import annotations

import sys
import os
import time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, args, n=8, label=""):
    """fn(args...) -> array; scan over n varying copies of args[0]."""
    @jax.jit
    def prog(stack, *rest):
        def body(acc, x0):
            return acc + jnp.sum(jnp.abs(fn(x0, *rest)).astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, 0.0, stack)
        return acc

    x0, rest = args[0], args[1:]
    key = jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF)
    stack = (jnp.asarray(x0)[None] +
             jax.random.normal(key, (n,) + (1,) * x0.ndim, x0.dtype) * 0.01)
    c = prog.lower(stack, *rest).compile()
    float(c(stack, *rest))
    stack2 = stack * 1.0001
    t0 = time.perf_counter()
    acc = float(c(stack2, *rest))
    dt = (time.perf_counter() - t0) / n * 1000
    assert np.isfinite(acc)
    print(f"{label:52s} {dt:8.2f} ms")
    return dt


def main():
    import stylegan_v_tpu.ops.shear_warp as sw
    from stylegan_v_tpu.ops.shear_warp import (_line_pass, _line_pass_onehot,
                                               _integer_shift_lines,
                                               _shift_lines_grouped)
    B, H, W, C = 4, 536, 536, 9          # chunk=4 of the B=16 batch
    Hp, Lz, out_h = 1072, 1060, 524
    R = W * C
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    print(f"pass-V shapes: x[{B},{Hp},{R}] -> z[{B},{Lz},{R}] "
          f"-> out[{B},{W},{out_h},{C}]  dtype={dt.__name__}  (x4 chunks/step)")

    x = jnp.asarray(rng.rand(B, Hp, R), dt)
    scale = jnp.asarray(rng.uniform(0.8, 1.2, B), jnp.float32)
    shift = jnp.asarray(rng.uniform(200, 300, B), jnp.float32)

    # ---------------- stage 1: shared-scale line resample -----------------
    z_oh = _line_pass_onehot(x, shift, scale, Lz)
    z_ref = _line_pass(x, shift, scale, Lz)
    err = float(jnp.max(jnp.abs(z_oh.astype(jnp.float32)
                                - z_ref.astype(jnp.float32))))
    print(f"    onehot vs gather max abs err: {err:.3e}")
    timeit(lambda x: _line_pass(x, shift, scale, Lz), (x,),
           label="stage1 take_along_axis")
    timeit(lambda x: _line_pass_onehot(x, shift, scale, Lz), (x,),
           label="stage1 one-hot matmul (MXU, default)")

    # ---------------- stage 2: per-line fractional shift ------------------
    # k linear in column with the pass-V slope bound (the production
    # contract; random k would violate the grouped executor's precondition)
    zt = jnp.asarray(rng.rand(B, W, Lz, C), dt)    # [B, W, Lz, C]
    frac = jnp.asarray(rng.rand(B, W), jnp.float32)
    slope_bound = sw.SCALE_MAX                     # pass-V bound
    cols = np.arange(W)
    kl = np.clip((200 + 0.8 * cols).astype(np.int32), 0, Lz - out_h - 2)
    kl = jnp.asarray(np.tile(kl[None], (B, 1)), jnp.int32)

    want = _integer_shift_lines(zt, kl, frac, out_h)
    for sel in ("barrel", "loop"):
        sw.STAGE2_SELECT = sel
        got = _shift_lines_grouped(zt, kl, frac, out_h, slope_bound)
        err2 = float(jnp.max(jnp.abs(want.astype(jnp.float32)
                                     - got.astype(jnp.float32))))
        print(f"    grouped[{sel}] vs per-line max abs err: {err2:.3e}")

    timeit(lambda zt: _integer_shift_lines(zt, kl, frac, out_h), (zt,),
           label="stage2 vmap dynamic_slice")
    for sel in ("barrel", "loop"):
        sw.STAGE2_SELECT = sel
        timeit(lambda zt: _shift_lines_grouped(zt, kl, frac, out_h,
                                               slope_bound), (zt,),
               label=f"stage2 grouped shift, {sel} select")

    # ---------------- backward costs (grad wrt payload) -------------------
    timeit(lambda x: jax.grad(lambda y: jnp.sum(jnp.abs(
        _line_pass(y, shift, scale, Lz)).astype(jnp.float32)))(x), (x,),
        n=4, label="stage1 take_along_axis fwd+bwd")
    timeit(lambda x: jax.grad(lambda y: jnp.sum(jnp.abs(
        _line_pass_onehot(y, shift, scale, Lz)).astype(jnp.float32)))(x), (x,),
        n=4, label="stage1 one-hot matmul fwd+bwd")
    timeit(lambda zt: jax.grad(lambda y: jnp.sum(jnp.abs(
        _integer_shift_lines(y, kl, frac, out_h)).astype(jnp.float32)))(zt),
        (zt,), n=4, label="stage2 vmap dynamic_slice fwd+bwd")
    for sel in ("barrel", "loop"):
        sw.STAGE2_SELECT = sel
        timeit(lambda zt: jax.grad(lambda y: jnp.sum(jnp.abs(
            _shift_lines_grouped(y, kl, frac, out_h, slope_bound))
            .astype(jnp.float32)))(zt), (zt,), n=4,
            label=f"stage2 grouped VJP fwd+bwd, {sel} select")


if __name__ == "__main__":
    main()
