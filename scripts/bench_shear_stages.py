#!/usr/bin/env python
"""Stage-level microbenchmark of the two-pass shear warp executor
(ops/shear_warp.py) at the production FFS-256 ADA shape, plus candidate
MXU/FIR reformulations of each stage.

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
    print(f"{label:44s} {dt:8.2f} ms")
    return dt


def main():
    from stylegan_v_tpu.ops.shear_warp import (_line_pass,
                                               _integer_shift_lines)
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
    timeit(lambda x: _line_pass(x, shift, scale, Lz), (x,), label="stage1 take_along_axis (current)")

    def line_pass_onehot(x, shift, scale, out_len):
        Bq, L, Rq = x.shape
        pos = scale[:, None] * jnp.arange(out_len, dtype=jnp.float32)[None] \
            + shift[:, None]
        i0 = jnp.floor(pos).astype(jnp.int32)
        f = pos - i0.astype(jnp.float32)
        period = 2 * L
        def mirror(i):
            i = jnp.mod(i, period)
            return jnp.where(i < L, i, period - 1 - i)
        i0m, i1m = mirror(i0), mirror(i0 + 1)
        rows = jnp.arange(L, dtype=jnp.int32)[None, None, :]
        S = ((rows == i0m[:, :, None]).astype(jnp.float32) * (1 - f)[:, :, None]
             + (rows == i1m[:, :, None]).astype(jnp.float32) * f[:, :, None])
        return jax.lax.dot_general(
            S.astype(x.dtype), x, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(x.dtype)

    z_oh = line_pass_onehot(x, shift, scale, Lz)
    z_ref = _line_pass(x, shift, scale, Lz)
    err = float(jnp.max(jnp.abs(z_oh.astype(jnp.float32) - z_ref.astype(jnp.float32))))
    print(f"    onehot vs gather max abs err: {err:.3e}")
    timeit(lambda x: line_pass_onehot(x, shift, scale, Lz), (x,),
           label="stage1 one-hot matmul (MXU)")

    # ---------------- stage 2: per-line fractional shift ------------------
    zt = jnp.asarray(rng.rand(B, W, Lz, C), dt)    # [B, W, Lz, C]
    k = jnp.asarray(rng.randint(0, Lz - out_h - 1, (B, W)), jnp.int32)
    frac = jnp.asarray(rng.rand(B, W), jnp.float32)
    timeit(lambda zt: _integer_shift_lines(zt, k, frac, out_h), (zt,),
           label="stage2 vmap dynamic_slice (current)")

    # candidate: coarse per-group shift + residual FIR via static rolls
    def shift_lines_grouped(zt, k, frac, out_len, TW=8):
        Bq, N, L, Cq = zt.shape
        G = N // TW
        kg = k.reshape(Bq, G, TW)
        k0 = kg.min(axis=2)                              # [B, G] coarse
        rmax = int(TW * 8)                               # static residual bound
        resid = kg - k0[:, :, None]                      # [B, G, TW] >= 0
        resid = jnp.clip(resid, 0, rmax)
        zg = zt.reshape(Bq, G, TW, L, Cq)

        def coarse(zgl, k0l):                            # [TW, L, C], scalar
            return jax.lax.dynamic_slice(
                zgl, (0, k0l, 0), (TW, out_len + rmax + 1, Cq))
        zc = jax.vmap(jax.vmap(coarse))(zg, k0)          # [B,G,TW,out+rmax+1,C]

        f = frac.reshape(Bq, G, TW)[..., None, None].astype(zt.dtype)
        out = jnp.zeros((Bq, G, TW, out_len, Cq), zt.dtype)
        for j in range(rmax + 1):
            w = (resid == j).astype(zt.dtype)[..., None, None]
            sl = jax.lax.dynamic_slice_in_dim(zc, j, out_len + 1, axis=3)
            out = out + w * (sl[:, :, :, :-1] * (1 - f) + sl[:, :, :, 1:] * f)
        return out.reshape(Bq, N, out_len, Cq)

    # correctness on small residual spread (realistic: k linear in column)
    cols = np.arange(W)
    kl = np.clip((200 + 0.8 * cols).astype(np.int32), 0, Lz - out_h - 2)
    kl = jnp.asarray(np.tile(kl[None], (B, 1)), jnp.int32)
    want = _integer_shift_lines(zt, kl, frac, out_h)
    got = shift_lines_grouped(zt, kl, frac, out_h)
    err2 = float(jnp.max(jnp.abs(want.astype(jnp.float32) - got.astype(jnp.float32))))
    print(f"    grouped vs current max abs err: {err2:.3e}")
    timeit(lambda zt: shift_lines_grouped(zt, kl, frac, out_h), (zt,),
           label="stage2 grouped slice + residual FIR")

    # candidate: whole-line one-hot matmul for stage 2 as well (per-line
    # matrices are too big; skip — documented in bench notes)

    # ---------------- backward costs (grad wrt payload) -------------------
    timeit(lambda x: jax.grad(lambda y: jnp.sum(jnp.abs(
        _line_pass(y, shift, scale, Lz)).astype(jnp.float32)))(x), (x,),
        n=4, label="stage1 take_along_axis fwd+bwd")
    timeit(lambda x: jax.grad(lambda y: jnp.sum(jnp.abs(
        line_pass_onehot(y, shift, scale, Lz)).astype(jnp.float32)))(x), (x,),
        n=4, label="stage1 one-hot matmul fwd+bwd")
    timeit(lambda zt: jax.grad(lambda y: jnp.sum(jnp.abs(
        _integer_shift_lines(y, kl, frac, out_h)).astype(jnp.float32)))(zt), (zt,),
        n=4, label="stage2 vmap dynamic_slice fwd+bwd")
    timeit(lambda zt: jax.grad(lambda y: jnp.sum(jnp.abs(
        shift_lines_grouped(y, kl, frac, out_h)).astype(jnp.float32)))(zt), (zt,),
        n=4, label="stage2 grouped+FIR fwd+bwd")


if __name__ == "__main__":
    main()
