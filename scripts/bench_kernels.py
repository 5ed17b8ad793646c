#!/usr/bin/env python
"""Kernel micro-benchmarks on the attached TPU: lax vs Pallas implementations
of the FIR resampling ops, against the HBM roofline.

    python scripts/bench_kernels.py [--shape 256,128,128,128]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBPS = 820.0   # v5e


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--shape", default="256,128,128,128")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from stylegan_v_tpu.ops import downsample2d, setup_filter, upsample2d
    from stylegan_v_tpu.ops.pallas_kernels import downfirdn2d_x2

    shape = tuple(int(s) for s in args.shape.split(","))
    f = setup_filter([1, 3, 3, 1])
    key = jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF)
    x = jax.random.normal(key, shape, jnp.bfloat16)

    def timeit(fn, label):
        @jax.jit
        def many(x):
            def body(acc, i):
                y = fn(x + i.astype(x.dtype))
                return acc + jnp.sum(jnp.abs(y)), None
            return jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                jnp.arange(args.iters))[0]
        float(many(x))
        t0 = time.perf_counter()
        float(many(x))
        el = (time.perf_counter() - t0) / args.iters
        print(f"{label:40s}: {el * 1e3:8.3f} ms")
        return el

    in_gb = x.size * 2 / 1e9
    print(f"input {shape} bf16 = {in_gb:.2f} GB")
    print(f"downsample roofline (in + out/4): {(in_gb * 1.25) / HBM_GBPS * 1e3:.2f} ms")
    timeit(lambda x: downsample2d(x, f), "lax downsample2d x2")
    for rb in (4, 8, 16):
        timeit(lambda x, rb=rb: downfirdn2d_x2(x, f, row_block=rb),
               f"pallas downfirdn2d_x2 rb={rb}")
    print(f"upsample roofline (in + out*4): {(in_gb * 5) / HBM_GBPS * 1e3:.2f} ms")
    timeit(lambda x: upsample2d(x, f), "lax upsample2d x2")


if __name__ == "__main__":
    main()
