#!/usr/bin/env python
"""On-chip drive of the space-to-batch weight-grad conv (ops/conv_wg.py):
jitted bf16 forward + first/second-order grads at a production-like shape,
s2b-auto vs disabled, asserting agreement and finiteness on the real TPU.

    python scripts/drive_conv_wg_onchip.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from stylegan_v_tpu.ops import conv_wg
    from stylegan_v_tpu.ops.conv2d_resample import conv2d_resample

    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(48, 64, 64, 64), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.05, jnp.bfloat16)

    def r1_like(a, b):
        # reverse-over-reverse, the Dr1 pattern
        g = jax.grad(lambda aa: jnp.sum(jnp.square(
            conv2d_resample(aa, b, padding=1).astype(jnp.float32))))(a)
        return jnp.sum(jnp.square(g.astype(jnp.float32)))

    def run():
        y = jax.jit(lambda a, b: conv2d_resample(a, b, padding=1))(x, w)
        gx, gw = jax.jit(jax.grad(
            lambda a, b: jnp.sum(jnp.abs(
                conv2d_resample(a, b, padding=1).astype(jnp.float32))),
            argnums=(0, 1)))(x, w)
        hw = jax.jit(jax.grad(r1_like, argnums=1))(x, w)
        outs = [np.asarray(t.astype(jnp.float32)) for t in (y, gx, gw, hw)]
        assert all(np.isfinite(o).all() for o in outs), "non-finite!"
        return outs

    conv_wg._MODE = "0"
    base = run()
    conv_wg._MODE = "force"
    s2b = run()
    for name, a, b in zip(("fwd", "dx", "dw", "d2w(r1)"), base, s2b):
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-30)
        print(f"{name:9s} max={np.abs(a).max():.4g} relerr={rel:.3e}",
              flush=True)
        assert rel < 2e-2, f"{name} disagrees (bf16 budget exceeded)"
    print("conv_wg on-chip drive: OK", flush=True)


if __name__ == "__main__":
    main()
