#!/usr/bin/env python
"""On-chip validation of the shear warp executor across resolutions.

The round-2 executor hit a canvas-size-specific v5e miscompile at the 64^2
AA canvas (kernel fault; every other size passed), so `warp_mode='auto'`
gates shear to SHEAR_TPU_VALIDATED_RES (training/augment.py). The round-3
stage executors (one-hot-matmul resample + grouped shift) avoid the per-line
gather/dynamic-slice lowering entirely — this script re-validates every
resolution fwd AND fwd+bwd against the gather executor and prints an
allowlist verdict per size. Run detached on the real chip:

    nohup python -u scripts/validate_shear_onchip.py > shear_val.log 2>&1 &
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from stylegan_v_tpu.ops import setup_filter
    from stylegan_v_tpu.training.augment import (_SYM6, _warp_antialiased,
                                                 rotate2d, scale2d)
    import stylegan_v_tpu.ops.shear_warp as sw
    print(f"backend={jax.default_backend()}  stage1={sw.STAGE1_IMPL}  "
          f"stage2={sw.STAGE2_IMPL}", flush=True)
    Hz = setup_filter(_SYM6)
    rng = np.random.RandomState(0)
    ok_all = []
    for res in (32, 64, 128, 256, 512, 1024):
        B = 4 if res <= 256 else (2 if res <= 512 else 1)
        x = jnp.asarray(rng.randn(B, res, res, 9).astype(np.float32))
        th = jnp.asarray(rng.uniform(-np.pi, np.pi, B).astype(np.float32))
        G = rotate2d(th) @ scale2d(
            jnp.asarray(rng.uniform(0.7, 1.4, B), jnp.float32),
            jnp.asarray(rng.uniform(0.7, 1.4, B), jnp.float32))
        try:
            got = np.asarray(jax.jit(lambda x_: _warp_antialiased(
                x_, G, Hz, 6, warp_mode="shear", geom_dtype="bfloat16"))(x))
            grad = np.asarray(jax.jit(jax.grad(lambda x_: jnp.sum(jnp.abs(
                _warp_antialiased(x_, G, Hz, 6, warp_mode="shear",
                                  geom_dtype="bfloat16"))
                .astype(jnp.float32))))(x))
            ref = np.asarray(jax.jit(lambda x_: _warp_antialiased(
                x_, G, Hz, 6, warp_mode="gather", geom_dtype="float32"))(x))
            d = (ref - got)[:, 8:-8, 8:-8]
            peak = ref.max() - ref.min()
            psnr = 10 * np.log10(peak ** 2 / np.mean(d ** 2))
            ok = (np.isfinite(got).all() and np.isfinite(grad).all()
                  and psnr > 28.0)
            print(f"res {res:5d}: psnr {psnr:6.1f} dB  grad finite "
                  f"{bool(np.isfinite(grad).all())}  -> "
                  f"{'PASS' if ok else 'FAIL'}", flush=True)
        except Exception as e:
            ok = False
            print(f"res {res:5d}: EXCEPTION {e!r}", flush=True)
        ok_all.append((res, ok))
    print("verdict:", {r: o for r, o in ok_all}, flush=True)


if __name__ == "__main__":
    main()
