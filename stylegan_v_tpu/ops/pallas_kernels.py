"""Pallas TPU kernels for the hot FIR resampling paths.

First production kernel: fused 2x FIR downsample (`downfirdn2d_x2`) — the
upfirdn2d specialization used by every DiscriminatorBlock and the ADA
geometric pipeline (down=2, 4-tap filter, padding=1). The lax/XLA version
reaches ~50% of the HBM roofline on v5e at ladder shapes; this kernel
decomposes the stride-2 convolution into even/odd W phases (pure VPU work on
NHWC tiles) and streams overlapping row bands HBM->VMEM with explicit-DMA
halo handling, so every input byte is read ~once.

Semantics exactly match ops.upfirdn2d.downsample2d(x, f) for a 4x4
setup_filter — verified against the lax path in tests (interpret mode on
CPU, compiled on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(row_block: int, W: int, C: int, out_dtype):
    Wo = W // 2
    rows_in = 2 * row_block + 3

    def kernel(x_hbm, f_ref, o_ref):
        n = pl.program_id(0)
        i = pl.program_id(1)

        def body(scratch, sem):
            # overlapping row band: input rows [2*i*rb, 2*i*rb + 2rb+3)
            # (x is H-padded by (1, 2) on the host, so always in bounds)
            dma = pltpu.make_async_copy(
                x_hbm.at[n, pl.ds(i * 2 * row_block, rows_in)], scratch, sem)
            dma.start()
            dma.wait()

            x = scratch[...]                                # [rows_in, W, C]
            xr = x.reshape(rows_in, Wo, 2, C)
            ph0 = xr[:, :, 0, :]                            # x[.., 2j,   :]
            ph1 = xr[:, :, 1, :]                            # x[.., 2j+1, :]
            zero_col = jnp.zeros((rows_in, 1, C), x.dtype)
            # tap k addresses input col (2j + k - 1):
            taps_w = (
                jnp.concatenate([zero_col, ph1[:, :-1, :]], axis=1),  # k=0
                ph0,                                                   # k=1
                ph1,                                                   # k=2
                jnp.concatenate([ph0[:, 1:, :], zero_col], axis=1),    # k=3
            )
            acc = jnp.zeros((row_block, Wo, C), jnp.float32)
            for ky in range(4):
                for kx in range(4):
                    w = f_ref[ky, kx]
                    rows = taps_w[kx][ky:ky + 2 * row_block:2]  # stride-2 rows
                    acc = acc + w * rows.astype(jnp.float32)
            o_ref[0] = acc.astype(out_dtype)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((rows_in, W, C), x_hbm.dtype),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("row_block", "interpret"))
def downfirdn2d_x2(x: jax.Array, f: jax.Array, row_block: int = 8,
                   interpret: bool = False) -> jax.Array:
    """Fused FIR 2x downsample, NHWC, 4x4 filter, padding=1 each side —
    equivalent to ops.upfirdn2d.downsample2d(x, f) with a 4-tap setup_filter."""
    N, H, W, C = x.shape
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    f = jnp.asarray(f, jnp.float32)
    assert f.shape == (4, 4)
    Ho, Wo = H // 2, W // 2
    row_block = min(row_block, Ho)
    while Ho % row_block != 0:
        row_block -= 1

    # true convolution (upfirdn2d flip_filter=False) => flip the filter
    fk = f[::-1, ::-1]
    # H halo: one cheap pad of the row axis only (traffic x (H+3)/H)
    xp = jnp.pad(x, ((0, 0), (1, 2), (0, 0), (0, 0)))

    kernel = _make_kernel(row_block, W, C, x.dtype)
    return pl.pallas_call(
        kernel,
        grid=(N, Ho // row_block),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.SMEM),         # 4x4 filter
        ],
        out_specs=pl.BlockSpec((1, row_block, Wo, C),
                               lambda n, i: (n, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Ho, Wo, C), x.dtype),
        interpret=interpret,
    )(xp, fk)
