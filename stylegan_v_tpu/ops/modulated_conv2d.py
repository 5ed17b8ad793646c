"""StyleGAN2 modulated convolution, TPU-native.

Replaces reference src/training/networks.py:30-86.  The reference's "fused"
path materializes per-sample weights [N,O,I,kh,kw] and runs ONE grouped conv
with groups=N (networks.py:77-86) — a cuDNN-shaped trick that is hostile to
the TPU MXU (tiny per-group contractions, huge weight tensor through HBM).

The TPU-native formulation uses the algebraic identity the reference's
non-fused path exploits (networks.py:65-74): modulation and demodulation are
per-sample DIAGONAL scalings, so

    demod_o * conv(w * style_i, x) == demod_o * conv(w, style_i * x)

i.e. scale activations by styles before ONE big shared-weight dense conv
(batch stays on the MXU's favorite axis), then scale by the demodulation
coefficients after.  Demod coefficients never materialize per-sample weights:

    dcoef[n,o] = rsqrt( sum_i styles[n,i]^2 * wsum[i,o] + 1e-8 ),
    wsum[i,o]  = sum_kh,kw w[kh,kw,i,o]^2              (one [N,I]x[I,O] matmul)

The fp16 pre-normalization (networks.py:49-52) is omitted: it is an exact
no-op in infinite precision (global per-o / per-n scales cancel through the
demodulation) and exists only to dodge fp16's narrow exponent; bf16 shares
fp32's exponent range so overflow cannot occur.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..utils.misc import assert_shape
from .conv2d_resample import conv2d_resample


def modulated_conv2d(
    x: jax.Array,                    # [N, H, W, I] input activations.
    weight: jax.Array,               # [kh, kw, I, O] shared conv weight (HWIO).
    styles: jax.Array,               # [N, I] per-sample modulation.
    noise: Optional[jax.Array] = None,  # optional [N, H', W', 1]-broadcastable noise.
    up: int = 1,
    down: int = 1,
    padding: int = 0,
    resample_filter=None,            # from upfirdn2d.setup_filter.
    demodulate: bool = True,
    flip_weight: bool = True,
) -> jax.Array:
    """Per-sample style modulation + conv + demodulation (see module docstring)."""
    N = x.shape[0]
    kh, kw, in_channels, out_channels = weight.shape
    assert_shape(x, [N, None, None, in_channels])
    assert_shape(styles, [N, in_channels])

    # Modulate: diagonal per-sample input scaling.
    x = x * styles.astype(x.dtype)[:, None, None, :]

    x = conv2d_resample(x=x, w=weight.astype(x.dtype), f=resample_filter, up=up,
                        down=down, padding=padding, flip_weight=flip_weight)

    if demodulate:
        # dcoefs via one small matmul in fp32 — numerically matches the
        # reference's sum over per-sample weights (networks.py:58-60).
        wsum = jnp.sum(jnp.square(weight.astype(jnp.float32)), axis=(0, 1))  # [I, O]
        d = jax.lax.rsqrt(jnp.square(styles.astype(jnp.float32)) @ wsum + 1e-8)  # [N, O]
        if noise is not None:
            # fma ordering mirrors reference networks.py:68-69.
            x = x * d.astype(x.dtype)[:, None, None, :] + noise.astype(x.dtype)
        else:
            x = x * d.astype(x.dtype)[:, None, None, :]
    elif noise is not None:
        x = x + noise.astype(x.dtype)
    return x
