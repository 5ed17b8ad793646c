"""upfirdn2d — pad, upsample, FIR-filter, downsample a batch of NHWC images.

TPU-native replacement for the reference CUDA kernel pair
(reference src/torch_utils/ops/upfirdn2d.{py,cu,cpp}).  The zero-insertion
upsample maps onto `lhs_dilation`, the FIR filter onto a depthwise
convolution, and the decimation onto `window_strides` — all in ONE
`lax.conv_general_dilated` call per filter pass, which XLA lowers to a single
fused TPU convolution. The per-(up,down,filter) CUDA dispatch table
(reference upfirdn2d.cu:205-341) becomes static specialization at trace time.

Semantics contract (mirrors reference upfirdn2d.py:120-158):
  1. Upsample by inserting up-1 zeros after each pixel.
  2. Pad with zeros (negative padding crops) — relative to the upsampled image.
  3. Convolve with the FIR filter f (flip_filter=False means true convolution).
  4. Downsample by keeping every down-th pixel (starting at 0).

Layout: x is [N, H, W, C] (NHWC, TPU-native; the reference uses NCHW).
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..utils.misc import parse_padding, parse_scaling

Filter = Union[np.ndarray, jax.Array, Sequence[float], None]


def setup_filter(f: Filter, normalize: bool = True, flip_filter: bool = False,
                 gain: float = 1.0, separable: Optional[bool] = None) -> np.ndarray:
    """Prepare a FIR filter for `upfirdn2d` (mirrors reference upfirdn2d.py:72-116).

    Returns a float32 numpy array of shape [fh, fw] (non-separable) or
    [taps] (separable). Host-side numpy on purpose: filters are compile-time
    constants baked into the jitted program.
    """
    if f is None:
        f = 1
    f = np.asarray(f, dtype=np.float32)
    assert f.ndim in (0, 1, 2)
    assert f.size > 0
    if f.ndim == 0:
        f = f[np.newaxis]

    if separable is None:
        separable = (f.ndim == 1 and f.size >= 8)
    if f.ndim == 1 and not separable:
        f = np.outer(f, f)
    assert f.ndim == (1 if separable else 2)

    if normalize:
        f = f / f.sum()
    if flip_filter:
        f = f[tuple(slice(None, None, -1) for _ in range(f.ndim))]
    f = f * (gain ** (f.ndim / 2))
    return np.ascontiguousarray(f, dtype=np.float32)


def _filter_size(f: Filter):
    """Return (fw, fh); mirrors reference upfirdn2d.py:47-68."""
    if f is None:
        return 1, 1
    fa = np.asarray(f) if not isinstance(f, jax.Array) else f
    assert fa.ndim in (1, 2)
    fw = int(fa.shape[-1])
    fh = int(fa.shape[0])
    return fw, fh


def _depthwise_pass(x: jax.Array, k: jax.Array, up: Sequence[int], down: Sequence[int],
                    pad: Sequence[int]) -> jax.Array:
    """One fused (zero-insert, pad, filter, decimate) pass as a depthwise conv.

    k must already be flipped/gained/cast. pad = [px0, px1, py0, py1] relative
    to the zero-inserted image. Trailing `up-1` implicit zeros of the
    reference's reshape-style upsample are folded into the high padding
    (lhs_dilation yields length (n-1)*up+1, the reference yields n*up).
    """
    upx, upy = up
    downx, downy = down
    px0, px1, py0, py1 = pad
    C = x.shape[-1]
    kernel = jnp.broadcast_to(k[:, :, None, None], (*k.shape, 1, C)).astype(x.dtype)
    # No preferred_element_type: output dtype == input dtype keeps arbitrary-
    # order AD dtype-consistent (the MXU still accumulates bf16 in fp32
    # internally), mirroring the reference's half-precision conv behavior.
    return lax.conv_general_dilated(
        x, kernel,
        window_strides=(downy, downx),
        padding=((py0, py1 + upy - 1), (px0, px1 + upx - 1)),
        lhs_dilation=(upy, upx),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def upfirdn2d(x: jax.Array, f: Filter, up=1, down=1, padding=0,
              flip_filter: bool = False, gain: float = 1.0) -> jax.Array:
    """Pad, upsample, filter, downsample (see module docstring for contract).

    Args:
        x:       [N, H, W, C] float array.
        f:       FIR filter [fh, fw] (non-separable), [taps] (separable) or None.
        up:      int or (ux, uy) upsampling factor.
        down:    int or (dx, dy) downsampling factor.
        padding: int, (px, py) or (px0, px1, py0, py1), w.r.t. the upsampled image.
        flip_filter: False = convolution, True = correlation.
        gain:    overall magnitude scaling.

    Returns [N, out_h, out_w, C].
    """
    assert x.ndim == 4, f"expected NHWC, got shape {x.shape}"
    upx, upy = parse_scaling(up)
    downx, downy = parse_scaling(down)
    px0, px1, py0, py1 = parse_padding(padding)

    if f is None:
        f = np.ones((1, 1), dtype=np.float32)
    f = jnp.asarray(f, dtype=jnp.float32)
    assert f.ndim in (1, 2)

    if not flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))

    if f.ndim == 2:
        k = f * (gain ** 1.0)
        return _depthwise_pass(x, k, (upx, upy), (downx, downy), (px0, px1, py0, py1))

    # Separable: horizontal pass then vertical pass, sqrt(gain) each
    # (mirrors reference _upfirdn2d_ref gain**(f.ndim/2) per pass and the CUDA
    # wrapper's two-pass split, upfirdn2d.py:239-240).
    g = float(np.sqrt(gain)) if not isinstance(gain, jax.Array) else jnp.sqrt(gain)
    kx = (f * g)[None, :]   # [1, taps]
    ky = (f * g)[:, None]   # [taps, 1]
    x = _depthwise_pass(x, kx, (upx, 1), (downx, 1), (px0, px1, 0, 0))
    x = _depthwise_pass(x, ky, (1, upy), (1, downy), (0, 0, py0, py1))
    return x


def filter2d(x: jax.Array, f: Filter, padding=0, flip_filter: bool = False,
             gain: float = 1.0) -> jax.Array:
    """Filter with shape-preserving default padding (reference upfirdn2d.py:272-304)."""
    px0, px1, py0, py1 = parse_padding(padding)
    fw, fh = _filter_size(f)
    p = [px0 + fw // 2, px1 + (fw - 1) // 2, py0 + fh // 2, py1 + (fh - 1) // 2]
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain)


def upsample2d(x: jax.Array, f: Filter, up=2, padding=0, flip_filter: bool = False,
               gain: float = 1.0) -> jax.Array:
    """Upsample with a FIR filter (reference upfirdn2d.py:308-343)."""
    upx, upy = parse_scaling(up)
    px0, px1, py0, py1 = parse_padding(padding)
    fw, fh = _filter_size(f)
    p = [px0 + (fw + upx - 1) // 2, px1 + (fw - upx) // 2,
         py0 + (fh + upy - 1) // 2, py1 + (fh - upy) // 2]
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter, gain=gain * upx * upy)


def downsample2d(x: jax.Array, f: Filter, down=2, padding=0, flip_filter: bool = False,
                 gain: float = 1.0) -> jax.Array:
    """Downsample with a FIR filter (reference upfirdn2d.py:347-382)."""
    downx, downy = parse_scaling(down)
    px0, px1, py0, py1 = parse_padding(padding)
    fw, fh = _filter_size(f)
    p = [px0 + (fw - downx + 1) // 2, px1 + (fw - downx) // 2,
         py0 + (fh - downy + 1) // 2, py1 + (fh - downy) // 2]
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain)
