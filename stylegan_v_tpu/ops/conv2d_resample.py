"""2-D convolution with optional FIR up/downsampling (NHWC / HWIO).

TPU-native equivalent of reference src/torch_utils/ops/conv2d_resample.py.
The reference routes into 6 cuDNN-shaped fast paths; on TPU, XLA's
`conv_general_dilated` natively expresses zero-insert upsampling
(lhs_dilation) and decimation (window_strides), so only three structural
paths remain — and each lowers to at most one depthwise + one dense conv.

Semantics contract (reference conv2d_resample.py:59-82): padding is applied
once, relative to the UPSAMPLED image; the pipeline is
  zero-insert(up) -> FIR filter f -> pad -> conv w -> FIR filter f -> decimate(down)
with the same padding-adjustment arithmetic as the reference
(conv2d_resample.py:94-104).

`flip_weight=True` means correlation (the torch/XLA native direction);
`flip_weight=False` flips the dense kernel spatially (true convolution).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax

from ..utils.misc import parse_padding
from .conv_wg import choose_s2b_factors, conv_valid_s2b
from .upfirdn2d import _filter_size, upfirdn2d


def _conv2d(x: jax.Array, w: jax.Array, stride: int = 1, padding=((0, 0), (0, 0)),
            groups: int = 1, flip_weight: bool = True) -> jax.Array:
    """Plain dense conv, NHWC x HWIO -> NHWC. padding = ((py0,py1),(px0,px1))."""
    if not flip_weight:
        w = jnp.flip(w, axis=(0, 1))
    w = w.astype(x.dtype)
    kh, kw = w.shape[0], w.shape[1]
    # Stride-1 dense k>1 convs: optional space-to-batch weight-grad custom
    # VJP (ops/conv_wg.py; the round-4 roofline audit's "problem shape"
    # lever). OFF by default — the on-chip A/B measured the quadrant-
    # stacked dW program slower end-to-end at the production shape (HBM
    # traffic from the reformulation outweighs the padded-MXU win; see
    # conv_wg.py docstring / PERF.md). Opt in via SGV_CONV_WG_S2B=auto.
    # lax.pad outside the custom VJP keeps (possibly negative) padding on
    # ordinary AD.
    if stride == 1 and groups == 1 and (kh > 1 or kw > 1):
        (py0, py1), (px0, px1) = padding
        N, H, W_, _ = x.shape
        Ho, Wo = H + py0 + py1 - kh + 1, W_ + px0 + px1 - kw + 1
        factors = choose_s2b_factors(N, Ho, Wo, kh, kw)
        if factors is not None:
            xp = lax.pad(x, jnp.zeros((), x.dtype),
                         [(0, 0, 0), (py0, py1, 0), (px0, px1, 0), (0, 0, 0)])
            return conv_valid_s2b(xp, w, factors)
    # No preferred_element_type: keeps arbitrary-order AD dtype-consistent;
    # the MXU accumulates bf16 contractions in fp32 internally regardless.
    return lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def conv2d_resample(x: jax.Array, w: jax.Array, f=None, up: int = 1, down: int = 1,
                    padding=0, groups: int = 1, flip_weight: bool = True,
                    flip_filter: bool = False) -> jax.Array:
    """Conv with optional up/downsampling (reference conv2d_resample.py:59-154).

    Args:
        x:       [N, H, W, C_in].
        w:       [kh, kw, C_in // groups, C_out] (HWIO).
        f:       FIR filter from `setup_filter`, or None.
        up/down: integer resampling factors.
        padding: int / (px,py) / (px0,px1,py0,py1), w.r.t. the upsampled image.
    """
    assert x.ndim == 4 and w.ndim == 4
    kh, kw, _, _ = w.shape
    fw, fh = _filter_size(f)
    px0, px1, py0, py1 = parse_padding(padding)
    assert isinstance(up, int) and isinstance(down, int) and up >= 1 and down >= 1

    # Padding adjustment for resampling (reference conv2d_resample.py:94-104).
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    # 1x1 conv + downsample: decimate first, convolve at low res
    # (reference fast path, conv2d_resample.py:106-110).
    if kw == 1 and kh == 1 and down > 1 and up == 1:
        x = upfirdn2d(x, f, down=down, padding=[px0, px1, py0, py1], flip_filter=flip_filter)
        return _conv2d(x, w, groups=groups, flip_weight=flip_weight)

    # 1x1 conv + upsample: convolve at low res, then upsample
    # (reference fast path, conv2d_resample.py:112-116).
    if kw == 1 and kh == 1 and up > 1 and down == 1:
        x = _conv2d(x, w, groups=groups, flip_weight=flip_weight)
        return upfirdn2d(x, f, up=up, padding=[px0, px1, py0, py1], gain=up ** 2,
                         flip_filter=flip_filter)

    # Downsample: FIR filter, then strided dense conv (decimation fused into
    # the conv) (reference conv2d_resample.py:118-122).
    if down > 1 and up == 1:
        x = upfirdn2d(x, f, padding=[px0, px1, py0, py1], flip_filter=flip_filter)
        return _conv2d(x, w, stride=down, groups=groups, flip_weight=flip_weight)

    # Upsample: one fused (zero-insert + FIR + pad) depthwise pass, then the
    # dense conv at high resolution. Same math as the reference's
    # transpose-conv fast path (conv2d_resample.py:124-142) and identical to
    # its documented generic pipeline (conv2d_resample.py:149-153); on XLA the
    # depthwise-then-dense order is one clean fusion.
    if up > 1:
        x = upfirdn2d(x, f, up=up, padding=[px0, px1, py0, py1], gain=up ** 2,
                      flip_filter=flip_filter)
        x = _conv2d(x, w, groups=groups, flip_weight=flip_weight)
        if down > 1:
            x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
        return x

    # Plain conv (reference conv2d_resample.py:144-147); asymmetric / negative
    # padding is supported natively by XLA so no fallback split is needed.
    return _conv2d(x, w, padding=((py0, py1), (px0, px1)), groups=groups,
                   flip_weight=flip_weight)
