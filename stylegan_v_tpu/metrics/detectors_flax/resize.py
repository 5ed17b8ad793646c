"""Detector-parity bilinear resizes.

The reference's metric detectors do their resizing INSIDE the TorchScript
modules, with two distinct (and non-interchangeable) bilinear conventions,
neither of which `jax.image.resize` reproduces (it antialiases on
downscale; torch/TF1 do not):

  * `half_pixel` — torch `F.interpolate(mode='bilinear'|'trilinear',
    align_corners=False, antialias=False)`: src = (dst + 0.5) * in/out - 0.5.
    Used by the FVD I3D TorchScript's internal `resize=True` preprocessing
    (reference src/metrics/frechet_video_distance.py:23) and by the C3D
    wrapper's 112^2 resize.
  * `asymmetric` — TF1 `tf.image.resize_bilinear(align_corners=False)`:
    src = dst * in/out. Used by the ResizeBilinear node inside NVIDIA's
    'inception-2015-12-05' FID TorchScript (a bit-faithful transcription of
    the TF graph).

Implementation: per-axis gather + lerp with statically precomputed indices
and weights — exact semantics of both conventions, static shapes, fuses
cleanly under jit (no antialias kernel, no dynamic control flow).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def linear_resize_weights(in_size: int, out_size: int, mapping: str
                          ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-output-pixel (idx0, idx1, weight-of-idx1) for 1-D linear resize."""
    dst = np.arange(out_size, dtype=np.float64)
    scale = in_size / out_size
    if mapping == "half_pixel":          # torch align_corners=False
        src = (dst + 0.5) * scale - 0.5
    elif mapping == "asymmetric":        # TF1 align_corners=False
        src = dst * scale
    else:
        raise ValueError(f"unknown mapping '{mapping}'")
    src = np.clip(src, 0.0, in_size - 1)
    i0 = np.floor(src).astype(np.int32)
    i1 = np.minimum(i0 + 1, in_size - 1).astype(np.int32)
    w1 = (src - i0).astype(np.float32)
    return i0, i1, w1


def _resize_axis(x: jnp.ndarray, out_size: int, axis: int, mapping: str
                 ) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    i0, i1, w1 = linear_resize_weights(in_size, out_size, mapping)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w1j = jnp.asarray(w1).reshape(shape)
    x0 = jnp.take(x, jnp.asarray(i0), axis=axis)
    x1 = jnp.take(x, jnp.asarray(i1), axis=axis)
    # torch computes w0*x0 + w1*x1 with w0 = 1 - w1
    return x0 * (1.0 - w1j) + x1 * w1j


def bilinear_resize(x: jnp.ndarray, out_h: int, out_w: int,
                    h_axis: int, w_axis: int,
                    mapping: str = "half_pixel") -> jnp.ndarray:
    """Spatial bilinear resize of two axes, no antialiasing.

    `half_pixel` matches torch F.interpolate(align_corners=False) bit-for-bit
    in fp32 (separable lerp order); `asymmetric` matches TF1
    resize_bilinear(align_corners=False) — the two resamplers embedded in the
    reference's detector TorchScripts. Works on any rank (e.g. NHWC images
    with h_axis=1, or NTHWC videos with h_axis=2, where torch 'trilinear'
    with unchanged T reduces to per-frame bilinear).
    """
    x = _resize_axis(x, out_h, h_axis, mapping)
    x = _resize_axis(x, out_w, w_axis, mapping)
    return x
