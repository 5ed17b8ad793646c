"""Differentiable bilinear affine warping (NHWC).

TPU-native replacement for torch affine_grid + grid_sample (+ the
grid_sample_gradfix double-backward shim, reference
src/torch_utils/ops/grid_sample_gradfix.py — unnecessary in JAX: gathers
compose with AD to any order).

Conventions follow torch align_corners=False:
  output pixel (i, j) -> normalized (x, y) = ((2j+1)/W_out - 1, (2i+1)/H_out - 1)
  input sample [x', y', 1]^T = G_inv[:2, :] @ [x, y, 1]
  input pixel   px = ((x' + 1) * W_in - 1) / 2

Out-of-bounds handling is 'reflect' (mirror around the half-pixel borders)
or 'zeros' (torch default). The ADA pipeline uses 'reflect', replacing the
reference's data-dependent reflect-padding margins (augment.py:271-285) with
shape-static mirrored coordinates.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _reflect_coords(px: jax.Array, size: int) -> jax.Array:
    """Mirror px into [-0.5, size-0.5] with reflective boundaries (no edge repeat)."""
    u = px + 0.5
    period = 2.0 * size
    v = jnp.mod(u, period)
    v = size - jnp.abs(size - v)
    return v - 0.5


def affine_grid_sample(images: jax.Array, G_inv: jax.Array, out_h: int, out_w: int,
                       mode: str = "reflect") -> jax.Array:
    """Warp [B, H, W, C] by per-sample inverse homographies G_inv [B, 3, 3]."""
    B, H, W, C = images.shape
    assert G_inv.shape == (B, 3, 3)
    dtype = images.dtype
    G = G_inv.astype(jnp.float32)

    xs = (2.0 * jnp.arange(out_w, dtype=jnp.float32) + 1.0) / out_w - 1.0
    ys = (2.0 * jnp.arange(out_h, dtype=jnp.float32) + 1.0) / out_h - 1.0
    gx, gy = jnp.meshgrid(xs, ys)                     # [out_h, out_w]

    # x' = g00 x + g01 y + g02 ; y' = g10 x + g11 y + g12
    xin = (G[:, 0, 0, None, None] * gx + G[:, 0, 1, None, None] * gy
           + G[:, 0, 2, None, None])                  # [B, out_h, out_w]
    yin = (G[:, 1, 0, None, None] * gx + G[:, 1, 1, None, None] * gy
           + G[:, 1, 2, None, None])

    px = ((xin + 1.0) * W - 1.0) / 2.0
    py = ((yin + 1.0) * H - 1.0) / 2.0

    if mode == "reflect":
        px = _reflect_coords(px, W)
        py = _reflect_coords(py, H)
        in_bounds = None
    elif mode == "zeros":
        in_bounds = ((px > -1.0) & (px < W) & (py > -1.0) & (py < H))
    else:
        raise ValueError(mode)

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = (px - x0).astype(jnp.float32)[..., None]
    wy = (py - y0).astype(jnp.float32)[..., None]

    # TPU gather cost scales with INDEX COUNT and wastes lanes when the
    # gathered row is narrow. So: pre-pack each pixel's 2x2 neighborhood into
    # channels (one cheap elementwise pass, lanes 4C instead of C), then ONE
    # take_along_axis per output pixel instead of four -> ~16x less gather
    # work than the naive four-corner formulation at C=3..9.
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)

    imgp = jnp.pad(images, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    packed = jnp.concatenate([
        imgp[:, :H, :W], imgp[:, :H, 1:W + 1],
        imgp[:, 1:H + 1, :W], imgp[:, 1:H + 1, 1:W + 1]], axis=-1)  # [B,H,W,4C]
    flat = packed.reshape(B, H * W, 4 * C)
    idx = (y0i * W + x0i).reshape(B, out_h * out_w)
    g = jnp.take_along_axis(flat, idx[:, :, None], axis=1)
    g = g.reshape(B, out_h, out_w, 4 * C)
    # lane SLICES (not a [... ,4, C] reshape): tiny trailing dims tile-pad
    # catastrophically on TPU (T(8,128) lanes), slices keep the layout.
    wxc = wx.astype(g.dtype)
    wyc = wy.astype(g.dtype)
    top = g[..., 0 * C:1 * C] * (1 - wxc) + g[..., 1 * C:2 * C] * wxc
    bot = g[..., 2 * C:3 * C] * (1 - wxc) + g[..., 3 * C:4 * C] * wxc
    out = (top * (1 - wyc) + bot * wyc).astype(jnp.float32)

    if in_bounds is not None:
        out = out * in_bounds[..., None].astype(jnp.float32)
    return out.astype(dtype)
