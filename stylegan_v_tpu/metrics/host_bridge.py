"""Differentiable host-torch bridge.

The reference's projection/editing objectives backprop through pretrained
torch networks (VGG16-LPIPS, reference src/scripts/project.py:77-88,139;
CLIP + ArcFace, src/scripts/clip_edit.py:52-110). On TPU the generator runs
in JAX while those detectors are CPU-torch modules, so this module wraps a
differentiable torch feature extractor as a JAX function with a custom VJP:
the forward runs torch under no_grad via `jax.pure_callback`, and the
backward routes the cotangent through `torch.autograd.grad` on the host.

The result composes with `jax.grad`/`jit` like any JAX op, giving real
gradient-based optimization against the reference objectives (not search) —
the TPU synthesizes and differentiates the generator; the host supplies
detector gradients for a few-megabyte image batch per step.
"""
from __future__ import annotations

from typing import Callable

import numpy as np


def make_host_feature_fn(torch_fn: Callable, out_dim: int):
    """Wrap `torch_fn(images torch.Tensor [N, H, W, C] float32) ->
    torch.Tensor [N, out_dim]` (differentiable) as a JAX function
    `f(x: [N, H, W, C] float32) -> [N, out_dim] float32` with host-autograd
    VJP. Any preprocessing (layout permute, resize, normalization) belongs
    inside torch_fn so it is part of the differentiated graph."""
    import jax
    import jax.numpy as jnp
    import torch

    def _fwd_host(x):
        with torch.no_grad():
            y = torch_fn(torch.from_numpy(np.array(x, np.float32, copy=True)))
        return np.asarray(y.detach().float().numpy(), np.float32)

    def _bwd_host(x, ct):
        xt = torch.from_numpy(np.array(x, np.float32, copy=True)).requires_grad_(True)
        y = torch_fn(xt)
        (gx,) = torch.autograd.grad(
            y, xt, torch.from_numpy(np.array(ct, np.float32, copy=True)))
        return np.asarray(gx.float().numpy(), np.float32)

    @jax.custom_vjp
    def f(x):
        return jax.pure_callback(
            _fwd_host,
            jax.ShapeDtypeStruct((x.shape[0], out_dim), jnp.float32), x)

    def f_fwd(x):
        return f(x), x

    def f_bwd(x, ct):
        gx = jax.pure_callback(
            _bwd_host, jax.ShapeDtypeStruct(x.shape, jnp.float32), x, ct)
        return (gx,)

    f.defvjp(f_fwd, f_bwd)
    return f


def probe_out_dim(torch_fn: Callable, h: int = 64, w: int = 64) -> int:
    """Run one dummy forward to discover the feature dimension."""
    import torch
    with torch.no_grad():
        y = torch_fn(torch.zeros(1, h, w, 3))
    return int(y.shape[-1])
