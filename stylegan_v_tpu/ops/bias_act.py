"""Fused bias + activation + gain + clamp.

TPU-native replacement for the reference CUDA kernel
(reference src/torch_utils/ops/bias_act.{py,cu,cpp}).  On TPU this is a pure
jnp composition: XLA fuses the bias add, nonlinearity, gain and clamp into the
epilogue of the producing matmul/conv, so no custom kernel is needed for the
forward pass.  The reference's hand-written 1st/2nd-order gradient modes
(bias_act.cu:24-147, BiasActCudaGrad double-autograd pair) are subsumed by
`jax.grad` composing to arbitrary order.

Gradient-clamp semantics: the reference zeroes gradients where the forward
output hit the clamp (bias_act.cu:136-142).  `jnp.clip` has exactly this VJP,
so behavior matches for free.

Layout note: default bias axis is -1 (channels-last); the reference default is
dim=1 (NCHW).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..utils.misc import EasyDict

# Activation registry; def_gain/def_alpha mirror reference bias_act.py:23-33.
activation_funcs = {
    'linear':   EasyDict(func=lambda x, **_: x,
                         def_alpha=0.0, def_gain=1.0, has_2nd_grad=False),
    'relu':     EasyDict(func=lambda x, **_: jax.nn.relu(x),
                         def_alpha=0.0, def_gain=math.sqrt(2), has_2nd_grad=False),
    'lrelu':    EasyDict(func=lambda x, alpha, **_: jax.nn.leaky_relu(x, alpha),
                         def_alpha=0.2, def_gain=math.sqrt(2), has_2nd_grad=False),
    'tanh':     EasyDict(func=lambda x, **_: jnp.tanh(x),
                         def_alpha=0.0, def_gain=1.0, has_2nd_grad=True),
    'sigmoid':  EasyDict(func=lambda x, **_: jax.nn.sigmoid(x),
                         def_alpha=0.0, def_gain=1.0, has_2nd_grad=True),
    'elu':      EasyDict(func=lambda x, **_: jax.nn.elu(x),
                         def_alpha=0.0, def_gain=1.0, has_2nd_grad=True),
    'selu':     EasyDict(func=lambda x, **_: jax.nn.selu(x),
                         def_alpha=0.0, def_gain=1.0, has_2nd_grad=True),
    'softplus': EasyDict(func=lambda x, **_: jax.nn.softplus(x),
                         def_alpha=0.0, def_gain=1.0, has_2nd_grad=True),
    'swish':    EasyDict(func=lambda x, **_: jax.nn.sigmoid(x) * x,
                         def_alpha=0.0, def_gain=math.sqrt(2), has_2nd_grad=True),
}


def bias_act(x: jax.Array, b: Optional[jax.Array] = None, axis: int = -1,
             act: str = 'linear', alpha: Optional[float] = None,
             gain: Optional[float] = None, clamp: Optional[float] = None) -> jax.Array:
    """Fused bias-add + activation + gain + clamp (reference bias_act.py:55-89).

    Args:
        x:     input of any shape.
        b:     optional 1-D bias broadcast along `axis`.
        axis:  dimension carrying channels (default -1; reference uses 1 for NCHW).
        act:   key into `activation_funcs`.
        alpha: activation shape parameter (lrelu slope); None = registry default.
        gain:  post-activation scale; None = registry default (sqrt(2) for [l]relu).
        clamp: clip output to [-clamp, clamp]; None = no clamping.
    """
    spec = activation_funcs[act]
    alpha = float(spec.def_alpha) if alpha is None else float(alpha)
    gain = float(spec.def_gain) if gain is None else gain
    if clamp is not None and not isinstance(clamp, jax.Array):
        assert clamp >= 0

    if b is not None:
        assert b.ndim == 1, f"bias must be 1-D, got {b.shape}"
        assert b.shape[0] == x.shape[axis]
        shape = [1] * x.ndim
        shape[axis] = -1
        x = x + b.reshape(shape).astype(x.dtype)

    x = spec.func(x, alpha=alpha)

    if isinstance(gain, jax.Array) or gain != 1.0:
        x = x * jnp.asarray(gain, dtype=x.dtype)
    if clamp is not None:
        x = jnp.clip(x, -clamp, clamp)
    return x
