"""Core layer zoo: equalized-LR layers, mapping network, generator input blocks,
and the discriminator-side time-difference encoders.

Behavioral parity with reference src/training/layers.py, re-designed for JAX:
  * parameters are stored at "unit" scale and rescaled at call time
    (equalized learning rate), exactly like the reference;
  * all image tensors are NHWC; FC weights are [in, out] (transpose of the
    reference's [out, in] — the pkl importer transposes);
  * w_avg moving average lives in the linen 'moving' collection, updated only
    when `update_w_avg=True` under mutable=['moving'] (replaces the in-place
    buffer update at reference layers.py:87-89).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import activation_funcs, bias_act, conv2d_resample, setup_filter
from ..utils.misc import assert_shape
from .config import SamplingConfig


def normalize_2nd_moment(x: jax.Array, axis: int = -1, eps: float = 1e-8) -> jax.Array:
    """x * rsqrt(mean(x^2)) (reference layers.py:16-18)."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


class FullyConnectedLayer(nn.Module):
    """Equalized-LR linear layer (reference layers.py:109-138).

    weight stored [in, out] at scale N(0, 1/lr_multiplier); effective weight
    = weight * lr_multiplier / sqrt(in); bias scaled by lr_multiplier.
    """
    in_features: int
    out_features: int
    use_bias: bool = True
    activation: str = "linear"
    lr_multiplier: float = 1.0
    bias_init: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("weight", nn.initializers.normal(stddev=1.0 / self.lr_multiplier),
                       (self.in_features, self.out_features), jnp.float32)
        weight_gain = self.lr_multiplier / math.sqrt(self.in_features)
        x = x.astype(self.dtype) @ (w * weight_gain).astype(self.dtype)
        b = None
        if self.use_bias:
            b = self.param("bias", nn.initializers.constant(float(self.bias_init)),
                           (self.out_features,), jnp.float32)
            if self.lr_multiplier != 1.0:
                b = b * self.lr_multiplier
        return bias_act(x, b.astype(self.dtype) if b is not None else None,
                        act=self.activation)


class Conv2dLayer(nn.Module):
    """Equalized-LR conv with optional FIR up/downsampling (reference layers.py:143-197)."""
    in_channels: int
    out_channels: int
    kernel_size: int
    use_bias: bool = True
    activation: str = "linear"
    up: int = 1
    down: int = 1
    resample_filter: Tuple[int, ...] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    trainable: bool = True        # Freeze-D: optimizer masks key off this flag.
    instance_norm: bool = False
    lr_multiplier: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, gain: float = 1.0) -> jax.Array:
        k = self.kernel_size
        w = self.param("weight", nn.initializers.normal(stddev=1.0),
                       (k, k, self.in_channels, self.out_channels), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
             if self.use_bias else None)
        if not self.trainable:
            w = jax.lax.stop_gradient(w)
            b = jax.lax.stop_gradient(b) if b is not None else None
        weight_gain = 1.0 / math.sqrt(self.in_channels * k * k)
        w = w * (weight_gain * self.lr_multiplier)
        b = b * self.lr_multiplier if b is not None else None

        f = setup_filter(self.resample_filter) if (self.up > 1 or self.down > 1) else None
        flip_weight = (self.up == 1)
        x = conv2d_resample(x.astype(self.dtype), w.astype(self.dtype), f=f, up=self.up,
                            down=self.down, padding=k // 2, flip_weight=flip_weight)

        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        x = bias_act(x, b.astype(self.dtype) if b is not None else None,
                     act=self.activation, gain=act_gain, clamp=act_clamp)

        if self.instance_norm:
            mean = jnp.mean(x, axis=(1, 2), keepdims=True)
            std = jnp.std(x, axis=(1, 2), keepdims=True)
            x = (x - mean) / (std + 1e-8)
        return x


class MappingNetwork(nn.Module):
    """z/c -> w mapping with 2nd-moment normalization, w_avg tracking,
    broadcast and truncation (reference layers.py:23-104)."""
    z_dim: int
    c_dim: int
    w_dim: int
    num_ws: Optional[int]
    num_layers: int = 8
    embed_features: Optional[int] = None
    layer_features: Optional[int] = None
    activation: str = "lrelu"
    lr_multiplier: float = 0.01
    w_avg_beta: Optional[float] = 0.995

    @nn.compact
    def __call__(self, z: Optional[jax.Array], c: Optional[jax.Array],
                 truncation_psi: float = 1.0, truncation_cutoff: Optional[int] = None,
                 update_w_avg: bool = False) -> jax.Array:
        embed_features = self.embed_features if self.embed_features is not None else self.w_dim
        if self.c_dim == 0:
            embed_features = 0
        layer_features = self.layer_features if self.layer_features is not None else self.w_dim
        features_list = ([self.z_dim + embed_features]
                         + [layer_features] * (self.num_layers - 1) + [self.w_dim])

        x = None
        if self.z_dim > 0:
            assert_shape(z, [None, self.z_dim])
            x = normalize_2nd_moment(z.astype(jnp.float32))
        if self.c_dim > 0:
            assert_shape(c, [None, self.c_dim])
            y = FullyConnectedLayer(self.c_dim, embed_features, name="embed")(
                c.astype(jnp.float32))
            y = normalize_2nd_moment(y)
            x = jnp.concatenate([x, y], axis=1) if x is not None else y

        for idx in range(self.num_layers):
            x = FullyConnectedLayer(features_list[idx], features_list[idx + 1],
                                    activation=self.activation,
                                    lr_multiplier=self.lr_multiplier,
                                    name=f"fc{idx}")(x)

        if self.num_ws is not None and self.w_avg_beta is not None:
            w_avg = self.variable("moving", "w_avg",
                                  lambda: jnp.zeros((self.w_dim,), jnp.float32))
            if update_w_avg and not self.is_initializing():
                # w_avg <- lerp(mean(x), w_avg, beta) (reference layers.py:87-89)
                w_avg.value = (jax.lax.stop_gradient(jnp.mean(x, axis=0))
                               * (1 - self.w_avg_beta) + w_avg.value * self.w_avg_beta)

        if self.num_ws is not None:
            x = jnp.repeat(x[:, None, :], self.num_ws, axis=1)

        if truncation_psi != 1:
            assert self.w_avg_beta is not None
            w_avg_v = self.get_variable("moving", "w_avg")
            if self.num_ws is None or truncation_cutoff is None:
                x = w_avg_v + truncation_psi * (x - w_avg_v)
            else:
                head = w_avg_v + truncation_psi * (x[:, :truncation_cutoff] - w_avg_v)
                x = jnp.concatenate([head, x[:, truncation_cutoff:]], axis=1)
        return x


class EqLRConv1d(nn.Module):
    """Equalized-LR 1-D conv over [N, L, C] (reference layers.py:332-373, NLC here)."""
    in_features: int
    out_features: int
    kernel_size: int
    padding: int = 0
    stride: int = 1
    activation: str = "linear"
    lr_multiplier: float = 1.0
    use_bias: bool = True
    bias_init: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert x.ndim == 3, f"expected [N, L, C], got {x.shape}"
        assert self.activation in ("linear", "lrelu")
        w = self.param("weight", nn.initializers.normal(stddev=1.0 / self.lr_multiplier),
                       (self.kernel_size, self.in_features, self.out_features), jnp.float32)
        weight_gain = self.lr_multiplier / math.sqrt(self.in_features * self.kernel_size)
        y = jax.lax.conv_general_dilated(
            x, w * weight_gain,
            window_strides=(self.stride,),
            padding=((self.padding, self.padding),),
            dimension_numbers=("NHC", "HIO", "NHC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.constant(float(self.bias_init)),
                           (self.out_features,), jnp.float32)
            y = y + (b * self.lr_multiplier)[None, None, :]
        if self.activation == "lrelu":
            # plain torch-style leaky_relu: NO sqrt(2) gain (reference layers.py:370)
            y = jax.nn.leaky_relu(y, 0.2)
        return y


class GenInput(nn.Module):
    """First-block input: learned const or const ⊕ motion code
    (reference layers.py:202-251, NHWC here)."""
    channel_dim: int
    input_type: str = "temporal"            # 'const' | 'temporal'
    motion_v_dim: int = 0

    @property
    def total_dim(self) -> int:
        if self.input_type == "const":
            return self.channel_dim
        return self.channel_dim + self.motion_v_dim

    @nn.compact
    def __call__(self, batch_size: int, motion_v: Optional[jax.Array] = None,
                 dtype=jnp.float32) -> jax.Array:
        const = self.param("const", nn.initializers.normal(stddev=1.0),
                           (4, 4, self.channel_dim), jnp.float32)
        if self.input_type == "const":
            return jnp.broadcast_to(const[None], (batch_size, 4, 4, self.channel_dim)
                                    ).astype(dtype)
        if self.input_type == "temporal":
            assert motion_v is not None, "temporal input requires motion_v"
            n = motion_v.shape[0]
            c = jnp.broadcast_to(const[None], (n, 4, 4, self.channel_dim))
            mv = jnp.broadcast_to(motion_v[:, None, None, :], (n, 4, 4, self.motion_v_dim))
            return jnp.concatenate([c, mv], axis=-1).astype(dtype)
        raise NotImplementedError(f"Unknown input type: {self.input_type}")


def construct_log_spaced_freqs(max_num_frames: int, skip_small_t_freqs: int = 0) -> np.ndarray:
    """Log-spaced Fourier coefficients (reference layers.py:439-446). Host numpy."""
    time_resolution = 2 ** np.ceil(np.log2(max_num_frames))
    num_fourier_feats = int(np.ceil(np.log2(time_resolution)))
    powers = 2.0 ** np.arange(num_fourier_feats)
    powers = powers[:len(powers) - skip_small_t_freqs]
    return (powers[None, :] * np.pi / time_resolution).astype(np.float32)


class FixedTimeEncoder(nn.Module):
    """sin/cos of log-spaced frequencies of t (reference layers.py:302-327)."""
    max_num_frames: int
    skip_small_t_freqs: int = 0

    @property
    def fourier_coefs(self) -> np.ndarray:
        return construct_log_spaced_freqs(self.max_num_frames, self.skip_small_t_freqs)

    def get_dim(self) -> int:
        return self.fourier_coefs.shape[1] * 2

    def __call__(self, t: jax.Array) -> jax.Array:
        assert t.ndim == 2, f"expected [N, F], got {t.shape}"
        coefs = jnp.asarray(self.fourier_coefs)
        raw = coefs * t.reshape(-1).astype(jnp.float32)[:, None]   # [N*F, num_feats]
        return jnp.concatenate([jnp.sin(raw), jnp.cos(raw)], axis=1)


class TemporalDifferenceEncoder(nn.Module):
    """Embeds frame-time DELTAS: learned embedding + fixed Fourier features of
    pairwise differences (reference layers.py:255-297)."""
    sampling: SamplingConfig
    d: int = 256
    skip_small_t_freqs: int = 0

    def get_dim(self) -> int:
        nf = self.sampling.num_frames_per_video
        if nf == 1:
            return 1
        # pure computation (constructing a child module here would require a
        # bound linen scope)
        fdim = 2 * construct_log_spaced_freqs(
            self.sampling.max_num_frames, self.skip_small_t_freqs).shape[1]
        if self.sampling.type == "uniform":
            return self.d + fdim
        return (self.d + fdim) * (nf - 1)

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        nf = self.sampling.num_frames_per_video
        assert_shape(t, [None, nf])
        batch_size = t.shape[0]
        if nf == 1:
            return jnp.zeros((batch_size, 1), jnp.float32)
        if self.sampling.type == "uniform":
            t_diffs = (t[:, 1] - t[:, 0]).reshape(-1)            # [N]
            num_diffs = 1
        else:
            t_diffs = (t[:, 1:] - t[:, :-1]).reshape(-1)          # [N*(F-1)]
            num_diffs = nf - 1
        # float -> round -> int (reference layers.py:291-292)
        idx = jnp.round(t_diffs.astype(jnp.float32)).astype(jnp.int32)
        const_embs = nn.Embed(self.sampling.max_num_frames, self.d,
                              embedding_init=nn.initializers.normal(stddev=1.0),
                              name="const_embed")(idx)
        fourier_embs = FixedTimeEncoder(self.sampling.max_num_frames,
                                        self.skip_small_t_freqs,
                                        name="time_encoder")(t_diffs[:, None])
        out = jnp.concatenate([const_embs, fourier_embs], axis=1)
        return out.reshape(batch_size, num_diffs * out.shape[1])
