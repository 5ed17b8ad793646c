"""StyleGAN-V generator: style-modulated synthesis ladder conditioned on
continuous timestamps through the motion mapping network.

Behavioral parity with reference src/training/networks.py:90-401, TPU-first:
  * NHWC activations, HWIO weights, bf16 compute for the highest
    `num_bf16_res` resolutions (reference uses fp16; bf16 needs no loss-scale
    and shares fp32's exponent range).
  * The reference's `fused_modconv` switch picks between grouped-conv and
    activation-scaling implementations of the same math (networks.py:41,57-86);
    here there is exactly one MXU-friendly path (see ops/modulated_conv2d.py),
    so the flag does not exist.
  * Per-layer noise uses the linen 'noise' rng stream ('random' mode) or a
    'buffers' variable ('const' mode).
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import bias_act, modulated_conv2d, setup_filter, upsample2d
from ..ops.bias_act import activation_funcs
from ..utils.misc import assert_shape
from .config import GeneratorConfig
from .layers import FullyConnectedLayer, GenInput, MappingNetwork
from .motion import MotionMappingNetwork, compute_motion_v_dim


class SynthesisLayer(nn.Module):
    """modconv + optional noise + bias_act (reference networks.py:91-144)."""
    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    up: int = 1
    activation: str = "lrelu"
    resample_filter: Tuple[int, ...] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    use_noise: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, w: jax.Array, noise_mode: str = "random",
                 gain: float = 1.0) -> jax.Array:
        assert noise_mode in ("random", "const", "none")
        in_res = self.resolution // self.up
        assert_shape(x, [None, in_res, in_res, self.in_channels])

        styles = FullyConnectedLayer(self.w_dim, self.in_channels, bias_init=1,
                                     name="affine")(w.astype(jnp.float32))
        weight = self.param("weight", nn.initializers.normal(stddev=1.0),
                            (self.kernel_size, self.kernel_size,
                             self.in_channels, self.out_channels), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)

        noise = None
        if self.use_noise and noise_mode != "none":
            strength = self.param("noise_strength", nn.initializers.zeros, (), jnp.float32)
            if noise_mode == "random":
                n = jax.random.normal(self.make_rng("noise"),
                                      (x.shape[0], self.resolution, self.resolution, 1),
                                      jnp.float32)
            else:
                const = self.variable(
                    "buffers", "noise_const",
                    lambda: jax.random.normal(self.make_rng("params"),
                                              (self.resolution, self.resolution, 1),
                                              jnp.float32))
                n = const.value[None]
            noise = n * strength

        flip_weight = (self.up == 1)
        f = setup_filter(self.resample_filter) if self.up > 1 else None
        x = modulated_conv2d(x=x.astype(self.dtype), weight=weight, styles=styles,
                             noise=noise, up=self.up, padding=self.kernel_size // 2,
                             resample_filter=f, flip_weight=flip_weight)

        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, bias.astype(x.dtype), act=self.activation,
                        gain=act_gain, clamp=act_clamp)


class ToRGBLayer(nn.Module):
    """Demodulation-free 1x1 modconv to image channels (reference networks.py:148-163)."""
    in_channels: int
    out_channels: int
    w_dim: int
    kernel_size: int = 1
    conv_clamp: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, w: jax.Array) -> jax.Array:
        weight_gain = 1.0 / math.sqrt(self.in_channels * self.kernel_size ** 2)
        styles = FullyConnectedLayer(self.w_dim, self.in_channels, bias_init=1,
                                     name="affine")(w.astype(jnp.float32)) * weight_gain
        weight = self.param("weight", nn.initializers.normal(stddev=1.0),
                            (self.kernel_size, self.kernel_size,
                             self.in_channels, self.out_channels), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
        x = modulated_conv2d(x=x.astype(self.dtype), weight=weight, styles=styles,
                             demodulate=False)
        return bias_act(x, bias.astype(x.dtype), clamp=self.conv_clamp)


class SynthesisBlock(nn.Module):
    """One resolution rung: (conv0-up), conv1, torgb + skip accumulation
    (reference networks.py:168-266)."""
    in_channels: int
    out_channels: int
    w_dim: int
    motion_v_dim: int
    resolution: int
    img_channels: int
    is_last: bool
    architecture: str = "skip"
    resample_filter: Tuple[int, ...] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    use_bf16: bool = False
    use_noise: bool = True
    input_type: str = "temporal"

    @property
    def num_conv(self) -> int:
        return 1 if self.in_channels == 0 else 2

    @property
    def num_torgb(self) -> int:
        return 1 if (self.is_last or self.architecture == "skip") else 0

    @nn.compact
    def __call__(self, x: Optional[jax.Array], img: Optional[jax.Array], ws: jax.Array,
                 motion_v: Optional[jax.Array] = None, force_fp32: bool = False,
                 noise_mode: str = "random") -> Tuple[jax.Array, Optional[jax.Array]]:
        assert_shape(ws, [None, self.num_conv + self.num_torgb, self.w_dim])
        dtype = jnp.bfloat16 if (self.use_bf16 and not force_fp32) else jnp.float32
        layer_kwargs = dict(w_dim=self.w_dim, resolution=self.resolution,
                            resample_filter=self.resample_filter,
                            conv_clamp=self.conv_clamp, use_noise=self.use_noise,
                            dtype=dtype)
        w_idx = 0

        if self.in_channels == 0:
            gen_input = GenInput(self.out_channels, input_type=self.input_type,
                                 motion_v_dim=self.motion_v_dim, name="input")
            x = gen_input(ws.shape[0], motion_v=motion_v, dtype=dtype)
            conv1_in = gen_input.total_dim
        else:
            assert_shape(x, [None, self.resolution // 2, self.resolution // 2,
                             self.in_channels])
            x = x.astype(dtype)
            conv1_in = self.out_channels

        if self.in_channels == 0:
            x = SynthesisLayer(conv1_in, self.out_channels, name="conv1",
                               **layer_kwargs)(x, ws[:, w_idx], noise_mode=noise_mode)
            w_idx += 1
        elif self.architecture == "resnet":
            from .layers import Conv2dLayer
            y = Conv2dLayer(self.in_channels, self.out_channels, kernel_size=1,
                            use_bias=False, up=2, resample_filter=self.resample_filter,
                            dtype=dtype, name="skip")(x, gain=math.sqrt(0.5))
            x = SynthesisLayer(self.in_channels, self.out_channels, up=2, name="conv0",
                               **layer_kwargs)(x, ws[:, w_idx], noise_mode=noise_mode)
            w_idx += 1
            x = SynthesisLayer(self.out_channels, self.out_channels, name="conv1",
                               **layer_kwargs)(x, ws[:, w_idx], noise_mode=noise_mode,
                                               gain=math.sqrt(0.5))
            w_idx += 1
            x = y + x
        else:
            x = SynthesisLayer(self.in_channels, self.out_channels, up=2, name="conv0",
                               **layer_kwargs)(x, ws[:, w_idx], noise_mode=noise_mode)
            w_idx += 1
            x = SynthesisLayer(self.out_channels, self.out_channels, name="conv1",
                               **layer_kwargs)(x, ws[:, w_idx], noise_mode=noise_mode)
            w_idx += 1

        if img is not None:
            assert_shape(img, [None, self.resolution // 2, self.resolution // 2,
                               self.img_channels])
            img = upsample2d(img, setup_filter(self.resample_filter))

        if self.is_last or self.architecture == "skip":
            y = ToRGBLayer(self.out_channels, self.img_channels, w_dim=self.w_dim,
                           conv_clamp=self.conv_clamp, dtype=dtype,
                           name="torgb")(x, ws[:, w_idx])
            y = y.astype(jnp.float32)
            img = img + y if img is not None else y

        assert x.dtype == dtype
        assert img is None or img.dtype == jnp.float32
        return x, img


def channels_dict(cfg) -> Dict[int, int]:
    resolutions = [2 ** i for i in range(2, int(math.log2(cfg.img_resolution)) + 1)]
    return {res: min(cfg.channel_base // res, cfg.channel_max) for res in resolutions}


def compute_num_ws(cfg: GeneratorConfig) -> int:
    """Number of per-layer w vectors (pure function of config;
    reference networks.py:301-321)."""
    n = 0
    chans = channels_dict(cfg)
    for res in [2 ** i for i in range(2, int(math.log2(cfg.img_resolution)) + 1)]:
        in_ch = chans[res // 2] if res > 4 else 0
        n += 1 if in_ch == 0 else 2
        if res == cfg.img_resolution:
            n += 1  # final torgb
    return n


class SynthesisNetwork(nn.Module):
    """Resolution ladder 4 -> img_resolution, owning the motion encoder
    (reference networks.py:271-366)."""
    cfg: GeneratorConfig

    @property
    def block_resolutions(self):
        return [2 ** i for i in range(2, int(math.log2(self.cfg.img_resolution)) + 1)]

    @property
    def motion_v_dim(self) -> int:
        return compute_motion_v_dim(self.cfg)

    @property
    def num_ws(self) -> int:
        return compute_num_ws(self.cfg)

    @property
    def w_dim_eff(self) -> int:
        """w_dim widened when motion codes are concatenated onto w
        (reference networks.py:310)."""
        extra = self.motion_v_dim if self.cfg.time_enc.cond_type == "concat_w" else 0
        return self.cfg.w_dim + extra

    @nn.compact
    def __call__(self, ws: jax.Array, t: jax.Array, c: Optional[jax.Array] = None,
                 motion_z: Optional[jax.Array] = None,
                 motion_v: Optional[jax.Array] = None,
                 force_fp32: bool = False, noise_mode: str = "random") -> jax.Array:
        cfg = self.cfg
        assert t.ndim == 2, f"expected [B, F] timestamps, got {t.shape}"
        assert_shape(ws, [t.shape[0], self.num_ws, cfg.w_dim])
        num_frames = t.shape[1]

        if not cfg.has_motion:
            ws = jnp.repeat(ws, num_frames, axis=0)
            motion_v = None
        else:
            if motion_v is None:
                with jax.named_scope("motion_encoder"):
                    motion_info = MotionMappingNetwork(cfg, name="motion_encoder")(
                        c, t, motion_z=motion_z)
                motion_v = motion_info["motion_v"]     # [B*F, motion_v_dim]
            if cfg.time_enc.cond_type == "concat_w":
                mv = jnp.repeat(motion_v[:, None, :], self.num_ws, axis=1)
                ws = jnp.concatenate([jnp.repeat(ws, num_frames, axis=0), mv], axis=2)
            elif cfg.time_enc.cond_type == "sum_w":
                ws = jnp.repeat(ws, num_frames, axis=0) + motion_v[:, None, :]
            else:
                ws = jnp.repeat(ws, num_frames, axis=0)

        ws = ws.astype(jnp.float32)           # split_ws region (networks.py:350)
        chans = channels_dict(cfg)
        log2res = int(math.log2(cfg.img_resolution))
        bf16_resolution = max(2 ** (log2res + 1 - cfg.num_bf16_res), 8)

        x = img = None
        w_idx = 0
        for res in self.block_resolutions:
            in_ch = chans[res // 2] if res > 4 else 0
            out_ch = chans[res]
            is_last = (res == cfg.img_resolution)
            block = SynthesisBlock(
                in_channels=in_ch, out_channels=out_ch, w_dim=self.w_dim_eff,
                motion_v_dim=self.motion_v_dim, resolution=res,
                img_channels=cfg.img_channels, is_last=is_last,
                architecture=cfg.architecture,
                resample_filter=cfg.resample_filter, conv_clamp=cfg.conv_clamp,
                use_bf16=(res >= bf16_resolution), use_noise=cfg.use_noise,
                input_type=cfg.input_type, name=f"b{res}")
            block_ws = ws[:, w_idx:w_idx + block.num_conv + block.num_torgb]
            # motion_v feeds only the first block under concat_const
            # (reference networks.py:362-363 nulls it for later blocks).
            mv = motion_v if cfg.time_enc.cond_type == "concat_const" else None
            with jax.named_scope(f"block_{res}"):
                x, img = block(x, img, block_ws, motion_v=mv,
                               force_fp32=force_fp32, noise_mode=noise_mode)
            w_idx += block.num_conv
        return img


class Generator(nn.Module):
    """mapping + synthesis (reference networks.py:371-401).

    __call__(z, c, t) -> [B*F, H, W, C] images in fp32, NHWC.
    """
    cfg: GeneratorConfig

    @property
    def num_ws(self) -> int:
        return compute_num_ws(self.cfg)

    @property
    def motion_v_dim(self) -> int:
        return compute_motion_v_dim(self.cfg)

    def setup(self):
        self.mapping = MappingNetwork(
            z_dim=self.cfg.z_dim, c_dim=self.cfg.c_dim, w_dim=self.cfg.w_dim,
            num_ws=self.num_ws, num_layers=self.cfg.mapping_layers,
            lr_multiplier=self.cfg.mapping_lr_multiplier,
            w_avg_beta=self.cfg.w_avg_beta)
        self.synthesis = SynthesisNetwork(self.cfg)

    def __call__(self, z: jax.Array, c: Optional[jax.Array], t: jax.Array,
                 truncation_psi: float = 1.0, truncation_cutoff: Optional[int] = None,
                 update_w_avg: bool = False, motion_z: Optional[jax.Array] = None,
                 noise_mode: str = "random", force_fp32: bool = False) -> jax.Array:
        assert len(z) == len(t), f"batch mismatch: {z.shape} vs {t.shape}"
        with jax.named_scope("mapping"):
            ws = self.mapping(z, c, truncation_psi=truncation_psi,
                              truncation_cutoff=truncation_cutoff,
                              update_w_avg=update_w_avg)
        with jax.named_scope("synthesis"):
            return self.synthesis(ws, t=t, c=c, motion_z=motion_z,
                                  noise_mode=noise_mode, force_fp32=force_fp32)
