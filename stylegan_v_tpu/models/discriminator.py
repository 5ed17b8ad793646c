"""Sparse-frame video discriminator.

Behavioral parity with reference src/training/networks.py:406-673 (NHWC):
a StyleGAN2 discriminator with two video modifications:
  1. time-delta conditioning: TemporalDifferenceEncoder embeddings are
     concatenated onto the label and projected into cmap for a
     projection-discriminator dot product (networks.py:648-654, 570-573);
  2. sparse-frame fusion: frames are processed independently down to
     `concat_res`, then concatenated on the channel axis
     ([B*F,H,W,C] -> [B,H,W,F*C], networks.py:659-662), with channel widths
     divided by `num_frames_div_factor` around the fusion point
     (networks.py:629-632).
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import downsample2d, setup_filter
from ..parallel.mesh import constrain_data_axis
from ..utils.misc import assert_shape
from .config import DiscriminatorConfig
from .layers import Conv2dLayer, FullyConnectedLayer, MappingNetwork, TemporalDifferenceEncoder


class DiscriminatorBlock(nn.Module):
    """Two convs + resnet skip, downsampling by 2 (reference networks.py:406-488)."""
    in_channels: int
    tmp_channels: int
    out_channels: int
    resolution: int
    img_channels: int
    first_layer_idx: int
    architecture: str = "resnet"
    activation: str = "lrelu"
    resample_filter: Tuple[int, ...] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    use_bf16: bool = False
    freeze_layers: int = 0

    @property
    def has_fromrgb(self) -> bool:
        return self.in_channels == 0 or self.architecture == "skip"

    @property
    def num_layers(self) -> int:
        """Trainable-counter order: fromrgb?, conv0, conv1, skip?
        (reference networks.py:436-458)."""
        return (1 if self.has_fromrgb else 0) + 2 + (1 if self.architecture == "resnet" else 0)

    def _trainable(self, layer_idx: int) -> bool:
        return (self.first_layer_idx + layer_idx) >= self.freeze_layers

    @nn.compact
    def __call__(self, x: Optional[jax.Array], img: Optional[jax.Array],
                 force_fp32: bool = False):
        dtype = jnp.bfloat16 if (self.use_bf16 and not force_fp32) else jnp.float32
        idx_fromrgb = 0
        idx_conv0 = 1 if self.has_fromrgb else 0
        idx_conv1 = idx_conv0 + 1
        idx_skip = idx_conv1 + 1

        if x is not None:
            assert_shape(x, [None, self.resolution, self.resolution, self.in_channels])
            x = x.astype(dtype)

        if self.has_fromrgb:
            assert_shape(img, [None, self.resolution, self.resolution, self.img_channels])
            img = img.astype(dtype)
            y = Conv2dLayer(self.img_channels, self.tmp_channels, kernel_size=1,
                            activation=self.activation, conv_clamp=self.conv_clamp,
                            trainable=self._trainable(idx_fromrgb), dtype=dtype,
                            name="fromrgb")(img)
            x = x + y if x is not None else y
            img = (downsample2d(img, setup_filter(self.resample_filter))
                   if self.architecture == "skip" else None)

        conv0_in = self.in_channels if self.in_channels > 0 else self.tmp_channels
        if self.architecture == "resnet":
            y = Conv2dLayer(conv0_in, self.out_channels, kernel_size=1, use_bias=False,
                            down=2, resample_filter=self.resample_filter,
                            trainable=self._trainable(idx_skip), dtype=dtype,
                            name="skip")(x, gain=math.sqrt(0.5))
            x = Conv2dLayer(conv0_in, self.tmp_channels, kernel_size=3,
                            activation=self.activation, conv_clamp=self.conv_clamp,
                            trainable=self._trainable(idx_conv0), dtype=dtype,
                            name="conv0")(x)
            x = Conv2dLayer(self.tmp_channels, self.out_channels, kernel_size=3,
                            activation=self.activation, down=2,
                            resample_filter=self.resample_filter,
                            conv_clamp=self.conv_clamp,
                            trainable=self._trainable(idx_conv1), dtype=dtype,
                            name="conv1")(x, gain=math.sqrt(0.5))
            x = y + x
        else:
            x = Conv2dLayer(conv0_in, self.tmp_channels, kernel_size=3,
                            activation=self.activation, conv_clamp=self.conv_clamp,
                            trainable=self._trainable(idx_conv0), dtype=dtype,
                            name="conv0")(x)
            x = Conv2dLayer(self.tmp_channels, self.out_channels, kernel_size=3,
                            activation=self.activation, down=2,
                            resample_filter=self.resample_filter,
                            conv_clamp=self.conv_clamp,
                            trainable=self._trainable(idx_conv1), dtype=dtype,
                            name="conv1")(x)
        assert x.dtype == dtype
        return x, img


class MinibatchStdLayer(nn.Module):
    """Appends cross-sample stddev channels (reference networks.py:492-514).

    NOTE: the reference's reshape makes groups STRIDED across the batch
    (group g = samples {g*n+i}); under a sharded global batch XLA inserts the
    tiny collectives this needs automatically.
    """
    group_size: Optional[int]
    num_channels: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        N, H, W, C = x.shape
        G = min(self.group_size, N) if self.group_size is not None else N
        F = self.num_channels
        c = C // F
        y = x.reshape(G, -1, H, W, F, c)            # strided groups, like torch view
        y = y - jnp.mean(y, axis=0)
        y = jnp.mean(jnp.square(y), axis=0)
        y = jnp.sqrt(y + 1e-8)
        y = jnp.mean(y, axis=(1, 2, 4))             # [n, F]
        y = y.reshape(-1, 1, 1, F)
        y = jnp.tile(y, (G, H, W, 1))
        return jnp.concatenate([x, y.astype(x.dtype)], axis=-1)


class DiscriminatorEpilogue(nn.Module):
    """mbstd + conv + fc + projection head (reference networks.py:518-576)."""
    in_channels: int
    cmap_dim: int
    resolution: int
    img_channels: int
    architecture: str = "resnet"
    mbstd_group_size: Optional[int] = 4
    mbstd_num_channels: int = 1
    activation: str = "lrelu"
    conv_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, x: jax.Array, img: Optional[jax.Array],
                 cmap: Optional[jax.Array]) -> jax.Array:
        assert_shape(x, [None, self.resolution, self.resolution, self.in_channels])
        x = constrain_data_axis(x.astype(jnp.float32))
        if self.architecture == "skip":
            img = img.astype(jnp.float32)
            x = x + Conv2dLayer(self.img_channels, self.in_channels, kernel_size=1,
                                activation=self.activation, name="fromrgb")(img)
        if self.mbstd_num_channels > 0:
            x = MinibatchStdLayer(self.mbstd_group_size, self.mbstd_num_channels,
                                  name="mbstd")(x)
        x = Conv2dLayer(self.in_channels + self.mbstd_num_channels, self.in_channels,
                        kernel_size=3, activation=self.activation,
                        conv_clamp=self.conv_clamp, name="conv")(x)
        # NHWC flatten differs from the reference's NCHW flatten only by a
        # fixed permutation of fc input features (pkl import permutes).
        x = constrain_data_axis(x.reshape(x.shape[0], -1))
        x = FullyConnectedLayer(self.in_channels * self.resolution ** 2,
                                self.in_channels, activation=self.activation,
                                name="fc")(x)
        x = FullyConnectedLayer(self.in_channels,
                                1 if self.cmap_dim == 0 else self.cmap_dim,
                                name="out")(x)
        if self.cmap_dim > 0:
            assert_shape(cmap, [None, self.cmap_dim])
            x = jnp.sum(x * cmap, axis=1, keepdims=True) / math.sqrt(self.cmap_dim)
        return x


class Discriminator(nn.Module):
    """Sparse-frame video discriminator (reference networks.py:580-673).

    __call__(img [B*F,H,W,C], c [B,c_dim] or None, t [B,F]) ->
        {'image_logits': [B]}
    """
    cfg: DiscriminatorConfig

    @property
    def block_resolutions(self):
        log2res = int(math.log2(self.cfg.img_resolution))
        return [2 ** i for i in range(log2res, 2, -1)]

    @property
    def has_time_encoder(self) -> bool:
        return self.cfg.sampling.num_frames_per_video > 1

    @property
    def cmap_dim_eff(self) -> int:
        chans = self._channels_dict()
        cmap_dim = self.cfg.cmap_dim if self.cfg.cmap_dim is not None else chans[4]
        if self.cfg.c_dim == 0 and not self.has_time_encoder:
            cmap_dim = 0
        return cmap_dim

    def _channels_dict(self) -> Dict[int, int]:
        return {res: min(self.cfg.channel_base // res, self.cfg.channel_max)
                for res in self.block_resolutions + [4]}

    @nn.compact
    def __call__(self, img: jax.Array, c: Optional[jax.Array], t: jax.Array,
                 force_fp32: bool = False) -> Dict[str, jax.Array]:
        cfg = self.cfg
        nf = cfg.sampling.num_frames_per_video
        assert t.ndim == 2, f"expected [B, F], got {t.shape}"
        assert img.shape[0] == t.shape[0] * t.shape[1], \
            f"frame count mismatch: {img.shape} vs {t.shape}"

        if self.has_time_encoder:
            with jax.named_scope("time_encoder"):
                t_embs = TemporalDifferenceEncoder(cfg.sampling,
                                                   name="time_encoder")(
                    t.reshape(-1, nf))
            c = (jnp.concatenate([c, t_embs], axis=1) if c is not None and cfg.c_dim > 0
                 else t_embs)
            if cfg.dummy_c:
                c = c * 0.0

        chans = self._channels_dict()
        log2res = int(math.log2(cfg.img_resolution))
        bf16_resolution = max(2 ** (log2res + 1 - cfg.num_bf16_res), 8)
        common = dict(img_channels=cfg.img_channels, architecture=cfg.architecture,
                      conv_clamp=cfg.conv_clamp, resample_filter=cfg.resample_filter)

        x = None
        cur_layer_idx = 0
        for res in self.block_resolutions:
            in_ch = chans[res] if res < cfg.img_resolution else 0
            tmp_ch = chans[res]
            out_ch = chans[res // 2]
            if res // 2 == cfg.concat_res:
                out_ch = out_ch // cfg.num_frames_div_factor
            if res == cfg.concat_res:
                in_ch = (in_ch // cfg.num_frames_div_factor) * nf
            if res == cfg.concat_res:
                # frame fusion: [B*F, H, W, C] -> [B, H, W, F*C]
                B = x.shape[0] // nf
                x = x.reshape(B, nf, *x.shape[1:])
                x = jnp.moveaxis(x, 1, -2)                  # [B, H, W, F, C]
                x = x.reshape(B, x.shape[1], x.shape[2], nf * x.shape[-1])
                # pin batch->'data' across the fusion reshape: the partitioner
                # cannot track the video axis through it and would otherwise
                # fully rematerialize in the second-order R1 path
                x = constrain_data_axis(x)
            block = DiscriminatorBlock(in_ch, tmp_ch, out_ch, resolution=res,
                                       first_layer_idx=cur_layer_idx,
                                       use_bf16=(res >= bf16_resolution),
                                       freeze_layers=cfg.freeze_layers,
                                       name=f"b{res}", **common)
            with jax.named_scope(f"block_{res}"):
                x, img = block(x, img, force_fp32=force_fp32)
            cur_layer_idx += block.num_layers

        cmap = None
        total_c_dim = (0 if c is None else c.shape[1])
        if total_c_dim > 0 and self.cmap_dim_eff > 0:
            cmap = MappingNetwork(z_dim=0, c_dim=total_c_dim, w_dim=self.cmap_dim_eff,
                                  num_ws=None, num_layers=cfg.mapping_layers,
                                  w_avg_beta=None, name="mapping")(None, c)
        with jax.named_scope("epilogue"):
            x = DiscriminatorEpilogue(chans[4], cmap_dim=self.cmap_dim_eff,
                                      resolution=4,
                                      img_channels=cfg.img_channels,
                                      architecture=cfg.architecture,
                                      mbstd_group_size=cfg.mbstd_group_size,
                                      mbstd_num_channels=cfg.mbstd_num_channels,
                                      conv_clamp=cfg.conv_clamp,
                                      name="b4")(x, img, cmap)
        return {"image_logits": x.squeeze(1)}
