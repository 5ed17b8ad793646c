"""MoCoGAN baseline discriminator (reference src/training/mocogan.py).

An alternate discriminator for ablations (configs/model/mocogan.yaml): a
per-frame StyleGAN2 image discriminator (frames_per_video=1, no frame fusion)
plus a Conv3d/BatchNorm3d video discriminator over [B, T, H, W, C]
(reference MoCoGANVideoDiscriminator, mocogan.py:228-278). Returns BOTH
image_logits and video_logits; the loss adds softplus terms for each
(reference loss.py:91-96, 130-134, 156-159).

TPU notes:
  * Conv3d -> lax.conv_general_dilated with NDHWC/DHWIO (time = depth axis).
  * BatchNorm3d uses batch statistics directly (the reference's running
    buffers are only consulted in eval mode, which this discriminator never
    runs in during training); documented divergence.
  * The 0.1 learning-rate multiplier for the video branch
    (mocogan.py:54-58, video_discr_lr_multiplier) is exposed via
    `lr_scale_map` and applied as a per-subtree optimizer partition.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .config import DiscriminatorConfig
from .discriminator import Discriminator as ImageDiscriminator


class _Conv3d(nn.Module):
    """Torch-initialized (N(0, 0.02)) bias-free 3-D conv, NDHWC."""
    in_channels: int
    out_channels: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]

    @nn.compact
    def __call__(self, x):
        kd, kh, kw = self.kernel
        w = self.param("weight", nn.initializers.normal(stddev=0.02),
                       (kd, kh, kw, self.in_channels, self.out_channels),
                       jnp.float32)
        pd, ph, pw = self.padding
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=self.stride,
            padding=((pd, pd), (ph, ph), (pw, pw)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


class _BatchNorm3d(nn.Module):
    """Batch-statistics normalization with affine params
    (gamma ~ N(1, 0.02), beta = 0 per reference weights_init)."""
    features: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("weight",
                           lambda k, s, d: 1 + 0.02 * jax.random.normal(k, s, d),
                           (self.features,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = jnp.mean(x, axis=(0, 1, 2, 3), keepdims=True)
        var = jnp.var(x, axis=(0, 1, 2, 3), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return y * gamma + beta


class MoCoGANVideoDiscriminator(nn.Module):
    """Conv3d ladder over [B, T, H, W, C] (reference mocogan.py:228-278)."""
    n_channels: int
    n_output_neurons: int = 1
    use_noise: bool = True
    noise_sigma: float = 0.1
    ndf: int = 64
    image_size: int = 64
    num_t_paddings: int = 0

    @nn.compact
    def __call__(self, videos: jax.Array) -> jax.Array:
        x = videos
        ndf, ntp = self.ndf, self.num_t_paddings

        def noise(x, i):
            if self.use_noise:
                x = x + self.noise_sigma * jax.random.normal(
                    self.make_rng("noise"), x.shape, x.dtype)
            return x

        specs = [
            (self.n_channels, ndf, (4, 4, 4), (1, 2, 2), (2 if ntp > 0 else 0, 1, 1), False),
            (ndf, ndf * 2, (4, 4, 4), (1, 2, 2), (2 if ntp > 1 else 0, 1, 1), True),
            (ndf * 2, ndf * 4, (4, 4, 4), (1, 2, 2), (2 if ntp > 2 else 0, 1, 1), True),
            (ndf * 4, ndf * 8, (4, 4, 4), (1, 2, 2), (2 if ntp > 3 else 0, 1, 1), True),
        ]
        if self.image_size == 256:
            specs += [
                (ndf * 8, ndf * 8, (3, 3, 3), (1, 1, 1),
                 (1 + (1 if ntp > 4 else 0), 1, 1), True),
                (ndf * 8, ndf * 8, (3, 3, 3), (1, 1, 1),
                 (1 + (1 if ntp > 5 else 0), 1, 1), True),
            ]
        for i, (ci, co, k, s, p, bn) in enumerate(specs):
            x = noise(x, i)
            x = _Conv3d(ci, co, k, s, p, name=f"conv{i}")(x)
            assert x.shape[1] > 0, (
                f"video discriminator conv{i} collapsed the time axis to 0 "
                f"(input had {videos.shape[1]} frames, num_t_paddings="
                f"{ntp}). Feed more frames (the reference runs MoCoGAN with "
                f"16-frame traditional sampling) or raise "
                f"model.discriminator.video_discr_num_t_paddings.")
            if bn:
                x = _BatchNorm3d(co, name=f"bn{i}")(x)
            x = jax.nn.leaky_relu(x, 0.2)
        x = _Conv3d(ndf * 8, self.n_output_neurons, (4, 4, 4), (1, 1, 1),
                    (2 if ntp > 5 else 0, 0, 0), name="conv_out")(x)
        assert x.size > 0, (
            f"video discriminator produced empty logits {x.shape} "
            f"(input had {videos.shape[1]} frames, num_t_paddings={ntp}); "
            f"raise model.discriminator.video_discr_num_t_paddings or feed "
            f"more frames per video.")
        return x.squeeze(-1)                       # [B, out_t, out_h, out_w]


def _instance_norm_3d(x: jax.Array) -> jax.Array:
    """Affine-free InstanceNorm3d: per-sample, per-channel normalization
    over (T, H, W) (torch nn.InstanceNorm3d defaults: affine=False)."""
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5)


class SubVideoDiscriminator(nn.Module):
    """Single-scale 3-D patch discriminator (reference mocogan.py:166-224,
    pix2pixHD lineage): k=4 s=2 conv ladder with instance norm, a stride-1
    block, and a 1-channel patch head. Returns the list of intermediate
    features when get_intermediate_feat (for feature-matching losses),
    else just the patch logits."""
    num_input_channels: int
    ndf: int = 64
    n_layers: int = 3
    get_intermediate_feat: bool = True

    @nn.compact
    def __call__(self, x: jax.Array):
        feats = []
        nf = self.ndf
        x = _Conv3d(self.num_input_channels, nf, (4, 4, 4), (2, 2, 2),
                    (2, 2, 2), name="conv0")(x)
        x = jax.nn.leaky_relu(x, 0.2)
        feats.append(x)
        for n in range(1, self.n_layers):
            nf_prev, nf = nf, min(nf * 2, 512)
            x = _Conv3d(nf_prev, nf, (4, 4, 4), (2, 2, 2), (2, 2, 2),
                        name=f"conv{n}")(x)
            x = jax.nn.leaky_relu(_instance_norm_3d(x), 0.2)
            feats.append(x)
        nf_prev, nf = nf, min(nf * 2, 512)
        x = _Conv3d(nf_prev, nf, (4, 4, 4), (1, 1, 1), (2, 2, 2),
                    name=f"conv{self.n_layers}")(x)
        x = jax.nn.leaky_relu(_instance_norm_3d(x), 0.2)
        feats.append(x)
        x = _Conv3d(nf, 1, (4, 4, 4), (1, 1, 1), (2, 2, 2),
                    name="head")(x)
        feats.append(x)
        return feats if self.get_intermediate_feat else x


class VideoDiscriminator(nn.Module):
    """Multiscale 3-D patch discriminator (reference mocogan.py:100-162):
    num_sub_discrs SubVideoDiscriminators applied to progressively
    avg-pooled videos (coarsest sub-D has the widest ndf). Input NDHWC
    [B, T, H, W, C]; returns a list (one per scale, finest-pool first) of
    feature lists (or single logits when not get_intermediate_feat).
    Kept for parity with the reference, where it is likewise unused by the
    training path (MoCoGANDiscriminator uses MoCoGANVideoDiscriminator)."""
    num_input_channels: int
    ndf: int = 64
    n_layers: int = 3
    n_frames_per_sample: int = 16
    num_sub_discrs: int = 2
    get_intermediate_feat: bool = True

    @nn.compact
    def __call__(self, x: jax.Array):
        ndf_max = 64
        results = []
        t_stride = 2 if self.n_frames_per_sample > 16 else 1
        for block_idx in range(self.num_sub_discrs):
            # the reference indexes sub-Ds coarsest-width-first (scale i gets
            # ndf * 2^(num-1-i)) and runs them in reverse; net effect: the
            # UNPOOLED input meets the NARROWEST sub-D
            i = self.num_sub_discrs - 1 - block_idx
            sub = SubVideoDiscriminator(
                num_input_channels=self.num_input_channels,
                ndf=min(ndf_max, self.ndf * (2 ** (self.num_sub_discrs - 1 - i))),
                n_layers=self.n_layers,
                get_intermediate_feat=self.get_intermediate_feat,
                name=f"scale{i}")
            results.append(sub(x))
            if block_idx != self.num_sub_discrs - 1:
                x = nn.avg_pool(x, (3, 3, 3),
                                strides=(t_stride, 2, 2),
                                padding=((1, 1), (1, 1), (1, 1)),
                                count_include_pad=False)
        return results


class MoCoGANDiscriminator(nn.Module):
    """image D + video D (reference mocogan.py:16-75)."""
    cfg: DiscriminatorConfig
    video_discr_lr_multiplier: float = 0.1
    video_discr_num_t_paddings: int = 0

    # optimizer partition hint (reference params_with_lr, mocogan.py:54-58)
    @property
    def lr_scale_map(self) -> Dict[str, float]:
        return {"video_discr": self.video_discr_lr_multiplier}

    @nn.compact
    def __call__(self, img: jax.Array, c: Optional[jax.Array], t: jax.Array,
                 force_fp32: bool = False) -> Dict[str, jax.Array]:
        assert self.cfg.img_resolution >= 64, (
            "MoCoGAN video discriminator needs >= 64x64 inputs (its fixed "
            "Conv3d ladder collapses smaller resolutions to empty outputs; "
            "the reference architecture has the same constraint)")
        B, F = t.shape
        # image branch: per-frame SG2-D with frames_per_video=1 semantics
        img_cfg = dataclasses.replace(
            self.cfg,
            channel_base=int((1.0 if self.cfg.img_resolution >= 512 else 0.5) * 32768),
            mbstd_group_size=4,
            concat_res=-1,
            sampling=dataclasses.replace(self.cfg.sampling, num_frames_per_video=1),
        )
        image_logits = ImageDiscriminator(img_cfg, name="image_discr")(
            img, (jnp.repeat(c, F, axis=0) if c is not None else None),
            t.reshape(B * F, 1), force_fp32=force_fp32)["image_logits"]

        videos = img.reshape(B, F, *img.shape[1:])              # [B,T,H,W,C]
        video_logits = MoCoGANVideoDiscriminator(
            n_channels=self.cfg.img_channels,
            image_size=self.cfg.img_resolution,
            num_t_paddings=self.video_discr_num_t_paddings,
            name="video_discr")(videos)
        return {"image_logits": image_logits,
                "video_logits": video_logits.reshape(B, -1)}
