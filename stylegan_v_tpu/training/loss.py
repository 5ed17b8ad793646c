"""Phased non-saturating StyleGAN2 video-GAN loss.

Behavioral parity with reference src/training/loss.py (StyleGAN2Loss),
functional-JAX design: each phase is a pure function
    (params, inputs, rng) -> (loss, aux)
and R1 / path-length penalties differentiate through `jax.grad` natively —
the reference's conv2d_gradfix / no_weight_gradients machinery
(loss.py:107,163) has no JAX counterpart because none is needed.

Phases (reference loss.py:74-173):
  * Gmain — softplus(-D(G(z,t)))
  * Gpl   — path-length reg on a pl_batch_shrink-smaller batch
  * Dgen  — softplus(D(G(z,t))), generator frozen
  * Dreal — softplus(-D(real))
  * Dr1   — R1 gradient penalty, averaged per video
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..models import Discriminator, Generator


@dataclass(frozen=True)
class LossConfig:
    """Mirrors reference loss_kwargs (configs/model/{base,stylegan-v}.yaml)."""
    r1_gamma: float = 10.0
    style_mixing_prob: float = 0.0       # stylegan-v default (stylegan-v.yaml:53)
    pl_weight: float = 0.0               # stylegan-v default (stylegan-v.yaml:54)
    pl_batch_shrink: int = 2
    pl_decay: float = 0.01
    video_consistent_aug: bool = True    # same ADA transform for all frames of a video


def softplus(x):
    return jax.nn.softplus(x)


class GANLoss:
    """Bundles G/D module defs + loss config into phase-loss callables.

    augment_fn: Optional[(rng, img [B*F,H,W,C], p) -> img] — the ADA pipe.
    When video_consistent_aug, frames of one video are fused on the channel
    axis before augmentation so they receive identical transforms
    (reference loss.py:56-67; color matrices handle F*C channels).
    """

    def __init__(self, G: Generator, D: Discriminator, cfg: LossConfig,
                 augment_fn: Optional[Callable] = None):
        self.G = G
        self.D = D
        self.cfg = cfg
        self.augment_fn = augment_fn
        self.num_frames = G.cfg.sampling.num_frames_per_video

    # ---------------- submodule runners ----------------

    def run_mapping(self, vars_G, z, c, rng, update_w_avg: bool):
        """mapping + optional style mixing (reference loss.py:44-51)."""
        def call(g, z, c):
            return g.mapping(z, c, update_w_avg=update_w_avg)

        with jax.named_scope("G_mapping"):
            out = self.G.apply(vars_G, z, c, method=call,
                               mutable=["moving"] if update_w_avg else False)
        ws, new_moving = out if update_w_avg else (out, None)

        if self.cfg.style_mixing_prob > 0:
            k_cut, k_prob, k_z = jax.random.split(rng, 3)
            num_ws = ws.shape[1]
            cutoff = jax.random.randint(k_cut, (), 1, num_ws)
            cutoff = jnp.where(
                jax.random.uniform(k_prob) < self.cfg.style_mixing_prob, cutoff, num_ws)
            ws2 = self.G.apply(vars_G, jax.random.normal(k_z, z.shape), c,
                               method=lambda g, z, c: g.mapping(z, c, update_w_avg=False))
            mask = (jnp.arange(num_ws)[None, :, None] < cutoff)
            ws = jnp.where(mask, ws, ws2)
        return ws, new_moving

    def run_synthesis(self, vars_G, ws, t, c, rng):
        def call(g, ws, t, c):
            return g.synthesis(ws, t=t, c=c)
        rngs = {"motion": jax.random.fold_in(rng, 1), "noise": jax.random.fold_in(rng, 2)}
        with jax.named_scope("G_synthesis"):
            return self.G.apply(vars_G, ws, t, c, method=call, rngs=rngs)

    def run_D(self, vars_D, img, c, t, rng, augment_p):
        """Video-consistent ADA + D (reference loss.py:56-72).

        The geometric warp is rematerialized per batch chunk inside the
        augment pipe (see augment.py warp_chunk)."""
        if self.augment_fn is not None:
            with jax.named_scope("augment"):
                if self.cfg.video_consistent_aug and self.num_frames > 1:
                    nf, h, w, ch = img.shape
                    f = self.num_frames
                    n = nf // f
                    # [B*F,H,W,C] -> [B,H,W,F*C]: all frames share one transform.
                    v = img.reshape(n, f, h, w, ch)
                    v = jnp.moveaxis(v, 1, -2).reshape(n, h, w, f * ch)
                    v = self.augment_fn(rng, v, augment_p)
                    v = v.reshape(n, h, w, f, ch)
                    img = jnp.moveaxis(v, -2, 1).reshape(n * f, h, w, ch)
                else:
                    img = self.augment_fn(rng, img, augment_p)
        with jax.named_scope("D_forward"):
            return self.D.apply(vars_D, img, c, t,
                                rngs={"noise": jax.random.fold_in(rng, 99)})

    # ---------------- phase losses ----------------

    def gmain(self, params_G, vars_rest_G, vars_D, gen_z, gen_c, gen_t, rng, augment_p):
        """softplus(-D(G)) + w_avg update (reference loss.py:84-99)."""
        vars_G = {"params": params_G, **vars_rest_G}
        k_mix, k_syn, k_aug = jax.random.split(rng, 3)
        ws, new_moving = self.run_mapping(vars_G, gen_z, gen_c, k_mix, update_w_avg=True)
        img = self.run_synthesis(vars_G, ws, gen_t, gen_c, k_syn)
        out = self.run_D(vars_D, img, gen_c, gen_t, k_aug, augment_p)
        logits = out["image_logits"]
        loss = jnp.mean(softplus(-logits))
        stats = {"Loss/scores/fake": jnp.mean(logits),
                 "Loss/signs/fake": jnp.mean(jnp.sign(logits)),
                 "Loss/G/loss": loss}
        if "video_logits" in out:   # MoCoGAN branch (reference loss.py:91-96)
            loss_video = jnp.mean(softplus(-out["video_logits"]))
            stats["Loss/scores/fake_video"] = jnp.mean(out["video_logits"])
            stats["Loss/G/loss_video"] = loss_video
            loss = loss + loss_video
        return loss, (new_moving, stats)

    def gpl(self, params_G, vars_rest_G, gen_z, gen_c, gen_t, rng, pl_mean):
        """Path-length regularization (reference loss.py:101-117)."""
        vars_G = {"params": params_G, **vars_rest_G}
        bsz = gen_z.shape[0] // self.cfg.pl_batch_shrink
        z, t = gen_z[:bsz], gen_t[:bsz]
        c = gen_c[:bsz] if gen_c is not None else None
        k_mix, k_syn, k_noise = jax.random.split(rng, 3)
        ws, _ = self.run_mapping(vars_G, z, c, k_mix, update_w_avg=False)

        def img_dot_noise(ws):
            img = self.run_synthesis(vars_G, ws, t, c, k_syn)
            pl_noise = jax.random.normal(k_noise, img.shape) / math.sqrt(
                img.shape[1] * img.shape[2])
            return jnp.sum(img * pl_noise)

        pl_grads = jax.grad(img_dot_noise)(ws)                      # [B, num_ws, w]
        pl_lengths = jnp.sqrt(jnp.mean(jnp.sum(jnp.square(pl_grads), axis=2), axis=1))
        new_pl_mean = pl_mean + self.cfg.pl_decay * (jnp.mean(pl_lengths) - pl_mean)
        pl_penalty = jnp.square(pl_lengths - jax.lax.stop_gradient(new_pl_mean))
        loss = jnp.mean(pl_penalty) * self.cfg.pl_weight
        stats = {"Loss/pl_penalty": jnp.mean(pl_penalty), "Loss/G/reg": loss}
        return loss, (jax.lax.stop_gradient(new_pl_mean), stats)

    def dgen(self, params_D, vars_G, vars_rest_D, gen_z, gen_c, gen_t, rng, augment_p):
        """softplus(D(G)), G frozen (reference loss.py:119-137)."""
        vars_D = {"params": params_D, **vars_rest_D}
        k_mix, k_syn, k_aug = jax.random.split(rng, 3)
        ws, _ = self.run_mapping(vars_G, gen_z, gen_c, k_mix, update_w_avg=False)
        img = jax.lax.stop_gradient(self.run_synthesis(vars_G, ws, gen_t, gen_c, k_syn))
        out = self.run_D(vars_D, img, gen_c, gen_t, k_aug, augment_p)
        logits = out["image_logits"]
        loss = jnp.mean(softplus(logits))
        stats = {"Loss/scores/fake": jnp.mean(logits),
                 "Loss/signs/fake": jnp.mean(jnp.sign(logits))}
        if "video_logits" in out:   # reference loss.py:130-134
            loss = loss + jnp.mean(softplus(out["video_logits"]))
            stats["Loss/scores/fake_video"] = jnp.mean(out["video_logits"])
        return loss, stats

    def dreal_dr1(self, params_D, vars_rest_D, real_img, real_c, real_t, rng,
                  augment_p, do_main: bool, do_r1: bool, r1_gamma: float):
        """Dreal + R1 sharing ONE D forward graph (reference loss.py:139-173).

        The R1 path obtains the stats/Dreal logits as the `has_aux` output of
        the same `jax.grad` forward, so the single-forward property holds by
        construction rather than by trusting XLA CSE (a duplicate would cost
        ~20 ms/step amortized at the production shape)."""
        vars_D = {"params": params_D, **vars_rest_D}
        stats: Dict[str, jax.Array] = {}

        def sum_logits_and_out(img):
            out = self.run_D(vars_D, img, real_c, real_t, rng, augment_p)
            return jnp.sum(out["image_logits"]), out

        loss = 0.0
        if do_r1:
            r1_grads, out = jax.grad(sum_logits_and_out, has_aux=True)(real_img)
        else:
            _, out = sum_logits_and_out(real_img)
        logits = out["image_logits"]
        stats["Loss/scores/real"] = jnp.mean(logits)
        stats["Loss/signs/real"] = jnp.mean(jnp.sign(logits))
        if do_main:
            loss_real = jnp.mean(softplus(-logits))
            stats["Loss/D/loss_real"] = loss_real
            loss = loss + loss_real
            if "video_logits" in out:   # reference loss.py:156-159
                loss = loss + jnp.mean(softplus(-out["video_logits"]))
                stats["Loss/scores/real_video"] = jnp.mean(out["video_logits"])
        if do_r1:
            r1_per_frame = jnp.sum(jnp.square(r1_grads), axis=(1, 2, 3))   # [B*F]
            frames_per_logit = real_img.shape[0] // logits.shape[0]
            r1_per_video = jnp.mean(
                r1_per_frame.reshape(-1, frames_per_logit), axis=1)        # [B]
            loss_r1 = jnp.mean(r1_per_video) * (r1_gamma / 2)
            stats["Loss/r1_penalty"] = jnp.mean(r1_per_frame)
            stats["Loss/D/reg"] = loss_r1
            loss = loss + loss_r1
        return loss, stats
