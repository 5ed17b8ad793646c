"""Motion mapping network + acyclic sine time encoder — the heart of StyleGAN-V.

Behavioral parity with reference src/training/motion.py, re-designed for
static-shape XLA execution:

  * The reference computes the motion-trajectory length dynamically from
    `t.max()` (motion.py:63-66). Under jit, shapes must be static, so the
    trajectory length is a STATIC argument derived host-side:
    `traj_len = MotionMappingNetwork.required_traj_len(cfg, max_t)`.
    For training, max_t < sampling.max_num_frames always, so the config-level
    default is exact parity; for long/slow-mo generation the caller passes a
    longer `motion_z` (as the reference generate CLI effectively does by
    precomputing motion_z once per clip, logging.py:37-38).

  * The conv trajectory generator runs padding-free ('valid') 1-D convs so
    trajectories stay valid for any t in (0, +inf) (reference motion.py:51-59);
    the LSTM variant uses a lax.scan-based cell (autoregressive parity).

  * Per-frame neighbor-code gather + linear interpolation in t is a batched
    take_along_axis (reference motion.py:105-116).
"""
from __future__ import annotations

import math
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.misc import assert_shape
from .config import GeneratorConfig
from .layers import EqLRConv1d, FullyConnectedLayer, MappingNetwork


def construct_linspaced_frequencies(num_freqs: int, min_period_len: float,
                                    max_period_len: float) -> np.ndarray:
    """Log-linspaced base frequencies, descending period order
    (reference motion.py:218-222). Host numpy: baked as constants."""
    freqs = 2 * np.pi / (2 ** np.linspace(np.log2(min_period_len),
                                          np.log2(max_period_len), num_freqs))
    return freqs[::-1].copy().astype(np.float32)[None, :]   # [1, num_freqs]


def compute_motion_v_dim(cfg: GeneratorConfig) -> int:
    """Output dim of the motion encoder (pure function of config; avoids
    constructing child modules outside a linen scope)."""
    if cfg.motion.v_dim <= 0:
        return 0
    if cfg.motion.fourier:
        return cfg.time_enc.dim * 2     # AlignedTimeEncoder: sin+cos per freq
    return cfg.motion.v_dim


class AlignedTimeEncoder(nn.Module):
    """Acyclic sine embeddings aligned with the piecewise-linear motion codes
    (reference motion.py:161-214).

    embedding(t) = sincos(freq * period(u_l) * t + phase(u_l) * phase_scale)
                 - lerp(sincos(...t_left...), sincos(...t_right...))
                 + lerp(aligners(u_l), aligners(u_r))
    which removes the cyclic component so embeddings stay aligned with the
    interpolated motion codes at lattice points.
    """
    cfg: GeneratorConfig
    latent_dim: int = 512

    @property
    def freqs(self) -> np.ndarray:
        te = self.cfg.time_enc
        return construct_linspaced_frequencies(te.dim, te.min_period_len, te.max_period_len)

    @property
    def phase_scales(self) -> np.ndarray:
        period_lens = 2 * np.pi / self.freqs
        return (self.cfg.time_enc.max_period_len / period_lens).astype(np.float32)

    def get_dim(self) -> int:
        return self.freqs.shape[1] * 2

    @nn.compact
    def __call__(self, t: jax.Array, motion_u_left: jax.Array, motion_u_right: jax.Array,
                 interp_weights: jax.Array, t_left: jax.Array, t_right: jax.Array
                 ) -> jax.Array:
        batch_size, num_frames, u_dim = motion_u_left.shape
        assert_shape(t, [batch_size, num_frames])
        nfeat = self.freqs.shape[1]

        u_l = motion_u_left.reshape(batch_size * num_frames, u_dim)
        u_r = motion_u_right.reshape(batch_size * num_frames, u_dim)

        # Bias-free predictors prevent motion mode collapse (motion.py:173-180).
        periods = jnp.tanh(FullyConnectedLayer(
            u_dim, nfeat, use_bias=False, name="periods_predictor")(u_l)) + 1.0
        phases = FullyConnectedLayer(
            u_dim, nfeat, use_bias=False, name="phase_predictor")(u_l)
        aligner_net = FullyConnectedLayer(
            u_dim, nfeat * 2, use_bias=False, name="aligners_predictor")
        aligners_left = aligner_net(u_l)
        aligners_right = aligner_net(u_r)

        freqs = jnp.asarray(self.freqs)
        phase_scales = jnp.asarray(self.phase_scales)

        def pos_emb(tv):
            raw = freqs * periods * tv.reshape(-1).astype(jnp.float32)[:, None] \
                + phases * phase_scales
            return jnp.concatenate([jnp.sin(raw), jnp.cos(raw)], axis=1)

        pos_embs = pos_emb(t)
        pos_embs_left = pos_emb(t_left)
        pos_embs_right = pos_emb(t_right)

        w = interp_weights.reshape(-1, 1)
        aligners_remove = pos_embs_left * (1 - w) + pos_embs_right * w
        aligners_add = aligners_left * (1 - w) + aligners_right * w
        return pos_embs - aligners_remove + aligners_add


class _LSTM(nn.Module):
    """Single-layer unidirectional LSTM over [N, L, C] via lax.scan
    (capability parity with reference motion.py:44-48 nn.LSTM)."""
    hidden_size: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cell = nn.OptimizedLSTMCell(self.hidden_size)
        scan = nn.RNN(cell, name="rnn")
        return scan(x)


class MotionMappingNetwork(nn.Module):
    """Continuous-time motion code generator (reference motion.py:19-156)."""
    cfg: GeneratorConfig

    @property
    def num_additional_codes(self) -> int:
        if self.cfg.motion.gen_strategy == "conv":
            return (self.cfg.motion.kernel_size - 1) * 2
        return 0

    @staticmethod
    def required_traj_len(cfg: GeneratorConfig, max_t: Optional[float] = None) -> int:
        """Static trajectory length incl. conv margin (reference motion.py:63-66 + :80)."""
        m = cfg.motion
        mt = max(cfg.sampling.max_num_frames - 1, max_t if max_t is not None else 0)
        base = int(math.ceil(mt / m.motion_z_distance)) + 2
        extra = (m.kernel_size - 1) * 2 if m.gen_strategy == "conv" else 0
        return base + extra

    def get_dim(self) -> int:
        return compute_motion_v_dim(self.cfg)

    def sample_motion_z(self, rng: jax.Array, batch_size: int,
                        max_t: Optional[float] = None) -> jax.Array:
        """Host-facing helper: sample a full motion noise trajectory."""
        L = self.required_traj_len(self.cfg, max_t)
        return jax.random.normal(rng, (batch_size, L, self.cfg.motion.z_dim), jnp.float32)

    def _generate_motion_u(self, c: Optional[jax.Array], t: jax.Array,
                           motion_z: Optional[jax.Array]) -> Dict[str, jax.Array]:
        """Trajectory synthesis + neighbor gather + lerp (motion.py:68-127)."""
        m = self.cfg.motion
        batch_size, num_frames = t.shape

        if motion_z is None:
            motion_z = jax.random.normal(
                self.make_rng("motion"),
                (batch_size, self.required_traj_len(self.cfg), m.z_dim), jnp.float32)
        input_trajs = motion_z[:batch_size, :, :m.z_dim].astype(jnp.float32)

        if self.cfg.c_dim > 0:
            assert c is not None
            c_rep = jnp.broadcast_to(c[:, None, :],
                                     (batch_size, input_trajs.shape[1], c.shape[1]))
            input_trajs = jnp.concatenate([input_trajs, c_rep], axis=2)

        if m.gen_strategy == "autoregressive":
            trajs = _LSTM(m.z_dim, name="rnn")(input_trajs)
        elif m.gen_strategy == "conv":
            # padding-free stack => valid for unbounded t (motion.py:51-59)
            h = EqLRConv1d(m.z_dim + self.cfg.c_dim, m.z_dim, m.kernel_size,
                           padding=0, activation="lrelu", lr_multiplier=0.01,
                           name="conv0")(input_trajs)
            trajs = EqLRConv1d(m.z_dim, m.v_dim, m.kernel_size,
                               padding=0, activation="lrelu", lr_multiplier=0.01,
                               name="conv1")(h)
        else:
            raise NotImplementedError(f"Unknown gen strategy: {m.gen_strategy}")

        t = t.astype(jnp.float32)
        dist = float(m.motion_z_distance)
        left_idx = jnp.floor(t / dist).astype(jnp.int32)                  # [B, F]
        u_left = jnp.take_along_axis(trajs, left_idx[:, :, None], axis=1)   # [B, F, D]
        u_right = jnp.take_along_axis(trajs, left_idx[:, :, None] + 1, axis=1)

        t_left = t - jnp.mod(t, dist)
        t_right = t_left + dist
        interp_weights = (jnp.mod(t, dist) / dist)[:, :, None].astype(jnp.float32)
        motion_u = u_left * (1 - interp_weights) + u_right * interp_weights
        motion_u = motion_u.reshape(batch_size * num_frames, -1)

        return dict(motion_u_left=u_left, motion_u_right=u_right,
                    t_left=t_left, t_right=t_right, interp_weights=interp_weights,
                    motion_u=motion_u, motion_z=motion_z)

    @nn.compact
    def __call__(self, c: Optional[jax.Array], t: jax.Array,
                 motion_z: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
        assert t.ndim == 2, f"expected [B, F] timestamps, got {t.shape}"
        info = self._generate_motion_u(c, t, motion_z)

        if self.cfg.motion.fourier:
            motion_v = AlignedTimeEncoder(self.cfg, latent_dim=self.cfg.motion.v_dim,
                                          name="time_encoder")(
                t=t.astype(jnp.float32),
                motion_u_left=info["motion_u_left"],
                motion_u_right=info["motion_u_right"],
                t_left=info["t_left"], t_right=info["t_right"],
                interp_weights=info["interp_weights"])
        else:
            c_rep = (jnp.repeat(c, t.shape[1], axis=0) if self.cfg.c_dim > 0 else None)
            motion_v = MappingNetwork(
                z_dim=self.cfg.motion.z_dim, c_dim=self.cfg.c_dim,
                w_dim=self.cfg.motion.v_dim, num_ws=None, num_layers=2,
                activation="lrelu", w_avg_beta=None, lr_multiplier=0.01,
                name="mapping")(info["motion_u"], c_rep)

        return dict(motion_v=motion_v, motion_z=info["motion_z"])
