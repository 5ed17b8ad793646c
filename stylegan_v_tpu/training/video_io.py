"""Video generation + media IO helpers.

Behavioral parity with reference src/training/logging.py: a video of ANY
length is synthesized chunk-wise against ONE shared motion_z trajectory so
chunks stay temporally coherent (logging.py:37-65); timestamps may be
fractional (slow-mo). Output media: mp4 (cv2), JPEG/PNG frame folders,
image grids.
"""
from __future__ import annotations

import math
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Optional

import numpy as np


def generate_videos(G, variables, z, c, ts, motion_z=None, noise_mode: str = "const",
                    truncation_psi: float = 1.0, batch_size_num_frames: int = 100,
                    seed: int = 0, verbose: bool = False) -> np.ndarray:
    """Chunked video synthesis (reference logging.py:17-81).

    Args:
        G: models.Generator module definition; variables: its flax variables.
        z [N, z_dim], c [N, c_dim] or None, ts [N, T] float timestamps.
        motion_z: optional precomputed trajectories [N, L, motion_z_dim];
                  sampled once for the FULL clip when absent.
    Returns float32 videos [N, T, H, W, C] in [0, 1].
    """
    import jax
    import jax.numpy as jnp

    z = jnp.asarray(z)
    ts = jnp.asarray(ts)
    N, T = ts.shape
    cfg = G.cfg

    if motion_z is None and cfg.has_motion:
        # one trajectory for the whole clip (temporal coherence across chunks)
        from ..models.motion import MotionMappingNetwork
        L = MotionMappingNetwork.required_traj_len(cfg, float(jnp.max(ts)))
        motion_z = jax.random.normal(jax.random.PRNGKey(seed),
                                     (N, L, cfg.motion.z_dim))

    # All N videos are synthesized together in each jit call (the reference
    # loops one video at a time, logging.py:44-65; batch-1 dispatch wastes the
    # chip). batch_size_num_frames bounds TOTAL frames per call, so the
    # per-video chunk shrinks as N grows; chunk lengths are balanced to ONE
    # static size so every call hits the same compiled program.
    frames_per_video = max(1, batch_size_num_frames // N)
    num_chunks = (T + frames_per_video - 1) // frames_per_video
    chunk = (T + num_chunks - 1) // num_chunks

    # Class-conditional truncation: truncate toward the PER-CLASS w mean
    # estimated from fresh samples, not the global moving w_avg
    # (reference logging.py:27-32,50-52).
    class_w_avg = None
    if (c is not None and cfg.c_dim > 0 and truncation_psi < 1):
        num_ws_to_average = 1000
        c_arr = jnp.asarray(c)
        z_avg = jax.random.normal(jax.random.PRNGKey(seed + 1),
                                  (N * num_ws_to_average, cfg.z_dim))
        c_avg = jnp.repeat(c_arr, num_ws_to_average, axis=0)
        w = G.apply(variables, z_avg, c_avg,
                    method=lambda g, z_, c_: g.mapping(z_, c_))[:, 0]
        class_w_avg = w.reshape(N, num_ws_to_average, -1).mean(axis=1)  # [N, w]

    @jax.jit
    def synth(z1, c1, t1, mz1):
        img = G.apply(variables, z1, c1, t1, motion_z=mz1, noise_mode=noise_mode,
                      truncation_psi=truncation_psi,
                      rngs={"motion": jax.random.PRNGKey(0),
                            "noise": jax.random.PRNGKey(1)})
        return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)

    @jax.jit
    def synth_cond_trunc(z1, c1, t1, mz1, w_avg1):
        ws = G.apply(variables, z1, c1,
                     method=lambda g, z_, c_: g.mapping(z_, c_))
        ws = truncation_psi * ws + (1 - truncation_psi) * w_avg1[:, None]
        img = G.apply(variables, ws, t1, c1, mz1,
                      method=lambda g, ws_, t_, c_, mz_: g.synthesis(
                          ws_, t=t_, c=c_, motion_z=mz_, noise_mode=noise_mode),
                      rngs={"motion": jax.random.PRNGKey(0),
                            "noise": jax.random.PRNGKey(1)})
        return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)

    c_all = None if (c is None or cfg.c_dim == 0) else jnp.asarray(c)
    mz_all = None if motion_z is None else jnp.asarray(motion_z)
    # Pad timestamps so every chunk has the same static length (one compile);
    # padded frames are synthesized with the final timestamp and sliced off.
    pad = num_chunks * chunk - T
    ts_pad = jnp.concatenate([ts, jnp.repeat(ts[:, -1:], pad, axis=1)], axis=1) \
        if pad else ts

    chunks = []
    for k in range(num_chunks):
        t_chunk = ts_pad[:, k * chunk:(k + 1) * chunk]
        if class_w_avg is not None:
            out = synth_cond_trunc(z, c_all, t_chunk, mz_all, class_w_avg)
        else:
            out = synth(z, c_all, t_chunk, mz_all)
        # synth returns [N*chunk, H, W, C] (frames-major per video)
        chunks.append(np.asarray(out).reshape(N, chunk, *out.shape[1:]))
    videos = np.concatenate(chunks, axis=1)[:, :T]   # [N, T, H, W, C]
    return videos


def make_grid(images: np.ndarray, nrow: Optional[int] = None,
              padding: int = 2) -> np.ndarray:
    """Tile [N, H, W, C] images into one grid image (torchvision.make_grid analog)."""
    N, H, W, C = images.shape
    nrow = nrow or int(math.ceil(math.sqrt(N)))
    ncol = (N + nrow - 1) // nrow
    grid = np.zeros((ncol * (H + padding) + padding,
                     nrow * (W + padding) + padding, C), images.dtype)
    for idx in range(N):
        r, col = divmod(idx, nrow)
        y = r * (H + padding) + padding
        x = col * (W + padding) + padding
        grid[y:y + H, x:x + W] = images[idx]
    return grid


def videos_as_grids(videos: np.ndarray, nrow: Optional[int] = None) -> np.ndarray:
    """[N, T, H, W, C] -> [T, grid_h, grid_w, C] (reference logging.py:74-78)."""
    T = videos.shape[1]
    return np.stack([make_grid(videos[:, t], nrow=nrow) for t in range(T)])


def save_video_frames_as_mp4(frames: np.ndarray, fps: float, save_path: str) -> None:
    """frames [T, H, W, C] float [0,1] or uint8 -> .mp4 (reference logging.py:97-111)."""
    import cv2
    if frames.dtype != np.uint8:
        frames = (np.clip(frames, 0, 1) * 255).astype(np.uint8)
    T, H, W, C = frames.shape
    os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
    writer = cv2.VideoWriter(save_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             float(fps), (W, H))
    for t in range(T):
        writer.write(cv2.cvtColor(frames[t], cv2.COLOR_RGB2BGR))
    writer.release()


def save_video_frames_as_frames_parallel(frames: np.ndarray, save_dir: str,
                                         time_offset: int = 0,
                                         num_processes: int = 8) -> None:
    """frame-folder output (reference logging.py:124-140), thread-parallel."""
    import PIL.Image
    os.makedirs(save_dir, exist_ok=True)
    if frames.dtype != np.uint8:
        frames = (np.clip(frames, 0, 1) * 255).astype(np.uint8)

    def write_one(i):
        PIL.Image.fromarray(frames[i]).save(
            os.path.join(save_dir, f"{i + time_offset:06d}.jpg"), q=95)

    with ThreadPoolExecutor(max_workers=num_processes) as ex:
        list(ex.map(write_one, range(len(frames))))


def save_image_grid(images: np.ndarray, path: str, drange=(-1, 1),
                    grid_size=None) -> None:
    """uint8 grid writer (reference training_loop.py save_image_grid analog).
    images: [N, H, W, C] in drange."""
    import PIL.Image
    lo, hi = drange
    img = (np.asarray(images, np.float32) - lo) / (hi - lo)
    img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    if grid_size is not None:
        gw, gh = grid_size
        grid = make_grid(img, nrow=gw, padding=0)
    else:
        grid = make_grid(img, padding=0)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if grid.shape[-1] == 1:
        grid = grid[:, :, 0]
    PIL.Image.fromarray(grid).save(path)


def run_batchwise(fn: Callable, data_kwargs: Dict[str, np.ndarray],
                  batch_size: int, **kwargs) -> np.ndarray:
    """Apply fn over batches and concatenate (reference logging.py:84-93)."""
    data_kwargs = {k: v for k, v in data_kwargs.items() if v is not None}
    seq_len = len(next(iter(data_kwargs.values())))
    out = []
    for i in range((seq_len + batch_size - 1) // batch_size):
        cur = {k: v[i * batch_size:(i + 1) * batch_size] for k, v in data_kwargs.items()}
        out.append(np.asarray(fn(**cur, **kwargs)))
    return np.concatenate(out, axis=0)
