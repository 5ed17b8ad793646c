"""Video-IO tests: chunked generation coherence, grids, media writers."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from stylegan_v_tpu.models import Generator
from stylegan_v_tpu.models.motion import MotionMappingNetwork
from stylegan_v_tpu.training.video_io import (
    generate_videos, make_grid, save_video_frames_as_frames_parallel,
    save_video_frames_as_mp4, videos_as_grids, run_batchwise,
)
from test_models import small_gen_cfg


def make_G():
    cfg = small_gen_cfg()
    G = Generator(cfg)
    z = jnp.zeros((1, cfg.z_dim))
    t = jnp.zeros((1, 2))
    variables = jax.jit(lambda r, z, t: G.init(r, z, None, t, noise_mode="none"))(
        {"params": jax.random.PRNGKey(0), "motion": jax.random.PRNGKey(1)}, z, t)
    return G, variables


def test_chunked_generation_is_coherent():
    """Chunked synthesis against one shared motion_z must equal single-shot
    synthesis frame-for-frame (the temporal-coherence contract,
    reference logging.py:37-65)."""
    G, variables = make_G()
    cfg = G.cfg
    N, T = 2, 12
    rng = np.random.RandomState(0)
    z = rng.randn(N, cfg.z_dim).astype(np.float32)
    ts = np.tile(np.arange(T, dtype=np.float32)[None], (N, 1))
    L = MotionMappingNetwork.required_traj_len(cfg, float(T))
    mz = rng.randn(N, L, cfg.motion.z_dim).astype(np.float32)

    whole = generate_videos(G, variables, z, None, ts, motion_z=mz,
                            noise_mode="none", batch_size_num_frames=100)
    chunked = generate_videos(G, variables, z, None, ts, motion_z=mz,
                              noise_mode="none", batch_size_num_frames=5)
    assert whole.shape == (N, T, 32, 32, 3)
    np.testing.assert_allclose(chunked, whole, rtol=1e-4, atol=1e-4)

    # ragged tail: T=7 over 3 chunks of 3 -> padded final chunk must be
    # sliced off and still match (all N videos batched per jit call)
    ragged = generate_videos(G, variables, z, None, ts[:, :7], motion_z=mz,
                             noise_mode="none", batch_size_num_frames=6)
    np.testing.assert_allclose(ragged, whole[:, :7], rtol=1e-4, atol=1e-4)


def test_grids_and_writers(tmp_path):
    vids = np.random.RandomState(1).rand(4, 3, 16, 16, 3).astype(np.float32)
    grids = videos_as_grids(vids)
    assert grids.shape[0] == 3 and grids.ndim == 4
    mp4 = str(tmp_path / "v.mp4")
    save_video_frames_as_mp4(vids[0], 8.0, mp4)
    assert os.path.getsize(mp4) > 0
    frames_dir = str(tmp_path / "frames")
    save_video_frames_as_frames_parallel(vids[0], frames_dir)
    assert len(os.listdir(frames_dir)) == 3
    g = make_grid(np.zeros((5, 8, 8, 3), np.uint8), nrow=3)
    assert g.shape[-1] == 3


def test_run_batchwise():
    f = lambda a: a * 2
    out = run_batchwise(f, {"a": np.arange(10)}, batch_size=3)
    np.testing.assert_array_equal(out, np.arange(10) * 2)


def test_class_conditional_truncation():
    """psi<1 with c_dim>0 truncates toward the PER-CLASS w mean (reference
    logging.py:27-32,50-52): at psi=0 the output depends only on (class,
    motion), not on z."""
    cfg = small_gen_cfg(c_dim=3)
    G = Generator(cfg)
    z0 = jnp.zeros((1, cfg.z_dim))
    c0 = jnp.eye(3)[:1]
    t0 = jnp.zeros((1, 2))
    variables = jax.jit(lambda r, z, c, t: G.init(r, z, c, t, noise_mode="none"))(
        {"params": jax.random.PRNGKey(0), "motion": jax.random.PRNGKey(1)},
        z0, c0, t0)

    rng = np.random.RandomState(0)
    z = rng.randn(2, cfg.z_dim).astype(np.float32)      # two DIFFERENT z
    c = np.tile(np.eye(3, dtype=np.float32)[1:2], (2, 1))  # same class
    ts = np.tile(np.arange(3, dtype=np.float32)[None], (2, 1))
    L = MotionMappingNetwork.required_traj_len(cfg, 2.0)
    mz = np.tile(rng.randn(1, L, cfg.motion.z_dim).astype(np.float32), (2, 1, 1))

    vids0 = generate_videos(G, variables, z, c, ts, motion_z=mz,
                            noise_mode="none", truncation_psi=0.0)
    assert np.isfinite(vids0).all()
    # psi=0: z must not matter — a different z with the same seed (=> same
    # per-class w mean estimate) gives identical videos. (Rows within one
    # call differ by Monte-Carlo error of the mean, as in the reference.)
    z_other = rng.randn(2, cfg.z_dim).astype(np.float32)
    vids0b = generate_videos(G, variables, z_other, c, ts, motion_z=mz,
                             noise_mode="none", truncation_psi=0.0)
    np.testing.assert_allclose(vids0, vids0b, atol=1e-5)

    vids1 = generate_videos(G, variables, z, c, ts, motion_z=mz,
                            noise_mode="none", truncation_psi=1.0)
    assert np.abs(vids1[0] - vids1[1]).max() > 1e-4     # z matters at psi=1
