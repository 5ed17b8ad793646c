#!/usr/bin/env python
"""Video sampling CLI (reference src/scripts/generate.py).

Generates videos from a checkpoint — either a native Orbax snapshot
(auto-selected 'latest', or the best by fvd metric jsonl when available) or a
reference network-snapshot .pkl (imported via the exec-free unpickler).

Capabilities mirrored: arbitrary video length with one shared motion
trajectory per clip, fractional-t slow-mo, grid mp4s, per-video mp4s or
frame folders, motion-content decomposition (same motion across a row,
same content across a column).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pick_best_checkpoint(networks_dir: str, metric: str = "fvd2048_16f"):
    """argmin over metric-<name>.jsonl (reference generate.py:63-75)."""
    jsonl = os.path.join(networks_dir, f"metric-{metric}.jsonl")
    if os.path.exists(jsonl):
        best, best_v = None, float("inf")
        with open(jsonl) as f:
            for line in f:
                rec = json.loads(line)
                v = list(rec.get("results", {}).values())
                if v and v[0] < best_v:
                    best_v = v[0]
                    best = rec.get("snapshot")
        if best:
            return os.path.join(networks_dir, best)
    from stylegan_v_tpu.io import find_latest_snapshot
    return find_latest_snapshot(networks_dir)


def load_any_checkpoint(path: str):
    """Returns (Generator module, variables). Supports Orbax dirs and
    reference .pkl snapshots."""
    from stylegan_v_tpu.models import Generator

    if path.endswith(".pkl"):
        from stylegan_v_tpu.io import (convert_generator_state,
                                       flatten_module_state, load_network_pkl)
        from stylegan_v_tpu.io.legacy import StubModule, infer_generator_config
        data = load_network_pkl(path)
        stub = data.get("G_ema") or data.get("G")
        assert isinstance(stub, StubModule), "no generator found in pkl"
        gcfg = infer_generator_config(stub)
        variables = convert_generator_state(flatten_module_state(stub))
        print(f"  imported reference pkl: {gcfg.img_resolution}^2, "
              f"w_dim {gcfg.w_dim}")
        return Generator(gcfg), variables
    else:
        from stylegan_v_tpu.io import load_snapshot
        from stylegan_v_tpu.io.checkpoint import meta_decode
        from stylegan_v_tpu.models import (GeneratorConfig, MotionConfig,
                                           SamplingConfig, TimeEncConfig)
        restored, meta = load_snapshot(path)
        registry = {c.__name__: c for c in
                    (GeneratorConfig, MotionConfig, SamplingConfig, TimeEncConfig)}
        gcfg = meta_decode(meta["configs"]["G"], registry)
        G = Generator(gcfg)
        params = restored["params_Gema"] if isinstance(restored, dict) else restored.params_Gema
        extra = restored["extra_Gema"] if isinstance(restored, dict) else restored.extra_Gema
        variables = {"params": params, **(extra or {})}
        return G, variables


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--networks-dir", help="run dir with snapshots + metric jsonls")
    ap.add_argument("--network", help="explicit checkpoint path")
    ap.add_argument("--output-dir", "-o", required=True)
    ap.add_argument("--num-videos", type=int, default=9)
    ap.add_argument("--video-len", type=int, default=16)
    ap.add_argument("--fps", type=float, default=25.0)
    ap.add_argument("--slowmo", type=float, default=1.0,
                    help="fractional-t slow-motion factor (reference generate.py:113)")
    ap.add_argument("--time-offset", type=float, default=0.0)
    ap.add_argument("--truncation-psi", type=float, default=0.9)
    ap.add_argument("--noise-mode", default="const",
                    choices=["const", "random", "none"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--class-idx", type=int, default=None,
                    help="class label for conditional models (omit = random)")
    ap.add_argument("--as-grids", action="store_true",
                    help="one grid mp4 instead of per-video mp4s")
    ap.add_argument("--save-as-frames", action="store_true")
    ap.add_argument("--moco-decomposition", action="store_true",
                    help="3x3 panel: same motion across rows, same content "
                         "across columns (reference generate.py:115-123)")
    ap.add_argument("--batch-size-num-frames", type=int, default=100)
    ap.add_argument("--frame-shards", type=int, default=1,
                    help="shard the frame axis over a 2-D (data x frame) "
                         "device mesh for long clips — the context-parallel "
                         "analog (SURVEY §5.7): frames are independent given "
                         "(ws, motion codes). num-videos must divide the "
                         "data axis and video-len the frame axis.")
    args = ap.parse_args()

    from stylegan_v_tpu.training.video_io import (
        generate_videos, save_video_frames_as_frames_parallel,
        save_video_frames_as_mp4, videos_as_grids)
    from stylegan_v_tpu.models.motion import MotionMappingNetwork

    path = args.network or pick_best_checkpoint(args.networks_dir)
    assert path, "no checkpoint found"
    print(f"Loading {path}")
    G, variables = load_any_checkpoint(path)

    n = args.num_videos
    rng = np.random.RandomState(args.seed)
    z = rng.randn(n, G.cfg.z_dim).astype(np.float32)
    ts = (args.time_offset
          + np.tile(np.arange(args.video_len, dtype=np.float32)[None], (n, 1))
          / args.slowmo)
    c = None
    if G.cfg.c_dim > 0:
        idx = (np.full(n, args.class_idx) if args.class_idx is not None
               else rng.randint(G.cfg.c_dim, size=n))
        c = np.eye(G.cfg.c_dim, dtype=np.float32)[idx]

    motion_z = None
    if args.moco_decomposition and G.cfg.has_motion:
        k = int(np.sqrt(n))
        assert k * k == n, "--moco-decomposition requires a square num-videos"
        L = MotionMappingNetwork.required_traj_len(G.cfg, float(ts.max()))
        row_motion = rng.randn(k, L, G.cfg.motion.z_dim).astype(np.float32)
        motion_z = np.repeat(row_motion, k, axis=0)       # same motion per row
        z = np.tile(z[:k], (k, 1))                        # same content per col

    print(f"Generating {n} videos x {args.video_len} frames...")
    if args.frame_shards > 1:
        # 2-D mesh synthesis: videos over 'data', frames over 'frame' — ONE
        # jitted program for the whole [V, T] grid instead of the chunked
        # host loop (reference logging.py:44's chunking re-expressed as
        # sharding). The shared motion trajectory keeps chunk-free temporal
        # coherence by construction.
        import jax
        from stylegan_v_tpu.parallel import create_mesh, sharded_generate_frames
        f = args.frame_shards
        ndev = len(jax.devices())
        assert ndev % f == 0, f"{ndev} devices not divisible by frame shards {f}"
        mesh = create_mesh(frame=f)
        d = int(mesh.shape["data"])
        assert n % d == 0 and args.video_len % f == 0, (
            f"num-videos {n} / video-len {args.video_len} must divide the "
            f"{d}x{f} (data x frame) mesh")
        if motion_z is None and G.cfg.has_motion:
            L = MotionMappingNetwork.required_traj_len(G.cfg, float(ts.max()))
            motion_z = rng.randn(n, L, G.cfg.motion.z_dim).astype(np.float32)
        frames = sharded_generate_frames(
            G, variables, z, c, ts, motion_z, mesh,
            noise_mode=args.noise_mode, truncation_psi=args.truncation_psi)
        videos = np.clip(np.asarray(frames) * 0.5 + 0.5, 0.0, 1.0)
    else:
        videos = generate_videos(G, variables, z, c, ts, motion_z=motion_z,
                                 noise_mode=args.noise_mode,
                                 truncation_psi=args.truncation_psi,
                                 batch_size_num_frames=args.batch_size_num_frames,
                                 seed=args.seed)

    os.makedirs(args.output_dir, exist_ok=True)
    if args.as_grids or args.moco_decomposition:
        grids = videos_as_grids(videos)
        out = os.path.join(args.output_dir, "grid.mp4")
        save_video_frames_as_mp4(grids, args.fps, out)
        print(f"Wrote {out}")
    elif args.save_as_frames:
        for i in range(n):
            save_video_frames_as_frames_parallel(
                videos[i], os.path.join(args.output_dir, f"video{i:04d}"))
        print(f"Wrote {n} frame folders to {args.output_dir}")
    else:
        for i in range(n):
            save_video_frames_as_mp4(
                videos[i], args.fps,
                os.path.join(args.output_dir, f"video{i:04d}.mp4"))
        print(f"Wrote {n} mp4s to {args.output_dir}")


if __name__ == "__main__":
    main()
