#!/usr/bin/env python
"""Export a trained generator to a serialized StableHLO serving artifact.

The reference ships live-module torch pickles and needs the model source
tree at load time (reference legacy.py:13-60, generate.py). The TPU-native
serving path is ahead-of-time: `jax.export` lowers the full synthesis
program (weights baked in as constants) to portable StableHLO bytes that
any JAX/XLA host — TPU or CPU — can deserialize and execute WITHOUT the
model code, flax, or the Python config tree.

    python scripts/export_model.py --ckpt <snapshot|run-dir|reference.pkl> \
        --out model.jaxexport --batch 4 --video-len 16 [--truncation 1.0] \
        [--platforms tpu,cpu] [--selftest]

The artifact takes (z [B, z_dim] f32, [c [B, c_dim] f32,] t [B, T] f32,
seed i32) and returns frames [B, T, H, W, img_channels] f32 in [-1, 1];
`seed` drives the motion-noise draw so one artifact serves arbitrarily
many distinct videos. The motion-code lattice is pre-sized for timestamps
up to --max-t (default: video-len; recorded as `t_max` in the sidecar) —
the same static-trajectory contract as generate.py, which sizes it from
t.max(). A sidecar <out>.json records the full I/O contract.

Verified end-to-end on BOTH backends: the CPU roundtrip in
tests/test_export_cli.py, and on the attached TPU chip (single- and
multi-platform artifacts deserialize and execute with finite output).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_export(G, variables, batch: int, video_len: int, truncation: float,
                 platforms, max_t: float | None = None):
    """Returns (exported, ref_fn): the jax.export artifact and the exact
    reference callable it was lowered from (for parity selftests)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    from stylegan_v_tpu.models.motion import MotionMappingNetwork

    cfg = G.cfg
    cond = cfg.c_dim > 0
    # Pre-size the motion lattice for the served timestamp range — relying
    # on the motion_z=None default would size it from sampling.
    # max_num_frames alone and silently clamp (freeze) motion past it
    # (models/motion.py required_traj_len / lattice gather).
    max_t = float(video_len if max_t is None else max_t)
    L = MotionMappingNetwork.required_traj_len(cfg, max_t)

    def synth(z, c, t, seed):
        key = jax.random.PRNGKey(seed)
        mz = jax.random.normal(key, (z.shape[0], L, cfg.motion.z_dim))
        img = G.apply(variables, z, c, t, motion_z=mz, noise_mode="const",
                      truncation_psi=truncation,
                      rngs={"motion": jax.random.fold_in(key, 1)})
        # [B*T, H, W, C] -> [B, T, H, W, C]
        return img.reshape(z.shape[0], t.shape[1], *img.shape[1:])

    z_spec = jax.ShapeDtypeStruct((batch, cfg.z_dim), jnp.float32)
    t_spec = jax.ShapeDtypeStruct((batch, video_len), jnp.float32)
    s_spec = jax.ShapeDtypeStruct((), jnp.int32)
    if cond:
        # conditional: one-hot (or soft) labels are a served input
        c_spec = jax.ShapeDtypeStruct((batch, cfg.c_dim), jnp.float32)
        fn = jax.jit(synth)
        exported = jexport.export(fn, platforms=platforms)(
            z_spec, c_spec, t_spec, s_spec)
        return exported, fn
    fn = jax.jit(lambda z, t, seed: synth(z, None, t, seed))
    exported = jexport.export(fn, platforms=platforms)(
        z_spec, t_spec, s_spec)
    return exported, fn


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True,
                    help="orbax snapshot dir, run dir, or reference .pkl")
    ap.add_argument("--out", required=True, help="output artifact path")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--video-len", type=int, default=16)
    ap.add_argument("--max-t", type=float, default=None,
                    help="largest timestamp the artifact must serve "
                         "(sizes the motion lattice; default: video-len)")
    ap.add_argument("--truncation", type=float, default=1.0)
    ap.add_argument("--platforms", default=None,
                    help="comma-separated lowering platforms (e.g. tpu,cpu); "
                         "default: the current backend only")
    ap.add_argument("--selftest", action="store_true",
                    help="deserialize the artifact and check it reproduces "
                         "the direct forward pass")
    args = ap.parse_args()

    import jax
    from generate import load_any_checkpoint, pick_best_checkpoint

    path = args.ckpt
    if os.path.isdir(path) and not os.path.basename(
            path.rstrip("/")).startswith("network-snapshot-"):
        found = pick_best_checkpoint(path)     # run dir -> best/latest snap
        assert found, f"no snapshot found under {path}"
        path = found
    G, variables = load_any_checkpoint(path)

    platforms = (tuple(p.strip() for p in args.platforms.split(","))
                 if args.platforms else None)
    exported, ref_fn = build_export(G, variables, args.batch, args.video_len,
                                    args.truncation, platforms,
                                    max_t=args.max_t)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    inputs = {"z": [args.batch, G.cfg.z_dim]}
    if G.cfg.c_dim > 0:
        inputs["c"] = [args.batch, G.cfg.c_dim]
    inputs["t"] = [args.batch, args.video_len]
    inputs["seed"] = []
    meta = {
        "inputs": inputs,
        "output": [args.batch, args.video_len, G.cfg.img_resolution,
                   G.cfg.img_resolution, G.cfg.img_channels],
        "range": [-1.0, 1.0],
        "t_max": float(args.video_len if args.max_t is None else args.max_t),
        "truncation": args.truncation,
        "platforms": list(exported.platforms),
    }
    with open(args.out + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    print(f"exported {len(blob) / 1e6:.1f} MB StableHLO artifact to "
          f"{args.out} (platforms {list(exported.platforms)})")

    if args.selftest:
        from jax import export as jexport
        import jax.numpy as jnp
        with open(args.out, "rb") as f:
            loaded = jexport.deserialize(bytearray(f.read()))
        rng = np.random.RandomState(0)
        z = jnp.asarray(rng.randn(args.batch, G.cfg.z_dim), jnp.float32)
        t = jnp.tile(jnp.arange(args.video_len, dtype=jnp.float32)[None],
                     (args.batch, 1))
        seed = jnp.asarray(7, jnp.int32)
        if G.cfg.c_dim > 0:
            c = jnp.zeros((args.batch, G.cfg.c_dim), jnp.float32)
            c = c.at[:, 0].set(1.0)
            inputs = (z, c, t, seed)
        else:
            inputs = (z, t, seed)
        got = np.asarray(jax.jit(loaded.call)(*inputs))
        # reference = the exact jitted fn the artifact was lowered from
        want = np.asarray(ref_fn(*inputs))
        err = np.abs(got - want).max()
        # bf16 synthesis blocks fuse/round differently across the two
        # compiles; fp32 models should agree to float-assoc noise
        tol = 1e-4 if G.cfg.num_bf16_res == 0 else 0.05
        assert err < tol, f"selftest mismatch: {err} (tol {tol})"
        print(f"selftest OK: artifact output matches direct forward "
              f"(max abs err {err:.2e})")


if __name__ == "__main__":
    main()
