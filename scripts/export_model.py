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

The artifact takes (z [B, z_dim] f32, t [B, T] f32, seed i32) and returns
frames [B, T, H, W, 3] f32 in [-1, 1]; `seed` drives the motion-noise
draw so one artifact serves arbitrarily many distinct videos. A sidecar
<out>.json records the I/O contract.

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
                 platforms):
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    cfg = G.cfg
    cond = cfg.c_dim > 0

    def synth(z, c, t, seed):
        key = jax.random.PRNGKey(seed)
        img = G.apply(variables, z, c, t, noise_mode="const",
                      truncation_psi=truncation, rngs={"motion": key})
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
    else:
        fn = jax.jit(lambda z, t, seed: synth(z, None, t, seed))
        exported = jexport.export(fn, platforms=platforms)(
            z_spec, t_spec, s_spec)
    return exported


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True,
                    help="orbax snapshot dir, run dir, or reference .pkl")
    ap.add_argument("--out", required=True, help="output artifact path")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--video-len", type=int, default=16)
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
    exported = build_export(G, variables, args.batch, args.video_len,
                            args.truncation, platforms)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    meta = {
        "inputs": ({"z": [args.batch, G.cfg.z_dim],
                    "c": [args.batch, G.cfg.c_dim],
                    "t": [args.batch, args.video_len], "seed": []}
                   if G.cfg.c_dim > 0 else
                   {"z": [args.batch, G.cfg.z_dim],
                    "t": [args.batch, args.video_len], "seed": []}),
        "output": [args.batch, args.video_len, G.cfg.img_resolution,
                   G.cfg.img_resolution, 3],
        "range": [-1.0, 1.0],
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
            got = np.asarray(jax.jit(loaded.call)(z, c, t, seed))
        else:
            c = None
            got = np.asarray(jax.jit(loaded.call)(z, t, seed))
        key = jax.random.PRNGKey(7)
        want = G.apply(variables, z, c, t, noise_mode="const",
                       truncation_psi=args.truncation, rngs={"motion": key})
        want = np.asarray(want).reshape(got.shape)
        err = np.abs(got - want).max()
        assert err < 1e-4, f"selftest mismatch: {err}"
        print(f"selftest OK: artifact output matches direct forward "
              f"(max abs err {err:.2e})")


if __name__ == "__main__":
    main()
