"""Sharded video synthesis: the context-parallel analog for video GANs.

Frames are embarrassingly parallel given (ws, motion codes) — SURVEY §5.7 /
reference logging.py:44's chunked loop becomes a 2-D sharded program: videos
shard over the 'data' mesh axis and frames over the 'frame' axis, so one
jitted call synthesizes a [V, T] grid of frames across the whole pod with no
collectives in the hot path (only the motion-code gather broadcasts the
per-video trajectories, which sharding propagation handles over ICI).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_map_batched(fn, x, mesh: Mesh, batch_size: int,
                        extra_args: tuple = ()):
    """Apply `fn([N, ...]) -> [N, D]` (jit it at the CALLER — wrapping here
    would build a fresh jit cache per call) over a host array in data-sharded
    batches on the mesh (the metric-pipeline extraction path: detector
    forward runs under jit over the 'data' axis).

    Every batch, including the ragged tail, is padded to ONE static batch
    size by repeating the final item (a tail padded only to a multiple of
    the data-axis size would compile a second executable); padded rows are
    sliced off the output.
    """
    import numpy as np

    d = mesh.shape["data"]
    bs = max(batch_size // d, 1) * d
    sharding = NamedSharding(mesh, P("data"))
    out = []
    for i in range(0, len(x), bs):
        xb = np.asarray(x[i:i + bs])
        n = len(xb)
        if n < bs:
            xb = np.concatenate([xb, np.repeat(xb[-1:], bs - n, axis=0)],
                                axis=0)
        y = fn(jax.device_put(jnp.asarray(xb), sharding), *extra_args)
        out.append(np.asarray(y)[:n])
    return np.concatenate(out, axis=0)


def sharded_generate_frames(G, variables, z, c, ts, motion_z, mesh: Mesh,
                            noise_mode: str = "const",
                            truncation_psi: float = 1.0) -> jax.Array:
    """Synthesize frames for all (video, frame) pairs over the mesh.

    Args:
        z [V, z_dim]; c [V, c_dim] or None; ts [V, T]; motion_z [V, L, mz].
        mesh: ('data', 'frame') mesh; V % data == 0 and T % frame == 0.
    Returns [V, T, H, W, C] float32 in [-1, 1], sharded (data, frame).
    """
    V, T = ts.shape
    d, f = mesh.shape["data"], mesh.shape["frame"]
    assert V % d == 0 and T % f == 0, (
        f"videos {V} / frames {T} must divide mesh {dict(mesh.shape)}")

    vspec = NamedSharding(mesh, P("data"))
    tspec = NamedSharding(mesh, P("data", "frame"))
    rep = NamedSharding(mesh, P())

    z = jax.device_put(jnp.asarray(z), vspec)
    ts = jax.device_put(jnp.asarray(ts), tspec)
    c = None if c is None else jax.device_put(jnp.asarray(c), vspec)
    motion_z = jax.device_put(jnp.asarray(motion_z), vspec)
    variables = jax.device_put(variables, rep)

    @jax.jit
    def synth(variables, z, c, ts, motion_z):
        img = G.apply(variables, z, c, ts, motion_z=motion_z,
                      noise_mode=noise_mode, truncation_psi=truncation_psi,
                      rngs={"motion": jax.random.PRNGKey(0),
                            "noise": jax.random.PRNGKey(1)})
        # [V*T, H, W, C] -> [V, T, H, W, C]
        return img.reshape(V, T, *img.shape[1:])

    return synth(variables, z, c, ts, motion_z)
