"""Small runtime utilities (capability parity with reference src/dnnlib/util.py and
src/torch_utils/misc.py, re-imagined for JAX).

Reference parity map:
  * EasyDict                  — reference dnnlib/util.py:40
  * assert_shape              — reference torch_utils/misc.py:80 (works on jnp/np arrays
                                and traced values; symbolic dims pass through)
  * format_time               — reference dnnlib/util.py:142
  * nan_to_num                — reference torch_utils/misc.py:46 (jnp native)
"""
from __future__ import annotations

import os
from typing import Any, List, Optional, Sequence


class EasyDict(dict):
    """dict with attribute access; mirrors reference dnnlib.EasyDict (util.py:40-56)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        del self[name]


def assert_shape(x, ref_shape: Sequence[Optional[int]]) -> None:
    """Assert that an array matches the given shape; None entries are wildcards.

    Mirrors reference torch_utils/misc.py:80-94. Works under jit because shapes
    are static in JAX traces.
    """
    if x.ndim != len(ref_shape):
        raise AssertionError(f"Wrong number of dimensions: got {x.ndim}, expected {len(ref_shape)}")
    for idx, (size, ref_size) in enumerate(zip(x.shape, ref_shape)):
        if ref_size is None:
            continue
        if int(size) != int(ref_size):
            raise AssertionError(f"Wrong size for dimension {idx}: got {size}, expected {ref_size}")


def format_time(seconds: float) -> str:
    """Human readable elapsed time; mirrors reference dnnlib/util.py:142-153."""
    s = int(round(seconds))
    if s < 60:
        return f"{s}s"
    if s < 60 * 60:
        return f"{s // 60}m {s % 60:02d}s"
    if s < 24 * 60 * 60:
        return f"{s // (60 * 60)}h {(s // 60) % 60:02d}m {s % 60:02d}s"
    return f"{s // (24 * 60 * 60)}d {(s // (60 * 60)) % 24:02d}h {(s // 60) % 60:02d}m"


def nan_to_num(x, nan=0.0, posinf=None, neginf=None):
    """jnp nan/inf scrub; mirrors reference torch_utils/misc.py:46-56."""
    import jax.numpy as jnp

    return jnp.nan_to_num(x, nan=nan, posinf=posinf, neginf=neginf)


def parse_scaling(scaling) -> List[int]:
    """Parse up/down factor into [x, y]; mirrors reference ops/upfirdn2d.py:22-30."""
    if isinstance(scaling, int):
        scaling = [scaling, scaling]
    sx, sy = scaling
    assert sx >= 1 and sy >= 1
    return [int(sx), int(sy)]


def parse_padding(padding) -> List[int]:
    """Parse padding into [x0, x1, y0, y1]; mirrors reference ops/upfirdn2d.py:33-44."""
    if isinstance(padding, int):
        padding = [padding, padding]
    padding = list(padding)
    if len(padding) == 2:
        px, py = padding
        padding = [px, px, py, py]
    px0, px1, py0, py1 = padding
    return [int(px0), int(px1), int(py0), int(py1)]


def enable_compile_cache(cache_dir: Optional[str] = None,
                         min_compile_secs: float = 5.0) -> str:
    """Enable JAX's persistent compilation cache (idempotent).

    The large programs here (train step with the ADA pipe, fused
    G+detector metric extraction, I3D features) take minutes to compile;
    over a tunnel-attached chip the compile runs on the local host and a
    killed/restarted run pays it again. The persistent cache keys on
    HLO + compile options, so code or shape changes recompile as usual.
    No reference counterpart (torch extensions cache objects per source
    hash, reference torch_utils/custom_ops.py); this is the XLA analog.
    Call BEFORE the first jit dispatch. Returns the cache dir used.
    """
    import jax
    if cache_dir is None:
        cache_dir = os.path.join(os.path.expanduser("~"), ".cache",
                                 "stylegan_v_tpu", "xla-cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return cache_dir
