"""Training telemetry: moment-accumulator statistics + Collector.

Behavioral parity with reference src/torch_utils/training_stats.py: every
reported quantity is reduced to [count, sum, sum-of-squares] moments so means
and stds can be aggregated exactly across steps (and, in the reference,
across ranks via one all_reduce, training_stats.py:254-266).

JAX design: the jitted train step already returns GLOBALLY-reduced scalar
stats (means over the sharded batch — XLA inserts the cross-chip psum), so
the Collector only aggregates across TIME on the host. `report()` accepts
scalars or arrays and accumulates moments.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class Collector:
    """Aggregates per-step stat dicts into mean/std over a collection window
    (reference training_stats.Collector, training_stats.py:113-230)."""

    def __init__(self, regex: str = ".*", keep_previous: bool = True):
        import re
        self._regex = re.compile(regex)
        self._keep_previous = keep_previous
        self._moments: Dict[str, np.ndarray] = {}
        self._cumulative: Dict[str, np.ndarray] = {}

    def report(self, name: str, value) -> None:
        """Accumulate [count, sum, sum_sq] moments for `name`."""
        arr = np.asarray(value, dtype=np.float64).reshape(-1)
        arr = arr[np.isfinite(arr)]
        m = np.array([arr.size, arr.sum(), np.square(arr).sum()], np.float64)
        if name in self._moments:
            self._moments[name] += m
        else:
            self._moments[name] = m

    def update(self, stats: Optional[Dict] = None) -> None:
        if stats:
            for k, v in stats.items():
                self.report(k, v)

    def update_moments(self, name: str, moments: np.ndarray) -> None:
        """Merge pre-reduced [count, sum, sum_sq] moments (exact composition,
        reference training_stats.py:56-99 invariant)."""
        m = np.asarray(moments, np.float64)
        if name in self._moments:
            self._moments[name] += m
        else:
            self._moments[name] = m.copy()

    def names(self):
        return [n for n in self._moments if self._regex.fullmatch(n)]

    def _get(self, name):
        return self._moments.get(name, np.zeros(3))

    def num(self, name) -> int:
        return int(self._get(name)[0])

    def mean(self, name) -> float:
        m = self._get(name)
        return float(m[1] / m[0]) if m[0] > 0 else float("nan")

    def std(self, name) -> float:
        m = self._get(name)
        if m[0] == 0 or not np.isfinite(m[1] / m[0]):
            return float("nan")
        if m[0] == 1:
            return 0.0
        mean = m[1] / m[0]
        raw_var = m[2] / m[0]
        return float(np.sqrt(max(raw_var - mean ** 2, 0)))

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        """{name: {mean, std, num}} like the reference's EasyDict export
        (training_stats.py:216-230)."""
        return {name: dict(mean=self.mean(name), std=self.std(name),
                           num=self.num(name))
                for name in self.names()}

    def reset(self) -> None:
        self._moments = {}


class DeviceStatsAccumulator:
    """Accumulates per-step scalar stats ON DEVICE: one fused async dispatch
    per step, one host readback per tick.

    Replaces the per-step `float(v)` sync (the JAX analog of the reference
    Collector's per-update GPU->CPU transfer, training_stats.py:147-168):
    blocking on every step's device scalars serializes dispatch against
    compute — and on a tunneled attachment pays the round-trip latency per
    step. Moments are [finite_count, sum, sum_sq] per name, so draining into
    a `Collector` is exact.

    Key sets differ per program variant (Gpl/Dr1 steps add stats); each
    distinct key set gets its own accumulator tree and jitted add program
    (a handful of cached variants).
    """

    def __init__(self):
        self._acc: Dict[frozenset, Dict] = {}
        self._add = None

    def _add_fn(self):
        if self._add is None:
            import jax
            import jax.numpy as jnp

            def add(acc, stats):
                out = {}
                for k, (cnt, s, sq) in acc.items():
                    v = stats[k].astype(jnp.float32)
                    ok = jnp.isfinite(v)
                    v = jnp.where(ok, v, 0.0)
                    out[k] = (cnt + ok.astype(jnp.float32), s + v, sq + v * v)
                return out

            # no donation: these are O(10) scalars and CPU backends warn on
            # unused donations
            self._add = jax.jit(add)
        return self._add

    def update(self, stats: Dict) -> None:
        import jax.numpy as jnp
        key = frozenset(stats)
        if key not in self._acc:
            z = jnp.zeros((), jnp.float32)
            self._acc[key] = {k: (z, z, z) for k in stats}
        self._acc[key] = self._add_fn()(self._acc[key], stats)

    def drain_into(self, collector: "Collector") -> None:
        """Fetch all accumulated moments (ONE host sync) and merge them into
        the collector; resets the accumulator."""
        import jax
        if not self._acc:
            return
        host = jax.device_get(list(self._acc.values()))
        self._acc = {}
        for tree in host:
            for name, (cnt, s, sq) in tree.items():
                collector.update_moments(
                    name, np.array([cnt, s, sq], np.float64))


class StatsJsonlWriter:
    """stats.jsonl sink (reference training_loop.py:531-535 format)."""

    def __init__(self, run_dir: str, fname: str = "stats.jsonl"):
        os.makedirs(run_dir, exist_ok=True)
        self._f = open(os.path.join(run_dir, fname), "at")

    def write(self, stats_dict: Dict, timestamp: Optional[float] = None) -> None:
        payload = dict(stats_dict)
        payload["timestamp"] = time.time() if timestamp is None else timestamp
        self._f.write(json.dumps(payload) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


class TensorboardWriter:
    """Optional tensorboardX sink (reference training_loop.py:308-316, 536-542)."""

    def __init__(self, run_dir: str):
        try:
            from tensorboardX import SummaryWriter
            self._w = SummaryWriter(run_dir)
        except Exception:
            self._w = None

    def add_scalars(self, collector: Collector, global_step: int) -> None:
        if self._w is None:
            return
        for name in collector.names():
            self._w.add_scalar(name, collector.mean(name), global_step)

    def add_text(self, tag: str, text: str, global_step: int = 0) -> None:
        if self._w is not None:
            self._w.add_text(tag, text, global_step)

    def flush(self):
        if self._w is not None:
            self._w.flush()
