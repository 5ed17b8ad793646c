"""Host-side infinite data pipeline: sampler + threaded decode + prefetch.

Replaces the reference's torch DataLoader worker processes + InfiniteSampler
(reference misc.py:110-141, training_loop.py:149-151, 330-348) with a
thread-pool pipeline on the TPU-VM host (JPEG decode releases the GIL in
PIL, so threads scale; no fork overhead, no tensor IPC).

Produces exactly the train-step batch dict:
    real_img [B,F,H,W,C] u8 | real_c [B,c] | real_t [B,F]
    gen_c [B,P,c] | gen_t [B,P,F]   (P = Gmain, Greg, Dmain draws,
                                     reference training_loop.py:338-348)
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from ..models.config import SamplingConfig
from .dataset import VideoFramesFolderDataset
from .sampling import sample_frames


def infinite_indices(n: int, rank: int = 0, num_replicas: int = 1,
                     shuffle: bool = True, seed: int = 0,
                     window_size: float = 0.5) -> Iterator[int]:
    """Infinite shuffled rank-strided index stream with windowed reshuffle
    (reference misc.py:110-141 InfiniteSampler semantics)."""
    assert n > 0
    order = np.arange(n)
    rnd = None
    window = 0
    if shuffle:
        rnd = np.random.RandomState(seed)
        rnd.shuffle(order)
        window = int(np.rint(order.size * window_size))

    idx = 0
    while True:
        i = idx % order.size
        if idx % num_replicas == rank:
            yield int(order[i])
        if window >= 2:
            j = (i - rnd.randint(window)) % order.size
            order[i], order[j] = order[j], order[i]
        idx += 1


class TrainingDataLoader:
    """Threaded prefetching loader over a VideoFramesFolderDataset.

    num_phases gen-draws per batch element (z is drawn on-device); timestamps
    come from `sample_frames` against per-item video lengths, with fractional
    offsets for the generator when configured (reference
    training_loop.py:345-346 use_fractional_t).
    """

    def __init__(self, dataset: VideoFramesFolderDataset, batch_size: int,
                 gen_sampling: Optional[SamplingConfig] = None,
                 use_fractional_t: bool = False, num_phases: int = 3,
                 rank: int = 0, num_replicas: int = 1, seed: int = 0,
                 num_workers: int = 4, prefetch: int = 4, shuffle: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.gen_sampling = gen_sampling or dataset.sampling
        self.use_fractional_t = use_fractional_t
        self.num_phases = num_phases
        self._index_iter = infinite_indices(len(dataset), rank=rank,
                                            num_replicas=num_replicas,
                                            seed=seed, shuffle=shuffle)
        self._index_lock = threading.Lock()
        self._rngs = [np.random.RandomState(seed * 1000 + rank * 100 + w + 1)
                      for w in range(num_workers)]
        self._queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(target=self._worker, args=(w,), daemon=True)
            for w in range(num_workers)]
        for t in self._threads:
            t.start()

    def _next_indices(self, k: int):
        with self._index_lock:
            return [next(self._index_iter) for _ in range(k)]

    def _make_batch(self, worker_id: int) -> Dict[str, np.ndarray]:
        rng = self._rngs[worker_id]
        ds = self.dataset
        B, P = self.batch_size, self.num_phases
        idxs = self._next_indices(B)
        items = [ds[i] for i in idxs]
        batch = {
            "real_img": np.stack([it["image"] for it in items]),
            "real_c": np.stack([it["label"] for it in items]).astype(np.float32),
            "real_t": np.stack([it["times"] for it in items]).astype(np.float32),
        }
        # gen draws: labels + video lengths from random dataset items
        # (reference training_loop.py:338-348).
        gen_idx = rng.randint(len(ds), size=(B * P,))
        gen_c = np.stack([ds.get_label(int(i)) for i in gen_idx]).astype(np.float32)
        gen_l = [min(ds.get_video_len(int(i)), self.gen_sampling.max_num_frames)
                 for i in gen_idx]
        gen_t = np.stack([
            sample_frames(self.gen_sampling, total_video_len=l,
                          use_fractional_t=self.use_fractional_t, rng=rng)
            for l in gen_l]).astype(np.float32)
        batch["gen_c"] = gen_c.reshape(B, P, -1)
        batch["gen_t"] = gen_t.reshape(B, P, -1)
        return batch

    def _worker(self, worker_id: int):
        while not self._stop.is_set():
            try:
                batch = self._make_batch(worker_id)
            except Exception as e:   # surface errors to the consumer
                self._queue.put(e)
                return
            while not self._stop.is_set():
                try:
                    self._queue.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        item = self._queue.get()
        if isinstance(item, Exception):
            raise item
        return item

    def close(self):
        self._stop.set()
        for t in self._threads:
            t.join(timeout=2)
