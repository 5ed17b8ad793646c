"""Metric infrastructure: feature statistics, detector registry, sharded
feature extraction with on-disk caching.

Behavioral parity with reference src/metrics/metric_utils.py:
  * FeatureStats accumulates raw mean / covariance in float64
    (metric_utils.py:63-139) — byte-compatible math;
  * dataset feature stats are cached on disk keyed by a hash of all
    arguments (metric_utils.py:200-219);
  * items are round-robin sharded across replicas (metric_utils.py:230);
  * generator stats draw fresh z, labels from the dataset, and CONSECUTIVE
    timestamps t = range(0, F*subsample, subsample) (metric_utils.py:305-310),
    with uint8 quantization to mirror the data path (metric_utils.py:285).

Detector backends (replaces the TorchScript download cache,
metric_utils.py:45-59 — no egress in this environment):
  * 'torchscript': runs a user-supplied TorchScript file via CPU torch —
    numerically identical to the reference by construction. Files are looked
    up in $SGV_DETECTOR_DIR (or ./detectors) by canonical name.
  * 'stub': deterministic cheap features for tests/smoke runs.
"""
from __future__ import annotations

import hashlib
import os
import pickle
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import numpy as np


def _vlog(msg: str) -> None:
    """Opt-in stage telemetry (SGV_METRIC_VERBOSE=1): metric extraction over
    a tunnel-attached chip interleaves multi-minute jit compiles with slow
    host<->device transfers, and a silent 30-minute eval is indistinguishable
    from a hang without these lines. stderr, timestamped, flushed."""
    if os.environ.get("SGV_METRIC_VERBOSE"):
        import sys
        import time as _time
        print(f"[metric {_time.strftime('%H:%M:%S')}] {msg}",
              file=sys.stderr, flush=True)


@dataclass
class MetricOptions:
    """Mirrors reference MetricOptions (metric_utils.py:23-36)."""
    G: Any = None                      # models.Generator module def
    G_variables: Any = None            # its flax variables ('params' + extras)
    dataset_kwargs: Dict = field(default_factory=dict)
    gen_dataset_kwargs: Optional[Dict] = None
    generator_as_dataset: bool = False
    num_replicas: int = 1
    replica: int = 0
    rank: int = 0
    mesh: Any = None                   # jax Mesh: shard extraction over 'data'
    cache: bool = True
    cache_dir: Optional[str] = None
    detector_dir: Optional[str] = None
    verbose: bool = False
    progress: Optional[Callable] = None
    # CI-shrink overrides for metric item counts (used by the fvd_parity
    # harness to run the full pipeline on tiny inputs; None = metric default)
    max_real_override: Optional[int] = None
    num_gen_override: Optional[int] = None


class FeatureStats:
    """float64 moment accumulator (reference metric_utils.py:63-139)."""

    def __init__(self, capture_all: bool = False, capture_mean_cov: bool = False,
                 max_items: Optional[int] = None):
        self.capture_all = capture_all
        self.capture_mean_cov = capture_mean_cov
        self.max_items = max_items
        self.num_items = 0
        self.num_features = None
        self.all_features = None
        self.raw_mean = None
        self.raw_cov = None

    def set_num_features(self, num_features: int):
        if self.num_features is not None:
            assert num_features == self.num_features
        else:
            self.num_features = num_features
            self.all_features = []
            self.raw_mean = np.zeros([num_features], dtype=np.float64)
            self.raw_cov = np.zeros([num_features, num_features], dtype=np.float64)

    def is_full(self) -> bool:
        return self.max_items is not None and self.num_items >= self.max_items

    def append(self, x) -> None:
        x = np.asarray(x, dtype=np.float32)
        assert x.ndim == 2
        if self.max_items is not None and self.num_items + x.shape[0] > self.max_items:
            if self.num_items >= self.max_items:
                return
            x = x[:self.max_items - self.num_items]
        self.set_num_features(x.shape[1])
        self.num_items += x.shape[0]
        if self.capture_all:
            self.all_features.append(x)
        if self.capture_mean_cov:
            x64 = x.astype(np.float64)
            self.raw_mean += x64.sum(axis=0)
            self.raw_cov += x64.T @ x64

    def get_all(self) -> np.ndarray:
        assert self.capture_all
        return np.concatenate(self.all_features, axis=0)

    def get_mean_cov(self):
        assert self.capture_mean_cov
        mean = self.raw_mean / self.num_items
        cov = self.raw_cov / self.num_items - np.outer(mean, mean)
        return mean, cov

    def save(self, pkl_file: str) -> None:
        # atomic temp-file + os.replace, matching the reference's save
        # pattern (metric_utils.py:250-254) — a crash mid-write must never
        # leave a truncated pkl that later runs load and fail on
        import uuid
        os.makedirs(os.path.dirname(os.path.abspath(pkl_file)), exist_ok=True)
        temp_file = pkl_file + "." + uuid.uuid4().hex
        with open(temp_file, "wb") as f:
            pickle.dump(self.__dict__, f)
        os.replace(temp_file, pkl_file)

    @staticmethod
    def load(pkl_file: str) -> "FeatureStats":
        with open(pkl_file, "rb") as f:
            s = pickle.load(f)
        obj = FeatureStats(capture_all=s["capture_all"], max_items=s["max_items"])
        obj.__dict__.update(s)
        return obj

    # ------------------------- replica merging -------------------------
    #
    # The reference interleaves per-rank sample batches through a broadcast
    # ladder so every rank accumulates ALL items in dataset order
    # (metric_utils.py:103-113) and truncates at max_items globally. Here each
    # replica accumulates only its own strided subset (truncated locally with
    # replica_max_items, which reproduces the global cutoff), and the partial
    # stats are merged afterwards: moments add; captured features interleave
    # round-robin, restoring exact dataset order.

    @staticmethod
    def replica_max_items(total: int, num_replicas: int, replica: int) -> int:
        """How many strided items replica owns under the global truncation:
        replica r's i-th item sits at global interleaved position i*R + r,
        kept iff i*R + r < total."""
        return len(range(replica, total, num_replicas))

    @staticmethod
    def merge(stats_list) -> "FeatureStats":
        """Merge per-replica stats (replica order = list order)."""
        assert len(stats_list) > 0
        base = stats_list[0]
        out = FeatureStats(capture_all=base.capture_all,
                           capture_mean_cov=base.capture_mean_cov,
                           max_items=sum(s.num_items for s in stats_list))
        out.set_num_features(base.num_features)
        out.num_items = sum(s.num_items for s in stats_list)
        if base.capture_mean_cov:
            for s in stats_list:
                out.raw_mean += s.raw_mean
                out.raw_cov += s.raw_cov
        if base.capture_all:
            # round-robin interleave (replica r's item i -> position i*R+r,
            # skipping exhausted replicas), vectorized: lexsort by (i, r)
            # instead of a per-row Python loop over tens of thousands of rows
            nf = base.num_features or 0
            feats = [s.get_all() if s.num_items else
                     np.zeros((0, nf), np.float32) for s in stats_list]
            key_i = np.concatenate([np.arange(len(f)) for f in feats])
            key_r = np.concatenate([np.full(len(f), r)
                                    for r, f in enumerate(feats)])
            if key_i.size:
                order = np.lexsort((key_r, key_i))
                out.all_features = [np.concatenate(feats, axis=0)[order]]
            else:
                out.all_features = []
        return out

    def merge_across_processes(self) -> "FeatureStats":
        """Multi-host merge: allgather each process's partial stats and merge
        them in process order, so EVERY process returns identical full-dataset
        stats (the reference's interleave + rank-0 broadcast,
        metric_utils.py:103-113 / metric_main.py:52-59, as one collective)."""
        import jax
        if jax.process_count() == 1:
            return self
        from jax.experimental import multihost_utils as mh

        def gather64(a):
            """Lossless float64 allgather: jax demotes f64->f32 when x64 is
            disabled, so transport the raw bytes as int32 words."""
            words = np.ascontiguousarray(a, np.float64).view(np.int32)
            out = np.asarray(mh.process_allgather(words))
            return out.view(np.float64).reshape((-1,) + np.shape(a))

        # A rank whose strided share is zero items (dataset smaller than the
        # process count) has no feature dim yet — learn it from the peers
        # via an allgather of [num_items, num_features] so every rank keeps
        # participating in the collectives instead of crashing while the
        # others hang.
        meta = np.asarray(mh.process_allgather(np.asarray(
            [self.num_items, -1 if self.num_features is None
             else self.num_features], np.int32)))
        counts = meta[:, 0].reshape(-1)
        nf = int(meta[:, 1].max())
        if nf < 0:
            return self                   # no process appended anything
        if self.num_features is None:
            self.set_num_features(nf)
        assert self.num_features == nf, \
            f"feature-dim mismatch across processes: {self.num_features} vs {nf}"
        parts = []
        if self.capture_mean_cov:
            means = gather64(self.raw_mean)
            covs = gather64(self.raw_cov)
        if self.capture_all:
            local = (self.get_all() if self.num_items else
                     np.zeros((0, nf), np.float32))
            n_max = int(counts.max())
            pad = np.zeros((n_max - local.shape[0], nf), np.float32)
            gathered = np.asarray(mh.process_allgather(
                np.concatenate([local, pad], axis=0)))
        for r in range(len(counts)):
            s = FeatureStats(capture_all=self.capture_all,
                             capture_mean_cov=self.capture_mean_cov)
            s.set_num_features(nf)
            s.num_items = int(counts[r])
            if self.capture_mean_cov:
                s.raw_mean = means[r]
                s.raw_cov = covs[r]
            if self.capture_all:
                s.all_features = [gathered[r][:int(counts[r])]]
            parts.append(s)
        return FeatureStats.merge(parts)


# ----------------------------- detector registry -----------------------------

# canonical filenames for the reference detectors (download them once with
# scripts/download_detectors.py on a machine with egress)
DETECTOR_FILES = {
    "inception": "inception-2015-12-05.pt",
    "i3d": "i3d_torchscript.pt",
    "c3d_ucf101": "c3d_ucf101.pt",
}

_custom_detectors: Dict[str, Callable] = {}
_custom_detector_tags: Dict[str, str] = {}


def register_detector(name: str, builder: Callable,
                      cache_tag: Optional[str] = None) -> None:
    """Override detector `name` with a custom builder.

    cache_tag identifies THIS builder's feature space in the dataset-stats
    cache key. Two different custom detectors registered under the same
    name (e.g. random-weight I3Ds under different seeds) MUST pass distinct
    tags, or the second run silently reuses the first one's cached real
    stats and the resulting distance compares features from two different
    projections. Omitting it keeps the legacy shared 'custom' namespace.
    """
    _custom_detectors[name] = builder
    if cache_tag is not None:
        _custom_detector_tags[name] = cache_tag
    else:
        _custom_detector_tags.pop(name, None)


def _detector_search_dirs(opts: MetricOptions):
    dirs = []
    if opts.detector_dir:
        dirs.append(opts.detector_dir)
    if os.environ.get("SGV_DETECTOR_DIR"):
        dirs.append(os.environ["SGV_DETECTOR_DIR"])
    dirs.append(os.path.join(os.getcwd(), "detectors"))
    return dirs


def _stub_detector(name: str, **detector_kwargs) -> Callable:
    """Deterministic cheap features (the 'stub' backend): spatially pooled
    pixel statistics. Enabled via SGV_STUB_DETECTORS=1 — lets the full metric
    stack (sharding, caching, Frechet/KID/IS math, jsonl reporting) run
    end-to-end without any detector weight files. NOT comparable to real
    detector scores."""
    def features(x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.float64) / 255.0
        if x.ndim == 5:                          # video [N, T, H, W, C]
            return np.concatenate(
                [x.mean(axis=(1, 2, 3)), x.std(axis=(1, 2, 3)),
                 np.diff(x.mean(axis=(2, 3, 4)), axis=1)], axis=1)
        N, H, W, C = x.shape                     # image [N, H, W, C]
        p = max(H // 4, 1)
        x = x[:, :H // p * p, :W // p * p]
        x = x.reshape(N, p, H // p, p, W // p, C).mean(axis=(2, 4))
        return x.reshape(N, -1)
    return features


def get_detector(name: str, opts: MetricOptions, **detector_kwargs) -> Callable:
    """Returns features_fn(images uint8 [N,H,W,C] or [N,T,H,W,C]) -> [N, D]."""
    if name in _custom_detectors:
        return _custom_detectors[name](**detector_kwargs)
    if os.environ.get("SGV_STUB_DETECTORS"):
        return _stub_detector(name, **detector_kwargs)
    fname = DETECTOR_FILES.get(name, name)
    for d in _detector_search_dirs(opts):
        path = os.path.join(d, fname)
        if os.path.exists(path):
            if name == "inception" and os.environ.get("SGV_INCEPTION_FLAX"):
                import torch
                import jax
                from .detectors_flax.inception_v3 import (
                    InceptionV3, convert_inception_state_dict,
                    inception_features_fn)
                sd = torch.jit.load(path).state_dict()
                model = InceptionV3()
                import jax.numpy as jnp
                template = model.init(jax.random.PRNGKey(0),
                                      jnp.zeros((1, 299, 299, 3)))
                variables = convert_inception_state_dict(
                    {k: v.numpy() for k, v in sd.items()}, template)
                return inception_features_fn(variables, mesh=opts.mesh,
                                             **detector_kwargs)
            if name == "i3d" and os.environ.get("SGV_I3D_FLAX"):
                # native on-TPU feature extraction: convert the pytorch_i3d
                # weights into the flax InceptionI3d (architecture+converter
                # parity-tested; TorchScript execution remains the bit-exact
                # reference path)
                import torch
                from .detectors_flax import convert_i3d_state_dict, i3d_features_fn
                sd = torch.jit.load(path).state_dict()
                variables = convert_i3d_state_dict(
                    {k: v.numpy() for k, v in sd.items()})
                return i3d_features_fn(variables, mesh=opts.mesh,
                                       **detector_kwargs)
            if name == "c3d_ucf101" and os.environ.get("SGV_C3D_FLAX"):
                import torch
                from .detectors_flax import convert_c3d_state_dict, c3d_features_fn
                sd = torch.jit.load(path).state_dict()
                variables = convert_c3d_state_dict(
                    {k: v.numpy() for k, v in sd.items()})
                return c3d_features_fn(variables, mesh=opts.mesh,
                                       **detector_kwargs)
            return _torchscript_detector(path, name, **detector_kwargs)
    raise FileNotFoundError(
        f"Detector '{name}' ({fname}) not found in {_detector_search_dirs(opts)}. "
        f"Fetch it with scripts/download_detectors.py on a machine with network "
        f"access, or set SGV_DETECTOR_DIR.")


def _torchscript_detector(path: str, name: str, **detector_kwargs) -> Callable:
    """Run the reference TorchScript detector via CPU torch — numerically
    identical to the reference metric stack by construction: the raw uint8
    batch goes straight into the scripted module with the caller's kwargs
    verbatim, exactly like reference metric_utils.py:232-245 (all
    rescaling/resizing happens INSIDE the TorchScript, steered by kwargs
    such as the I3D's rescale=True, resize=True)."""
    import torch
    model = torch.jit.load(path).eval()

    def features(images: np.ndarray) -> np.ndarray:
        assert images.dtype == np.uint8
        with torch.no_grad():
            if images.ndim == 5:      # video: [N,T,H,W,C] -> [N,C,T,H,W]
                x = torch.from_numpy(
                    np.ascontiguousarray(images.transpose(0, 4, 1, 2, 3)))
            else:                     # image: [N,H,W,C] -> [N,C,H,W]
                x = torch.from_numpy(
                    np.ascontiguousarray(images.transpose(0, 3, 1, 2)))
            out = model(x, **detector_kwargs)
        return out.numpy()

    return features


# ------------------------------ feature loops ---------------------------------

def _cache_tag(opts: MetricOptions, dataset_kwargs: Dict, detector_name: str,
               stats_kwargs: Dict, extra: Dict) -> str:
    def stable(o):
        try:
            return repr(sorted(o.items())) if isinstance(o, dict) else repr(o)
        except Exception:
            return str(o)
    args = dict(dataset_kwargs={k: stable(v) for k, v in dataset_kwargs.items()},
                detector=detector_name, stats_kwargs=stats_kwargs, extra=extra)
    md5 = hashlib.md5(repr(sorted(args.items())).encode("utf-8")).hexdigest()
    name = os.path.splitext(os.path.basename(
        str(dataset_kwargs.get("path", "ds"))))[0]
    return f"{name}-{detector_name}-{md5}"


def _iter_items_threaded(dataset, indices, num_workers: int = 8,
                         prefetch: int = 32):
    """Yield dataset[idx] for idx in indices IN ORDER, decoding up to
    `prefetch` items ahead on a thread pool — the metric analog of the
    training loader's threaded decode (data/loader.py), hiding JPEG-decode
    latency behind the detector forward (the reference hides it in
    DataLoader workers, reference metric_utils.py:229-231). Order
    preservation keeps FeatureStats truncation and capture_all order
    identical to the serial loop."""
    if num_workers <= 1 or len(indices) <= 1:
        for idx in indices:
            yield dataset[idx]
        return
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=num_workers) as ex:
        pending = deque()
        it = iter(indices)
        for _ in range(min(prefetch, len(indices))):
            pending.append(ex.submit(dataset.__getitem__, next(it)))
        while pending:
            item = pending.popleft().result()
            nxt = next(it, None)
            if nxt is not None:
                pending.append(ex.submit(dataset.__getitem__, nxt))
            yield item


def _detector_backend_tag(name: str) -> str:
    """Cache-key backend class: 'stub' and 'custom' features must never
    share a cache entry with the real detectors ('real' covers both the
    TorchScript and flax paths — gated to <=1e-3 agreement by
    scripts/validate_detectors.py, so their dataset stats are
    interchangeable, matching the reference's single cache per detector)."""
    if name in _custom_detectors:
        tag = _custom_detector_tags.get(name)
        return f"custom:{tag}" if tag else "custom"
    if os.environ.get("SGV_STUB_DETECTORS"):
        return "stub"
    return "real"


def _make_dataset(dataset_kwargs: Dict, use_image_dataset: bool):
    from ..data import ImageFolderDataset, VideoFramesFolderDataset
    kwargs = dict(dataset_kwargs)
    if use_image_dataset:
        # frames-as-images adapter (reference dataset.py:469-481)
        keep = {"path", "use_labels", "xflip", "random_seed"}
        kwargs = {k: v for k, v in kwargs.items() if k in keep}
        return ImageFolderDataset(**kwargs)
    return VideoFramesFolderDataset(**kwargs)


def compute_feature_stats_for_dataset(
        opts: MetricOptions, detector_name: str, detector_kwargs: Dict,
        batch_size: int = 64, data_loader_kwargs=None, max_items=None,
        temporal_detector: bool = False, use_image_dataset: bool = False,
        feature_stats_cls=FeatureStats, **stats_kwargs) -> FeatureStats:
    """(reference metric_utils.py:189-257)."""
    dataset_kwargs = dict(opts.dataset_kwargs)
    if temporal_detector:
        dataset_kwargs.pop("sampling", None)

    import jax
    multi_process = (jax.process_count() > 1
                     and opts.num_replicas == jax.process_count())

    # A single-process caller with num_replicas>1 accumulates only its
    # PARTIAL strided share — those stats are cached under a replica-tagged
    # key so they can never poison the serial/full-stats cache entry
    # (multi-process runs merge to identical FULL stats on every process
    # before caching, so they share the canonical tag with serial runs,
    # matching the reference's all-ranks-accumulate design,
    # reference metric_utils.py:200-219).
    partial_stats = opts.num_replicas > 1 and not multi_process

    cache_file = None
    if opts.cache:
        cache_dir = opts.cache_dir or os.path.join(
            os.path.expanduser("~"), ".cache", "stylegan_v_tpu", "metric-stats")
        extra = dict(max_items=max_items, temporal=temporal_detector,
                     image=use_image_dataset,
                     backend=_detector_backend_tag(detector_name),
                     # preprocessing kwargs change the features (e.g. I3D
                     # rescale/resize) — they must invalidate the cache
                     detector_kwargs=repr(sorted(detector_kwargs.items())))
        if partial_stats:
            extra.update(num_replicas=opts.num_replicas, replica=opts.replica)
        tag = _cache_tag(opts, dataset_kwargs, detector_name, stats_kwargs,
                         extra)
        cache_file = os.path.join(cache_dir, tag + ".pkl")
        hit = os.path.isfile(cache_file)
        if multi_process:
            # all processes must agree on the cache decision (the reference's
            # rank-0 flag broadcast, metric_utils.py:211-215); shared FS.
            # Every rank sees the same allgathered flags, so a visibility
            # mismatch raises on EVERY rank together — raising only on the
            # ranks missing the file would let rank 0 proceed into the next
            # collective alone and deadlock the job.
            from jax.experimental import multihost_utils as mh
            flags = np.asarray(mh.process_allgather(
                np.asarray([int(hit)], np.int32))).reshape(-1)
            hit = bool(flags[0])
            if hit and not flags.all():
                missing = np.nonzero(flags == 0)[0].tolist()
                raise RuntimeError(
                    f"metric stats cache hit on process 0 but {cache_file} is "
                    f"not visible on process(es) {missing} — the cache dir "
                    f"must live on a filesystem shared by all hosts (set "
                    f"cache_dir / --cache-dir accordingly)")
        if hit:
            return feature_stats_cls.load(cache_file)

    dataset = _make_dataset(dataset_kwargs, use_image_dataset)
    if max_items is not None:
        num_items = min(len(dataset), max_items)
    else:
        num_items = len(dataset)

    # Each replica accumulates ONLY its strided share, truncated so the
    # round-robin union is exactly the first num_items in dataset order
    # (reference metric_utils.py:230 striding + global interleave cutoff).
    local_items = FeatureStats.replica_max_items(
        num_items, opts.num_replicas, opts.replica)
    stats = feature_stats_cls(max_items=local_items, **stats_kwargs)
    detector = get_detector(detector_name, opts, **detector_kwargs)

    # round-robin item sharding (reference metric_utils.py:230)
    item_subset = [(i * opts.num_replicas + opts.replica) % num_items
                   for i in range((num_items - 1) // opts.num_replicas + 1)]
    _vlog(f"real[{detector_name}]: {len(item_subset)} items, "
          f"batch {batch_size}")
    batch = []
    nb = 0
    for item in _iter_items_threaded(dataset, item_subset):
        img = item["image"]
        if not temporal_detector and img.ndim == 4:
            img = img[0]              # first frame for image detectors
        batch.append(img)
        if len(batch) == batch_size:
            stats.append(detector(np.stack(batch)))
            nb += 1
            if nb in (1, 2) or nb % 16 == 0:
                _vlog(f"real batch {nb} done ({stats.num_items} items)")
            batch = []
            if stats.is_full():
                break
    if batch and not stats.is_full():
        stats.append(detector(np.stack(batch)))
    _vlog(f"real[{detector_name}]: done ({stats.num_items} items)")
    dataset.close()

    if multi_process:
        # merge partial moments/features across hosts; every process returns
        # identical full-dataset stats (reference metric_utils.py:103-113).
        stats = stats.merge_across_processes()

    if cache_file is not None and (not multi_process or opts.replica == 0):
        stats.save(cache_file)
    return stats


def compute_feature_stats_for_generator(
        opts: MetricOptions, detector_name: str, detector_kwargs: Dict,
        batch_size: int = 16, num_video_frames: int = 16,
        subsample_factor: int = 1, temporal_detector: bool = False,
        max_items=None, noise_mode: str = "const", seed: int = 0,
        feature_stats_cls=FeatureStats, **stats_kwargs) -> FeatureStats:
    """Fresh z + dataset labels + consecutive timestamps -> G -> uint8 ->
    detector (reference metric_utils.py:260-331)."""
    import jax
    import jax.numpy as jnp

    G, variables = opts.G, opts.G_variables
    cfg = G.cfg
    dataset = _make_dataset(dict(opts.dataset_kwargs), use_image_dataset=False)

    multi_process = (jax.process_count() > 1
                     and opts.num_replicas == jax.process_count())
    local_items = max_items
    if max_items is not None and opts.num_replicas > 1:
        # each replica synthesizes its strided share of the num_gen quota
        local_items = FeatureStats.replica_max_items(
            max_items, opts.num_replicas, opts.replica)

    stats = feature_stats_cls(max_items=local_items, **stats_kwargs)
    detector = get_detector(detector_name, opts, **detector_kwargs)
    rng = np.random.RandomState(seed + opts.replica)
    key = jax.random.PRNGKey(seed * 1000 + opts.replica)

    ts_row = np.arange(num_video_frames, dtype=np.float32) * subsample_factor
    from ..models.motion import MotionMappingNetwork
    L = (MotionMappingNetwork.required_traj_len(cfg, float(ts_row.max()))
         if cfg.has_motion else 0)

    mesh = opts.mesh
    jittable = getattr(detector, "jittable", None)
    batch_videos = max(1, batch_size // num_video_frames)
    if local_items is not None:
        # never synthesize more videos per dispatch than the quota needs
        # (demo/CI runs with small num_gen overrides would otherwise pay the
        # full production batch, reference metric_utils.py:274 keeps the
        # fixed batch because its quotas are always >= one batch)
        batch_videos = min(batch_videos, max(int(local_items), 1))
    frame_shards = 1
    if mesh is not None:
        # round the video batch up to the data-axis size so every jit call
        # shards evenly over the mesh
        d = int(mesh.shape["data"])
        batch_videos = max(batch_videos // d, 1) * d
        # frame-axis (context-parallel analog) sharding: long-clip extraction
        # (fvd2048_128f) shards the T synthesized frames over the 'frame'
        # mesh axis — frames are independent given (ws, motion codes), so
        # synthesis needs no collectives (SURVEY §5.7; parallel/sharded_eval)
        frame_shards = int(dict(mesh.shape).get("frame", 1))
        if num_video_frames % frame_shards != 0:
            frame_shards = 1

    def synth_body(z, c, t, mz):
        img = G.apply(variables, z, c, t, motion_z=mz, noise_mode=noise_mode,
                      rngs={"motion": jax.random.PRNGKey(0),
                            "noise": jax.random.PRNGKey(1)})
        img = jnp.clip((img * 0.5 + 0.5) * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
        if temporal_detector:
            img = img.reshape(batch_videos, num_video_frames, *img.shape[1:])
        return img

    if (mesh is not None and jittable is not None
            and not os.environ.get("SGV_METRIC_NO_FUSE")):
        # the BASELINE north star: G synthesis AND detector forward fused in
        # ONE jitted program, batch sharded over the mesh 'data' axis.
        # SGV_METRIC_NO_FUSE=1 opts out: the fused program is the fastest
        # steady-state extractor but its one-off compile is the largest in
        # the repo, and on a 1-core tunnel host the unfused path (separate
        # synth jit + detector program, the latter usually already compiled
        # by the real-stats pass) reaches first results much sooner.
        @jax.jit
        def synth_feat(z, c, t, mz):
            return jittable(synth_body(z, c, t, mz))
        run = synth_feat
        run_mode = "fused"
    elif jittable is not None:
        # two programs with a device-resident handoff: all the throughput of
        # staying on-chip (no host round trip of the synthesized frames,
        # which over a tunnel attachment costs seconds per batch) at a
        # fraction of the fused program's compile time
        synth = jax.jit(synth_body)
        feat = jax.jit(jittable)

        def run(z, c, t, mz):
            return feat(synth(z, c, t, mz))
        run_mode = "two-program"
    else:
        synth = jax.jit(synth_body)

        def run(z, c, t, mz):
            return detector(np.asarray(synth(z, c, t, mz)))
        run_mode = "host-detector"

    from jax.sharding import NamedSharding, PartitionSpec
    put = ((lambda x: jax.device_put(x, NamedSharding(mesh, PartitionSpec("data"))))
           if mesh is not None else (lambda x: x))
    # timestamps shard [videos, frames] over (data, frame): the generator's
    # [B,T]->[B*T] flatten merges both sharded axes, so every synthesized
    # frame lands on its own mesh coordinate
    put_t = ((lambda x: jax.device_put(
                 x, NamedSharding(mesh, PartitionSpec("data", "frame"))))
             if mesh is not None and frame_shards > 1 else put)

    _vlog(f"gen[{detector_name}]: target {local_items} items, "
          f"batch {batch_videos} videos x {num_video_frames}f, "
          f"mode={run_mode}")
    nb = 0
    while not stats.is_full():
        key, sub = jax.random.split(key)
        z = put(jax.random.normal(sub, (batch_videos, cfg.z_dim)))
        if cfg.c_dim > 0:
            c = np.stack([dataset.get_label(rng.randint(len(dataset)))
                          for _ in range(batch_videos)]).astype(np.float32)
            c_j = put(jnp.asarray(c))
        else:
            c_j = None
        t = put_t(jnp.asarray(np.tile(ts_row[None], (batch_videos, 1))))
        mz = (put(jax.random.normal(jax.random.fold_in(key, 1),
                                    (batch_videos, L, cfg.motion.z_dim)))
              if cfg.has_motion else None)
        stats.append(np.asarray(run(z, c_j, t, mz)))
        nb += 1
        if nb in (1, 2) or nb % 16 == 0:
            _vlog(f"gen batch {nb} done ({stats.num_items} items)")
    _vlog(f"gen[{detector_name}]: done ({stats.num_items} items)")
    dataset.close()

    if multi_process:
        stats = stats.merge_across_processes()
    return stats


def rewrite_opts_for_gen_dataset(opts: MetricOptions) -> MetricOptions:
    """Evaluate a 'fake' dataset in place of the generator
    (reference metric_utils.py:39-46)."""
    import copy
    new = copy.copy(opts)
    assert opts.gen_dataset_kwargs is not None
    new.dataset_kwargs = opts.gen_dataset_kwargs
    new.cache = False
    return new
