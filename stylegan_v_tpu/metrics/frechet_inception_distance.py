"""FID (reference src/metrics/frechet_inception_distance.py; math matches
Heusel et al. TTUR)."""
from __future__ import annotations

import numpy as np
import scipy.linalg

from . import metric_utils

NUM_FRAMES_IN_BATCH = {128: 32, 256: 32, 512: 8, 1024: 2}


def frechet_distance(mu_real, sigma_real, mu_gen, sigma_gen) -> float:
    m = np.square(mu_gen - mu_real).sum()
    s, _ = scipy.linalg.sqrtm(np.dot(sigma_gen, sigma_real), disp=False)
    return float(np.real(m + np.trace(sigma_gen + sigma_real - s * 2)))


def compute_fid(opts, max_real, num_gen, detector_name: str = "inception") -> float:
    detector_kwargs = dict(return_features=True)
    resolution = opts.dataset_kwargs.get("resolution") or 256
    batch_size = NUM_FRAMES_IN_BATCH.get(resolution, 32)

    mu_real, sigma_real = metric_utils.compute_feature_stats_for_dataset(
        opts=opts, detector_name=detector_name, detector_kwargs=detector_kwargs,
        capture_mean_cov=True, max_items=max_real,
        use_image_dataset=True).get_mean_cov()

    if opts.generator_as_dataset:
        stats = metric_utils.compute_feature_stats_for_dataset(
            opts=metric_utils.rewrite_opts_for_gen_dataset(opts),
            detector_name=detector_name, detector_kwargs=detector_kwargs,
            capture_mean_cov=True, max_items=num_gen, use_image_dataset=True)
    else:
        stats = metric_utils.compute_feature_stats_for_generator(
            opts=opts, detector_name=detector_name, detector_kwargs=detector_kwargs,
            batch_size=batch_size, num_video_frames=1,
            capture_mean_cov=True, max_items=num_gen)
    mu_gen, sigma_gen = stats.get_mean_cov()

    if opts.rank != 0:
        return float("nan")
    return frechet_distance(mu_real, sigma_real, mu_gen, sigma_gen)
