"""Metric framework tests with a stub detector (no external detector files).

The stub = spatially-pooled pixel features; discriminative enough to check
the Frechet/KID/IS math, sharding, caching, and jsonl reporting end-to-end.
TorchScript-detector fidelity is by construction (the reference detectors are
executed verbatim via torch when their files are present).
"""
import json
import os

import numpy as np
import pytest

from stylegan_v_tpu.metrics import FeatureStats, MetricOptions, metric_main, register_detector
from stylegan_v_tpu.metrics.frechet_inception_distance import frechet_distance
from stylegan_v_tpu.metrics.metric_utils import (
    compute_feature_stats_for_dataset, compute_feature_stats_for_generator,
)
from test_data import build_video_dataset_dir, SAMPLING


def stub_image_detector(**kwargs):
    def features(images):                       # [N, H, W, C] uint8
        x = images.astype(np.float64) / 255.0
        N, H, W, C = x.shape
        x = x.reshape(N, 4, H // 4, 4, W // 4, C).mean(axis=(2, 4))
        return x.reshape(N, -1)
    return features


def stub_video_detector(**kwargs):
    def features(videos):                       # [N, T, H, W, C] uint8
        x = videos.astype(np.float64) / 255.0
        N = x.shape[0]
        return np.concatenate([x.mean(axis=(1, 2, 3)),     # color stats
                               x.std(axis=(1, 2, 3)),
                               np.diff(x.mean(axis=(2, 3, 4)), axis=1)], axis=1)
    return features


register_detector("stub_img", stub_image_detector)
register_detector("stub_vid", stub_video_detector)


def test_feature_stats_mean_cov_exact():
    rng = np.random.RandomState(0)
    x = rng.randn(500, 7)
    st = FeatureStats(capture_mean_cov=True, capture_all=True)
    for chunk in np.array_split(x, 13):
        st.append(chunk)
    mean, cov = st.get_mean_cov()
    x32 = x.astype(np.float32).astype(np.float64)
    np.testing.assert_allclose(mean, x32.mean(0), rtol=1e-10)
    np.testing.assert_allclose(cov, np.cov(x32.T, bias=True), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(st.get_all(), x, rtol=1e-6)


def test_feature_stats_max_items_truncation():
    st = FeatureStats(capture_all=True, max_items=10)
    st.append(np.ones((7, 3)))
    st.append(np.ones((7, 3)) * 2)
    assert st.num_items == 10 and st.is_full()
    assert st.get_all().shape == (10, 3)


def test_frechet_distance_identities():
    rng = np.random.RandomState(1)
    mu = rng.randn(5)
    A = rng.randn(5, 5)
    sigma = A @ A.T + np.eye(5)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6
    # shifting the mean by d adds |d|^2
    d = np.ones(5)
    assert abs(frechet_distance(mu, sigma, mu + d, sigma) - 5.0) < 1e-6


@pytest.fixture(scope="module")
def ds_path(tmp_path_factory):
    return build_video_dataset_dir(str(tmp_path_factory.mktemp("m")),
                                   num_videos=6, frames_per_video=20, res=16)


def dataset_kwargs(path):
    return dict(path=path, sampling=SAMPLING, max_num_frames=16)


def test_dataset_stats_and_cache(ds_path, tmp_path):
    opts = MetricOptions(dataset_kwargs=dataset_kwargs(ds_path),
                         cache_dir=str(tmp_path / "cache"))
    st = compute_feature_stats_for_dataset(
        opts, "stub_img", {}, capture_mean_cov=True, max_items=6,
        use_image_dataset=False, batch_size=3)
    mu, sigma = st.get_mean_cov()
    assert mu.shape[0] == 4 * 4 * 3
    # second call hits the cache (delete dataset -> still works)
    st2 = compute_feature_stats_for_dataset(
        opts, "stub_img", {}, capture_mean_cov=True, max_items=6,
        use_image_dataset=False, batch_size=3)
    np.testing.assert_allclose(st2.get_mean_cov()[0], mu)
    assert len(os.listdir(tmp_path / "cache")) == 1


def test_custom_detector_cache_tag_invalidates(ds_path, tmp_path):
    """Re-registering a DIFFERENT custom detector under the same name with
    a distinct cache_tag must NOT reuse the first one's cached dataset
    stats (the round-5 multi-seed FVD bug: seed-N rescoring silently hit
    the seed-17 real-stats cache and produced an anti-correlated series)."""
    opts = MetricOptions(dataset_kwargs=dataset_kwargs(ds_path),
                         cache_dir=str(tmp_path / "cache"))

    def scaled_detector(scale):
        def builder(**kwargs):
            def features(images):
                x = images.astype(np.float64) / 255.0 * scale
                return x.reshape(x.shape[0], -1)[:, :8]
            return features
        return builder

    register_detector("tagged", scaled_detector(1.0), cache_tag="s1")
    st1 = compute_feature_stats_for_dataset(
        opts, "tagged", {}, capture_mean_cov=True, max_items=6,
        use_image_dataset=False, batch_size=3)
    register_detector("tagged", scaled_detector(2.0), cache_tag="s2")
    st2 = compute_feature_stats_for_dataset(
        opts, "tagged", {}, capture_mean_cov=True, max_items=6,
        use_image_dataset=False, batch_size=3)
    mu1, mu2 = st1.get_mean_cov()[0], st2.get_mean_cov()[0]
    np.testing.assert_allclose(mu2, mu1 * 2.0, rtol=1e-12)
    assert len(os.listdir(tmp_path / "cache")) == 2
    # same tag re-registered -> cache hit (entry count unchanged)
    register_detector("tagged", scaled_detector(3.0), cache_tag="s2")
    st3 = compute_feature_stats_for_dataset(
        opts, "tagged", {}, capture_mean_cov=True, max_items=6,
        use_image_dataset=False, batch_size=3)
    np.testing.assert_allclose(st3.get_mean_cov()[0], mu2, rtol=1e-12)
    assert len(os.listdir(tmp_path / "cache")) == 2


def test_fvd_dataset_vs_itself_is_zero(ds_path, tmp_path):
    """generator_as_dataset with the SAME dataset must give FVD ~ 0
    (the calc_metrics_for_dataset.py use-case)."""
    from stylegan_v_tpu.metrics.frechet_video_distance import compute_fvd
    opts = MetricOptions(
        dataset_kwargs=dataset_kwargs(ds_path),
        gen_dataset_kwargs=dataset_kwargs(ds_path),
        generator_as_dataset=True, cache=False)
    fvd = compute_fvd(opts, max_real=6, num_gen=6, num_frames=4,
                      detector_name="stub_vid")
    assert abs(fvd) < 1.0, fvd


def test_generator_metric_end_to_end(ds_path):
    """FID through a real (tiny) Generator with the stub detector."""
    import jax
    from stylegan_v_tpu.models import Generator
    from test_models import small_gen_cfg
    cfg = small_gen_cfg(**{"img_resolution": 16, "channel_base": 512})
    G = Generator(cfg)
    z = jax.numpy.zeros((1, cfg.z_dim))
    t = jax.numpy.zeros((1, 2))
    variables = jax.jit(lambda r, z, t: G.init(r, z, None, t, noise_mode="none"))(
        {"params": jax.random.PRNGKey(0), "motion": jax.random.PRNGKey(1)}, z, t)

    opts = MetricOptions(G=G, G_variables=variables,
                         dataset_kwargs=dataset_kwargs(ds_path), cache=False)
    st = compute_feature_stats_for_generator(
        opts, "stub_img", {}, capture_mean_cov=True, max_items=8,
        num_video_frames=1, batch_size=4)
    mu, sigma = st.get_mean_cov()
    assert st.num_items >= 8
    assert np.isfinite(mu).all()


def test_registry_and_report(tmp_path):
    assert metric_main.is_valid_metric("fvd2048_16f")
    assert metric_main.is_valid_metric("fid50k_full")
    canonical = {"fid50k_full", "kid50k_full", "is50k", "fvd2048_16f",
                 "fvd2048_128f", "fvd2048_128f_subsample8f", "isv2048_ucf",
                 "fid50k", "kid50k"}
    # other test modules may register extra (tiny) metrics in-session
    assert canonical <= set(metric_main.list_valid_metrics())
    metric_main.report_metric(
        dict(metric="fvd2048_16f", results={"fvd2048_16f": 123.0},
             total_time=1.0, num_runs=1),
        run_dir=str(tmp_path), snapshot_nimg=5000)
    rec = json.loads(open(tmp_path / "metric-fvd2048_16f.jsonl").read())
    assert rec["snapshot"] == "network-snapshot-000005"
    assert rec["results"]["fvd2048_16f"] == 123.0

def test_frechet_distance_eigh_matches_sqrtm():
    """The default eigh formulation equals the reference sqrtm formulation
    (same math, different factorization) on full-rank AND rank-deficient
    covariances — rank deficiency is the NORM (num_items < num_features in
    every demo/CI run) and is what sends scipy's Schur sqrtm into its
    minutes-long path."""
    rng = np.random.RandomState(3)
    for n_items in (2048, 200):              # full-rank / rank-deficient
        X = rng.randn(n_items, 256)
        Y = rng.randn(n_items, 256) * 1.3 + 0.2
        mu_r, sig_r = X.mean(0), np.cov(X, rowvar=False, bias=True)
        mu_g, sig_g = Y.mean(0), np.cov(Y, rowvar=False, bias=True)
        d_e = frechet_distance(mu_r, sig_r, mu_g, sig_g, method="eigh")
        d_s = frechet_distance(mu_r, sig_r, mu_g, sig_g, method="sqrtm")
        assert abs(d_e - d_s) <= 1e-5 * max(abs(d_s), 1.0), (n_items, d_e, d_s)


def test_frechet_distance_nonfinite_guard():
    """Non-finite moments (detector overflow) must return +inf, not hang
    LAPACK (the round-4 sqrtm-on-NaN stall)."""
    mu = np.zeros(8)
    sigma = np.eye(8)
    bad = sigma.copy()
    bad[0, 0] = np.nan
    assert frechet_distance(mu, bad, mu, sigma) == float("inf")
    assert frechet_distance(mu + np.inf, sigma, mu, sigma) == float("inf")


def test_i3d_native_res_features_finite():
    """Fully-convolutional I3D feature extraction below 224^2 must produce
    finite features: the head's VALID (2,7,7) avg-pool window is clamped to
    the actual extent (at 64^2 Mixed_5c is [2,2,2]; the unclamped window
    yielded a ZERO-SIZE output whose mean is NaN — the round-4 FVD-demo
    covariance poisoning). At 224^2 the clamp is a no-op."""
    import jax
    import jax.numpy as jnp
    from stylegan_v_tpu.metrics.detectors_flax.i3d import InceptionI3d

    model = InceptionI3d()
    x = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (1, 16, 64, 64, 3)), jnp.float32) * (2.0 / 255.0) - 1.0
    variables = model.init(jax.random.PRNGKey(17), x)
    feats = np.asarray(model.apply(variables, x, return_features=True))
    assert feats.shape == (1, 1024)
    assert np.isfinite(feats).all()
    assert np.abs(feats).max() > 0
