"""Worker for the 2-process x 4-device multihost CPU test (launched by
tests/test_multiprocess.py — NOT a pytest module).

Exercises every multi-host code path on a jax.distributed local cluster (the
JAX analog of the reference's file://-rendezvous multi-process simulation,
reference train.py:359-366):
  * global-mesh batch assembly (make_array_from_process_local_data) + psum;
  * cross-host replica hash check;
  * replica-sharded metric feature extraction with cross-process merge;
  * metric result broadcast (every process must print identical numbers).

Prints ONE JSON line with the results; the parent compares across processes.
"""
import json
import os
import sys


def main():
    port, pid, nproc, ds_path = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    os.environ["SGV_STUB_DETECTORS"] = "1"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.local_devices()) == 4

    import numpy as np
    import jax.numpy as jnp
    out = {"pid": pid, "n_devices": len(jax.devices())}

    # ---- global mesh + per-host batch assembly + implicit psum ----------
    from stylegan_v_tpu.parallel import create_mesh, shard_batch
    mesh = create_mesh(frame=1)                       # 8 global devices
    local = {"x": np.arange(8, dtype=np.float32)[:, None] + 100 * pid}
    batch = shard_batch(mesh, local)                  # global [16, 1]
    assert batch["x"].shape == (16, 1)
    total = jax.jit(lambda b: jnp.sum(b["x"]))(batch)
    out["batch_sum"] = float(total)                   # must agree everywhere

    # ---- replica consistency hash check ----------------------------------
    from stylegan_v_tpu.utils.summary import check_replica_consistency
    tree = {"w": np.full((3, 3), 7.0, np.float32)}
    out["consistency_ok"] = bool(check_replica_consistency(tree))

    # divergence in ANY state member must be caught (the full-state sweep of
    # reference training_loop.py:487-492): here D diverges across processes
    # while G agrees — the check must raise on every process.
    diverged = {"params_G": np.ones(3, np.float32),
                "params_D": np.full(3, 1.0 + pid, np.float32)}
    try:
        check_replica_consistency(diverged)
        out["divergence_caught"] = False
    except RuntimeError:
        out["divergence_caught"] = True

    # ignore_regex: the same divergence is waived when the diverging leaf
    # path is ignored (reference misc.py:179-188 ignore semantics)
    out["divergence_ignored_ok"] = bool(
        check_replica_consistency(diverged, ignore_regex=r"params_D"))

    # ---- replica-sharded dataset stats + cross-process merge -------------
    from stylegan_v_tpu.metrics.metric_utils import (
        MetricOptions, compute_feature_stats_for_dataset)
    from stylegan_v_tpu.models.config import SamplingConfig
    sampling = SamplingConfig(num_frames_per_video=2, max_num_frames=16,
                              total_dists=(1, 2), max_dist=4)
    dkw = dict(path=ds_path, sampling=sampling, max_num_frames=16,
               load_n_consecutive=4, discard_short_videos=True)
    stats = compute_feature_stats_for_dataset(
        MetricOptions(dataset_kwargs=dkw, cache=False,
                      num_replicas=nproc, replica=pid, rank=pid),
        "i3d", {}, capture_mean_cov=True, capture_all=True, max_items=6,
        temporal_detector=True, batch_size=2)
    out["stats_num_items"] = stats.num_items          # merged: full dataset
    mu, cov = stats.get_mean_cov()
    out["stats_mu_head"] = [round(float(v), 12) for v in mu[:4]]
    out["stats_all_shape"] = list(stats.get_all().shape)

    # zero-share replica: max_items=1 with 2 processes leaves rank 1 with
    # no items; the cross-process merge must still converge on every rank
    # (feature dim learned from peers) instead of assert-crash + peer hang
    stats1 = compute_feature_stats_for_dataset(
        MetricOptions(dataset_kwargs=dkw, cache=False,
                      num_replicas=nproc, replica=pid, rank=pid),
        "i3d", {}, capture_mean_cov=True, max_items=1,
        temporal_detector=True, batch_size=2)
    out["stats1_num_items"] = stats1.num_items
    out["stats1_mu0"] = round(float(stats1.get_mean_cov()[0][0]), 12)

    # ---- full metric with result broadcast --------------------------------
    from stylegan_v_tpu.metrics import metric_main
    r = metric_main.calc_metric(
        metric="fvd2048_16f",
        dataset_kwargs=dict(path=ds_path, sampling=sampling, max_num_frames=16),
        gen_dataset_kwargs=dict(path=ds_path, sampling=sampling,
                                max_num_frames=16),
        generator_as_dataset=True, cache=False)
    out["fvd"] = float(r["results"]["fvd2048_16f"])

    # ---- mesh + multi-process: calc_metric must restrict the GLOBAL mesh
    # to this process's local devices (device_put of per-replica batches on
    # a spanning mesh would touch non-addressable devices), and the replica
    # merge must still produce identical numbers everywhere.
    r2 = metric_main.calc_metric(
        metric="fvd2048_16f",
        dataset_kwargs=dict(path=ds_path, sampling=sampling, max_num_frames=16),
        gen_dataset_kwargs=dict(path=ds_path, sampling=sampling,
                                max_num_frames=16),
        generator_as_dataset=True, cache=False, mesh=mesh)
    out["fvd_mesh"] = float(r2["results"]["fvd2048_16f"])

    # ---- rank-agreed abort: only process 1's abort_fn fires, but BOTH
    # processes must leave the training loop at the same tick instead of
    # process 1 exiting alone and deadlocking process 0's next collective
    # (reference training_loop.py:130,436-440 contract).
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_models import small_gen_cfg, small_disc_cfg
    from stylegan_v_tpu.train_setup import TrainSetup
    from stylegan_v_tpu.training.loop import training_loop
    from stylegan_v_tpu.training.loss import LossConfig
    from stylegan_v_tpu.training.train_step import OptimizerConfig, TrainingConfig
    from stylegan_v_tpu.models.config import SamplingConfig as _SC
    sampling3 = _SC(num_frames_per_video=3, max_num_frames=16,
                    total_dists=(1, 2, 4, 8), max_dist=8)
    setup = TrainSetup(
        run_dir=os.path.join(os.path.dirname(ds_path), f"abort_run_{pid}"),
        desc="abort",
        gen_cfg=small_gen_cfg(img_resolution=16),
        disc_cfg=small_disc_cfg(img_resolution=16),
        loss_cfg=LossConfig(r1_gamma=0.5, pl_weight=0.0),
        # zero1: ZeRO-1 moments partitioned across BOTH processes'
        # devices — covers the multihost snapshot allgather path
        train_cfg=TrainingConfig(batch_size=8, ema_kimg=0.5, ada_target=0.6,
                                 zero1=True),
        opt_g=OptimizerConfig(lr=0.002), opt_d=OptimizerConfig(lr=0.002),
        augment_cfg=None, augment_p=0.0,
        dataset_kwargs=dict(path=ds_path, sampling=sampling3,
                            max_num_frames=16),
        sampling_cfg=sampling3, use_fractional_t=True,
        total_kimg=1, kimg_per_tick=0.024, snap_ticks=1,
        metrics=[], seed=0, num_chips=1, resume=None, freeze_layers=0,
        num_workers=2)
    res = training_loop(setup, abort_fn=lambda: pid == 1,
                        log=lambda *_: None)
    out["abort_nimg"] = int(res["cur_nimg"])   # far below total_kimg*1000

    print("RESULT " + json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
