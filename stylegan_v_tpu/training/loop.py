"""The training orchestrator.

Behavioral parity with reference src/training/training_loop.py:97-544, on the
JAX/TPU execution model: the per-step work is ONE jitted program (all phases,
EMA, ADA) over a device mesh; the host loop handles data feeding, tick-level
telemetry, snapshots (images / videos / Orbax state), in-training metric
evaluation, and resume.

Tick cadence, snapshot naming, stats.jsonl schema, visualization panels
(reals / fakes_init / fakesNNNNNN grids + sample videos with the
same-motion-different-content decomposition) mirror the reference.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Dict, Optional

import numpy as np

from ..data import TrainingDataLoader, VideoFramesFolderDataset
from ..io.checkpoint import find_latest_snapshot, load_snapshot, save_snapshot
from ..models import Discriminator, Generator
from ..parallel import create_mesh, replicated_sharding, shard_batch
from ..train_setup import TrainSetup
from ..utils.misc import format_time
from ..utils.training_stats import Collector, StatsJsonlWriter, TensorboardWriter
from .augment import make_augment_pipe
from .train_step import init_train_state, make_train_step
from .video_io import generate_videos, save_image_grid, save_video_frames_as_mp4, videos_as_grids


def setup_snapshot_image_grid(dataset, grid_seed: int = 0, max_videos: int = 16,
                              row_len: int = 4):
    """Pick grid videos + their conditioning (reference training_loop.py:35-76).

    Unconditional datasets: seeded random subset. Conditional datasets: the
    grid is LABEL-GROUPED — consecutive `row_len` slots show videos of one
    label, cycling through labels in sorted order — so class coverage and
    per-class quality are visible at a glance (the reference's
    cluster-by-label grid layout)."""
    rnd = np.random.RandomState(grid_seed)
    n = min(max_videos, len(dataset))
    if not dataset.has_labels:
        idx = rnd.choice(len(dataset), size=n, replace=False)
    else:
        groups: Dict[tuple, list] = {}
        for i in range(len(dataset)):
            key = tuple(np.asarray(dataset.get_label(i)).flatten().tolist())
            groups.setdefault(key, []).append(i)
        keys = sorted(groups)
        for g in groups.values():
            rnd.shuffle(g)
        idx, k = [], 0
        while len(idx) < n and any(groups.values()):
            g = groups[keys[k % len(keys)]]
            idx.extend(g[:row_len])
            del g[:row_len]
            k += 1
        idx = np.asarray(idx[:n])
    items = [dataset[int(i)] for i in idx]
    images = np.stack([it["image"][0] for it in items])       # first frames
    labels = np.stack([it["label"] for it in items]).astype(np.float32)
    return images, labels


def training_loop(setup: TrainSetup,
                  abort_fn: Optional[Callable[[], bool]] = None,
                  progress_fn: Optional[Callable[[int, int], None]] = None,
                  log: Callable[[str], None] = print) -> Dict:
    """Run training to total_kimg; returns final summary dict."""
    import jax

    run_dir = setup.run_dir
    is_chief = jax.process_index() == 0
    os.makedirs(run_dir, exist_ok=True)
    from ..utils.logger import Logger
    logger = Logger(os.path.join(run_dir, "log.txt"), "a") if is_chief else None
    if logger is not None:
        logger.install()
    start_time = time.time()

    # ---- dataset + loader (reference training_loop.py:141-151) ----------
    log("Loading training set...")
    dataset = VideoFramesFolderDataset(**setup.dataset_kwargs)
    log(f"  videos: {len(dataset)}  resolution: {dataset.resolution}  "
        f"labels: {dataset.label_dim if dataset.has_labels else 0}")
    # per-host shard of the global batch (rank-strided index stream,
    # reference misc.py:136 / metric_utils.py:230 semantics)
    n_proc, proc = jax.process_count(), jax.process_index()
    assert setup.train_cfg.batch_size % n_proc == 0
    loader = TrainingDataLoader(
        dataset, batch_size=setup.train_cfg.batch_size // n_proc,
        gen_sampling=setup.sampling_cfg, use_fractional_t=setup.use_fractional_t,
        seed=setup.seed, num_workers=setup.num_workers,
        rank=proc, num_replicas=n_proc)

    # ---- models + state (reference training_loop.py:160-183) ------------
    log("Constructing networks...")
    G = Generator(setup.gen_cfg)
    d_lr_scales = None
    if getattr(setup, "disc_source", "networks") == "mocogan":
        from ..models.mocogan import MoCoGANDiscriminator
        D = MoCoGANDiscriminator(
            setup.disc_cfg,
            video_discr_lr_multiplier=setup.video_discr_lr_multiplier,
            video_discr_num_t_paddings=setup.video_discr_num_t_paddings)
        d_lr_scales = D.lr_scale_map
    else:
        D = Discriminator(setup.disc_cfg)
    rng = jax.random.PRNGKey(setup.seed)
    state = init_train_state(rng, G, D, setup.opt_g, setup.opt_d, setup.train_cfg,
                             augment_p=setup.augment_p, d_lr_scales=d_lr_scales)
    n_gp = sum(int(np.prod(np.shape(l)))
               for l in jax.tree_util.tree_leaves(state.params_G))
    n_dp = sum(int(np.prod(np.shape(l)))
               for l in jax.tree_util.tree_leaves(state.params_D))
    log(f"  G params: {n_gp/1e6:.2f}M   D params: {n_dp/1e6:.2f}M")

    from ..utils.summary import print_module_summary
    print_module_summary({"params": state.params_G}, "Generator",
                         max_rows=0, log=log)
    print_module_summary({"params": state.params_D}, "Discriminator",
                         max_rows=0, log=log)
    try:
        # per-module output shapes from an abstract dummy forward (the
        # reference's print_module_summary pass, misc.py:193-272)
        import jax.numpy as jnp
        from ..utils.summary import print_activation_summary
        F = setup.sampling_cfg.num_frames_per_video
        z0 = jnp.zeros((1, setup.gen_cfg.z_dim))
        c0 = (jnp.zeros((1, setup.gen_cfg.c_dim))
              if setup.gen_cfg.c_dim > 0 else None)
        t0 = jnp.zeros((1, F))
        print_activation_summary(
            G, {"params": state.params_G, **state.extra_G}, z0, c0, t0,
            noise_mode="const", title="Generator", log=log,
            rngs={"motion": jax.random.PRNGKey(0),
                  "noise": jax.random.PRNGKey(1)})
    except Exception as e:                          # diagnostics only
        log(f"  (activation summary unavailable: {e!r})")

    # ---- resume (reference train.py:283-317, training_loop.py:167-183) ---
    resume_nimg = 0
    if setup.resume and str(setup.resume).endswith(".pkl"):
        # weights-only transfer learning from a reference snapshot pickle
        # (reference resume_pkl semantics: partial copy, counters untouched)
        log(f"Importing reference snapshot {setup.resume} (weights only)")
        from ..io.legacy import import_reference_snapshot
        chans4 = min(setup.disc_cfg.channel_base // 4, setup.disc_cfg.channel_max)
        imported = import_reference_snapshot(
            setup.resume,
            gen_template={"params": state.params_G, **state.extra_G},
            disc_template={"params": state.params_D},
            epilogue_channels=chans4)
        if imported["G"] is not None:
            state = state.replace(params_G=imported["G"]["params"],
                                  extra_G={k: v for k, v in imported["G"].items()
                                           if k != "params"} or state.extra_G)
        if imported["G_ema"] is not None:
            state = state.replace(params_Gema=imported["G_ema"]["params"])
        if imported["D"] is not None:
            state = state.replace(params_D=imported["D"]["params"])
    elif setup.resume:
        path = (find_latest_snapshot(run_dir) if setup.resume == "latest"
                else setup.resume)
        if path:
            log(f"Resuming from {path}")
            state, meta = load_snapshot(path, target=state)
            resume_nimg = int(meta.get("cur_nimg", int(state.cur_nimg)))
        elif setup.resume != "latest":
            raise FileNotFoundError(setup.resume)

    # ---- mesh ------------------------------------------------------------
    # data-parallel width = largest device count dividing the batch
    import math as _math
    n_dev = len(jax.devices())
    dp = _math.gcd(setup.train_cfg.batch_size, n_dev)
    mesh = create_mesh(devices=jax.devices()[:dp], frame=1)
    log(f"Device mesh: {dict(mesh.shape)} (of {n_dev} devices)")
    state_sharding = None
    if setup.train_cfg.zero1 and dp > 1:
        # ZeRO-1: Adam moments partitioned across 'data' (parallel/zero.py)
        from ..parallel import opt_state_bytes_per_device, zero1_state_sharding
        state_sharding = zero1_state_sharding(mesh, state)
        state = jax.device_put(state, state_sharding)
        log(f"ZeRO-1 optimizer sharding: "
            f"{opt_state_bytes_per_device(state) / 1e6:.1f} MB/device "
            f"of optimizer state (vs replicated x{dp})")
    else:
        state = jax.device_put(state, replicated_sharding(mesh))

    # ---- augmentation + train step ---------------------------------------
    # the augment pipe derives its warp chunking from the per-shard batch
    augment_fn = (make_augment_pipe(dataclasses.replace(
                      setup.augment_cfg, data_shards=dp))
                  if setup.augment_cfg is not None else None)
    step_fn = make_train_step(G, D, setup.loss_cfg, setup.opt_g, setup.opt_d,
                              setup.train_cfg, augment_fn=augment_fn, donate=False,
                              d_lr_scales=d_lr_scales,
                              state_sharding=state_sharding, mesh=mesh)

    # ---- visualization state (reference training_loop.py:272-299) --------
    grid_reals, grid_labels = setup_snapshot_image_grid(dataset, setup.seed)
    save_image_grid(grid_reals.astype(np.float32) / 127.5 - 1,
                    os.path.join(run_dir, "reals.jpg"))
    vis_n = min(9, setup.train_cfg.batch_size)
    vis_z = np.asarray(jax.random.normal(jax.random.PRNGKey(setup.seed + 1),
                                         (vis_n, setup.gen_cfg.z_dim)))
    vis_c = (grid_labels[:vis_n] if setup.gen_cfg.c_dim > 0 else None)
    vis_T = min(16, setup.sampling_cfg.max_num_frames)
    vis_ts = np.tile(np.arange(vis_T, dtype=np.float32)[None], (vis_n, 1))

    # fakes_init: untrained-G_ema grid before the first step (reference
    # training_loop.py:283) — same call shape as the per-snapshot panels, so
    # the compiled synthesis program is reused.
    if is_chief:
        init_vars = {"params": jax.device_get(state.params_Gema),
                     **jax.device_get(state.extra_Gema)}
        init_vids = generate_videos(G, init_vars, vis_z, vis_c, vis_ts,
                                    noise_mode="const")
        save_image_grid(init_vids[:, 0] * 2 - 1,
                        os.path.join(run_dir, "fakes_init.jpg"))

    # ---- sinks -----------------------------------------------------------
    from ..utils.training_stats import DeviceStatsAccumulator
    collector = Collector()
    dstats = DeviceStatsAccumulator()
    jsonl = StatsJsonlWriter(run_dir)
    tb = TensorboardWriter(run_dir)

    # ---- main loop (reference training_loop.py:330-544) ------------------
    total_steps = max(1, setup.total_kimg * 1000 //
                      (setup.train_cfg.batch_size
                       * setup.sampling_cfg.num_frames_per_video))
    gpl_int = setup.train_cfg.G_reg_interval
    dr1_int = setup.train_cfg.D_reg_interval
    tick_interval_nimg = setup.kimg_per_tick * 1000
    next_tick_nimg = resume_nimg
    cur_tick = 0
    tick_start = time.time()
    step_idx = int(state.step)
    # host-side nimg mirror: reading state.cur_nimg per step would block on
    # the step's device scalars (serializing dispatch against compute); the
    # jitted step increments by exactly nimg_per_step, so the mirror is exact
    nimg_per_step = (setup.train_cfg.batch_size
                     * setup.sampling_cfg.num_frames_per_video)
    cur_nimg = int(state.cur_nimg)
    base_nimg, base_step = cur_nimg, step_idx

    log(f"Training for {setup.total_kimg} kimg ({total_steps} steps)...")
    while True:
        t_step = time.time()
        batch = shard_batch(mesh, next(loader))
        t_data = time.time()
        do_gpl = gpl_int is not None and step_idx % gpl_int == 0
        do_dr1 = dr1_int is not None and step_idx % dr1_int == 0
        state, stats = step_fn(state, batch, jax.random.fold_in(rng, step_idx),
                               do_gpl=do_gpl, do_dr1=do_dr1)
        dstats.update(stats)         # device-resident accumulation, no sync
        t_disp = time.time()
        # per-phase timing telemetry (reference Timing/<phase>,
        # training_loop.py:254-262). The step is ONE fused program, so the
        # reference's Gmain/Greg/Dmain/Dreg split becomes per-PROGRAM-VARIANT
        # wall time between dispatches: once the dispatch queue back-
        # pressures, the mean per-variant wall time converges to the
        # variant's device step time.
        variant = ("Gmain_Dmain" + ("_Gpl" if do_gpl else "")
                   + ("_Dr1" if do_dr1 else ""))
        collector.report("Timing/data_fetch", t_data - t_step)
        collector.report(f"Timing/{variant}", t_disp - t_data)
        step_idx += 1
        cur_nimg = base_nimg + (step_idx - base_step) * nimg_per_step

        done = cur_nimg >= setup.total_kimg * 1000
        if (not done) and cur_nimg < next_tick_nimg + tick_interval_nimg:
            continue

        # ---- per-tick maintenance (reference training_loop.py:417-544) ---
        cur_tick += 1
        next_tick_nimg = cur_nimg
        dstats.drain_into(collector)   # the tick's ONE stats host sync
        tick_time = time.time() - tick_start
        fields = [
            f"tick {cur_tick:<5d}",
            f"kimg {cur_nimg / 1e3:<8.1f}",
            f"time {format_time(time.time() - start_time):<12s}",
            f"sec/tick {tick_time:<7.1f}",
            f"sec/kimg {tick_time / max(tick_interval_nimg / 1e3, 1e-8):<7.2f}",
            f"augment {float(state.augment_p):.3f}",
            f"Gloss {collector.mean('Loss/G/loss'):.3f}",
            f"Dreal {collector.mean('Loss/scores/real'):.3f}",
        ]
        log(" ".join(fields))
        jsonl.write({k: v for k, v in collector.as_dict().items()})
        tb.add_scalars(collector, cur_nimg)
        collector.reset()
        tick_start = time.time()

        # snapshots
        if setup.snap_ticks and (cur_tick % setup.snap_ticks == 0 or done):
            log("Saving snapshots...")
            # replicated-state divergence check before checkpointing over the
            # FULL state — G, D, EMA, optimizer moments, pl_mean, augment_p —
            # the sharded-jit analog of the reference's per-module
            # check_ddp_consistency sweep (training_loop.py:487-492,
            # misc.py:179-188). ZeRO-1-sharded leaves are skipped inside
            # (shard-local by construction).
            from ..utils.summary import check_replica_consistency
            check_replica_consistency({
                "params_G": state.params_G, "params_D": state.params_D,
                "params_Gema": state.params_Gema, "extra_G": state.extra_G,
                "extra_Gema": state.extra_Gema, "opt_G": state.opt_G,
                "opt_D": state.opt_D, "pl_mean": state.pl_mean,
                "augment_p": state.augment_p})
            # image/video panels from G_ema
            ema_vars = {"params": jax.device_get(state.params_Gema),
                        **jax.device_get(state.extra_Gema)}
            ts = vis_ts
            vids = generate_videos(G, ema_vars, vis_z, vis_c, ts,
                                   noise_mode="const")
            save_image_grid(vids[:, 0] * 2 - 1,
                            os.path.join(run_dir, f"fakes{cur_nimg:06d}.jpg"))
            panel = videos_as_grids(vids)
            if setup.gen_cfg.has_motion:
                # moco-decomposition panel (reference
                # training_loop.py:448-462): [different-motion grid | white
                # pad | same-motion grid] — ONE motion trajectory repeated
                # across all videos exposes content/motion entanglement at a
                # glance during training.
                from ..models.motion import MotionMappingNetwork
                L = MotionMappingNetwork.required_traj_len(
                    setup.gen_cfg, float(ts.max()))
                mz = np.repeat(np.asarray(jax.random.normal(
                    jax.random.PRNGKey(setup.seed + 2),
                    (1, L, setup.gen_cfg.motion.z_dim))), vis_n, axis=0)
                same = videos_as_grids(generate_videos(
                    G, ema_vars, vis_z, vis_c, ts, motion_z=mz,
                    noise_mode="const"))
                pad = np.ones_like(panel[:, :, :min(64, panel.shape[2])])
                panel = np.concatenate([panel, pad, same], axis=2)
            save_video_frames_as_mp4(
                panel, setup.sampling_cfg.fps,
                os.path.join(run_dir, f"fakes{cur_nimg:06d}.mp4"))
            # ZeRO-1 moments span non-addressable devices on a multi-host
            # mesh; all-gather to replicated (one jit identity over ICI)
            # before the host fetch or device_get raises
            snap_state = state
            if state_sharding is not None and jax.process_count() > 1:
                snap_state = jax.jit(
                    lambda s: s,
                    out_shardings=replicated_sharding(mesh))(state)
            save_snapshot(run_dir, jax.device_get(snap_state), cur_nimg,
                          configs={"G": setup.gen_cfg, "D": setup.disc_cfg})

            # in-training metrics (reference training_loop.py:503-518)
            if setup.metrics:
                try:
                    from ..metrics import metric_main
                    for metric in setup.metrics:
                        r = metric_main.calc_metric(
                            metric=metric, G=G, G_variables=ema_vars,
                            dataset_kwargs=setup.dataset_kwargs, mesh=mesh,
                            **(setup.metric_kwargs or {}))
                        metric_main.report_metric(r, run_dir=run_dir,
                                                  snapshot_nimg=cur_nimg)
                        log(f"  {metric}: {r['results']}")
                except Exception as e:                     # metrics are best-effort
                    import traceback
                    log(f"  metric evaluation failed: {e!r}")
                    log(traceback.format_exc(limit=3))

        if progress_fn is not None:
            progress_fn(cur_nimg // 1000, setup.total_kimg)
        # rank-agreed abort (reference training_loop.py:130,436-440 requires
        # abort_fn to agree across ranks; here ANY process's abort wins via
        # an explicit per-tick allgather, so no process can leave the loop
        # alone and deadlock the others' next collective). Ticks are
        # synchronized by construction — cur_nimg comes from the global
        # sharded state — so every process reaches this collective together.
        local_abort = bool(abort_fn()) if abort_fn is not None else False
        if n_proc > 1:
            from jax.experimental import multihost_utils as mh
            local_abort = bool(np.asarray(mh.process_allgather(
                np.asarray([int(local_abort)], np.int32))).max())
        if local_abort:
            log("Aborting...")
            done = True
        if done:
            break

    loader.close()
    jsonl.close()
    if logger is not None:
        logger.close()
    log(f"Training complete: {cur_nimg // 1000} kimg in "
        f"{format_time(time.time() - start_time)}")
    return dict(cur_nimg=cur_nimg, ticks=cur_tick,
                seconds=time.time() - start_time)
