#!/usr/bin/env python
"""Per-phase training-step timing on the attached TPU: where do the
milliseconds go at the production FFS-256 shape?

Times each phase's value_and_grad as its own scan-of-varying-inputs program
(the axon platform memoizes identical dispatches and adds per-call tunnel
latency, so each phase runs K iterations inside ONE jitted lax.scan reduced
to a scalar — see docs/PERF.md for the method):

    Gmain   — G fwd + D fwd + bwd through both (+ ADA warp fwd+bwd if p>0)
    Dmain   — G fwd (no grad) + D fwd on fake+real + D bwd (+ 2 ADA fwd)
    Dr1     — grad-of-grad R1 on reals (amortized /16 in the full step)
    full    — the complete jitted train step (incl. EMA, opts, ADA ctrl)

    python scripts/bench_phases.py [--batch 16] [--resolution 256] [--ada]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--ada", action="store_true",
                    help="enable the bgc augment pipe at p=0.8 (parity AA mode)")
    ap.add_argument("--hlo-audit", action="store_true",
                    help="parse each compiled program's HLO and report the "
                         "tile-padded (128-lane) MXU roofline next to the "
                         "naive one (utils/roofline.py)")
    ap.add_argument("--top", type=int, default=0,
                    help="with --hlo-audit: also print the top-N contractions "
                         "by padded MXU time")
    args = ap.parse_args()

    import dataclasses
    import jax
    import jax.numpy as jnp
    from functools import partial
    from stylegan_v_tpu.models import (Discriminator, DiscriminatorConfig,
                                       Generator, GeneratorConfig)
    from stylegan_v_tpu.models.config import replace
    from stylegan_v_tpu.training import (LossConfig, OptimizerConfig,
                                         TrainingConfig, init_train_state,
                                         make_train_step)
    from stylegan_v_tpu.training.augment import (AUGPIPE_SPECS, AugmentConfig,
                                                 make_augment_pipe)
    from stylegan_v_tpu.training.loss import GANLoss

    res, B, K = args.resolution, args.batch, args.iters
    gcfg = replace(GeneratorConfig(), img_resolution=res, channel_base=16384)
    dcfg = replace(DiscriminatorConfig(), img_resolution=res, channel_base=16384)
    G, D = Generator(gcfg), Discriminator(dcfg)
    F = gcfg.sampling.num_frames_per_video
    tcfg = TrainingConfig(batch_size=B, ada_target=0.6 if args.ada else None)
    lcfg = LossConfig(r1_gamma=0.0002 * res ** 2 / B, pl_weight=0.0,
                      video_consistent_aug=True)
    aug = (make_augment_pipe(AugmentConfig(**AUGPIPE_SPECS["bgc"]))
           if args.ada else None)
    p = 0.8 if args.ada else 0.0

    state = init_train_state(jax.random.PRNGKey(0), G, D, OptimizerConfig(0.0025),
                             OptimizerConfig(0.0025), tcfg, augment_p=p)
    loss = GANLoss(G, D, lcfg, augment_fn=aug)

    rng = np.random.RandomState(int(time.time()) % 100000)
    t = np.sort(rng.randint(0, 128, size=(B, F)).astype(np.float32), axis=1)
    t += np.arange(F)[None] * 0.1
    t = jax.device_put(jnp.asarray(t))
    real = jax.device_put(jnp.asarray(
        rng.rand(B * F, res, res, 3).astype(np.float32) * 2 - 1))
    vars_D = {"params": state.params_D}
    vars_G = {"params": state.params_G, **state.extra_G}
    pj = jnp.asarray(p, jnp.float32)

    def leafsum(tree):
        # consume EVERY leaf: summing only a few would let XLA dead-code-
        # eliminate the unconsumed layers' weight-grad convolutions and
        # undercount the phase (measured ~120 ms/step of DCE'd work at the
        # production shape); EMA+2xAdam+scrub alone is only ~4.6 ms.
        return sum(jnp.sum(jnp.abs(l).astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(tree))

    # operands are threaded as jit ARGUMENTS (closure capture would embed
    # params/images as XLA constants and constant-fold the model away)
    ops = {"pg": state.params_G, "eg": dict(state.extra_G),
           "pd": state.params_D, "real": real, "t": t}

    # v5e per-chip peaks for the roofline: bf16 MXU 197.3 TF/s, HBM 820 GB/s.
    # Phases mix bf16 (ladder convs) and fp32 (epilogues/stats); using the
    # bf16 peak makes the roofline CONSERVATIVE (reported ratios are upper
    # bounds on the true headroom).
    PEAK_FLOPS, HBM_BW = 197.3e12, 820e9

    def timed(name, body):
        """body(key, ops) -> scalar; K iterations in one scan program.
        Reports measured ms/iter plus the program's own XLA-cost-analysis
        roofline: max(flops/MXU_peak, bytes/HBM_bw) — cost analysis counts a
        lax.scan body ONCE, so the numbers are per-iteration."""
        @jax.jit
        def prog(keys, ops):
            def step(acc, k):
                return acc + body(k, ops), None
            acc, _ = jax.lax.scan(step, 0.0, keys)
            return acc

        seed = int(time.time()) & 0x7FFFFFFF
        keys = jax.random.split(jax.random.PRNGKey(seed), K)
        lowered = prog.lower(keys, ops)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
        bytes_ = float(ca.get("bytes accessed", 0.0))
        float(compiled(keys, ops))                          # warm
        keys2 = jax.random.split(jax.random.PRNGKey(seed + 1), K)
        t0 = time.perf_counter()
        acc = float(compiled(keys2, ops))
        dt = (time.perf_counter() - t0) / K * 1e3
        assert np.isfinite(acc)
        t_mxu = flops / PEAK_FLOPS * 1e3
        t_hbm = bytes_ / HBM_BW * 1e3
        roof = max(t_mxu, t_hbm)
        bound = "mxu" if t_mxu >= t_hbm else "hbm"
        ratio = dt / roof if roof > 0 else float("nan")
        line = (f"{name:28s} {dt:8.1f} ms/iter   roofline {roof:7.1f} ms "
                f"({bound}: mxu {t_mxu:.1f} / hbm {t_hbm:.1f})   "
                f"ratio {ratio:.2f}")
        if args.hlo_audit:
            from stylegan_v_tpu.utils.roofline import effective_mxu_seconds
            audit = effective_mxu_seconds(lowered.as_text(dialect="hlo"),
                                          peak_flops=PEAK_FLOPS)
            t_eff = audit["eff_s"] * 1e3
            t_ehbm = audit["eff_hbm_s"] * 1e3      # tile-padded IO bytes of
            # the contraction ops alone (lower bound on true HBM traffic)
            eroof = max(t_eff, t_hbm, t_ehbm)
            ebound = ("mxu" if t_eff == eroof
                      else ("hbm-tiled" if t_ehbm == eroof else "hbm"))
            eratio = dt / eroof if eroof > 0 else float("nan")
            line += (f"   | padded mxu {t_eff:.1f} / tiled hbm {t_ehbm:.1f} "
                     f"-> eff roofline {eroof:.1f} ({ebound}) ratio {eratio:.2f}")
            if args.top:
                tops = sorted(audit["ops"], key=lambda o: -o["eff_flops"])
                for o in tops[:args.top]:
                    print(f"    {o['kind']:4s} {o['out_dtype']:8s} "
                          f"M={o['m']:<9d} K={o['k']:<6d} N={o['n']:<5d} "
                          f"ksp={o['ksp']:<2d} g={o['groups']:<3d} "
                          f"naive {o['flops'] / PEAK_FLOPS * 1e3:6.2f} ms  "
                          f"padded {o['eff_flops'] / PEAK_FLOPS * 1e3:6.2f} ms",
                          flush=True)
        print(line, flush=True)
        return dt

    def gmain_body(k, o):
        z = jax.random.normal(jax.random.fold_in(k, 0), (B, gcfg.z_dim))
        def f(pg):
            l, _ = loss.gmain(pg, o["eg"], {"params": o["pd"]}, z, None,
                              o["t"], k, pj)
            return l
        return leafsum(jax.grad(f)(o["pg"]))

    def dmain_body(k, o):
        z = jax.random.normal(jax.random.fold_in(k, 0), (B, gcfg.z_dim))
        vg = {"params": o["pg"], **o["eg"]}
        def f(pd):
            l1, _ = loss.dgen(pd, vg, {}, z, None, o["t"],
                              jax.random.fold_in(k, 1), pj)
            l2, _ = loss.dreal_dr1(pd, {}, o["real"], None, o["t"],
                                   jax.random.fold_in(k, 2),
                                   pj, do_main=True, do_r1=False,
                                   r1_gamma=lcfg.r1_gamma)
            return l1 + l2
        return leafsum(jax.grad(f)(o["pd"]))

    def dr1_body(k, o):
        def f(pd):
            l, _ = loss.dreal_dr1(pd, {}, o["real"], None, o["t"], k, pj,
                                  do_main=False, do_r1=True,
                                  r1_gamma=lcfg.r1_gamma)
            return l
        return leafsum(jax.grad(f)(o["pd"]))

    def gfwd_body(k, o):
        z = jax.random.normal(k, (B, gcfg.z_dim))
        img = G.apply({"params": o["pg"], **o["eg"]}, z, None, o["t"],
                      noise_mode="random",
                      rngs={"motion": jax.random.fold_in(k, 1),
                            "noise": jax.random.fold_in(k, 2)})
        return jnp.sum(jnp.abs(img).astype(jnp.float32))

    def dfwd_body(k, o):
        # tiny key-dependent perturbation: stops XLA hoisting D(real) out of
        # the scan as loop-invariant while keeping inputs in-distribution
        eps = jax.random.uniform(k, ()) * 1e-6
        out = D.apply({"params": o["pd"]}, o["real"] + eps, None, o["t"])
        logits = out["image_logits"] if isinstance(out, dict) else out
        return jnp.sum(jnp.abs(logits).astype(jnp.float32))

    print(f"phase timing @ {res}^2, batch {B}x{F}, ada={'on p=0.8' if args.ada else 'off'}")
    tg = timed("G fwd (48 frames)", gfwd_body)
    td = timed("D fwd (48 frames)", dfwd_body)
    t1 = timed("Gmain grad", gmain_body)
    t2 = timed("Dmain grad", dmain_body)
    t3 = timed("Dr1 grad (/16 in full step)", dr1_body)

    # full step for the cross-check
    step = make_train_step(G, D, lcfg, OptimizerConfig(0.0025),
                           OptimizerConfig(0.0025), tcfg, augment_fn=aug,
                           donate=False)
    batch = {
        "real_img": jax.device_put(rng.randint(0, 255, (B, F, res, res, 3)).astype(np.uint8)),
        "real_c": jax.device_put(np.zeros((B, 0), np.float32)),
        "real_t": t,
        "gen_c": jax.device_put(np.zeros((B, 3, 0), np.float32)),
        "gen_t": jax.device_put(jnp.stack([t, t + 1, t + 2], axis=1)),
    }
    st, _ = step(state, batch, jax.random.PRNGKey(1))
    st, _ = step(st, batch, jax.random.PRNGKey(2))
    jax.block_until_ready(st.params_G)
    t0 = time.perf_counter()
    for i in range(args.iters):
        st, _ = step(st, batch, jax.random.PRNGKey(10 + i))
    jax.block_until_ready(st.params_G)
    tf = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"{'full step (no R1)':28s} {tf:8.1f} ms/iter")
    print(f"{'sum of Gmain+Dmain':28s} {t1 + t2:8.1f} ms  "
          f"(residual {tf - t1 - t2:+.1f} ms = EMA+opt+dispatch)")


if __name__ == "__main__":
    main()
