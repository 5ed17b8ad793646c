"""The training step: all phases of one iteration as a single jitted program.

Replaces the reference's per-phase Python loop with DDP + per-GPU processes
(reference training_loop.py:350-410) by ONE pure function
    (state, batch, rng) -> (state', stats)
jit-compiled over a `jax.sharding.Mesh`: the batch is sharded on the 'data'
axis, parameters/optimizer state are replicated, and XLA inserts the gradient
all-reduces (the DDP equivalent) automatically.

Lazy regularization (reference training_loop.py:238-252): main and reg phases
share one Adam state per network whose lr/betas are pre-scaled by
mb_ratio = interval/(interval+1); reg losses are scaled by their interval
(the `gain` of reference loss.py backward calls). Reg phases execute on steps
where `step % interval == 0`, selected HOST-side so each program stays static
(two/four compiled variants, cached).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models import Discriminator, Generator
from .loss import GANLoss, LossConfig


@dataclass(frozen=True)
class OptimizerConfig:
    """Adam hyperparameters (reference train.py cfg_specs; auto: lr=0.002@<256²,
    0.0025 heuristic — set from the config system)."""
    lr: float = 0.002
    beta1: float = 0.0
    beta2: float = 0.99
    eps: float = 1e-8


@dataclass(frozen=True)
class TrainingConfig:
    batch_size: int = 64                  # videos per step (global)
    # microbatch size (videos) per accumulation round; None = whole batch.
    # The reference's batch_gpu: batch_size > batch_gpu*chips => multiple
    # rounds per phase per optimizer step (training_loop.py:363-378).
    batch_chip: Optional[int] = None
    ema_kimg: float = 10.0
    ema_rampup: Optional[float] = None
    G_reg_interval: Optional[int] = 4
    D_reg_interval: Optional[int] = 16
    ada_target: Optional[float] = None    # None = fixed p
    ada_interval: int = 4
    ada_kimg: float = 500.0
    grad_clip_value: float = 1e5          # nan_to_num posinf bound (misc.py:46-56)
    # ZeRO-1: partition Adam moments across the mesh 'data' axis (see
    # parallel/zero.py). No reference counterpart — DDP replicates all state.
    zero1: bool = False


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    cur_nimg: jax.Array                      # counts FRAMES (training_loop.py:403)
    params_G: Any
    extra_G: Any                             # {'moving': ..., 'buffers': ...} collections
    params_D: Any
    params_Gema: Any
    extra_Gema: Any
    opt_G: Any
    opt_D: Any
    pl_mean: jax.Array
    augment_p: jax.Array
    ada_sign_acc: jax.Array                  # accumulated mean sign(D(real)) over interval


def _mb_ratio(interval: Optional[int]) -> float:
    return 1.0 if interval is None else interval / (interval + 1)


def _adam(cfg: OptimizerConfig, ratio: float, lr_scale: float = 1.0):
    return optax.adam(cfg.lr * ratio * lr_scale, b1=cfg.beta1 ** ratio,
                      b2=cfg.beta2 ** ratio, eps=cfg.eps)


def make_optimizers(opt_g: OptimizerConfig, opt_d: OptimizerConfig,
                    tcfg: TrainingConfig,
                    d_lr_scales: Optional[Dict[str, float]] = None
                    ) -> Tuple[optax.GradientTransformation,
                               optax.GradientTransformation]:
    """Adam pairs with lazy-reg lr/beta rescale (training_loop.py:245-248).

    d_lr_scales: per-top-level-subtree learning-rate multipliers for D
    (the MoCoGAN video-branch 0.1x, reference mocogan.py:54-58)."""
    rg, rd = _mb_ratio(tcfg.G_reg_interval), _mb_ratio(tcfg.D_reg_interval)
    g = _adam(opt_g, rg)
    if d_lr_scales:
        labels_map = dict(d_lr_scales)

        def label_fn(params):
            return {k: (k if k in labels_map else "__default__")
                    for k in params.keys()}

        transforms = {"__default__": _adam(opt_d, rd)}
        for k, scale in labels_map.items():
            transforms[k] = _adam(opt_d, rd, lr_scale=scale)
        d = optax.multi_transform(transforms, label_fn)
    else:
        d = _adam(opt_d, rd)
    return g, d


def scrub_grads(grads, clip: float = 1e5):
    """NaN/Inf gradient scrub before every optimizer step
    (reference training_loop.py:383-385)."""
    return jax.tree_util.tree_map(
        lambda g: jnp.nan_to_num(g, nan=0.0, posinf=clip, neginf=-clip), grads)


def init_train_state(rng: jax.Array, G: Generator, D: Discriminator,
                     opt_g_cfg: OptimizerConfig, opt_d_cfg: OptimizerConfig,
                     tcfg: TrainingConfig, augment_p: float = 0.0,
                     d_lr_scales: Optional[Dict[str, float]] = None) -> TrainState:
    """Build replicated initial state; init runs under jit for speed."""
    cfg = G.cfg
    k_g, k_m, k_d = jax.random.split(rng, 3)
    F = cfg.sampling.num_frames_per_video
    # dummy batch of 4: keeps the per-frame batch divisible by the default
    # minibatch-std group size during shape inference
    z = jnp.zeros((4, cfg.z_dim))
    t = jnp.zeros((4, F))
    c = jnp.zeros((4, cfg.c_dim)) if cfg.c_dim > 0 else None
    img = jnp.zeros((4 * F, cfg.img_resolution, cfg.img_resolution, cfg.img_channels))

    vars_G = jax.jit(partial(G.init, noise_mode="none"))(
        {"params": k_g, "motion": k_m}, z, c, t)
    vars_D = jax.jit(D.init)(k_d, img, c, t)

    params_G = vars_G["params"]
    extra_G = {k: v for k, v in vars_G.items() if k != "params"}
    opt_g, opt_d = make_optimizers(opt_g_cfg, opt_d_cfg, tcfg, d_lr_scales)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        cur_nimg=jnp.zeros((), jnp.int32),
        params_G=params_G,
        extra_G=extra_G,
        params_D=vars_D["params"],
        params_Gema=jax.tree_util.tree_map(jnp.copy, params_G),
        extra_Gema=jax.tree_util.tree_map(jnp.copy, extra_G),
        opt_G=opt_g.init(params_G),
        opt_D=opt_d.init(vars_D["params"]),
        pl_mean=jnp.zeros((), jnp.float32),
        augment_p=jnp.asarray(augment_p, jnp.float32),
        ada_sign_acc=jnp.zeros((), jnp.float32),
    )


def make_train_step(G: Generator, D: Discriminator, loss_cfg: LossConfig,
                    opt_g_cfg: OptimizerConfig, opt_d_cfg: OptimizerConfig,
                    tcfg: TrainingConfig, augment_fn: Optional[Callable] = None,
                    donate: bool = True,
                    d_lr_scales: Optional[Dict[str, float]] = None,
                    state_sharding=None, mesh=None):
    """Returns train_step(state, batch, rng, do_gpl, do_dr1) with the two
    booleans static (compiles up to 4 cached variants).

    state_sharding: optional sharding pytree (TrainState structure) pinned
    as the OUTPUT state sharding — required for ZeRO-1 so the updated
    moments stay partitioned step over step instead of drifting to whatever
    layout sharding propagation picks (parallel/zero.py).

    mesh: the device mesh the program runs over (derived from state_sharding
    when omitted). When known, the step traces under
    `jax.sharding.use_abstract_mesh` so model-internal
    `constrain_data_axis` pins resolve — this is what keeps the D
    frame-fusion/epilogue reshapes batch-sharded through the second-order R1
    path instead of triggering SPMD involuntary full rematerialization.

    batch dict (host-prepared, [B, ...] global shapes):
      real_img: [B, F, H, W, C] uint8 (normalized on device: saves 4x PCIe)
      real_c:   [B, c_dim] float32 (c_dim may be 0)
      real_t:   [B, F] float32
      gen_c:    [B, P, c_dim] — per-phase label draws (P=3: Gmain, Gpl, Dmain);
      gen_t:    [B, P, F] — per-phase timestamp draws (sample_frames, host-side).
      Batch-major so every batch array shards uniformly on the 'data' axis.
    """
    loss = GANLoss(G, D, loss_cfg, augment_fn=augment_fn)
    opt_g, opt_d = make_optimizers(opt_g_cfg, opt_d_cfg, tcfg, d_lr_scales)
    z_dim = G.cfg.z_dim
    num_frames = G.cfg.sampling.num_frames_per_video
    c_dim = G.cfg.c_dim

    def maybe_c(c):
        return c if c_dim > 0 else None

    def _rounds(B: int) -> int:
        if tcfg.batch_chip is None or tcfg.batch_chip >= B:
            return 1
        assert B % tcfg.batch_chip == 0, \
            f"batch {B} not divisible by batch_chip {tcfg.batch_chip}"
        return B // tcfg.batch_chip

    def _split(tree, rounds: int):
        """Reshape leading batch axis B -> [rounds, B/rounds] for lax.scan."""
        return jax.tree_util.tree_map(
            lambda x: x.reshape(rounds, x.shape[0] // rounds, *x.shape[1:]), tree)

    def _accum(fn, params, mb_tree, rounds: int, carry0=None):
        """Gradient accumulation over microbatch rounds (the reference's
        round loop, training_loop.py:363-378). fn(params, mb, carry) ->
        ((loss, (carry', stats)), ...). Grads and stats are averaged."""
        if rounds == 1:
            (l, (carry, s)), g = jax.value_and_grad(fn, has_aux=True)(
                params, mb_tree, carry0)
            return g, s, carry

        mbs = _split(mb_tree, rounds)

        def body(acc, mb):
            gsum, ssum, carry = acc
            (l, (carry, s)), g = jax.value_and_grad(fn, has_aux=True)(
                params, mb, carry)
            gsum = jax.tree_util.tree_map(lambda a, b: a + b, gsum, g)
            ssum = {k: ssum[k] + v for k, v in s.items()}
            return (gsum, ssum, carry), None

        zero_g = jax.tree_util.tree_map(jnp.zeros_like, params)
        (l0, (carry, s0)), g0 = jax.value_and_grad(fn, has_aux=True)(
            params, jax.tree_util.tree_map(lambda x: x[0], mbs), carry0)
        rest = jax.tree_util.tree_map(lambda x: x[1:], mbs)
        (gsum, ssum, carry), _ = jax.lax.scan(body, (g0, s0, carry), rest)
        grads = jax.tree_util.tree_map(lambda a: a / rounds, gsum)
        stats = {k: v / rounds for k, v in ssum.items()}
        return grads, stats, carry

    jit_kwargs = {}
    if state_sharding is not None:
        # stats are scalars -> replicated; prefix-match the whole dict
        from jax.sharding import NamedSharding, PartitionSpec
        rep = NamedSharding(jax.tree_util.tree_leaves(state_sharding)[0].mesh,
                            PartitionSpec())
        jit_kwargs["out_shardings"] = (state_sharding, rep)
        if mesh is None:
            mesh = jax.tree_util.tree_leaves(state_sharding)[0].mesh

    @partial(jax.jit, static_argnames=("do_gpl", "do_dr1"),
             donate_argnums=(0,) if donate else (), **jit_kwargs)
    def train_step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array,
                   do_gpl: bool = False, do_dr1: bool = False):
        stats: Dict[str, jax.Array] = {}
        B = batch["real_t"].shape[0]
        rounds = _rounds(B)
        real_img = batch["real_img"].astype(jnp.float32) / 127.5 - 1.0
        real_img = real_img.reshape(-1, *real_img.shape[2:])       # [B*F, H, W, C]
        real_c = maybe_c(batch["real_c"])
        real_t = batch["real_t"].astype(jnp.float32)
        gen_t = batch["gen_t"].astype(jnp.float32)

        keys = jax.random.split(rng, 8)

        # ---- Gmain ----------------------------------------------------
        z0 = jax.random.normal(keys[0], (B, z_dim))
        vars_D = {"params": state.params_D}

        def gmain_fn(p, mb, extra):
            l, (new_moving, s) = loss.gmain(
                p, extra, vars_D, mb["z"], maybe_c(mb["c"]), mb["t"],
                jax.random.fold_in(keys[1], mb["idx"][0]), state.augment_p)
            extra = dict(extra)
            if new_moving is not None:
                extra["moving"] = new_moving["moving"]
            return l, (extra, s)

        gmain_mb = {"z": z0, "c": batch["gen_c"][:, 0], "t": gen_t[:, 0],
                    "idx": jnp.arange(B)}
        with jax.named_scope("Gmain"):
            grads_G, s, extra_G = _accum(gmain_fn, state.params_G, gmain_mb,
                                         rounds, carry0=dict(state.extra_G))
        stats.update(s)
        with jax.named_scope("Gopt"):
            updates, opt_G_state = opt_g.update(
                scrub_grads(grads_G, tcfg.grad_clip_value),
                state.opt_G, state.params_G)
            params_G = optax.apply_updates(state.params_G, updates)

        # ---- Gpl (lazy, gain = interval) -------------------------------
        pl_mean = state.pl_mean
        if do_gpl:
            z1 = jax.random.normal(keys[2], (B, z_dim))
            gain = float(tcfg.G_reg_interval or 1)

            def gpl_fn(p, mb, pl_m):
                l, (pl_m, s) = loss.gpl(p, extra_G, mb["z"], maybe_c(mb["c"]),
                                        mb["t"],
                                        jax.random.fold_in(keys[3], mb["idx"][0]),
                                        pl_m)
                return l * gain, (pl_m, s)

            gpl_mb = {"z": z1, "c": batch["gen_c"][:, 1], "t": gen_t[:, 1],
                      "idx": jnp.arange(B)}
            with jax.named_scope("Gpl"):
                grads_G, s, pl_mean = _accum(gpl_fn, params_G, gpl_mb, rounds,
                                             carry0=pl_mean)
            stats.update(s)
            updates, opt_G_state = opt_g.update(
                scrub_grads(grads_G, tcfg.grad_clip_value), opt_G_state, params_G)
            params_G = optax.apply_updates(params_G, updates)

        # ---- Dmain (Dgen + Dreal in one optimizer step) ----------------
        z2 = jax.random.normal(keys[4], (B, z_dim))
        vars_G_new = {"params": params_G, **extra_G}
        F = real_t.shape[1]

        def dmain_fn(p_d, mb, _):
            k = jax.random.fold_in(keys[5], mb["idx"][0])
            l1, s1 = loss.dgen(p_d, vars_G_new, {}, mb["z"], maybe_c(mb["gc"]),
                               mb["gt"], jax.random.fold_in(k, 0), state.augment_p)
            ri = mb["ri"].reshape(-1, *mb["ri"].shape[2:])
            l2, s2 = loss.dreal_dr1(p_d, {}, ri, maybe_c(mb["rc"]), mb["rt"],
                                    jax.random.fold_in(k, 1), state.augment_p,
                                    do_main=True, do_r1=False,
                                    r1_gamma=loss_cfg.r1_gamma)
            s1.update(s2)
            s1["Loss/D/loss"] = l1 + s2.get("Loss/D/loss_real", 0.0)
            return l1 + l2, (None, s1)

        real_img_b = real_img.reshape(B, F, *real_img.shape[1:])
        dmain_mb = {"z": z2, "gc": batch["gen_c"][:, 2], "gt": gen_t[:, 2],
                    "ri": real_img_b, "rc": batch["real_c"], "rt": real_t,
                    "idx": jnp.arange(B)}
        with jax.named_scope("Dmain"):
            grads_D, s, _ = _accum(dmain_fn, state.params_D, dmain_mb, rounds)
        stats.update(s)
        updates_d, opt_D_state = opt_d.update(
            scrub_grads(grads_D, tcfg.grad_clip_value), state.opt_D, state.params_D)
        params_D = optax.apply_updates(state.params_D, updates_d)

        # ---- Dr1 (lazy, gain = interval) --------------------------------
        if do_dr1:
            gain = float(tcfg.D_reg_interval or 1)

            def dr1_fn(p_d, mb, _):
                ri = mb["ri"].reshape(-1, *mb["ri"].shape[2:])
                l, s = loss.dreal_dr1(p_d, {}, ri, maybe_c(mb["rc"]), mb["rt"],
                                      jax.random.fold_in(keys[7], mb["idx"][0]),
                                      state.augment_p, do_main=False,
                                      do_r1=True, r1_gamma=loss_cfg.r1_gamma)
                return l * gain, (None, s)

            dr1_mb = {"ri": real_img_b, "rc": batch["real_c"], "rt": real_t,
                      "idx": jnp.arange(B)}
            with jax.named_scope("Dr1"):
                grads_D, s, _ = _accum(dr1_fn, params_D, dr1_mb, rounds)
            stats.update(s)
            updates_d, opt_D_state = opt_d.update(
                scrub_grads(grads_D, tcfg.grad_clip_value), opt_D_state, params_D)
            params_D = optax.apply_updates(params_D, updates_d)

        # ---- G_ema (reference training_loop.py:391-400) -----------------
        with jax.named_scope("Gema"):
            ema_nimg = tcfg.ema_kimg * 1000.0
            if tcfg.ema_rampup is not None:
                ema_nimg = jnp.minimum(ema_nimg, state.cur_nimg * tcfg.ema_rampup)
            ema_beta = 0.5 ** (tcfg.batch_size / jnp.maximum(ema_nimg, 1e-8))
            params_Gema = jax.tree_util.tree_map(
                lambda p, e: p + (e - p) * ema_beta, params_G, state.params_Gema)
            extra_Gema = jax.tree_util.tree_map(lambda x: x, extra_G)  # buffer copy

        # ---- ADA controller (reference training_loop.py:406-410) --------
        augment_p = state.augment_p
        ada_sign_acc = state.ada_sign_acc + stats.get(
            "Loss/signs/real", jnp.zeros(()))
        if tcfg.ada_target is not None:
            apply_now = ((state.step + 1) % tcfg.ada_interval) == 0
            adjust = jnp.sign(ada_sign_acc / tcfg.ada_interval - tcfg.ada_target) * \
                (tcfg.batch_size * tcfg.ada_interval) / (tcfg.ada_kimg * 1000.0)
            augment_p = jnp.where(apply_now,
                                  jnp.maximum(augment_p + adjust, 0.0), augment_p)
            ada_sign_acc = jnp.where(apply_now, 0.0, ada_sign_acc)
        stats["Progress/augment_p"] = augment_p

        new_state = state.replace(
            step=state.step + 1,
            cur_nimg=state.cur_nimg + tcfg.batch_size * num_frames,
            params_G=params_G, extra_G=extra_G, params_D=params_D,
            params_Gema=params_Gema, extra_Gema=extra_Gema,
            opt_G=opt_G_state, opt_D=opt_D_state,
            pl_mean=pl_mean, augment_p=augment_p, ada_sign_acc=ada_sign_acc)
        return new_state, stats

    if mesh is not None and mesh.size > 1:
        abstract = mesh.abstract_mesh

        def train_step_with_mesh(state, batch, rng, **kw):
            with jax.sharding.use_abstract_mesh(abstract):
                return train_step(state, batch, rng, **kw)

        return train_step_with_mesh
    return train_step
