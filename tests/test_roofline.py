"""HLO contraction parser for the tile-padded MXU roofline
(utils/roofline.py; consumed by scripts/bench_phases.py --hlo-audit).

The fixture mirrors `jit(f).lower(...).as_text(dialect="hlo")` format:
operands are printed by NAME ONLY, so shapes resolve through the
definition map."""
import numpy as np

from stylegan_v_tpu.utils.roofline import (effective_mxu_seconds,
                                           parse_contractions)

HLO = """
HloModule jit_prog, entry_computation_layout={...}

ENTRY main {
  x.1 = bf16[48,256,256,64]{3,2,1,0} parameter(0)
  w.1 = bf16[3,3,64,64]{3,2,1,0} parameter(1)
  conv.1 = bf16[48,256,256,64]{3,2,1,0} convolution(x.1, w.1), window={size=3x3 pad=1_1x1_1}, dim_labels=b01f_01io->b01f
  a.1 = f32[16,512]{1,0} parameter(2)
  wm.1 = f32[512,512]{1,0} parameter(3)
  dot.7 = f32[16,512]{1,0} dot(a.1, wm.1), lhs_contracting_dims={1}, rhs_contracting_dims={0}
  fx.1 = bf16[48,515,256,9]{3,2,1,0} parameter(4)
  ff.1 = bf16[4,1,1,9]{3,2,1,0} parameter(5)
  conv.9 = bf16[48,258,256,9]{3,2,1,0} convolution(fx.1, ff.1), window={size=4x1 stride=2x1}, dim_labels=b01f_01io->b01f, feature_group_count=9
  ba.1 = bf16[9,4096,530]{2,1,0} parameter(6)
  bb.1 = bf16[9,530,544]{2,1,0} parameter(7)
  dot.11 = bf16[9,4096,544]{2,1,0} dot(ba.1, bb.1), lhs_batch_dims={0}, lhs_contracting_dims={2}, rhs_batch_dims={0}, rhs_contracting_dims={1}
}
"""


def test_parse_counts_and_kinds():
    ops = parse_contractions(HLO)
    assert len(ops) == 4
    kinds = [o["kind"] for o in ops]
    assert kinds == ["conv", "dot", "conv", "dot"]


def test_dense_conv_padding():
    conv = parse_contractions(HLO)[0]
    rows = 48 * 256 * 256
    assert conv["m"] == rows and conv["k"] == 9 * 64 and conv["n"] == 64
    assert conv["flops"] == 2.0 * rows * 9 * 64 * 64
    # 64 features pad to 128 on both contraction depth (per tap) and lanes
    assert conv["eff_flops"] == 2.0 * rows * 9 * 128 * 128
    assert conv["eff_flops"] == 4.0 * conv["flops"]


def test_grouped_conv_charged_zero_mxu():
    fir = parse_contractions(HLO)[2]
    assert fir["groups"] == 9
    assert fir["eff_flops"] == 0.0
    assert fir["flops"] > 0


def test_plain_dot():
    dot = parse_contractions(HLO)[1]
    assert (dot["m"], dot["k"], dot["n"]) == (16, 512, 512)
    assert dot["flops"] == 2.0 * 16 * 512 * 512
    assert dot["eff_flops"] == 2.0 * 16 * 512 * 512  # all tiles full


def test_batched_dot_dims():
    bd = parse_contractions(HLO)[3]
    assert (bd["m"], bd["k"], bd["n"]) == (4096, 530, 544)
    assert bd["flops"] == 2.0 * 9 * 4096 * 530 * 544
    # K 530->640, N 544->640
    assert bd["eff_flops"] == 2.0 * 9 * 4096 * 640 * 640


def test_summary():
    s = effective_mxu_seconds(HLO, peak_flops=1e12)
    assert s["num_ops"] == 4
    naive = sum(o["flops"] for o in parse_contractions(HLO))
    assert np.isclose(s["naive_s"], naive / 1e12)
    assert s["eff_s"] > s["naive_s"]


def test_on_real_lowered_hlo():
    """Round-trip through an actual jit lowering on the test backend."""
    import jax
    import jax.numpy as jnp

    def f(x, w, m):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y @ m)

    x = jnp.zeros((2, 16, 16, 8), jnp.bfloat16)
    w = jnp.zeros((3, 3, 8, 8), jnp.bfloat16)
    m = jnp.zeros((8, 4), jnp.bfloat16)
    txt = jax.jit(f).lower(x, w, m).as_text(dialect="hlo")
    ops = parse_contractions(txt)
    convs = [o for o in ops if o["kind"] == "conv"]
    dots = [o for o in ops if o["kind"] == "dot"]
    assert len(convs) == 1 and len(dots) >= 1
    assert convs[0]["m"] == 2 * 16 * 16 and convs[0]["k"] == 9 * 8
    assert convs[0]["n"] == 8
    assert dots[0]["k"] == 8 and dots[0]["n"] == 4
