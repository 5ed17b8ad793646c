"""Loss-layer parity vs the PyTorch reference: with imported weights and
identical inputs, the R1 penalty and the non-saturating losses must agree
numerically. Validates the training objective, not just the model forward.
Skipped when /root/reference is unavailable.
"""
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
HAS_REF = os.path.isdir("/root/reference/src")
pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference repo not available")

from stylegan_v_tpu.io.legacy import convert_discriminator_state
from stylegan_v_tpu.models import Discriminator
from stylegan_v_tpu.training.loss import GANLoss, LossConfig
from test_legacy_import import my_cfgs, ref_modules  # fixture reuse


def test_r1_penalty_parity(ref_modules):
    """R1 = |dD/dx|^2 summed per frame, averaged per video — values must
    match the reference's autograd computation (reference loss.py:161-173)."""
    import torch
    _, RefD = ref_modules
    _, dcfg = my_cfgs()
    myD = Discriminator(dcfg)
    variables = convert_discriminator_state(
        {k: v.numpy() for k, v in RefD.state_dict().items()},
        epilogue_channels=64)

    B, F = 2, 3
    rng = np.random.RandomState(0)
    img = rng.randn(B * F, 3, 32, 32).astype(np.float32) * 0.5
    t = np.array([[0.0, 2.0, 7.0], [1.0, 5.0, 6.0]], np.float32)

    # ---- reference r1 (torch double-backward) ----
    img_t = torch.from_numpy(img).requires_grad_(True)
    logits = RefD(img_t, torch.zeros(B, 0), torch.from_numpy(t))["image_logits"]
    grads = torch.autograd.grad(logits.sum(), img_t, create_graph=False)[0]
    r1_frame_ref = grads.square().sum(dim=[1, 2, 3]).detach().numpy()   # [B*F]
    r1_video_ref = r1_frame_ref.reshape(B, F).mean(axis=1)

    # ---- ours (jax.grad) ----
    img_j = jnp.asarray(img.transpose(0, 2, 3, 1))

    def logits_sum(x):
        return jnp.sum(myD.apply(variables, x, None, jnp.asarray(t))["image_logits"])

    g = jax.grad(logits_sum)(img_j)
    r1_frame = np.asarray(jnp.sum(jnp.square(g), axis=(1, 2, 3)))
    np.testing.assert_allclose(r1_frame, r1_frame_ref, rtol=2e-2, atol=1e-3)
    np.testing.assert_allclose(r1_frame.reshape(B, F).mean(1), r1_video_ref,
                               rtol=2e-2)


def test_nonsaturating_loss_values(ref_modules):
    """softplus(±logits) means must match for identical logits."""
    import torch
    import torch.nn.functional as TF
    logits = np.linspace(-4, 4, 9, dtype=np.float32)
    want_g = TF.softplus(-torch.from_numpy(logits)).mean().item()
    want_dgen = TF.softplus(torch.from_numpy(logits)).mean().item()
    got_g = float(jnp.mean(jax.nn.softplus(-jnp.asarray(logits))))
    got_dgen = float(jnp.mean(jax.nn.softplus(jnp.asarray(logits))))
    assert abs(got_g - want_g) < 1e-6
    assert abs(got_dgen - want_dgen) < 1e-6


def test_dmain_loss_through_imported_D(ref_modules):
    """End-to-end Dreal loss value (softplus(-D(x)) mean) parity."""
    import torch
    import torch.nn.functional as TF
    _, RefD = ref_modules
    _, dcfg = my_cfgs()
    myD = Discriminator(dcfg)
    variables = convert_discriminator_state(
        {k: v.numpy() for k, v in RefD.state_dict().items()},
        epilogue_channels=64)
    B, F = 2, 3
    rng = np.random.RandomState(1)
    img = rng.randn(B * F, 3, 32, 32).astype(np.float32) * 0.5
    t = np.array([[0.0, 2.0, 7.0], [1.0, 5.0, 6.0]], np.float32)
    with torch.no_grad():
        ref_logits = RefD(torch.from_numpy(img), torch.zeros(B, 0),
                          torch.from_numpy(t))["image_logits"]
        want = TF.softplus(-ref_logits).mean().item()
    from stylegan_v_tpu.models import Generator
    gcfg, _ = my_cfgs()
    loss = GANLoss(Generator(gcfg), myD, LossConfig())  # G unused in dreal path
    got, stats = loss.dreal_dr1(variables["params"], {},
                                jnp.asarray(img.transpose(0, 2, 3, 1)), None,
                                jnp.asarray(t), jax.random.PRNGKey(0), 0.0,
                                do_main=True, do_r1=False, r1_gamma=1.0)
    assert abs(float(got) - want) < 5e-3
