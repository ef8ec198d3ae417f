"""Fused dec0 Pallas kernel (ops/pallas_dec0.py) vs the XLA reference
(models/layers.py::up_concat_conv3x3). Runs in Pallas interpret mode on CPU
(the same kernel code Mosaic compiles on TPU)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("FETAL_TPU_PALLAS_INTERPRET", "1")

import jax
import jax.numpy as jnp

from fetal_mri_segmentation_tpu.models.layers import up_concat_conv3x3
from fetal_mri_segmentation_tpu.ops.pallas_dec0 import (
    dec0_available, up_concat_conv3x3_pallas)


from tests.synthetic import decoder_level_case as _case


def test_matches_xla_reference():
    x, s, k, b = _case()
    assert dec0_available(x.shape, x.shape[-1], s.shape[-1], k.shape[-1], 4)
    ref = up_concat_conv3x3(x, s, k, b)
    got = up_concat_conv3x3_pallas(x, s, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_fused_activation():
    x, s, k, b = _case(seed=1)
    ref = jnp.maximum(up_concat_conv3x3(x, s, k, b), 0.0)
    got = up_concat_conv3x3_pallas(x, s, k, b, "relu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    ref_l = up_concat_conv3x3(x, s, k, b)
    ref_l = jnp.where(ref_l > 0, ref_l, ref_l * 0.3)
    got_l = up_concat_conv3x3_pallas(x, s, k, b, "leaky_relu", 0.3)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(ref_l),
                               atol=1e-4)


def test_non_cubic_and_odd_batch():
    """Anisotropic coarse grids (d != h != w) must route taps correctly."""
    rng = np.random.default_rng(2)
    B, dd, hh, ww, CU, CS, CO = 1, 3, 4, 5, 8, 8, 8
    x = jnp.asarray(rng.normal(size=(B, dd, hh, ww, CU)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(B, 2 * dd, 2 * hh, 2 * ww, CS)),
                    jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, CU + CS, CO)) * 0.1,
                    jnp.float32)
    b = jnp.zeros((CO,), jnp.float32)
    ref = up_concat_conv3x3(x, s, k, b)
    got = up_concat_conv3x3_pallas(x, s, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_gradients_match_reference():
    """The custom VJP (XLA recompute through the parity formulation) must
    agree with differentiating the reference directly."""
    x, s, k, b = _case(B=1, seed=3)

    def loss_p(x, s, k, b):
        return jnp.sum(up_concat_conv3x3_pallas(x, s, k, b, "relu") ** 2)

    def loss_r(x, s, k, b):
        return jnp.sum(jnp.maximum(up_concat_conv3x3(x, s, k, b), 0.0) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(x, s, k, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(x, s, k, b)
    for a, r in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=2e-3)


def test_availability_gates():
    assert not dec0_available((1, 4, 4, 4, 12), 12, 8, 8, 4)  # ch % 8
    # VMEM blowout: enormous plane
    assert not dec0_available((1, 128, 128, 128, 128), 128, 64, 64, 2)
    # skip dims not exactly 2x the coarse grid (odd dim survived a pooling
    # level): must decline here, not die in a reshape inside jit
    assert not dec0_available((1, 4, 4, 4, 16), 16, 8, 8, 4,
                              skip_shape=(1, 8, 8, 7, 8))
    assert dec0_available((1, 4, 4, 4, 16), 16, 8, 8, 4,
                          skip_shape=(1, 8, 8, 8, 8))


def test_unet_forward_matches_with_dec0_kernel():
    """Whole-model forward with use_pallas_dec0 == plain XLA forward
    (same params — the kernel only changes the decoder-level execution)."""
    from fetal_mri_segmentation_tpu.models import UNet3D

    model_ref = UNet3D(n_labels=1, depth=3, n_base_filters=8,
                       dtype=jnp.float32)
    model_pal = UNet3D(n_labels=1, depth=3, n_base_filters=8,
                       dtype=jnp.float32, use_pallas_dec0=True)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 16, 16, 16, 1)), jnp.float32)
    params = model_ref.init(jax.random.PRNGKey(0), x)
    ref = model_ref.apply(params, x)
    got = model_pal.apply(params, x)   # same param tree
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
