"""Flat-plane Pallas conv (any channel count) vs the XLA oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fetal_mri_segmentation_tpu.ops import pallas_conv_flat as PF


def xla_conv_act(x, w, b, activation="relu", slope=0.01):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32) + b.astype(jnp.float32)
    if activation == "relu":
        y = jnp.maximum(y, 0)
    elif activation == "leaky_relu":
        y = jnp.where(y > 0, y, y * slope)
    return y.astype(x.dtype)


def make(B=1, D=6, H=10, W=12, CI=3, CO=5, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (B, D, H, W, CI)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, CI, CO)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (CO,)), jnp.float32)
    return x, w, b


def test_flat_layout_roundtrip():
    x, _, _ = make()
    xf, (H, W, P) = PF.to_flat(x)
    assert P % 128 == 0
    back = PF.from_flat(xf, H, W)
    assert np.array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize("CI,CO", [(1, 4), (3, 5), (8, 8), (32, 16)])
def test_flat_conv_matches_xla_any_channels(CI, CO):
    x, w, b = make(CI=CI, CO=CO, seed=CI)
    got = PF.conv3x3_chain(x, (w,), (b,), ("relu",), interpret=True)
    want = xla_conv_act(x, w, b)
    assert got.shape == want.shape
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-4), \
        float(np.abs(np.asarray(got) - np.asarray(want)).max())


def test_flat_conv_chain_two_layers():
    """A U-Net level's conv pair chained without intermediate relayout."""
    x, w1, b1 = make(CI=4, CO=6, seed=1)
    rng = np.random.default_rng(2)
    w2 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 6, 8)), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 0.1, (8,)), jnp.float32)
    got = PF.conv3x3_chain(x, (w1, w2), (b1, b2), ("relu", "leaky_relu"),
                           interpret=True)
    want = xla_conv_act(xla_conv_act(x, w1, b1, "relu"), w2, b2, "leaky_relu")
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-4), \
        float(np.abs(np.asarray(got) - np.asarray(want)).max())
