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


def test_conv3x3_flat_matches_xla():
    """NDHWC-boundary single-conv entry (the ConvBlock integration point)."""
    x, w, b = make(CI=8, CO=12, seed=3)
    got = PF._conv3x3_flat_fwd(x, w, b, activation="leaky_relu",
                               negative_slope=0.3, interpret=True)
    want = xla_conv_act(x, w, b, "leaky_relu", slope=0.3)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-4), \
        float(np.abs(np.asarray(got) - np.asarray(want)).max())


def test_conv3x3_flat_grads_match_xla(monkeypatch):
    """custom_vjp of the flat op == pure-XLA gradients."""
    orig = PF._conv3x3_flat_fwd
    monkeypatch.setattr(
        PF, "_conv3x3_flat_fwd",
        lambda x, w, b, **kw: orig(x, w, b, interpret=True,
                                   **{k: v for k, v in kw.items()
                                      if k != "interpret"}))
    x, w, b = make(B=1, D=4, H=4, W=6, CI=8, CO=8, seed=4)

    def loss_pallas(x, w, b):
        return (PF.conv3x3_flat(x, w, b, "relu") ** 2).sum()

    def loss_xla(x, w, b):
        return (xla_conv_act(x, w, b, "relu") ** 2).sum()

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(x, w, b)
    for a, bb in zip(g1, g2):
        assert np.allclose(np.asarray(a), np.asarray(bb), atol=1e-3), \
            float(np.abs(np.asarray(a) - np.asarray(bb)).max())


def test_flat_conv_tap_group3_matches_xla(monkeypatch):
    """Wide-C fallback (one GEMM per kh row) == XLA oracle. Distinct shape
    from other tests so the jit cache can't serve a tap_group=9 trace."""
    monkeypatch.setattr(PF, "_tap_group", lambda ci, P, itemsize=2: 3)
    x, w, b = make(B=1, D=5, H=9, W=11, CI=8, CO=6, seed=7)
    got = PF._conv3x3_flat_fwd(x, w, b, activation="relu", interpret=True)
    want = xla_conv_act(x, w, b, "relu")
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-4), \
        float(np.abs(np.asarray(got) - np.asarray(want)).max())


def test_flat_availability_gate(monkeypatch):
    monkeypatch.setenv("FETAL_TPU_PALLAS_INTERPRET", "1")
    assert not PF.pallas_conv_flat_available((1, 8, 8, 8), ci=1, co=32)
    assert PF.pallas_conv_flat_available((1, 64, 64, 64), ci=32, co=64)
    assert PF.pallas_conv_flat_available((1, 64, 64, 64), ci=192, co=64)
    monkeypatch.setenv("FETAL_TPU_NO_PALLAS", "1")
    assert not PF.pallas_conv_flat_available((1, 64, 64, 64), ci=32, co=64)


def test_unet_dispatches_flat_when_slab_unavailable(monkeypatch):
    """ConvBlock falls back slab -> flat -> XLA; with the slab kernel gated
    off, the flat path must produce identical numerics on the same params."""
    monkeypatch.setenv("FETAL_TPU_PALLAS_INTERPRET", "1")
    from fetal_mri_segmentation_tpu.models import UNet3D
    from fetal_mri_segmentation_tpu.ops import pallas_conv as PC

    monkeypatch.setattr(PC, "pallas_conv3x3_available",
                        lambda *a, **k: False)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (1, 8, 8, 8, 8)),
                    jnp.float32)
    plain = UNet3D(n_labels=1, depth=2, n_base_filters=8, dtype=jnp.float32)
    fused = UNet3D(n_labels=1, depth=2, n_base_filters=8, dtype=jnp.float32,
                   use_pallas=True)
    params = plain.init(jax.random.PRNGKey(0), x)
    y_plain = plain.apply(params, x)
    y_fused = fused.apply(params, x)
    assert np.allclose(np.asarray(y_plain), np.asarray(y_fused), atol=2e-4), \
        float(np.abs(np.asarray(y_plain) - np.asarray(y_fused)).max())


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
