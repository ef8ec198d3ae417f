"""Dice formula parity vs numpy oracles (SURVEY.md section 4 unit tests)."""

import jax.numpy as jnp
import numpy as np

from fetal_mri_segmentation_tpu.ops import dice as D


def _np_dice(t, p, smooth=1.0):
    t = t.reshape(-1).astype(np.float64)
    p = p.reshape(-1).astype(np.float64)
    return (2 * (t * p).sum() + smooth) / (t.sum() + p.sum() + smooth)


def test_dice_matches_numpy_oracle(rng):
    t = (rng.random((2, 1, 8, 8, 8)) > 0.5).astype(np.float32)
    p = rng.random((2, 1, 8, 8, 8)).astype(np.float32)
    got = float(D.dice_coefficient(jnp.asarray(t), jnp.asarray(p)))
    want = _np_dice(t, p)
    assert abs(got - want) < 1e-5


def test_dice_loss_is_negative_dice(rng):
    t = (rng.random((1, 1, 4, 4, 4)) > 0.5).astype(np.float32)
    p = rng.random((1, 1, 4, 4, 4)).astype(np.float32)
    assert float(D.dice_coefficient_loss(t, p)) == -float(D.dice_coefficient(t, p))


def test_dice_perfect_prediction():
    t = np.ones((1, 1, 4, 4, 4), np.float32)
    assert abs(float(D.dice_coefficient(t, t)) - 1.0) < 1e-6
    z = np.zeros_like(t)
    # all-empty: smooth term gives exactly 1
    assert abs(float(D.dice_coefficient(z, z)) - 1.0) < 1e-6


def test_weighted_dice_matches_numpy_oracle(rng):
    t = (rng.random((2, 3, 8, 8, 8)) > 0.5).astype(np.float32)
    p = rng.random((2, 3, 8, 8, 8)).astype(np.float32)
    s = 1e-5
    num = 2 * ((t * p).sum(axis=(-3, -2, -1)) + s / 2)
    den = t.sum(axis=(-3, -2, -1)) + p.sum(axis=(-3, -2, -1)) + s
    want = (num / den).mean()
    got = float(D.weighted_dice_coefficient(jnp.asarray(t), jnp.asarray(p)))
    assert abs(got - want) < 1e-5
    assert float(D.weighted_dice_coefficient_loss(t, p)) == -got


def test_label_wise_dice_selects_channel(rng):
    t = (rng.random((2, 3, 6, 6, 6)) > 0.5).astype(np.float32)
    p = rng.random((2, 3, 6, 6, 6)).astype(np.float32)
    f1 = D.get_label_dice_coefficient_function(1)
    assert f1.__name__ == "label_1_dice_coef"
    want = _np_dice(t[:, 1], p[:, 1])
    assert abs(float(f1(t, p)) - want) < 1e-5


def test_hard_dice():
    t = np.zeros((4, 4, 4), bool)
    p = np.zeros((4, 4, 4), bool)
    t[:2] = True
    p[1:3] = True
    assert abs(D.hard_dice(t, p) - 0.5) < 1e-12
    assert D.hard_dice(np.zeros(8), np.zeros(8)) == 1.0


def test_weighted_dice_sample_mask_equals_ragged(rng):
    """Masked padded batch == ragged batch for the weighted loss."""
    import jax.numpy as jnp
    t = (rng.random((3, 2, 4, 4, 4)) > 0.5).astype(np.float32)
    p = rng.random((3, 2, 4, 4, 4)).astype(np.float32)
    ragged = float(D.weighted_dice_coefficient(t, p))
    tp = np.concatenate([t, np.zeros((2, 2, 4, 4, 4), np.float32)])
    pp = np.concatenate([p, np.zeros((2, 2, 4, 4, 4), np.float32)])
    mask = jnp.asarray([1, 1, 1, 0, 0], jnp.float32)
    padded = float(D.weighted_dice_coefficient(tp, pp, sample_mask=mask))
    assert abs(ragged - padded) < 1e-6


def test_weighted_dice_unmasked_padding_differs(rng):
    """Sanity: WITHOUT the mask, zero-padding skews the weighted mean
    (each padded sample contributes a spurious 1.0 term)."""
    t = (rng.random((2, 1, 4, 4, 4)) > 0.5).astype(np.float32)
    p = rng.random((2, 1, 4, 4, 4)).astype(np.float32)
    ragged = float(D.weighted_dice_coefficient(t, p))
    tp = np.concatenate([t, np.zeros((2, 1, 4, 4, 4), np.float32)])
    pp = np.concatenate([p, np.zeros((2, 1, 4, 4, 4), np.float32)])
    padded = float(D.weighted_dice_coefficient(tp, pp))
    assert abs(ragged - padded) > 1e-3
