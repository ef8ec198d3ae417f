"""Soft-Dice losses and metrics.

Formula parity with the reference (reference: unet3d/metrics.py::
dice_coefficient, dice_coefficient_loss, weighted_dice_coefficient,
weighted_dice_coefficient_loss, label_wise_dice_coefficient):

- ``dice = (2*sum(t*p) + smooth) / (sum(t) + sum(p) + smooth)`` over the
  flattened tensors, ``smooth = 1.0``.
- The loss is the NEGATIVE dice (not ``1 - dice``) — optimum at -1.
- Weighted (multi-class) dice: per-channel dice over the spatial axes with
  ``smooth = 1e-5`` and ``smooth/2`` added inside the numerator sum, then the
  unweighted mean over channels (equal class weighting).

All functions are pure ``jnp`` and usable under jit/grad/vmap. Reductions are
accumulated in float32 regardless of the compute dtype so that bf16 model
outputs still produce accurate Dice numbers on TPU.

Tensor layout: channels-first ``(B, C, D, H, W)`` like the reference
(Keras ``image_data_format="channels_first"``); the functions only assume the
channel axis position where it matters (label-wise metrics).
"""

from __future__ import annotations

import jax.numpy as jnp


def dice_coefficient(y_true: jnp.ndarray, y_pred: jnp.ndarray,
                     smooth: float = 1.0) -> jnp.ndarray:
    """Global soft Dice over flattened tensors. Reference: metrics.py::dice_coefficient."""
    y_true_f = y_true.reshape(-1).astype(jnp.float32)
    y_pred_f = y_pred.reshape(-1).astype(jnp.float32)
    intersection = jnp.sum(y_true_f * y_pred_f)
    return (2.0 * intersection + smooth) / (
        jnp.sum(y_true_f) + jnp.sum(y_pred_f) + smooth)


def dice_coefficient_loss(y_true: jnp.ndarray, y_pred: jnp.ndarray,
                          smooth: float = 1.0) -> jnp.ndarray:
    """Negative dice (NOT 1-dice). Reference: metrics.py::dice_coefficient_loss."""
    return -dice_coefficient(y_true, y_pred, smooth=smooth)


def weighted_dice_coefficient(y_true: jnp.ndarray, y_pred: jnp.ndarray,
                              axis=(-3, -2, -1),
                              smooth: float = 1e-5) -> jnp.ndarray:
    """Per-channel dice over spatial axes, mean over channels.

    Reference: metrics.py::weighted_dice_coefficient —
    ``mean( 2*(sum(t*p, axis) + smooth/2) / (sum(t, axis) + sum(p, axis) + smooth) )``.
    """
    y_true = y_true.astype(jnp.float32)
    y_pred = y_pred.astype(jnp.float32)
    num = 2.0 * (jnp.sum(y_true * y_pred, axis=axis) + smooth / 2.0)
    den = jnp.sum(y_true, axis=axis) + jnp.sum(y_pred, axis=axis) + smooth
    return jnp.mean(num / den)


def weighted_dice_coefficient_loss(y_true: jnp.ndarray,
                                   y_pred: jnp.ndarray) -> jnp.ndarray:
    """Reference: metrics.py::weighted_dice_coefficient_loss (negative weighted dice)."""
    return -weighted_dice_coefficient(y_true, y_pred)


def label_wise_dice_coefficient(y_true: jnp.ndarray, y_pred: jnp.ndarray,
                                label_index: int) -> jnp.ndarray:
    """Dice of one label channel (channels-first axis 1).

    Reference: metrics.py::label_wise_dice_coefficient.
    """
    return dice_coefficient(y_true[:, label_index], y_pred[:, label_index])


def get_label_dice_coefficient_function(label_index: int):
    """Closure with a stable ``__name__`` for logging.

    Reference: metrics.py::get_label_dice_coefficient_function (the name is
    part of the training.log CSV header surface).
    """

    def f(y_true, y_pred):
        return label_wise_dice_coefficient(y_true, y_pred, label_index)

    f.__name__ = f"label_{label_index}_dice_coef"
    return f


def hard_dice(y_true, y_pred) -> float:
    """Hard (binary) Dice used by evaluate.py — numpy-compatible semantics.

    Reference: evaluate.py::dice_coefficient (hard masks, no smoothing;
    empty-vs-empty is defined as 1.0 here to keep per-case CSVs finite).
    """
    import numpy as np

    t = np.asarray(y_true).astype(bool)
    p = np.asarray(y_pred).astype(bool)
    denom = t.sum() + p.sum()
    if denom == 0:
        return 1.0
    return float(2.0 * np.logical_and(t, p).sum() / denom)
