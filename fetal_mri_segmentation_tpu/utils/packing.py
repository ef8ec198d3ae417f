"""Bit-packed binary label masks (device→host transfer format).

MSB-first weights [128, 64, ..., 1], matching ``np.unpackbits``'
big-endian default. BOTH sides of the contract live here — the jnp pack
(called inside the jitted label programs of the sliding-window and
spatial predictors) and the ONE host-side unpack shared by every consumer
(predictors, exported-artifact loader) — so the bit order cannot drift
between copies.
"""

from __future__ import annotations

import numpy as np


def pack_bit_mask(mask_flat):
    """jnp uint8/bool 1-D mask → uint8 packed bytes (MSB-first).

    Traceable (used inside jit). Pads to a byte boundary with zeros; the
    unpack side truncates back to the caller's shape.
    """
    import jax.numpy as jnp

    mask = mask_flat.astype(jnp.uint8)
    padn = (-mask.shape[0]) % 8
    if padn:
        mask = jnp.pad(mask, (0, padn))
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return (mask.reshape(-1, 8) * weights[None, :]).sum(
        axis=1).astype(jnp.uint8)


def device_label_map(prob, threshold, n_labels: int, labels):
    """(L, D, H, W) device probability map → the D2H label artifact.

    Binary (n_labels==1): threshold → bit-packed uint8 bytes (8× fewer D2H
    bytes). Multi-class: argmax over channels mapped through ``labels``
    (channel i → labels[i], the reference prediction_to_image semantics),
    zeroed where no channel clears ``threshold``, as a uint8 map.

    ONE implementation (traceable, called inside the jitted label programs)
    shared by the sliding-window and spatial predictors so the label-map
    semantics cannot drift between serving modes.
    """
    import jax.numpy as jnp

    if n_labels == 1:
        return pack_bit_mask((prob[0] > threshold).reshape(-1))
    # numpy-only import (labelmaps has no jax dependency); the dtype is
    # static at trace time — label values >255 widen the D2H artifact
    # instead of wrapping modulo 256
    from fetal_mri_segmentation_tpu.inference.labelmaps import label_map_dtype

    lab_list = list(labels or range(1, n_labels + 1))
    lab = jnp.asarray(lab_list, jnp.int32)
    label_map = jnp.take(lab, jnp.argmax(prob, axis=0))
    return jnp.where(jnp.max(prob, axis=0) > threshold,
                     label_map, 0).astype(label_map_dtype(lab_list))


def unpack_bit_mask(packed, shape) -> np.ndarray:
    """uint8 packed bits → uint8 binary mask of ``shape`` (D, H, W)."""
    packed = np.asarray(packed)
    bits = np.unpackbits(packed.reshape(-1, 1), axis=1)
    return bits.reshape(-1)[: int(np.prod(shape))].reshape(
        tuple(shape)).astype(np.uint8)
