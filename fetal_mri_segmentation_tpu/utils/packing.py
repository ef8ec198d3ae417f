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


def unpack_bit_mask(packed, shape) -> np.ndarray:
    """uint8 packed bits → uint8 binary mask of ``shape`` (D, H, W)."""
    packed = np.asarray(packed)
    bits = np.unpackbits(packed.reshape(-1, 1), axis=1)
    return bits.reshape(-1)[: int(np.prod(shape))].reshape(
        tuple(shape)).astype(np.uint8)
