"""Bit-packed binary label masks (device→host transfer format).

The pack side lives in the jitted programs (inference/sliding_window.py::
_predict_labels_packed and parallel/spatial.py's _labels): MSB-first
weights [128, 64, ..., 1], matching ``np.unpackbits``' big-endian default.
This module is the ONE host-side unpack implementation shared by every
consumer (sliding-window predictor, spatial predictor, exported-artifact
loader) so the bit-order contract cannot drift between copies.
"""

from __future__ import annotations

import numpy as np


def unpack_bit_mask(packed, shape) -> np.ndarray:
    """uint8 packed bits → uint8 binary mask of ``shape`` (D, H, W)."""
    packed = np.asarray(packed)
    bits = np.unpackbits(packed.reshape(-1, 1), axis=1)
    return bits.reshape(-1)[: int(np.prod(shape))].reshape(
        tuple(shape)).astype(np.uint8)
