"""Portable model export (StableHLO) for deployment without Python model code.

Reference: the reference "deploys" by shipping the Keras ``.h5`` plus the
repo (training.py::load_old_model with custom_objects). The TPU-native
equivalent is a **self-contained serialized program**: `jax.export` captures
the jitted whole-volume label-map program — model graph, trained weights
(baked as constants), sliding-window reconstruction, thresholding — as one
StableHLO artifact that any later jax (or XLA runtime) can load and run with
NO dependency on this package's model classes or flax.

    # producer (has the framework + checkpoint)
    export_predictor(model, config, variables, image_shape, "model.fetal")

    # consumer (only needs jax)
    predict = load_predictor("model.fetal")
    labels = predict(volume)          # (C, D, H, W) f32 -> uint8 labels

The exported program is the SAME compiled path `predict.py` serves, so
outputs are identical by construction (round-trip test in
tests/test_export.py).
"""

from __future__ import annotations

import json
import struct
from typing import Optional, Sequence

import numpy as np

_MAGIC = b"FETALTPU1"


def export_predictor(model, config, variables, image_shape: Sequence[int],
                     path: str, overlap: int = 16,
                     patch_batch_size: int = 27,
                     threshold: float = 0.5) -> None:
    """Serialize the whole-volume label-map program with weights baked in."""
    import jax
    from jax import export as jexport

    from fetal_mri_segmentation_tpu.inference.sliding_window import (
        SlidingWindowPredictor)

    predictor = SlidingWindowPredictor(model, config,
                                       image_shape=image_shape,
                                       overlap=overlap,
                                       patch_batch_size=patch_batch_size)
    variables = jax.device_get(variables)  # bake host copies as constants

    def program(vol_cdhw):
        return predictor._predict_labels_packed(variables, vol_cdhw,
                                                threshold)

    n_ch = len(config.training_modalities)
    spec = jax.ShapeDtypeStruct((n_ch,) + tuple(image_shape), np.float32)
    exported = jexport.export(jax.jit(program))(spec)
    meta = {
        "image_shape": list(int(s) for s in image_shape),
        "n_channels": n_ch,
        "n_labels": int(config.n_labels),
        "labels": list(config.labels or []),
        "threshold": threshold,
        "packed_bits": config.n_labels == 1,
        "model_name": config.model_name,
    }
    meta_blob = json.dumps(meta).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(meta_blob)))
        f.write(meta_blob)
        f.write(exported.serialize())


def load_predictor(path: str):
    """Load an exported artifact; returns ``predict(vol) -> uint8 labels``.

    Needs only jax — no model classes, no flax, no checkpoint files.
    """
    from jax import export as jexport

    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a fetal-tpu export artifact")
        (meta_len,) = struct.unpack("<I", f.read(4))
        meta = json.loads(f.read(meta_len).decode())
        exported = jexport.deserialize(f.read())

    image_shape = tuple(meta["image_shape"])

    def predict(vol_cdhw) -> np.ndarray:
        out = np.asarray(exported.call(np.asarray(vol_cdhw, np.float32)))
        if meta["packed_bits"]:
            bits = np.unpackbits(out.reshape(-1, 1), axis=1)
            return bits.reshape(-1)[: int(np.prod(image_shape))].reshape(
                image_shape).astype(np.uint8)
        return out

    predict.meta = meta
    return predict
