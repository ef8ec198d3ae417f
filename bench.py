#!/usr/bin/env python
"""TPU benchmark — the BASELINE.md composite, one JSON line to stdout.

Measures on the attached TPU chip exactly the composite that
``baseline_keras.py`` measures on CPU Keras (the reference-equivalent):

  one "volume-equivalent" = 8 batch-1 train steps on 64^3 patches
  (depth-3 3D U-Net, soft-Dice, Adam) + 1 whole-volume sliding-window
  inference (128^3 volume, 64^3 patches, overlap 16, Gaussian overlap-add).

vs_baseline = our volumes/sec divided by the CPU-Keras volumes/sec from
``baseline_cpu_keras.json`` (north star: >= 10x).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

PATCH = (64, 64, 64)
VOLUME = (128, 128, 128)
OVERLAP = 16
TRAIN_PATCHES_PER_VOLUME = 8


def main():
    import jax
    import jax.numpy as jnp

    from fetal_mri_segmentation_tpu.config import Config
    from fetal_mri_segmentation_tpu.inference import SlidingWindowPredictor
    from fetal_mri_segmentation_tpu.models import build_model
    from fetal_mri_segmentation_tpu.training import (create_train_state,
                                                     make_train_step)

    config = Config(model_name="unet", depth=3, n_base_filters=32,
                    patch_shape=PATCH, image_shape=VOLUME, batch_size=1,
                    augment=False, compute_dtype="bfloat16",
                    use_pallas_conv=os.environ.get("FETAL_TPU_BENCH_PALLAS",
                                                   "0") == "1",
                    initial_learning_rate=1e-5)
    model = build_model(config)
    state = create_train_state(model, config, jax.random.PRNGKey(0))
    train_step = make_train_step(model, config)

    rng = np.random.default_rng(0)
    y = (rng.random((1, 1) + PATCH) > 0.7).astype(np.float32)
    x = (y * 2 + rng.normal(0, 0.3, y.shape)).astype(np.float32)
    x, y = jnp.asarray(x), jnp.asarray(y)
    key = jax.random.PRNGKey(1)

    predictor = SlidingWindowPredictor(model, config, image_shape=VOLUME,
                                       patch_shape=PATCH, overlap=OVERLAP,
                                       patch_batch_size=27, use_gaussian=True)
    vol = rng.normal(0, 1, (1,) + VOLUME).astype(np.float32)

    # ---- warmup / compile ----
    # (the train step donates its input state, so always read params from the
    # CURRENT state object; inference produces the reference's artifact — the
    # uint8 label map — computed on device)
    state, m = train_step(state, x, y, key, None)
    jax.block_until_ready(m["loss"])
    predictor.predict_labels({"params": state.params}, vol)

    # ---- timed composite ----
    n_reps = 5
    t0 = time.perf_counter()
    for _ in range(n_reps):
        for _ in range(TRAIN_PATCHES_PER_VOLUME):
            state, m = train_step(state, x, y, key, None)
        jax.block_until_ready(m["loss"])
        predictor.predict_labels({"params": state.params}, vol)
    dt = (time.perf_counter() - t0) / n_reps
    volumes_per_sec = 1.0 / dt

    # components (informational)
    t0 = time.perf_counter()
    for _ in range(20):
        state, m = train_step(state, x, y, key, None)
    jax.block_until_ready(m["loss"])
    train_step_sec = (time.perf_counter() - t0) / 20
    t0 = time.perf_counter()
    predictor.predict_labels({"params": state.params}, vol)
    infer_sec = time.perf_counter() - t0

    vs_baseline = None
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "baseline_cpu_keras.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        vs_baseline = volumes_per_sec / base["composite_volumes_per_sec"]

    result = {
        "metric": "volumes/sec end-to-end fetal-brain seg (8x 64^3 train "
                  "steps + whole-volume Gaussian sliding-window infer)",
        "value": round(volumes_per_sec, 4),
        "unit": "volumes/sec",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "detail": {
            "train_step_sec": round(train_step_sec, 5),
            "whole_volume_infer_sec": round(infer_sec, 5),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
