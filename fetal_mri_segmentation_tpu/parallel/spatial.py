"""Spatial sharding (the sequence-parallel analogue for 3D CNNs) via GSPMD.

Reference: ABSENT — the reference is single-device; SURVEY.md section 5.7
names spatial sharding of whole-volume convs (halo exchange over ICI) as the
TPU-native analogue of sequence/context parallelism for this workload.

Unlike `parallel/data_parallel.py` (shard_map = per-shard code), this module
uses the GLOBAL-VIEW path: ``jax.jit`` with `NamedSharding` annotations on a
``jax.sharding.Mesh``. XLA's SPMD partitioner then inserts the collectives
itself — halo exchanges (`ppermute`) at shard boundaries for every 3³ SAME
conv / pool / upsample along the sharded depth axis, and all-reduces for the
global loss/metric reductions — exactly the scaling-book recipe: pick a
mesh, annotate shardings, let XLA insert collectives.

Two axes compose:
- ``data``   — batch dimension (classic DP; gradients all-reduced),
- ``spatial``— the volume depth axis (activations sharded; memory per chip
               for whole-volume training drops by the spatial factor).

The SAME jitted step serves any mesh shape, including 1x1 (collectives
compile away). Equivalence vs the single-device step is tested on the
virtual 8-device CPU mesh (tests/test_spatial.py).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fetal_mri_segmentation_tpu.training.train_step import (
    make_eval_step, make_train_step)


def make_hybrid_mesh(n_data: int, n_spatial: int,
                     devices=None) -> Mesh:
    """2-D ``Mesh(("data", "spatial"))`` over the first n_data*n_spatial
    visible devices."""
    devices = list(devices if devices is not None else jax.devices())
    need = n_data * n_spatial
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:need]).reshape(n_data, n_spatial),
                ("data", "spatial"))


def _batch_spec(mesh: Mesh) -> P:
    """(B, C, D, H, W) partition spec: batch on "data" (if present), volume
    depth on "spatial" (if present)."""
    data = "data" if "data" in mesh.axis_names else None
    spatial = "spatial" if "spatial" in mesh.axis_names else None
    return P(data, None, spatial, None, None)


def make_gspmd_train_step(model, config, mesh: Mesh) -> Callable:
    """``step(state, x, y, rng, n_valid) -> (state, metrics)`` — global-view
    jit over the mesh.

    ``x``/``y`` are GLOBAL ``(B, C, D, H, W)`` arrays with the batch axis
    sharded over "data" and the depth axis over "spatial" (use
    `shard_batch_spatial`); ``state`` is replicated. The loss here is the
    plain global-batch loss (no axis_name / per-shard partials needed —
    GSPMD's reductions ARE global), so gradients and metrics match the
    single-device step up to fp reduction order.
    """
    inner = make_train_step(model, config, jit=False)
    repl = NamedSharding(mesh, P())
    batch = NamedSharding(mesh, _batch_spec(mesh))
    return jax.jit(
        inner,
        in_shardings=(repl, batch, batch, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,))


def make_gspmd_eval_step(model, config, mesh: Mesh) -> Callable:
    inner = make_eval_step(model, config, jit=False)
    repl = NamedSharding(mesh, P())
    batch = NamedSharding(mesh, _batch_spec(mesh))
    return jax.jit(inner,
                   in_shardings=(repl, batch, batch, repl),
                   out_shardings=repl,
                   static_argnames=("axis_name",))


def shard_batch_spatial(mesh: Mesh, *arrays):
    """Place (B, C, D, H, W) host arrays with batch/"data" + depth/"spatial"
    sharding; validates divisibility with a clear error."""
    spec = _batch_spec(mesh)
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    out = []
    for a in arrays:
        for dim, axis in ((0, spec[0]), (2, spec[2])):
            n = sizes.get(axis, 1)
            if a.shape[dim] % n != 0:
                raise ValueError(
                    f"array dim {dim} (size {a.shape[dim]}) not divisible "
                    f"by mesh axis {axis!r} ({n} shards)")
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out) if len(out) > 1 else out[0]


class SpatialPredictor:
    """Whole-volume predictor with the volume depth sharded over the mesh —
    activation memory per chip drops by the spatial factor (lets volumes
    that exceed one chip's HBM run without patching).

    Duck-types `SlidingWindowPredictor`'s serving surface: ``__call__`` for
    the (L, D, H, W) probability map and ``predict_labels`` computing the
    uint8 label map ON DEVICE (threshold / argmax→labels), with the param
    tree kept device-resident across cases (same levers that cut ~40% of
    per-volume wall time from the sliding-window path)."""

    def __init__(self, model, config, mesh: Mesh):
        import jax.numpy as jnp

        self.config = config
        repl = NamedSharding(mesh, P())
        spatial = ("spatial" if "spatial" in mesh.axis_names
                   else mesh.axis_names[0])
        self._vol_spec = NamedSharding(mesh, P(None, spatial, None, None))
        self._resident_key = None
        self._resident_host = None
        self._resident_vars = None

        def _probs(variables, vol_cdhw):
            x = jnp.transpose(vol_cdhw, (1, 2, 3, 0))[None]  # (1, D, H, W, C)
            y = model.apply(variables, x)                    # (1, D, H, W, L)
            return jnp.transpose(y[0], (3, 0, 1, 2)).astype(jnp.float32)

        def _labels(variables, vol_cdhw, threshold):
            prob = _probs(variables, vol_cdhw)
            if config.n_labels == 1:
                return (prob[0] > threshold).astype(jnp.uint8)
            labels = jnp.asarray(list(config.labels
                                      or range(1, config.n_labels + 1)),
                                 jnp.int32)
            label_map = jnp.take(labels, jnp.argmax(prob, axis=0))
            return jnp.where(jnp.max(prob, axis=0) > threshold,
                             label_map, 0).astype(jnp.uint8)

        self._jitted = jax.jit(_probs, in_shardings=(repl, self._vol_spec),
                               out_shardings=repl)
        self._jitted_labels = jax.jit(_labels,
                                      in_shardings=(repl, self._vol_spec),
                                      out_shardings=repl,
                                      static_argnames=("threshold",))

    def _device_variables(self, variables):
        key = tuple(id(l) for l in jax.tree_util.tree_leaves(variables))
        if self._resident_key != key:
            self._resident_key = key
            self._resident_host = variables
            self._resident_vars = jax.device_put(variables)
        return self._resident_vars

    def _stage(self, data_cdhw):
        return jax.device_put(np.asarray(data_cdhw, np.float32),
                              self._vol_spec)

    def __call__(self, variables, data_cdhw) -> np.ndarray:
        variables = self._device_variables(variables)
        return np.asarray(self._jitted(variables, self._stage(data_cdhw)))

    def predict_labels(self, variables, data_cdhw,
                       threshold: float = 0.5) -> np.ndarray:
        variables = self._device_variables(variables)
        return np.asarray(self._jitted_labels(
            variables, self._stage(data_cdhw), threshold))


def make_spatial_predictor(model, config, mesh: Mesh) -> SpatialPredictor:
    """See `SpatialPredictor`."""
    return SpatialPredictor(model, config, mesh)
