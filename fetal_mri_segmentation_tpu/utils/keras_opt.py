"""Keras Adam optimizer-state interop (import AND export).

Completes `load_old_model` parity (reference: unet3d/training.py::
load_old_model — keras load_model restores arch + weights + OPTIMIZER
state from the single ``.h5``): a user migrating a half-trained reference
model continues with the same Adam moments, step count, and learning rate
instead of restarting them from scratch. `utils/keras_import.py` /
`keras_export.py` carry the weights; this module carries the slots.

Key facts the mapping relies on:

- Keras optimizer slot variables (momentum ``m`` and velocity ``v``) are
  elementwise-aligned with their weight variable, so whatever layout
  transform the weight importer applies (e.g. the Conv3DTranspose
  channel-swap + spatial flip) must be applied to the slots identically —
  which is exactly what reusing the weight importers on slot lists does.
- Slot ordering follows ``model.trainable_variables`` order = layer build
  order with each layer's weights in creation order — the same traversal
  `keras_weight_list_from_model`/`_from_h5` produce, so slots regroup
  into the per-layer arity of the weight list.
- Legacy whole-model ``.h5`` files store the state under an
  ``optimizer_weights`` group with a ``weight_names`` attr. Keras 3 names
  slots ``<opt>/<layer>_<weight>_momentum|velocity`` (interleaved per
  variable); TF2-era Keras 2.4+ used ``.../m:0`` / ``.../v:0``; TF1-era
  Keras 2.2 wrote unnamed ``Variable`` slots grouped all-m-then-all-v —
  all three layouts are handled (the last via the grouped-halves
  fallback, validated against the weight shapes).
- Keras counts ``iterations`` as completed update steps and bias-corrects
  with ``local_step = iterations + 1``; optax `scale_by_adam` corrects
  with ``count + 1`` — so optax ``count`` = Keras ``iterations``,
  verbatim.
- Epsilon semantics differ slightly (Keras adds eps to sqrt(v) AFTER
  folding the bias correction into the step size; optax adds it to
  sqrt(nu_hat)). With default eps (1e-7/1e-8) the continued-training
  divergence is O(eps/sqrt(v_hat)) per step — pinned by the round-trip
  test at <1e-4 relative.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np


@dataclass
class AdamSlots:
    """Flat Adam state in trainable-variable order."""
    iterations: int
    learning_rate: Optional[float]
    momentum: List[np.ndarray]
    velocity: List[np.ndarray]


def _names_from_group(grp) -> List[str]:
    names = grp.attrs.get("weight_names", None)
    if names is not None:
        return [n.decode() if isinstance(n, bytes) else str(n) for n in names]
    # no attr (hand-rolled files): walk datasets in insertion order
    out = []

    def visit(name, obj):
        import h5py
        if isinstance(obj, h5py.Dataset):
            out.append(name)
    grp.visititems(visit)
    return out


def keras_adam_slots_from_h5(path: str) -> AdamSlots:
    """Parse the ``optimizer_weights`` group of a legacy whole-model .h5."""
    import h5py

    with h5py.File(path, "r") as f:
        if "optimizer_weights" not in f:
            raise ValueError(
                f"{path}: no optimizer_weights group — the file was saved "
                "weights-only (model.save_weights); optimizer state needs a "
                "whole-model save (model.save('model.h5'), the reference's "
                "ModelCheckpoint output)")
        grp = f["optimizer_weights"]
        iterations, lr = 0, None
        momentum, velocity, unknown = [], [], []
        for name in _names_from_group(grp):
            arr = np.asarray(grp[name])
            base = name.rsplit(":", 1)[0]  # strip TF ':0' suffixes
            low = base.lower()
            if low.endswith("iteration") or low.endswith("iterations") \
                    or low.endswith("/iter") or low == "iter":
                # 'Adam/iter:0' is the TF2-era (tf.keras 2.4-2.10)
                # OptimizerV2 step-counter name; 'iterations' is Keras 2.2.
                iterations = int(arr)
            elif low.endswith("learning_rate") or low.endswith("/lr") \
                    or low == "lr" or low.endswith("_lr"):
                lr = float(arr)
            elif low.endswith("momentum") or low.endswith("/m") \
                    or "_momentum" in low:
                momentum.append(arr)
            elif low.endswith("velocity") or low.endswith("/v") \
                    or "_velocity" in low:
                velocity.append(arr)
            else:
                unknown.append(arr)
        if not momentum and not velocity and unknown:
            # TF1-era Keras 2.2 layout: unnamed slots, all m then all v
            if len(unknown) % 2:
                raise ValueError(
                    f"{path}: {len(unknown)} unrecognized optimizer slots "
                    "(odd count — cannot split into m/v halves)")
            half = len(unknown) // 2
            momentum, velocity = unknown[:half], unknown[half:]
        elif unknown:
            raise ValueError(
                f"{path}: {len(unknown)} optimizer slot(s) with "
                "unrecognized names alongside named momentum/velocity "
                "slots — mixed layout not supported")
        if lr is None and "training_config" in f.attrs:
            raw = f.attrs["training_config"]
            raw = raw.decode() if isinstance(raw, bytes) else raw
            opt_cfg = json.loads(raw).get("optimizer_config", {})
            cfg = opt_cfg.get("config", {})
            val = cfg.get("learning_rate", cfg.get("lr"))
            if isinstance(val, (int, float)):
                lr = float(val)
    if len(momentum) != len(velocity):
        raise ValueError(
            f"{path}: {len(momentum)} momentum vs {len(velocity)} velocity "
            "slots — not a plain-Adam optimizer state")
    return AdamSlots(iterations, lr, momentum, velocity)


def keras_adam_slots_from_model(keras_model) -> AdamSlots:
    """Extract Adam slots from a live compiled+built Keras 3 model."""
    opt = keras_model.optimizer
    slot_by_path = {v.path: np.asarray(v) for v in opt.variables}
    momentum, velocity = [], []
    for var in keras_model.trainable_variables:
        stem = f"{opt.name}/{var.path.replace('/', '_')}"
        try:
            momentum.append(slot_by_path[f"{stem}_momentum"])
            velocity.append(slot_by_path[f"{stem}_velocity"])
        except KeyError:
            raise ValueError(
                f"optimizer has no momentum/velocity slots for {var.path} "
                f"— not a built Adam optimizer (have: "
                f"{sorted(slot_by_path)[:6]}...)")
    return AdamSlots(int(np.asarray(opt.iterations)),
                     float(np.asarray(opt.learning_rate)),
                     momentum, velocity)


def slots_as_weight_list(keras_weights: Sequence[Tuple[str, list]],
                         flat: Sequence[np.ndarray]
                         ) -> List[Tuple[str, list]]:
    """Regroup a flat slot list into the weight list's per-layer arity.

    The result quacks like `keras_weight_list_from_model` output, so the
    existing weight importers map it — applying the identical layout
    transforms slots require.
    """
    total = sum(len(w) for _, w in keras_weights)
    if len(flat) != total:
        raise ValueError(
            f"slot count {len(flat)} != weight count {total} — optimizer "
            "state does not match this model's weight list")
    out, i = [], 0
    for name, weights in keras_weights:
        group = []
        for w in weights:
            s = flat[i]
            if tuple(np.shape(s)) != tuple(np.shape(w)):
                raise ValueError(
                    f"slot {i} shape {np.shape(s)} != weight shape "
                    f"{np.shape(w)} (layer {name}) — slot order does not "
                    "match the weight traversal")
            group.append(np.asarray(s))
            i += 1
        out.append((name, group))
    return out


def _find_adam_index(inner_state) -> int:
    for i, s in enumerate(inner_state):
        if type(s).__name__ == "ScaleByAdamState":
            return i
    raise ValueError("opt_state has no ScaleByAdamState — not the Adam "
                     "chain make_optimizer builds")


def _retree(template, tree):
    """Leaves of ``tree`` in ``template``'s treedef, cast to leaf dtypes."""
    import jax
    import jax.numpy as jnp

    td = jax.tree_util.tree_structure(template)
    old = jax.tree_util.tree_leaves(template)
    new = jax.tree_util.tree_leaves(tree)
    if len(old) != len(new):
        raise ValueError(f"tree leaf count {len(new)} != template {len(old)}")
    leaves = []
    for o, n in zip(old, new):
        if tuple(np.shape(o)) != tuple(np.shape(n)):
            raise ValueError(
                f"slot leaf shape {np.shape(n)} != template {np.shape(o)}")
        leaves.append(jnp.asarray(n, jnp.asarray(o).dtype))
    return jax.tree_util.tree_unflatten(td, leaves)


def import_keras_adam_state(state, keras_weights, slots: AdamSlots,
                            importer: Callable):
    """Fill a TrainState's Adam moments/count/LR from Keras slots.

    ``importer`` is the matching weight importer
    (`import_keras_unet_weights` or `import_keras_isensee_weights`) — it
    is reused verbatim on the slot lists so every layout transform the
    weights get, the slots get too. Returns the updated TrainState
    (params untouched — import those separately, first).
    """
    import jax.numpy as jnp

    mu = importer(state.params,
                  slots_as_weight_list(keras_weights, slots.momentum))
    nu = importer(state.params,
                  slots_as_weight_list(keras_weights, slots.velocity))
    opt_state = state.opt_state
    inner = list(opt_state.inner_state)
    i = _find_adam_index(inner)
    adam = inner[i]
    inner[i] = adam._replace(
        count=jnp.asarray(slots.iterations, jnp.int32),
        mu=_retree(adam.mu, mu), nu=_retree(adam.nu, nu))
    opt_state = opt_state._replace(inner_state=tuple(inner))
    if slots.learning_rate is not None:
        hp = dict(opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(slots.learning_rate, jnp.float32)
        opt_state = opt_state._replace(hyperparams=hp)
    return state.replace(opt_state=opt_state,
                         step=jnp.asarray(slots.iterations, jnp.int32))


def export_keras_adam_state(state, keras_model, exporter: Callable) -> None:
    """Write a TrainState's Adam moments/count/LR onto a compiled Keras
    model's optimizer, in place (reverse migration: keras_model.save(...)
    afterwards gives reference-era tooling a FULL resume .h5).

    ``exporter`` is the matching weight exporter
    (`export_keras_unet_weights` / `export_keras_isensee_weights`) run in
    slot-capture mode via its ``assign`` hook, so slots ride the same
    per-layer transforms as the weights.
    """
    import jax

    opt = keras_model.optimizer
    if not getattr(opt, "built", False):
        opt.build(keras_model.trainable_variables)
    slot_by_path = {v.path: v for v in opt.variables}

    inner = state.opt_state.inner_state
    adam = inner[_find_adam_index(inner)]

    def assign_kind(kind: str):
        def assign(layer, arrays):
            tvars = [w for w in layer.weights if w.trainable]
            if len(tvars) != len(arrays):
                raise ValueError(
                    f"{layer.name}: {len(arrays)} slot arrays for "
                    f"{len(tvars)} trainable weights")
            for var, arr in zip(tvars, arrays):
                key = f"{opt.name}/{var.path.replace('/', '_')}_{kind}"
                if key not in slot_by_path:
                    raise ValueError(
                        f"optimizer has no slot {key!r} — not a built "
                        "Adam optimizer")
                slot_by_path[key].assign(np.asarray(arr, np.float32))
        return assign

    mu = jax.tree_util.tree_map(np.asarray, adam.mu)
    nu = jax.tree_util.tree_map(np.asarray, adam.nu)
    exporter(mu, keras_model, assign=assign_kind("momentum"))
    exporter(nu, keras_model, assign=assign_kind("velocity"))
    opt.iterations.assign(int(np.asarray(adam.count)))
    opt.learning_rate.assign(
        float(np.asarray(state.opt_state.hyperparams["learning_rate"])))
