"""Checkpoint / resume via orbax.

Reference semantics to reproduce (reference: unet3d/training.py::get_callbacks
ModelCheckpoint(model_file, save_best_only=True) + load_old_model; train.py
auto-resumes when the model file exists and not overwrite):

- one logical "model file" (here: a directory) holding the BEST-val-loss
  state only;
- restoring returns everything needed to continue training exactly: params,
  optimizer state (Adam moments + current learning rate), BatchNorm stats,
  step/epoch counters, best-val bookkeeping.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from fetal_mri_segmentation_tpu.training.state import TrainState


# epoch-level scheduler state persisted alongside the model so a resumed
# run continues its plateau/early-stop patience windows EXACTLY (the
# reference's Keras restart rebuilds them — here "resume exactly" is the
# bar the rest of the checkpoint already meets: LR and best-val are
# restored, so the 8 bytes of wait counters must be too)
_SCHED_KEYS = ("plateau_best", "plateau_wait", "early_best", "early_wait")


class CheckpointIO:
    """Best-only checkpointing into `model_file` (a directory)."""

    def __init__(self, model_file: str):
        self.path = os.path.abspath(model_file)
        self._ckptr = ocp.StandardCheckpointer()

    def exists(self) -> bool:
        return os.path.isdir(self.path) and os.path.exists(
            os.path.join(self.path, "_CHECKPOINT_METADATA"))

    def peek_epoch(self) -> Optional[int]:
        """The checkpoint's resume epoch WITHOUT a full restore (sidecar
        read) — None for legacy checkpoints saved before the sidecar
        existed (callers fall back to epoch-0 generator streams, the
        pre-sidecar behavior)."""
        import json
        if not self.exists():
            return None
        try:
            with open(self.path + ".meta.json") as f:
                epoch = int(json.load(f)["epoch"])
        except (OSError, ValueError, KeyError, TypeError):
            return None
        # a corrupt/hand-edited negative epoch must not reach the
        # generators' skip_batches (it would fast-forward forever)
        return epoch if epoch >= 0 else None

    def peek_data_order(self) -> Optional[dict]:
        """The sidecar's recorded data-order mode, without a full restore.

        ``{"mode": "lockstep"}`` (host staging or full device cache — both
        share the host pipeline's batch boundaries) or ``{"mode":
        "partial", "resident": [case ids]}`` (partial device cache — batch
        grouping depends on WHICH cases were resident). A resumed run's
        ``skip_batches`` fast-forward only lands on the interrupted run's
        exact batch sequence if the cache mode is reproduced, so
        maybe_build_device_cache pins its decision to this record instead
        of re-deriving it from live free HBM (which may differ between the
        two runs). None for sidecars written before the field existed.
        """
        import json
        if not self.exists():
            return None
        try:
            with open(self.path + ".meta.json") as f:
                order = json.load(f).get("data_order")
        except (OSError, ValueError, AttributeError):
            return None
        return order if isinstance(order, dict) and "mode" in order else None

    def save(self, state: TrainState, *, epoch: int, best_val: float,
             sched: Optional[dict] = None,
             data_order: Optional[dict] = None) -> None:
        # a caller omitting sched (external tooling, tests) must not persist
        # plateau/early "best" of 0.0 — restore would seed the schedulers
        # with an unbeatable best and the LR would drop every `patience`
        # epochs regardless of improvement; default the bests to best_val
        # (the pre-scheduler-state semantics) and the waits to 0
        sched = sched or {"plateau_best": best_val, "plateau_wait": 0,
                          "early_best": best_val, "early_wait": 0}
        payload = {
            "params": jax.device_get(state.params),
            "opt_state": jax.device_get(state.opt_state),
            "batch_stats": jax.device_get(state.batch_stats),
            "step": np.asarray(state.step),
            "epoch": np.asarray(epoch),
            "best_val": np.asarray(best_val, np.float64),
            "sched": {k: np.asarray(float(sched.get(k, 0.0)), np.float64)
                      for k in _SCHED_KEYS},
        }
        self._ckptr.save(self.path, payload, force=True)
        self._ckptr.wait_until_finished()
        # tiny sidecar BESIDE the orbax dir (force=True replaces the dir
        # itself): lets train.py peek the resume epoch BEFORE building the
        # generators, so their per-epoch rng streams can fast-forward and a
        # resumed run sees the exact batch sequence an uninterrupted run
        # would (data-order exact resume). Written atomically.
        from fetal_mri_segmentation_tpu.utils.io_utils import atomic_json_dump
        atomic_json_dump({"epoch": int(epoch), "best_val": float(best_val),
                          "data_order": data_order or {"mode": "lockstep"}},
                         self.path + ".meta.json")

    def restore(self, state: TrainState
                ) -> Tuple[TrainState, int, float, dict]:
        """Restore into the (abstractly matching) fresh `state` skeleton.

        ``state`` may be a concrete `create_train_state` result OR the
        compile-free `create_abstract_state` template (ShapeDtypeStruct
        leaves) — orbax restores concrete arrays either way. Returns
        ``(state, epoch, best_val, sched)``; ``sched`` is ``{}`` for
        checkpoints written before scheduler state was persisted.
        """
        def host(x):
            return x if isinstance(x, jax.ShapeDtypeStruct) else \
                jax.device_get(x)

        tmap = jax.tree_util.tree_map
        template = {
            "params": tmap(host, state.params),
            "opt_state": tmap(host, state.opt_state),
            "batch_stats": tmap(host, state.batch_stats),
            "step": host(state.step),
            "epoch": np.asarray(0),
            "best_val": np.asarray(0.0, np.float64),
            "sched": {k: np.asarray(0.0, np.float64) for k in _SCHED_KEYS},
        }
        # probe the checkpoint's metadata for the "sched" subtree instead of
        # restore-and-retry: a blanket retry would swallow real failures
        # (shape mismatch, corrupt checkpoint, even Ctrl-C) into a second
        # multi-second restore that then fails with a misleading error
        has_sched: Optional[bool] = None
        try:
            meta = self._ckptr.metadata(self.path)
            tree = getattr(meta, "item_metadata", meta)
            has_sched = "sched" in tree
        except Exception:
            pass  # metadata probing is best-effort; decide below
        if has_sched is None:
            # probe inconclusive (orbax version without metadata support,
            # storage error): attempt the current layout, then the legacy
            # (pre-sched) layout. If BOTH fail the failure was never about
            # the sched subtree — re-raise the ORIGINAL error so shape
            # mismatches/corruption surface undistorted. (Matching on the
            # exception TEXT instead would couple this to orbax's error
            # formatting, which changes across versions.)
            try:
                restored = self._ckptr.restore(self.path, template)
                has_sched = True
            except Exception as e:
                legacy = {k: v for k, v in template.items() if k != "sched"}
                try:
                    restored = self._ckptr.restore(self.path, legacy)
                except Exception:
                    raise e
                has_sched = False
        else:
            if not has_sched:
                # legacy checkpoint (no "sched" subtree): restore without
                # it; the caller rebuilds schedulers from best_val as before
                del template["sched"]
            restored = self._ckptr.restore(self.path, template)
        sched = ({k: float(v) for k, v in restored["sched"].items()}
                 if has_sched else {})
        new_state = state.replace(params=restored["params"],
                                  opt_state=restored["opt_state"],
                                  batch_stats=restored["batch_stats"],
                                  step=restored["step"])
        return (new_state, int(restored["epoch"]),
                float(restored["best_val"]), sched)


def load_old_model(model_file: str, model, config):
    """Rebuild state and restore the best checkpoint — full training resume.

    Reference: training.py::load_old_model (keras load_model with
    custom_objects → arch + weights + optimizer state from one .h5).

    The restore template is built ABSTRACTLY (`create_abstract_state` —
    `jax.eval_shape`, no init compile/compute): every leaf is overwritten by
    the checkpoint anyway, and skipping the throwaway `model.init` cuts
    serving cold-start by the full init-compile time (~30 s for a small
    U-Net on one CPU core; measured).
    """
    from fetal_mri_segmentation_tpu.training.state import (
        create_abstract_state)

    io = CheckpointIO(model_file)
    if not io.exists():
        raise FileNotFoundError(f"no checkpoint at {model_file}")
    state, epoch, best_val, _ = io.restore(
        create_abstract_state(model, config))
    return state, epoch, best_val
