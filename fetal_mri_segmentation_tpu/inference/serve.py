"""Streaming serving: watch a directory, predict new cases as they arrive.

Reference: ABSENT — the reference's only inference surface is a batch run
over the validation pickle (prediction.py::run_validation_cases). This is
the production-serving counterpart: ONE process holds the compiled
whole-volume executable and device-resident params (compile once, serve
forever), and every case dropped into the watch directory is predicted with
the ad-hoc path (`inference/predict.py::predict_case` — builder-identical
preprocessing, no HDF5 ingest).

Case protocol:
- a case = a subdirectory of the watch dir containing
  ``<modality>.nii[.gz]`` per ``config.training_modalities`` (the
  train-time layout), or a bare ``*.nii[.gz]`` file for single-modality
  configs;
- a case is picked up once ALL its modality files exist and their sizes
  have been stable for one poll interval (guards against half-written
  uploads);
- output goes to ``<output_dir>/<case_name>/prediction.nii.gz``; a case is
  skipped when that file already exists (idempotent restarts — delete the
  output to re-predict).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Tuple

from fetal_mri_segmentation_tpu.inference.predict import (
    load_global_moments, predict_case)


def _case_name(path: str) -> str:
    name = os.path.basename(os.path.normpath(path))
    return name.replace(".nii.gz", "").replace(".nii", "")


def discover_cases(watch_dir: str, config) -> Dict[str, str]:
    """Map case name → input path for every complete case in the watch dir."""
    cases = {}
    for entry in sorted(os.listdir(watch_dir)):
        path = os.path.join(watch_dir, entry)
        if os.path.isdir(path):
            complete = all(
                any(os.path.exists(os.path.join(path, m + ext))
                    for ext in (".nii.gz", ".nii"))
                for m in config.training_modalities)
            if complete:
                cases[_case_name(path)] = path
        elif (entry.endswith((".nii", ".nii.gz"))
              and len(config.training_modalities) == 1):
            cases[_case_name(path)] = path
    return cases


def _signature(path: str) -> Tuple:
    """(file, size, mtime) tuple set — used to require two stable polls
    before predicting, so half-uploaded NIfTIs are never read."""
    if os.path.isfile(path):
        st = os.stat(path)
        return ((path, st.st_size, st.st_mtime),)
    out = []
    for f in sorted(os.listdir(path)):
        p = os.path.join(path, f)
        if os.path.isfile(p):
            st = os.stat(p)
            out.append((f, st.st_size, st.st_mtime))
    return tuple(out)


def watch_and_predict(watch_dir: str, output_dir: str, model, variables,
                      config, predictor, *, poll_interval: float = 1.0,
                      once: bool = False, require_stable: bool = True,
                      threshold: float = 0.5, overlap: int = 16,
                      stop: Optional[object] = None,
                      verbose: bool = True) -> int:
    """Serve until ``stop.is_set()`` (or forever; one pass with ``once``).

    Returns the number of cases predicted. ``predictor`` is any object with
    the `SlidingWindowPredictor` serving surface (sliding-window or direct).
    """
    os.makedirs(output_dir, exist_ok=True)
    moments = (load_global_moments(config.data_file)
               if config.normalization == "global" else None)
    pending_sigs: Dict[str, Tuple] = {}
    failed: Dict[str, Tuple] = {}  # name -> signature AT FAILURE TIME: the
    # case stays quarantined (no retry loop) until its files change
    n_done = 0
    while True:
        for name, path in discover_cases(watch_dir, config).items():
            out_dir = os.path.join(output_dir, name)
            if os.path.exists(os.path.join(out_dir, "prediction.nii.gz")):
                continue
            sig = _signature(path)
            if failed.get(name) == sig:
                continue  # unchanged since the failure — stay quarantined
            failed.pop(name, None)
            if require_stable and not once:
                if pending_sigs.get(name) != sig:
                    pending_sigs[name] = sig   # first sighting or still
                    continue                   # changing — wait one poll
            t0 = time.perf_counter()
            try:
                predict_case(path, out_dir, model, variables, config,
                             predictor=predictor, overlap=overlap,
                             threshold=threshold, global_moments=moments)
            except Exception as e:  # one bad case must not kill the server
                failed[name] = sig
                pending_sigs.pop(name, None)
                print(f"[serve] FAILED {name}: {type(e).__name__}: {e} "
                      f"(quarantined — modify the case files to retry)",
                      flush=True)
                continue
            n_done += 1
            pending_sigs.pop(name, None)
            if verbose:
                print(f"[serve] {name} -> {out_dir}/prediction.nii.gz "
                      f"({time.perf_counter() - t0:.2f}s)", flush=True)
        if once or (stop is not None and stop.is_set()):
            return n_done
        time.sleep(poll_interval)
