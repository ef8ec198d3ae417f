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
- in continuous mode a case is picked up once ALL its modality files exist
  and their sizes/mtimes have been stable for one poll interval (guards
  against half-written uploads); ``--once`` backlog processing skips the
  guard (a backlog is assumed fully uploaded);
- output goes to ``<output_dir>/<case_name>/prediction.nii.gz``; a case is
  skipped when that file already exists (idempotent restarts — delete the
  output to re-predict); failing cases are quarantined and retried when
  their files change or after a backoff.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Tuple

from fetal_mri_segmentation_tpu.inference.predict import (
    _write_prediction, load_global_moments, predict_case, preprocess_case,
    queue_input_writes)
from fetal_mri_segmentation_tpu.utils.io_utils import case_name_from_path

_case_name = case_name_from_path  # shared with predict.py --input naming


def discover_cases(watch_dir: str, config,
                   collisions: Optional[list] = None,
                   present: Optional[set] = None) -> Dict[str, str]:
    """Map case name → input path for every complete case in the watch dir.

    A case's name derives ONLY from its own entry (never from siblings), so
    names — and therefore output directories and quarantine keys — are
    stable across sweeps regardless of what else appears later. Entries
    whose names collide (a ``foo/`` directory next to a ``foo.nii.gz``
    file, or ``foo.nii`` next to ``foo.nii.gz``) are ALL excluded and
    reported via ``collisions`` — serving either would misattribute
    outputs; the operator must rename one.

    ``present``, when given, is filled with EVERY case name whose entry
    exists at all — including incomplete directories and colliding entries
    — so the caller can distinguish "case deleted" (prune its tracking
    state) from "case transiently not servable" (keep its quarantine
    backoff; a collision flicker must not reset retry throttling).
    """
    found: Dict[str, list] = {}
    for entry in sorted(os.listdir(watch_dir)):
        path = os.path.join(watch_dir, entry)
        if os.path.isdir(path):
            if present is not None:
                present.add(_case_name(path))
            complete = all(
                any(os.path.exists(os.path.join(path, m + ext))
                    for ext in (".nii.gz", ".nii"))
                for m in config.training_modalities)
            if complete:
                found.setdefault(_case_name(path), []).append(path)
        elif (entry.endswith((".nii", ".nii.gz"))
              and len(config.training_modalities) == 1):
            if present is not None:
                present.add(_case_name(path))
            found.setdefault(_case_name(path), []).append(path)
    cases = {n: ps[0] for n, ps in found.items() if len(ps) == 1}
    if collisions is not None:
        collisions.extend(n for n, ps in sorted(found.items())
                          if len(ps) > 1)
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
                      save_inputs: bool = False,
                      retry_backoff: float = 60.0,
                      stop: Optional[object] = None,
                      stats: Optional[dict] = None,
                      stats_file: Optional[str] = None,
                      verbose: bool = True,
                      device_pre=None,
                      moments=None) -> int:
    """Serve until ``stop.is_set()`` (or forever; one pass with ``once``).

    Returns the number of cases predicted AND durably written. ``predictor``
    is any object with the `SlidingWindowPredictor` serving surface
    (sliding-window or direct).

    Backlog cases are PIPELINED (when the predictor exposes the async
    surface, which all built-in predictors do): case *i*'s device predict is
    dispatched, then case *i+1*'s host preprocessing+H2D runs while the
    device computes, then case *i*'s D2H+unpack lands — the same two-stage
    overlap `run_validation_cases` uses, extended to the serving surface.
    All NIfTI gzip+disk writes additionally run on a worker thread.

    ``once`` processes the current backlog WITHOUT the stability guard (a
    backlog is assumed fully uploaded); the guard applies in continuous
    mode. ``save_inputs=False`` (default) keeps the hot path to one NIfTI
    write — the inputs already live in the watch dir. A failing case
    (including a failed output write — e.g. disk full) is quarantined and
    retried when its files change OR after ``retry_backoff`` seconds, so a
    persistent output-side error cannot cause a full recompute every poll.
    ``stats``, when given, is filled with ``{"predicted", "write_failures",
    "aux_write_failures"}`` — ``write_failures`` counts LOST PREDICTIONS
    (case not served), ``aux_write_failures`` counts lost ``--save-inputs``
    copies of otherwise-served cases — so a ``--once`` caller can exit
    nonzero on genuine prediction loss without re-alerting on a batch whose
    predictions all landed.

    ``stats_file``: when given, an atomically-replaced JSON heartbeat is
    written after every sweep — uptime, counts, quarantine size, and
    p50/p95/max case latency over the last 512 served cases — so an
    operator/monitor can watch a long-running server without parsing logs.
    Latency counts each case's OWN work (preprocess + dispatch + D2H +
    write-queue); the pipelined wait that overlaps the next case's
    preprocessing is excluded, so backlog p50 reflects per-case cost, not
    pipeline depth. A failing stats write is reported once and never kills
    serving.
    """
    from concurrent.futures import ThreadPoolExecutor

    os.makedirs(output_dir, exist_ok=True)
    if moments is None and config.normalization == "global":
        # callers that already loaded the training-distribution moments
        # (serve.py wires them into the device preprocessor too) pass them
        # in; everyone else pays the HDF5 read once here
        moments = load_global_moments(config.data_file)
    pending_sigs: Dict[str, Tuple] = {}
    failed: Dict[str, Tuple] = {}  # name -> (signature, monotonic time) at
    #                                failure
    n_done = 0
    n_write_failed = 0      # lost predictions (case NOT served)
    n_aux_write_failed = 0  # lost --save-inputs copies (case served)
    # NIfTI gzip+disk writes run on a worker thread so case i's write
    # overlaps case i+1's preprocess+predict; each case's futures drain at
    # sweep end (success is only reported once its writes landed). Writes
    # are atomic (utils/nifti.py temp+rename), so a failed prediction write
    # leaves NO file and the case is genuinely retried on a later sweep.
    pool = ThreadPoolExecutor(max_workers=1)
    inflight = []  # (name, out_dir, seconds, [write futures], signature)
    warned_collisions = set()
    import collections
    latencies = collections.deque(maxlen=512)  # served-case seconds
    t_start = time.monotonic()
    n_sweeps = 0
    last_served = None
    stats_write_warned = False

    def write_stats_file():
        nonlocal stats_write_warned
        if stats_file is None:
            return
        from fetal_mri_segmentation_tpu.utils.io_utils import (
            atomic_json_dump)
        lat = sorted(latencies)
        pct = (lambda q: round(lat[min(len(lat) - 1,
                                       int(q * (len(lat) - 1)))], 4)) \
            if lat else (lambda q: None)
        payload = {
            "time": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
            "uptime_sec": round(time.monotonic() - t_start, 1),
            "sweeps": n_sweeps,
            "predicted": n_done,
            "write_failures": n_write_failed,
            "aux_write_failures": n_aux_write_failed,
            "quarantined": len(failed),
            "awaiting_stability": len(pending_sigs),
            "last_served": last_served,
            "latency_sec": {"n": len(lat), "p50": pct(0.5),
                            "p95": pct(0.95),
                            "max": lat[-1] if lat else None},
        }
        try:
            atomic_json_dump(payload, stats_file)
        except OSError as e:
            if not stats_write_warned:  # must never kill serving
                stats_write_warned = True
                print(f"[serve] stats file unwritable ({e}) — continuing "
                      "without heartbeat", flush=True)
    pipelined = (hasattr(predictor, "predict_labels_async")
                 and hasattr(predictor, "unpack_labels"))

    def drain_writes():
        nonlocal n_done, n_write_failed, n_aux_write_failed, last_served
        for name, odir, dt, futs, sig in inflight:
            errs = [(path, f.exception()) for f, path in futs]
            errs = [(p, e) for p, e in errs if e is not None]
            pred_errs = [(p, e) for p, e in errs
                         if os.path.basename(p) == "prediction.nii.gz"]
            if pred_errs:
                e = pred_errs[0][1]
                # the case was NOT served: no durable prediction exists.
                # Un-count it and quarantine (same backoff as a predict
                # failure) so e.g. a full disk doesn't recompute the same
                # prediction every poll.
                n_done -= 1
                n_write_failed += 1
                failed[name] = (sig, time.monotonic())
                print(f"[serve] WRITE FAILED {name}: "
                      f"{type(e).__name__}: {e} (atomic writes leave no "
                      f"partial artifact; retried when the files change "
                      f"or after {retry_backoff:.0f}s)", flush=True)
            elif errs:
                # only auxiliary --save-inputs artifacts were lost; the
                # prediction landed, so the case IS served (and won't be
                # recomputed) — report the loss truthfully instead of
                # un-counting a served case and quarantining it forever
                n_aux_write_failed += 1
                latencies.append(dt)
                last_served = name
                lost = ", ".join(os.path.basename(p) for p, _ in errs)
                e = errs[0][1]
                print(f"[serve] {name} served, but input copies lost "
                      f"({lost}): {type(e).__name__}: {e}", flush=True)
            else:
                latencies.append(dt)
                last_served = name
                if verbose:
                    print(f"[serve] {name} -> {odir}/prediction.nii.gz "
                          f"({dt:.2f}s)", flush=True)
        inflight.clear()

    def quarantine(name, sig, exc, case_futs):
        for f, _ in case_futs:  # settle any already-queued writes
            f.exception()
        failed[name] = (sig, time.monotonic())
        pending_sigs.pop(name, None)
        print(f"[serve] FAILED {name}: {type(exc).__name__}: {exc} "
              f"(quarantined — retries when the files change or "
              f"after {retry_backoff:.0f}s)", flush=True)

    while True:
        collisions: list = []
        present: set = set()
        try:
            discovered = discover_cases(watch_dir, config, collisions,
                                        present)
        except OSError as e:
            # transiently unavailable watch dir (unmounted NFS, rename)
            # must not kill a long-running server; in --once mode it IS
            # the operator's one chance to see the problem — re-raise.
            if once:
                pool.shutdown(wait=True)
                raise
            print(f"[serve] watch dir unreadable: {type(e).__name__}: {e} "
                  f"(retrying next poll)", flush=True)
            if stop is not None and stop.is_set():
                pool.shutdown(wait=True)
                return n_done
            time.sleep(poll_interval)
            continue

        # a deleted case must not leak tracking state in a long-running
        # server: prune keys whose watch-dir entry is GONE entirely.
        # ``present`` (not ``discovered``) is the gate — a quarantined case
        # that is transiently unservable (name collision, incomplete dir
        # mid-re-upload) keeps its backoff state, so a collision flicker
        # cannot re-trigger an immediate full recompute.
        for d in (pending_sigs, failed):
            for k in [k for k in d if k not in present]:
                del d[k]
        warned_collisions &= set(collisions)

        pending = None  # (name, out_dir, sig, host_sec, out_dev, affine,
        #                  futs)

        def finalize(p):
            nonlocal n_done
            name, odir, sig, host_sec, out_dev, affine, futs = p
            # per-case latency = this case's own work (preprocess + H2D +
            # dispatch, measured at dispatch time) + its D2H/unpack/write-
            # queue (measured here). The wall time the case spent parked in
            # ``pending`` — which overlaps the NEXT case's preprocessing,
            # the whole point of the pipeline — is deliberately excluded:
            # charging it would roughly double the reported p50 during
            # backlogs and mislead the monitor the heartbeat feeds.
            t1 = time.perf_counter()
            try:
                label_map = predictor.unpack_labels(out_dev)
            except Exception as e:  # device error surfaces at D2H
                quarantine(name, sig, e, futs)
                return
            _write_prediction(
                label_map, config, odir, affine,
                lambda target, fn, *a, **kw: futs.append(
                    (pool.submit(fn, *a, **kw), target)))
            n_done += 1
            pending_sigs.pop(name, None)
            inflight.append((name, odir,
                             host_sec + time.perf_counter() - t1, futs,
                             sig))

        for name, path in discovered.items():
            out_dir = os.path.join(output_dir, name)
            if os.path.exists(os.path.join(out_dir, "prediction.nii.gz")):
                continue
            try:
                sig = _signature(path)
            except OSError:
                # files vanished/renamed between discovery and stat —
                # the case is in flux; catch it on a later sweep
                pending_sigs.pop(name, None)
                continue
            if name in failed:
                fsig, ftime = failed[name]
                if (fsig == sig
                        and time.monotonic() - ftime < retry_backoff):
                    continue  # unchanged and inside backoff — quarantined
                del failed[name]
            if require_stable and not once:
                if pending_sigs.get(name) != sig:
                    pending_sigs[name] = sig   # first sighting or still
                    continue                   # changing — wait one poll
            t0 = time.perf_counter()
            case_futs: list = []

            def submit(target, fn, *a, _futs=case_futs, **kw):
                # ``target`` is the write's destination path, passed
                # EXPLICITLY by the io_submit protocol (predict.py) — it is
                # what drain_writes keys on to distinguish a lost
                # prediction (un-count + quarantine) from a lost
                # --save-inputs copy (case served, artifact missing)
                _futs.append((pool.submit(fn, *a, **kw), target))

            if not pipelined:
                try:
                    predict_case(path, out_dir, model, variables, config,
                                 predictor=predictor, overlap=overlap,
                                 threshold=threshold, global_moments=moments,
                                 save_inputs=save_inputs, io_submit=submit,
                                 device_pre=device_pre)
                except Exception as e:  # one bad case must not kill the
                    quarantine(name, sig, e, case_futs)  # server
                    continue
                n_done += 1
                pending_sigs.pop(name, None)
                inflight.append((name, out_dir, time.perf_counter() - t0,
                                 case_futs, sig))
                continue

            # pipelined path: preprocess+dispatch now, unpack AFTER the
            # next case's dispatch is in flight (or at sweep end)
            try:
                data, affine, truth_image = preprocess_case(
                    path, config, global_moments=moments,
                    device_pre=device_pre)
                os.makedirs(out_dir, exist_ok=True)
                if save_inputs:
                    queue_input_writes(data, truth_image, config, out_dir,
                                       affine, submit)
                out_dev = predictor.predict_labels_async(
                    variables, data, threshold=threshold)
            except Exception as e:  # one bad case must not kill the server
                quarantine(name, sig, e, case_futs)
                continue
            host_sec = time.perf_counter() - t0  # this case's own host work
            if pending is not None:
                finalize(pending)
            pending = (name, out_dir, sig, host_sec, out_dev, affine,
                       case_futs)
        if pending is not None:
            finalize(pending)
        for c in collisions:
            if c not in warned_collisions:
                warned_collisions.add(c)
                print(f"[serve] SKIPPED colliding cases named {c!r}: "
                      f"multiple watch-dir entries map to the same case "
                      f"name — rename one to serve them", flush=True)
        drain_writes()
        n_sweeps += 1
        if stats is not None:
            stats.update(predicted=n_done, write_failures=n_write_failed,
                         aux_write_failures=n_aux_write_failed)
        write_stats_file()
        if once or (stop is not None and stop.is_set()):
            pool.shutdown(wait=True)
            return n_done
        time.sleep(poll_interval)
