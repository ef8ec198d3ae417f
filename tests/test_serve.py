"""Streaming serving (inference/serve.py): discovery, idempotency,
half-upload guard."""
import os
import sys
import threading

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from fetal_mri_segmentation_tpu.config import Config
from fetal_mri_segmentation_tpu.inference import SlidingWindowPredictor
from fetal_mri_segmentation_tpu.inference.serve import (
    discover_cases, watch_and_predict)
from fetal_mri_segmentation_tpu.models import build_model
from fetal_mri_segmentation_tpu.training import create_train_state
from tests.synthetic import write_synthetic_dataset


def _setup(tmp_path, n_cases=2):
    write_synthetic_dataset(str(tmp_path / "watch"), n_cases=n_cases,
                            shape=(24, 24, 24))
    cfg = Config(image_shape=(24, 24, 24), patch_shape=(16, 16, 16),
                 model_name="unet", depth=3, n_base_filters=4,
                 compute_dtype="float32",
                 data_file=str(tmp_path / "none.h5"))
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    variables = {"params": state.params}
    predictor = SlidingWindowPredictor(model, cfg,
                                       image_shape=cfg.image_shape,
                                       overlap=4)
    return cfg, model, variables, predictor


def test_discover_cases(tmp_path):
    cfg, *_ = _setup(tmp_path)
    cases = discover_cases(str(tmp_path / "watch"), cfg)
    assert sorted(cases) == ["case_0", "case_1"]
    # incomplete case (missing modality) is not picked up
    os.makedirs(str(tmp_path / "watch" / "half"))
    assert "half" not in discover_cases(str(tmp_path / "watch"), cfg)
    # bare single-modality file IS a case
    import shutil
    shutil.copy(str(tmp_path / "watch" / "case_0" / "volume.nii.gz"),
                str(tmp_path / "watch" / "extra.nii.gz"))
    assert "extra" in discover_cases(str(tmp_path / "watch"), cfg)


def test_serve_once_idempotent_and_incremental(tmp_path):
    cfg, model, variables, predictor = _setup(tmp_path)
    out = str(tmp_path / "served")
    n = watch_and_predict(str(tmp_path / "watch"), out, model, variables,
                          cfg, predictor, once=True, overlap=4,
                          verbose=False)
    assert n == 2
    assert os.path.exists(os.path.join(out, "case_0", "prediction.nii.gz"))
    # idempotent: nothing new on a second pass
    assert watch_and_predict(str(tmp_path / "watch"), out, model, variables,
                             cfg, predictor, once=True, overlap=4,
                             verbose=False) == 0
    # a case arriving later is picked up
    write_synthetic_dataset(str(tmp_path / "more"), n_cases=3,
                            shape=(24, 24, 24))
    import shutil
    shutil.copytree(str(tmp_path / "more" / "case_2"),
                    str(tmp_path / "watch" / "case_2"))
    assert watch_and_predict(str(tmp_path / "watch"), out, model, variables,
                             cfg, predictor, once=True, overlap=4,
                             verbose=False) == 1
    assert os.path.exists(os.path.join(out, "case_2", "prediction.nii.gz"))


def test_serve_defers_until_files_stable(tmp_path):
    """Continuous mode requires TWO stable sightings before predicting —
    a case must not be read mid-upload."""
    cfg, model, variables, predictor = _setup(tmp_path, n_cases=1)
    out = str(tmp_path / "served")
    stop = threading.Event()
    stop.set()  # one discovery sweep per call, then return
    n1 = watch_and_predict(str(tmp_path / "watch"), out, model, variables,
                           cfg, predictor, once=False, stop=stop, overlap=4,
                           poll_interval=0.01, verbose=False)
    assert n1 == 0  # first sighting only records the signature
    n2 = watch_and_predict(str(tmp_path / "watch"), out, model, variables,
                           cfg, predictor, once=False, stop=stop, overlap=4,
                           poll_interval=0.01, verbose=False)
    assert n2 == 0  # fresh call = fresh signature cache, still deferred
    # within ONE server lifetime: sighting, then stable -> predicted
    stop2 = threading.Event()
    calls = {"n": 0}

    class TwoSweeps:
        def is_set(self):
            calls["n"] += 1
            if calls["n"] >= 2:
                return True
            return False
    n3 = watch_and_predict(str(tmp_path / "watch"), out, model, variables,
                           cfg, predictor, once=False, stop=TwoSweeps(),
                           overlap=4, poll_interval=0.01, verbose=False)
    assert n3 == 1
    assert os.path.exists(os.path.join(out, "case_0", "prediction.nii.gz"))


def test_serve_quarantines_bad_case_and_retries_on_change(tmp_path):
    """A corrupt case must not kill the server, must not retry-loop while
    unchanged, and must become eligible again once its files change."""
    cfg, model, variables, predictor = _setup(tmp_path, n_cases=1)
    out = str(tmp_path / "served")
    bad = tmp_path / "watch" / "bad"
    bad.mkdir()
    (bad / "volume.nii.gz").write_bytes(b"not a nifti")

    n = watch_and_predict(str(tmp_path / "watch"), out, model, variables,
                          cfg, predictor, once=True, overlap=4,
                          verbose=False)
    assert n == 1  # the good case was still served
    assert not os.path.exists(os.path.join(out, "bad", "prediction.nii.gz"))

    # within one server lifetime: bad case fails once, is NOT retried on the
    # next sweep, and IS retried (successfully) after its files change
    calls = {"n": 0}

    class Sweeps:
        def __init__(self, n):
            self.limit = n

        def is_set(self):
            calls["n"] += 1
            return calls["n"] >= self.limit

    import shutil
    os.remove(os.path.join(out, "case_0", "prediction.nii.gz"))
    shutil.rmtree(os.path.join(out, "case_0"))
    n2 = watch_and_predict(str(tmp_path / "watch"), out, model, variables,
                           cfg, predictor, once=False, stop=Sweeps(3),
                           overlap=4, poll_interval=0.01, verbose=False)
    assert n2 == 1  # good case re-served; bad case failed once, then skipped
    # repair the bad case -> served on the following sweeps
    shutil.copy(str(tmp_path / "watch" / "case_0" / "volume.nii.gz"),
                str(bad / "volume.nii.gz"))
    calls["n"] = 0
    n3 = watch_and_predict(str(tmp_path / "watch"), out, model, variables,
                           cfg, predictor, once=False, stop=Sweeps(3),
                           overlap=4, poll_interval=0.01, verbose=False)
    assert n3 == 1
    assert os.path.exists(os.path.join(out, "bad", "prediction.nii.gz"))


def test_discover_cases_basename_collision(tmp_path):
    """A directory `foo/` next to a bare file `foo.nii.gz` is a genuine
    ambiguity: neither is served (silent shadowing/misattribution would be
    worse) and the collision is reported for the operator. Case names must
    stay stable regardless of siblings — a name never shifts when a
    colliding entry appears later."""
    cfg, *_ = _setup(tmp_path, n_cases=2)
    import shutil
    shutil.copy(str(tmp_path / "watch" / "case_0" / "volume.nii.gz"),
                str(tmp_path / "watch" / "case_0.nii.gz"))
    collisions = []
    cases = discover_cases(str(tmp_path / "watch"), cfg, collisions)
    assert sorted(cases) == ["case_1"]  # non-colliding case unaffected
    assert collisions == ["case_0"]
    # remove the ambiguity -> the directory case is served under its
    # ORIGINAL stable name
    os.remove(str(tmp_path / "watch" / "case_0.nii.gz"))
    cases = discover_cases(str(tmp_path / "watch"), cfg)
    assert sorted(cases) == ["case_0", "case_1"]


def test_serve_pipelined_matches_serial(tmp_path):
    """The pipelined backlog path (predict_labels_async + deferred unpack)
    must produce byte-identical predictions to the serial per-case path."""
    from fetal_mri_segmentation_tpu.inference import predict_case
    from fetal_mri_segmentation_tpu.utils.nifti import load_nifti

    cfg, model, variables, predictor = _setup(tmp_path, n_cases=4)
    out = str(tmp_path / "served")
    assert hasattr(predictor, "predict_labels_async")  # pipelined path on
    n = watch_and_predict(str(tmp_path / "watch"), out, model, variables,
                          cfg, predictor, once=True, overlap=4,
                          verbose=False)
    assert n == 4
    for i in range(4):
        serial_dir = str(tmp_path / "serial" / f"case_{i}")
        predict_case(str(tmp_path / "watch" / f"case_{i}"), serial_dir,
                     model, variables, cfg, predictor=predictor, overlap=4,
                     save_inputs=False)
        a = load_nifti(os.path.join(out, f"case_{i}", "prediction.nii.gz"))
        b = load_nifti(os.path.join(serial_dir, "prediction.nii.gz"))
        np.testing.assert_array_equal(np.asarray(a.get_fdata()),
                                      np.asarray(b.get_fdata()))


def test_serve_write_failure_not_counted_and_quarantined(tmp_path):
    """A case whose output write fails must NOT count as predicted (no
    artifact on disk), must surface in stats (--once exits nonzero), and
    must be backoff-quarantined so the prediction is not recomputed every
    sweep while the error persists (e.g. disk full)."""
    from unittest import mock

    from fetal_mri_segmentation_tpu.inference import predict as predict_mod

    cfg, model, variables, predictor = _setup(tmp_path, n_cases=1)
    out = str(tmp_path / "served")

    real_save = predict_mod.save_nifti

    def failing_save(data, path, affine=None):
        if path.endswith("prediction.nii.gz"):
            raise OSError(28, "No space left on device")
        return real_save(data, path, affine=affine)

    stats = {}
    with mock.patch.object(predict_mod, "save_nifti", failing_save):
        n = watch_and_predict(str(tmp_path / "watch"), out, model,
                              variables, cfg, predictor, once=True,
                              overlap=4, verbose=False, stats=stats)
    assert n == 0
    assert stats == {"predicted": 0, "write_failures": 1,
                     "aux_write_failures": 0}
    assert not os.path.exists(os.path.join(out, "case_0",
                                           "prediction.nii.gz"))

    # while the error persists, the quarantine backoff prevents a full
    # recompute every sweep: 3 sweeps -> exactly ONE write attempt
    attempts = {"n": 0}

    def counting_failing_save(data, path, affine=None):
        if path.endswith("prediction.nii.gz"):
            attempts["n"] += 1
            raise OSError(28, "No space left on device")
        return real_save(data, path, affine=affine)

    calls = {"n": 0}

    class Sweeps:
        def is_set(self):
            calls["n"] += 1
            return calls["n"] >= 3

    with mock.patch.object(predict_mod, "save_nifti",
                           counting_failing_save):
        n2 = watch_and_predict(str(tmp_path / "watch"), out, model,
                               variables, cfg, predictor, once=False,
                               stop=Sweeps(), overlap=4,
                               poll_interval=0.01, verbose=False)
    assert n2 == 0
    assert attempts["n"] == 1
    # once the disk recovers (and the backoff elapses / files change) the
    # case serves normally — here: fresh server, working writes
    n3 = watch_and_predict(str(tmp_path / "watch"), out, model, variables,
                           cfg, predictor, once=True, overlap=4,
                           verbose=False)
    assert n3 == 1
    assert os.path.exists(os.path.join(out, "case_0", "prediction.nii.gz"))


def test_serve_watch_dir_unreadable(tmp_path):
    """A transiently unavailable watch dir must not kill a continuous
    server (retry next poll); in --once mode it must raise (the operator's
    one chance to see the problem)."""
    import pytest

    cfg, model, variables, predictor = _setup(tmp_path, n_cases=1)
    out = str(tmp_path / "served")
    gone = str(tmp_path / "nonexistent")

    calls = {"n": 0}

    class Sweeps:
        def is_set(self):
            calls["n"] += 1
            return calls["n"] >= 2

    n = watch_and_predict(gone, out, model, variables, cfg, predictor,
                          once=False, stop=Sweeps(), overlap=4,
                          poll_interval=0.01, verbose=False)
    assert n == 0  # survived both sweeps without raising
    with pytest.raises(OSError):
        watch_and_predict(gone, out, model, variables, cfg, predictor,
                          once=True, overlap=4, verbose=False)


def test_serve_prunes_state_for_deleted_cases(tmp_path, capsys):
    """Quarantine state must not outlive its case: a case deleted from the
    watch dir and later re-created with an IDENTICAL signature is retried
    immediately (the old failure entry was pruned), instead of sitting in
    the old entry's backoff window."""
    import shutil

    cfg, model, variables, predictor = _setup(tmp_path, n_cases=1)
    out = str(tmp_path / "served")
    bad = tmp_path / "watch" / "bad"
    bad.mkdir()
    (bad / "volume.nii.gz").write_bytes(b"not a nifti")
    mtime = os.stat(bad / "volume.nii.gz").st_mtime

    calls = {"n": 0}

    class Script:
        """sweep 1: bad fails (quarantined). between 1 and 2: delete bad.
        between 2 and 3: re-create byte- and mtime-identical. sweep 3:
        must fail AGAIN (pruned + retried), not be skipped by backoff."""

        def is_set(self):
            calls["n"] += 1
            if calls["n"] == 1:
                shutil.rmtree(str(bad))
            elif calls["n"] == 2:
                bad.mkdir()
                (bad / "volume.nii.gz").write_bytes(b"not a nifti")
                os.utime(bad / "volume.nii.gz", (mtime, mtime))
            return calls["n"] >= 3

    watch_and_predict(str(tmp_path / "watch"), out, model, variables, cfg,
                      predictor, once=False, stop=Script(), overlap=4,
                      poll_interval=0.01, verbose=False,
                      require_stable=False, retry_backoff=3600.0)
    failures = capsys.readouterr().out.count("FAILED bad")
    assert failures == 2


def test_serve_device_preprocess_matches_serial(tmp_path):
    """Serving with ops/resample.py::DevicePreprocessor (zoom+normalize on
    device) must produce byte-identical predictions to predict_case with
    the same preprocessor, and the full --save-inputs tree must land (the
    data_<modality> write D2Hs the device array in the IO worker)."""
    from fetal_mri_segmentation_tpu.inference import predict_case
    from fetal_mri_segmentation_tpu.ops.resample import DevicePreprocessor
    from fetal_mri_segmentation_tpu.utils.nifti import load_nifti

    # raw cases NOT at image_shape so the device zoom actually runs
    write_synthetic_dataset(str(tmp_path / "watch"), n_cases=3,
                            shape=(30, 26, 28))
    cfg = Config(image_shape=(24, 24, 24), patch_shape=(16, 16, 16),
                 model_name="unet", depth=3, n_base_filters=4,
                 compute_dtype="float32",
                 data_file=str(tmp_path / "none.h5"))
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    variables = {"params": state.params}
    predictor = SlidingWindowPredictor(model, cfg,
                                       image_shape=cfg.image_shape,
                                       overlap=4)
    pre = DevicePreprocessor(cfg.image_shape, cfg.normalization)
    out = str(tmp_path / "served")
    n = watch_and_predict(str(tmp_path / "watch"), out, model, variables,
                          cfg, predictor, once=True, overlap=4,
                          verbose=False, device_pre=pre, save_inputs=True)
    assert n == 3
    for i in range(3):
        serial_dir = str(tmp_path / "serial" / f"case_{i}")
        predict_case(str(tmp_path / "watch" / f"case_{i}"), serial_dir,
                     model, variables, cfg, predictor=predictor, overlap=4,
                     save_inputs=False, device_pre=pre)
        a = load_nifti(os.path.join(out, f"case_{i}", "prediction.nii.gz"))
        b = load_nifti(os.path.join(serial_dir, "prediction.nii.gz"))
        np.testing.assert_array_equal(np.asarray(a.get_fdata()),
                                      np.asarray(b.get_fdata()))
        # --save-inputs wrote the preprocessed modality from the device
        mod = cfg.training_modalities[0]
        d = load_nifti(os.path.join(out, f"case_{i}", f"data_{mod}.nii.gz"))
        assert d.shape[:3] == cfg.image_shape
        arr = d.get_fdata(dtype=np.float32)
        assert abs(float(arr.mean())) < 0.1  # per-volume z-scored


def test_serve_aux_write_failure_classified_separately(tmp_path):
    """A lost --save-inputs copy on an otherwise-served case must count as
    aux_write_failures (the prediction IS on disk), NOT as write_failures —
    a --once caller exits 0 and does not re-alert on a served batch."""
    from unittest import mock

    from fetal_mri_segmentation_tpu.inference import predict as predict_mod

    cfg, model, variables, predictor = _setup(tmp_path, n_cases=1)
    out = str(tmp_path / "served")

    real_save = predict_mod.save_nifti

    def failing_aux_save(data, path, affine=None):
        if os.path.basename(path).startswith("data_"):
            raise OSError(28, "No space left on device")
        return real_save(data, path, affine=affine)

    stats = {}
    with mock.patch.object(predict_mod, "save_nifti", failing_aux_save):
        n = watch_and_predict(str(tmp_path / "watch"), out, model,
                              variables, cfg, predictor, once=True,
                              overlap=4, verbose=False, stats=stats,
                              save_inputs=True)
    assert n == 1
    assert stats == {"predicted": 1, "write_failures": 0,
                     "aux_write_failures": 1}
    assert os.path.exists(os.path.join(out, "case_0", "prediction.nii.gz"))


def test_serve_stats_file_heartbeat(tmp_path):
    """--stats-file writes an atomically-replaced JSON heartbeat after
    every sweep: counts, quarantine size and latency percentiles over the
    served cases; an unwritable path must not kill serving."""
    import json

    cfg, model, variables, predictor = _setup(tmp_path)
    out = str(tmp_path / "served")
    sf = str(tmp_path / "stats.json")
    n = watch_and_predict(str(tmp_path / "watch"), out, model, variables,
                          cfg, predictor, once=True, overlap=4,
                          stats_file=sf, verbose=False)
    assert n == 2
    s = json.load(open(sf))
    assert s["predicted"] == 2
    assert s["sweeps"] == 1
    assert s["write_failures"] == 0 and s["quarantined"] == 0
    assert s["latency_sec"]["n"] == 2
    assert s["latency_sec"]["p50"] > 0
    assert s["latency_sec"]["max"] >= s["latency_sec"]["p50"]
    assert s["last_served"] in ("case_0", "case_1")

    # unwritable stats path: serving must still complete (and warn once)
    n = watch_and_predict(str(tmp_path / "watch"), str(tmp_path / "s2"),
                          model, variables, cfg, predictor, once=True,
                          overlap=4, verbose=False,
                          stats_file=str(tmp_path / "no_dir" / "x.json"))
    assert n == 2


def test_serve_collision_flicker_keeps_backoff(tmp_path, capsys):
    """A quarantined case that becomes transiently UNSERVABLE (a sibling
    name collision appears and disappears) must keep its backoff state:
    the flicker must not re-trigger an immediate recompute. Only full
    deletion of the entry prunes the quarantine."""
    import shutil

    cfg, model, variables, predictor = _setup(tmp_path, n_cases=1)
    out = str(tmp_path / "served")
    bad = tmp_path / "watch" / "bad"
    bad.mkdir()
    (bad / "volume.nii.gz").write_bytes(b"not a nifti")
    collider = tmp_path / "watch" / "bad.nii.gz"

    calls = {"n": 0}

    class Script:
        """sweep 1: bad fails (quarantined, long backoff). between 1 and 2:
        a colliding entry appears (bad leaves `discovered` but its entry is
        still present). between 2 and 3: collision resolved. sweeps 3+:
        bad is unchanged and inside backoff -> must NOT be retried."""

        def is_set(self):
            calls["n"] += 1
            if calls["n"] == 1:
                shutil.copy(str(tmp_path / "watch" / "case_0"
                                / "volume.nii.gz"), str(collider))
            elif calls["n"] == 2:
                os.remove(str(collider))
            return calls["n"] >= 4

    watch_and_predict(str(tmp_path / "watch"), out, model, variables, cfg,
                      predictor, once=False, stop=Script(), overlap=4,
                      poll_interval=0.01, verbose=False,
                      require_stable=False, retry_backoff=3600.0)
    # exactly ONE failure: the collision flicker did not reset the backoff
    assert capsys.readouterr().out.count("FAILED bad") == 1
