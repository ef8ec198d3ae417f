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
