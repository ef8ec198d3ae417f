"""Ad-hoc NIfTI case prediction (inference/predict.py::predict_case).

The reference could only predict cases already ingested into its HDF5
dataset; `predict_case` runs the SAME ingest preprocessing (shared crop,
resample, normalize) on raw NIfTI files and must therefore produce a label
map identical to ingest-then-predict for the same case.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from fetal_mri_segmentation_tpu.config import Config
from fetal_mri_segmentation_tpu.data import open_data_file, write_data_to_file
from fetal_mri_segmentation_tpu.inference import (
    SlidingWindowPredictor, predict_case, resolve_case_files,
    run_validation_case)
from fetal_mri_segmentation_tpu.models import build_model
from fetal_mri_segmentation_tpu.training import create_train_state
from fetal_mri_segmentation_tpu.utils.nifti import load_nifti
from tests.synthetic import write_synthetic_dataset


def _setup(tmp_path, normalization="per_volume", n_cases=2):
    files = write_synthetic_dataset(str(tmp_path / "cases"), n_cases=n_cases,
                                    shape=(24, 24, 24))
    cfg = Config(image_shape=(24, 24, 24), patch_shape=(16, 16, 16),
                 model_name="unet", depth=3, n_base_filters=4,
                 normalization=normalization,
                 data_file=str(tmp_path / "data.h5"),
                 compute_dtype="float32")
    write_data_to_file(files, cfg.data_file, image_shape=cfg.image_shape,
                       normalize=normalization)
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    variables = {"params": state.params}
    return cfg, model, variables


def test_predict_case_matches_ingested(tmp_path):
    cfg, model, variables = _setup(tmp_path)
    predictor = SlidingWindowPredictor(model, cfg,
                                       image_shape=cfg.image_shape,
                                       overlap=4)
    data_file = open_data_file(cfg.data_file)
    try:
        run_validation_case(0, str(tmp_path / "ingested"), model, variables,
                            data_file, cfg, predictor)
    finally:
        data_file.close()
    predict_case(str(tmp_path / "cases" / "case_0"),
                 str(tmp_path / "adhoc"), model, variables, cfg,
                 predictor=predictor, overlap=4)

    img_i = load_nifti(str(tmp_path / "ingested" / "prediction.nii.gz"))
    img_a = load_nifti(str(tmp_path / "adhoc" / "prediction.nii.gz"))
    np.testing.assert_array_equal(np.asarray(img_i.get_fdata()),
                                  np.asarray(img_a.get_fdata()))
    np.testing.assert_allclose(img_i.affine, img_a.affine, atol=1e-6)
    # the per-case output tree is complete (inputs + truth from the case dir)
    assert os.path.exists(str(tmp_path / "adhoc" / "data_volume.nii.gz"))
    assert os.path.exists(str(tmp_path / "adhoc" / "truth.nii.gz"))


def test_predict_case_global_normalization_uses_training_moments(tmp_path):
    cfg, model, variables = _setup(tmp_path, normalization="global",
                                   n_cases=3)
    # builder persisted the training-distribution moments
    import h5py
    with h5py.File(cfg.data_file, "r") as h5:
        assert "norm_mean" in h5.attrs and "norm_std" in h5.attrs

    predict_case(str(tmp_path / "cases" / "case_1"),
                 str(tmp_path / "adhoc"), model, variables, cfg, overlap=4)
    # the preprocessed input written by predict_case must equal the stored
    # (ingested) volume: same crop/resample AND the same global moments.
    stored = open_data_file(cfg.data_file)
    try:
        expected = np.asarray(stored.root.data[1][0])
    finally:
        stored.close()
    written = load_nifti(str(tmp_path / "adhoc" / "data_volume.nii.gz"))
    np.testing.assert_allclose(written.get_fdata(dtype=np.float32), expected,
                               atol=1e-4)


def test_predict_case_global_without_moments_errors(tmp_path):
    cfg, model, variables = _setup(tmp_path)  # built with per_volume
    cfg.normalization = "global"
    cfg.data_file = str(tmp_path / "missing.h5")  # no persisted moments
    with pytest.raises(ValueError, match="global"):
        predict_case(str(tmp_path / "cases" / "case_0"),
                     str(tmp_path / "adhoc"), model, variables, cfg,
                     overlap=4)


def test_resolve_case_files(tmp_path):
    cfg = Config(image_shape=(24, 24, 24))
    write_synthetic_dataset(str(tmp_path), n_cases=1, shape=(24, 24, 24))
    files, truth = resolve_case_files(str(tmp_path / "case_0"), cfg)
    assert len(files) == 1 and files[0].endswith("volume.nii.gz")
    assert truth and truth.endswith("truth.nii.gz")
    # bare file works for single-modality configs
    files, truth = resolve_case_files(files[0], cfg)
    assert len(files) == 1 and truth is None
    # missing modality is a clear error
    with pytest.raises(FileNotFoundError, match="missing modality"):
        resolve_case_files(str(tmp_path), cfg)
    # bare file + multi-modality config is a clear error
    cfg2 = Config(image_shape=(24, 24, 24), all_modalities=("t1", "t2"))
    with pytest.raises(ValueError, match="single-modality"):
        resolve_case_files(files[0], cfg2)


def test_config_warns_on_unknown_keys():
    with pytest.warns(UserWarning, match="normalization"):
        Config.from_dict({"normalize": "per_volume"})
    # derived round-trip keys stay silent
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        Config.from_dict(Config().to_dict())


def test_predict_case_without_truth_uses_linear_resampling(tmp_path):
    """Without a truth file, the LAST MODALITY must still be resampled
    linearly — read_image_files' default treats the last file as a label
    (nearest-neighbor), which silently broke ingest parity for truth-less
    ad-hoc cases (the primary --input use case). Regression: a 20^3 case
    resampled to 24^3 must preprocess identically with and without the
    truth file present (crop disabled to isolate interpolation)."""
    import shutil

    files = write_synthetic_dataset(str(tmp_path / "cases"), n_cases=1,
                                    shape=(20, 20, 20))
    cfg = Config(image_shape=(24, 24, 24), patch_shape=(16, 16, 16),
                 model_name="unet", depth=3, n_base_filters=4,
                 data_file=str(tmp_path / "none.h5"),
                 compute_dtype="float32")
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    variables = {"params": state.params}

    shutil.copytree(str(tmp_path / "cases" / "case_0"),
                    str(tmp_path / "no_truth"))
    os.remove(str(tmp_path / "no_truth" / "truth.nii.gz"))

    predictor = SlidingWindowPredictor(model, cfg,
                                       image_shape=cfg.image_shape,
                                       overlap=4)
    predict_case(str(tmp_path / "cases" / "case_0"),
                 str(tmp_path / "with_truth_out"), model, variables, cfg,
                 predictor=predictor, crop=False)
    predict_case(str(tmp_path / "no_truth"),
                 str(tmp_path / "no_truth_out"), model, variables, cfg,
                 predictor=predictor, crop=False)

    a = load_nifti(str(tmp_path / "with_truth_out" / "data_volume.nii.gz"))
    b = load_nifti(str(tmp_path / "no_truth_out" / "data_volume.nii.gz"))
    np.testing.assert_allclose(a.get_fdata(dtype=np.float32),
                               b.get_fdata(dtype=np.float32), atol=1e-5)
    assert not os.path.exists(str(tmp_path / "no_truth_out" / "truth.nii.gz"))


def test_predict_case_multimodal(tmp_path):
    """Two-modality ad-hoc case: resolve_case_files orders files by
    training_modalities, both channels feed the net, and ONLY the truth is
    nearest-resampled."""
    from tests.synthetic import make_ellipsoid_case
    from fetal_mri_segmentation_tpu.utils.nifti import save_nifti

    vol, truth = make_ellipsoid_case(shape=(20, 20, 20), seed=0)
    case = tmp_path / "case_m"
    case.mkdir()
    save_nifti(vol, str(case / "t2.nii.gz"))
    save_nifti(vol * 0.5, str(case / "t1.nii.gz"))
    save_nifti(truth, str(case / "truth.nii.gz"))

    cfg = Config(image_shape=(24, 24, 24), patch_shape=(16, 16, 16),
                 model_name="unet", depth=3, n_base_filters=4,
                 all_modalities=("t1", "t2"), compute_dtype="float32",
                 data_file=str(tmp_path / "none.h5"))
    files, truth_f = resolve_case_files(str(case), cfg)
    assert [os.path.basename(f) for f in files] == ["t1.nii.gz", "t2.nii.gz"]
    assert truth_f.endswith("truth.nii.gz")

    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    predict_case(str(case), str(tmp_path / "out"), model,
                 {"params": state.params}, cfg, overlap=4)
    for artifact in ("data_t1.nii.gz", "data_t2.nii.gz", "truth.nii.gz",
                     "prediction.nii.gz"):
        assert os.path.exists(str(tmp_path / "out" / artifact)), artifact
    # truth resampled nearest: stays strictly binary after 20^3 -> 24^3
    t = load_nifti(str(tmp_path / "out" / "truth.nii.gz")).get_fdata()
    assert set(np.unique(t)).issubset({0.0, 1.0})


def test_predict_case_big_endian_input(tmp_path):
    """A big-endian scanner export predicts identically to the same case in
    native byte order (utils/nifti.py reads all NIfTI-1/2 endiannesses,
    matching the reference's nibabel ingest)."""
    import gzip

    from tests.test_nifti_io import _synth_nifti1

    cfg, model, variables = _setup(tmp_path)
    predictor = SlidingWindowPredictor(model, cfg,
                                       image_shape=cfg.image_shape,
                                       overlap=4)
    src = load_nifti(str(tmp_path / "cases" / "case_0" / "volume.nii.gz"))
    be_case = tmp_path / "be_cases" / "case_0"
    os.makedirs(be_case)
    raw = _synth_nifti1(src.get_fdata(dtype=np.float32), src.affine, bo=">")
    (be_case / "volume.nii.gz").write_bytes(gzip.compress(raw))

    predict_case(str(tmp_path / "cases" / "case_0"),
                 str(tmp_path / "out_le"), model, variables, cfg,
                 predictor=predictor, overlap=4, save_inputs=False)
    predict_case(str(be_case), str(tmp_path / "out_be"), model, variables,
                 cfg, predictor=predictor, overlap=4, save_inputs=False)
    le = load_nifti(str(tmp_path / "out_le" / "prediction.nii.gz"))
    be = load_nifti(str(tmp_path / "out_be" / "prediction.nii.gz"))
    np.testing.assert_array_equal(np.asarray(le.get_fdata()),
                                  np.asarray(be.get_fdata()))


def test_case_name_strips_only_trailing_suffix():
    """serve.py and predict.py --input share ONE case-naming helper; it
    strips .nii/.nii.gz as a SUFFIX only (a mid-string occurrence is part
    of the name, not an extension)."""
    from fetal_mri_segmentation_tpu.inference.serve import _case_name
    from fetal_mri_segmentation_tpu.utils.io_utils import case_name_from_path

    assert _case_name is case_name_from_path  # shared, cannot diverge
    assert case_name_from_path("/a/b/scan.nii.gz") == "scan"
    assert case_name_from_path("scan.nii") == "scan"
    assert case_name_from_path("/a/case_dir/") == "case_dir"
    assert case_name_from_path("scan.nii.gz.bak") == "scan.nii.gz.bak"
    assert case_name_from_path("my.nii.scan.nii.gz") == "my.nii.scan"


def test_resolve_tta_mode_implies_tta():
    """--tta-mode without --tta must enable that mode (a requested mode is
    never silently dropped); bare --tta defaults to the 48-symmetry."""
    from fetal_mri_segmentation_tpu.inference.predict import resolve_tta

    assert resolve_tta(False, None) is False
    assert resolve_tta(True, None) == "permute"
    assert resolve_tta(False, "flips") == "flips"
    assert resolve_tta(True, "flips") == "flips"
    assert resolve_tta(True, "permute") == "permute"


def test_predict_cases_pipelined_matches_serial(tmp_path):
    """predict.py --input's pipelined batch path must produce byte-identical
    artifacts to serial predict_case, and errors must PROPAGATE (fail-loud
    CLI semantics, unlike serve.py's quarantine)."""
    from fetal_mri_segmentation_tpu.inference.predict import (
        predict_cases_pipelined)

    cfg, model, variables = _setup(tmp_path, n_cases=4)
    predictor = SlidingWindowPredictor(model, cfg,
                                       image_shape=cfg.image_shape,
                                       overlap=4)
    cases = [(str(tmp_path / "cases" / f"case_{i}"),
              str(tmp_path / "piped" / f"case_{i}")) for i in range(4)]
    n = predict_cases_pipelined(cases, model, variables, cfg, predictor,
                                verbose=False)
    assert n == 4
    for i in range(4):
        serial_dir = str(tmp_path / "serial" / f"case_{i}")
        predict_case(str(tmp_path / "cases" / f"case_{i}"), serial_dir,
                     model, variables, cfg, predictor=predictor)
        for art in ("prediction.nii.gz", "truth.nii.gz",
                    f"data_{cfg.training_modalities[0]}.nii.gz"):
            a = load_nifti(os.path.join(str(tmp_path / "piped"),
                                        f"case_{i}", art))
            b = load_nifti(os.path.join(serial_dir, art))
            np.testing.assert_array_equal(np.asarray(a.get_fdata()),
                                          np.asarray(b.get_fdata()))

    # a corrupt case mid-batch raises (no quarantine on the CLI surface) —
    # but the GOOD case dispatched before it must keep its full artifact
    # tree (its device predict succeeded; a different case's corruption
    # must not drop a completed prediction)
    bad = tmp_path / "cases" / "bad"
    bad.mkdir()
    (bad / "volume.nii.gz").write_bytes(b"not a nifti")
    with pytest.raises(Exception):
        predict_cases_pipelined(
            [(str(tmp_path / "cases" / "case_0"), str(tmp_path / "x0")),
             (str(bad), str(tmp_path / "xbad"))],
            model, variables, cfg, predictor, verbose=False)
    assert os.path.exists(str(tmp_path / "x0" / "prediction.nii.gz"))
    a = load_nifti(str(tmp_path / "x0" / "prediction.nii.gz"))
    b = load_nifti(str(tmp_path / "serial" / "case_0" / "prediction.nii.gz"))
    np.testing.assert_array_equal(np.asarray(a.get_fdata()),
                                  np.asarray(b.get_fdata()))


def test_predict_case_prob_map_matches_thresholded_labels(tmp_path):
    """--prob-map surface: output_label_map=False writes the raw
    probability volume (reference: run_validation_case with
    output_label_map=False); thresholding it must reproduce the label-map
    run exactly."""
    cfg, model, variables = _setup(tmp_path)
    predictor = SlidingWindowPredictor(model, cfg,
                                       image_shape=cfg.image_shape,
                                       overlap=4)
    case = str(tmp_path / "cases" / "case_0")
    predict_case(case, str(tmp_path / "labels"), model, variables, cfg,
                 predictor=predictor, save_inputs=False)
    prob = predict_case(case, str(tmp_path / "prob"), model, variables, cfg,
                        predictor=predictor, save_inputs=False,
                        output_label_map=False)
    img = load_nifti(str(tmp_path / "prob" / "prediction.nii.gz"))
    p = img.get_fdata(dtype=np.float32)
    assert p.shape == cfg.image_shape  # binary: single 3-D channel
    assert 0.0 <= p.min() and p.max() <= 1.0
    np.testing.assert_allclose(p, np.asarray(prob)[0], atol=1e-6)
    labels = load_nifti(
        str(tmp_path / "labels" / "prediction.nii.gz")).get_fdata()
    lab = cfg.labels[0] if cfg.labels else 1
    np.testing.assert_array_equal((p > 0.5).astype(np.uint8) * lab, labels)


def test_predict_cases_pipelined_prob_map(tmp_path):
    """predict.py --input --prob-map: the batch driver pipelines
    probability output (async prob dispatch + IO worker, round 4) and
    produces the same artifact as predict_case(output_label_map=False)."""
    from fetal_mri_segmentation_tpu.inference.predict import (
        predict_cases_pipelined)

    cfg, model, variables = _setup(tmp_path)
    predictor = SlidingWindowPredictor(model, cfg,
                                       image_shape=cfg.image_shape,
                                       overlap=4)
    case = str(tmp_path / "cases" / "case_0")
    n = predict_cases_pipelined([(case, str(tmp_path / "batch"))],
                                model, variables, cfg, predictor,
                                verbose=False, output_label_map=False)
    assert n == 1
    predict_case(case, str(tmp_path / "single"), model, variables, cfg,
                 predictor=predictor, output_label_map=False)
    a = load_nifti(str(tmp_path / "batch" / "prediction.nii.gz"))
    b = load_nifti(str(tmp_path / "single" / "prediction.nii.gz"))
    np.testing.assert_array_equal(np.asarray(a.get_fdata()),
                                  np.asarray(b.get_fdata()))


def test_predict_cases_pipelined_prob_map_direct(tmp_path):
    """predict.py --input --direct --prob-map: the DIRECT whole-volume
    predictor duck-types the async prob surface (round 4), so the batch
    driver takes the pipelined branch — and the artifact equals the serial
    predict_case one. Also composes with volume-level TTA (flips)."""
    from fetal_mri_segmentation_tpu.inference.predict import (
        predict_cases_pipelined)
    from fetal_mri_segmentation_tpu.parallel import make_direct_predictor

    cfg, model, variables = _setup(tmp_path)
    for tta, tag in ((False, "plain"), ("flips", "tta")):
        predictor = make_direct_predictor(model, cfg, tta=tta)
        # the hasattr dispatch must pick the pipelined branch for direct mode
        assert hasattr(predictor, "predict_prob_async")
        case = str(tmp_path / "cases" / "case_0")
        n = predict_cases_pipelined(
            [(case, str(tmp_path / f"batch_{tag}"))], model, variables,
            cfg, predictor, verbose=False, output_label_map=False)
        assert n == 1
        predict_case(case, str(tmp_path / f"single_{tag}"), model,
                     variables, cfg, predictor=predictor,
                     output_label_map=False)
        a = load_nifti(str(tmp_path / f"batch_{tag}" / "prediction.nii.gz"))
        b = load_nifti(str(tmp_path / f"single_{tag}" / "prediction.nii.gz"))
        np.testing.assert_array_equal(np.asarray(a.get_fdata()),
                                      np.asarray(b.get_fdata()))


def test_run_validation_cases_prob_map(tmp_path):
    """predict.py --prob-map on the VALIDATION-SET path: per-case
    probability NIfTIs whose thresholding matches the label-map run."""
    from fetal_mri_segmentation_tpu.inference import run_validation_cases
    from fetal_mri_segmentation_tpu.utils.io_utils import pickle_dump

    cfg, model, variables = _setup(tmp_path)
    cfg.validation_file = str(tmp_path / "val_ids.pkl")
    pickle_dump([0, 1], cfg.validation_file)
    data_file = open_data_file(cfg.data_file)
    try:
        run_validation_cases(cfg.validation_file, model, variables,
                             data_file, cfg,
                             output_dir=str(tmp_path / "lab"), overlap=4)
        run_validation_cases(cfg.validation_file, model, variables,
                             data_file, cfg,
                             output_dir=str(tmp_path / "prob"), overlap=4,
                             output_label_map=False)
    finally:
        data_file.close()
    for i in (0, 1):
        p = load_nifti(str(tmp_path / "prob" / f"validation_case_{i}" /
                           "prediction.nii.gz")).get_fdata(dtype=np.float32)
        lab = load_nifti(str(tmp_path / "lab" / f"validation_case_{i}" /
                             "prediction.nii.gz")).get_fdata()
        assert p.shape == cfg.image_shape
        v = cfg.labels[0] if cfg.labels else 1
        np.testing.assert_array_equal((p > 0.5).astype(np.uint8) * v, lab)


def test_prob_pipeline_fp16_transfer(tmp_path):
    """--prob-map --prob-dtype float16: the fp16-packed D2H stays within
    the documented quantization (<=4.9e-4 on [0,1]) of the fp32 maps, and
    the derived label maps agree except exactly at the threshold boundary
    (ensemble workflows are therefore unchanged)."""
    from fetal_mri_segmentation_tpu.inference.predict import (
        predict_cases_pipelined)

    cfg, model, variables = _setup(tmp_path, n_cases=3)
    predictor = SlidingWindowPredictor(model, cfg,
                                       image_shape=cfg.image_shape,
                                       overlap=4)
    cases32 = [(str(tmp_path / "cases" / f"case_{i}"),
                str(tmp_path / "p32" / f"case_{i}")) for i in range(3)]
    cases16 = [(str(tmp_path / "cases" / f"case_{i}"),
                str(tmp_path / "p16" / f"case_{i}")) for i in range(3)]
    assert predict_cases_pipelined(
        cases32, model, variables, cfg, predictor, verbose=False,
        output_label_map=False, prob_dtype="float32") == 3
    assert predict_cases_pipelined(
        cases16, model, variables, cfg, predictor, verbose=False,
        output_label_map=False, prob_dtype="float16") == 3
    for i in range(3):
        p32 = load_nifti(str(tmp_path / "p32" / f"case_{i}" /
                             "prediction.nii.gz")).get_fdata(np.float32)
        p16 = load_nifti(str(tmp_path / "p16" / f"case_{i}" /
                             "prediction.nii.gz")).get_fdata(np.float32)
        assert np.abs(p32 - p16).max() <= 4.9e-4
        # label agreement away from the knife-edge
        safe = np.abs(p32 - 0.5) > 1e-3
        np.testing.assert_array_equal((p32 > 0.5)[safe], (p16 > 0.5)[safe])


def test_run_validation_cases_prob_pipelined_identical(tmp_path):
    """The validation-set --prob-map path rides the async pipeline now;
    artifacts must equal the serial run_validation_case output bitwise
    (fp32 transfer)."""
    from fetal_mri_segmentation_tpu.inference import run_validation_cases
    from fetal_mri_segmentation_tpu.utils.io_utils import pickle_dump

    cfg, model, variables = _setup(tmp_path, n_cases=3)
    keys = str(tmp_path / "val.pkl")
    pickle_dump([0, 2], keys)
    df = open_data_file(cfg.data_file)
    try:
        run_validation_cases(keys, model, variables, df, cfg,
                             output_dir=str(tmp_path / "piped"), overlap=4,
                             output_label_map=False)
        predictor = SlidingWindowPredictor(model, cfg,
                                           image_shape=cfg.image_shape,
                                           overlap=4)
        for i in (0, 2):
            run_validation_case(i, str(tmp_path / "serial" / f"c{i}"),
                                model, variables, df, cfg, predictor,
                                output_label_map=False)
            a = load_nifti(str(tmp_path / "piped" / f"validation_case_{i}" /
                               "prediction.nii.gz")).get_fdata(np.float32)
            b = load_nifti(str(tmp_path / "serial" / f"c{i}" /
                               "prediction.nii.gz")).get_fdata(np.float32)
            np.testing.assert_array_equal(a, b)
    finally:
        df.close()


@pytest.mark.parametrize("dtype,tol", [("uint8", 1.0 / 255 / 2 + 1e-7),
                                       ("uint16", 1.0 / 65535 / 2 + 1e-7)])
def test_prob_pipeline_quantized_transfer(tmp_path, dtype, tol):
    """--prob-map --prob-dtype uint8/uint16: the fixed-point D2H stays
    within its documented half-step quantization of the fp32 maps, the
    written NIfTI is dequantized float32, and derived label maps agree
    away from the threshold knife-edge — so ensemble.py consumes all
    transfer dtypes identically (VERDICT r4 item 4)."""
    from fetal_mri_segmentation_tpu.inference.predict import (
        predict_cases_pipelined)

    cfg, model, variables = _setup(tmp_path, n_cases=2)
    predictor = SlidingWindowPredictor(model, cfg,
                                       image_shape=cfg.image_shape,
                                       overlap=4)
    cases32 = [(str(tmp_path / "cases" / f"case_{i}"),
                str(tmp_path / "p32" / f"case_{i}")) for i in range(2)]
    casesq = [(str(tmp_path / "cases" / f"case_{i}"),
               str(tmp_path / f"p_{dtype}" / f"case_{i}"))
              for i in range(2)]
    assert predict_cases_pipelined(
        cases32, model, variables, cfg, predictor, verbose=False,
        output_label_map=False, prob_dtype="float32") == 2
    assert predict_cases_pipelined(
        casesq, model, variables, cfg, predictor, verbose=False,
        output_label_map=False, prob_dtype=dtype) == 2
    for i in range(2):
        p32 = load_nifti(str(tmp_path / "p32" / f"case_{i}" /
                             "prediction.nii.gz")).get_fdata(np.float32)
        pq = load_nifti(str(tmp_path / f"p_{dtype}" / f"case_{i}" /
                            "prediction.nii.gz")).get_fdata(np.float32)
        assert pq.dtype == np.float32
        assert np.abs(p32 - pq).max() <= tol, float(np.abs(p32 - pq).max())
        safe = np.abs(p32 - 0.5) > 2 * tol
        np.testing.assert_array_equal((p32 > 0.5)[safe], (pq > 0.5)[safe])
        # the FILE stores the integer volume (scl_slope dequantization on
        # read) — materially smaller than the float32 artifact
        sz32 = os.path.getsize(str(tmp_path / "p32" / f"case_{i}" /
                                   "prediction.nii.gz"))
        szq = os.path.getsize(str(tmp_path / f"p_{dtype}" / f"case_{i}" /
                                  "prediction.nii.gz"))
        assert szq < 0.8 * sz32, (szq, sz32)


def test_quantize_unpack_roundtrip_and_rejects():
    """Unit contract of the shared transfer helpers: quantize->unpack is a
    half-step-exact involution on [0,1], dtype spellings canonicalize, and
    unknown dtypes fail loudly."""
    import jax.numpy as jnp

    from fetal_mri_segmentation_tpu.utils.residency import (
        quantize_prob, resolve_prob_transfer, unpack_prob_f32)

    p = np.linspace(0, 1, 1001, dtype=np.float32)
    for kind, steps in (("uint8", 255), ("uint16", 65535)):
        q = np.asarray(quantize_prob(jnp.asarray(p), kind))
        assert q.dtype == np.dtype(kind)
        back = unpack_prob_f32(q)
        assert back.dtype == np.float32
        assert np.abs(back - p).max() <= 0.5 / steps + 1e-7
    assert resolve_prob_transfer("half") == "float16"
    assert resolve_prob_transfer("u8") == "uint8"
    assert resolve_prob_transfer("float32") == "float32"
    with pytest.raises(ValueError, match="transfer dtype"):
        resolve_prob_transfer("int4")
