"""tools/ensemble.py — probability-map ensembling over prediction trees.

Consumes what ``predict.py --prob-map`` writes (3-D binary / 4-D
multi-class probability NIfTIs) and must reproduce the reference's
``prediction_to_image`` label semantics on the averaged volume.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fetal_mri_segmentation_tpu.utils.nifti import load_nifti, save_nifti
from tools.ensemble import main as ensemble_main


def _write_tree(root, cases):
    """cases: {name: prob array (3-D or 4-D channel-last)}."""
    affine = np.diag([1.0, 1.0, 2.0, 1.0])
    for name, prob in cases.items():
        d = os.path.join(root, name)
        os.makedirs(d)
        save_nifti(prob.astype(np.float32),
                   os.path.join(d, "prediction.nii.gz"), affine=affine)


def test_binary_ensemble_averages_and_thresholds(tmp_path):
    rng = np.random.default_rng(0)
    pa = rng.uniform(size=(8, 8, 8)).astype(np.float32)
    pb = rng.uniform(size=(8, 8, 8)).astype(np.float32)
    _write_tree(str(tmp_path / "a"), {"case_0": pa})
    _write_tree(str(tmp_path / "b"), {"case_0": pb})
    n = ensemble_main([str(tmp_path / "a"), str(tmp_path / "b")],
                      str(tmp_path / "out"), save_prob=True)
    assert n == 1
    mean = (pa + pb) / 2
    prob = load_nifti(str(tmp_path / "out" / "case_0" /
                          "probability.nii.gz")).get_fdata(dtype=np.float32)
    np.testing.assert_allclose(prob, mean, atol=1e-6)
    lab = load_nifti(str(tmp_path / "out" / "case_0" /
                         "prediction.nii.gz")).get_fdata()
    np.testing.assert_array_equal(lab, (mean > 0.5).astype(np.uint8))


def test_weighted_multiclass_argmax(tmp_path):
    rng = np.random.default_rng(1)
    pa = rng.uniform(size=(6, 6, 6, 3)).astype(np.float32)
    pb = rng.uniform(size=(6, 6, 6, 3)).astype(np.float32)
    _write_tree(str(tmp_path / "a"), {"c": pa})
    _write_tree(str(tmp_path / "b"), {"c": pb})
    ensemble_main([str(tmp_path / "a"), str(tmp_path / "b")],
                  str(tmp_path / "out"), weights=[3.0, 1.0],
                  threshold=0.0, labels=[2, 4, 6])
    mean = (3 * pa + pb) / 4
    expect = np.asarray([2, 4, 6])[mean.argmax(axis=-1)]
    lab = load_nifti(str(tmp_path / "out" / "c" /
                         "prediction.nii.gz")).get_fdata()
    np.testing.assert_array_equal(lab, expect)


def test_mismatched_cases_warn_or_strict(tmp_path, capsys):
    p = np.full((4, 4, 4), 0.7, np.float32)
    _write_tree(str(tmp_path / "a"), {"c0": p, "c1": p})
    _write_tree(str(tmp_path / "b"), {"c0": p})
    n = ensemble_main([str(tmp_path / "a"), str(tmp_path / "b")],
                      str(tmp_path / "out"))
    assert n == 1 and "c1" in capsys.readouterr().err
    with pytest.raises(ValueError, match="strict"):
        ensemble_main([str(tmp_path / "a"), str(tmp_path / "b")],
                      str(tmp_path / "out2"), strict=True)


def test_label_map_input_rejected(tmp_path):
    """A LABEL map fed as ensemble input (values outside [0,1]) must be
    rejected — silently averaging labels is the classic footgun."""
    _write_tree(str(tmp_path / "a"),
                {"c": np.full((4, 4, 4), 2.0, np.float32)})
    _write_tree(str(tmp_path / "b"),
                {"c": np.full((4, 4, 4), 0.5, np.float32)})
    with pytest.raises(ValueError, match="LABEL map"):
        ensemble_main([str(tmp_path / "a"), str(tmp_path / "b")],
                      str(tmp_path / "out"))


def test_grid_mismatch_rejected(tmp_path):
    p = np.full((4, 4, 4), 0.5, np.float32)
    _write_tree(str(tmp_path / "a"), {"c": p})
    d = tmp_path / "b" / "c"
    os.makedirs(str(d))
    save_nifti(p, str(d / "prediction.nii.gz"),
               affine=np.diag([2.0, 1.0, 2.0, 1.0]))  # different grid
    with pytest.raises(ValueError, match="affine"):
        ensemble_main([str(tmp_path / "a"), str(tmp_path / "b")],
                      str(tmp_path / "out"))


def test_binary_mask_input_rejected(tmp_path):
    """A {0,1}-only volume (binary label map from a labels=[1] config —
    the DEFAULT prediction output) must be rejected too; the [0,1] range
    check alone cannot catch it."""
    rng = np.random.default_rng(5)
    mask = (rng.uniform(size=(4, 4, 4)) > 0.5).astype(np.float32)
    _write_tree(str(tmp_path / "a"), {"c": mask})
    _write_tree(str(tmp_path / "b"),
                {"c": np.full((4, 4, 4), 0.5, np.float32)})
    with pytest.raises(ValueError, match="LABEL map"):
        ensemble_main([str(tmp_path / "a"), str(tmp_path / "b")],
                      str(tmp_path / "out"))


def test_assume_prob_accepts_saturated_maps(tmp_path):
    """--assume-prob bypasses the exact-0/1 hard-label heuristic: a
    genuinely saturated sigmoid volume (all voxels exactly 0.0/1.0) can
    still be ensembled when the user vouches for it."""
    rng = np.random.default_rng(7)
    sat = (rng.uniform(size=(4, 4, 4)) > 0.5).astype(np.float32)
    _write_tree(str(tmp_path / "a"), {"c": sat})
    _write_tree(str(tmp_path / "b"), {"c": sat})
    # default: rejected, and the error names the override
    with pytest.raises(ValueError, match="assume-prob"):
        ensemble_main([str(tmp_path / "a"), str(tmp_path / "b")],
                      str(tmp_path / "out"))
    n = ensemble_main([str(tmp_path / "a"), str(tmp_path / "b")],
                      str(tmp_path / "out"), assume_prob=True)
    assert n == 1
    lab = load_nifti(str(tmp_path / "out" / "c" / "prediction.nii.gz")
                     ).get_fdata()
    np.testing.assert_array_equal(lab, sat)


def test_large_label_values_widen_dtype(tmp_path):
    """--labels 500 must not wrap modulo 256 (uint8) in the output map."""
    rng = np.random.default_rng(11)
    p = rng.uniform(0.05, 0.95, size=(4, 4, 4)).astype(np.float32)
    _write_tree(str(tmp_path / "a"), {"c": p})
    _write_tree(str(tmp_path / "b"), {"c": p})
    ensemble_main([str(tmp_path / "a"), str(tmp_path / "b")],
                  str(tmp_path / "out"), labels=[500])
    lab = load_nifti(str(tmp_path / "out" / "c" / "prediction.nii.gz")
                     ).get_fdata()
    assert set(np.unique(lab)) <= {0.0, 500.0}
    assert (lab == 500).any()
