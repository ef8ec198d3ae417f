"""Surface-distance metrics (utils/surface_metrics.py): oracle geometry
cases, physical-spacing scaling, empty-mask semantics, evaluate.py wiring."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fetal_mri_segmentation_tpu.utils.surface_metrics import (
    assd, hausdorff95, surface_distances, voxel_spacing_from_affine)


def _cube(shape=(24, 24, 24), lo=6, hi=14):
    m = np.zeros(shape, bool)
    m[lo:hi, lo:hi, lo:hi] = True
    return m


def test_identical_masks_zero_distance():
    m = _cube()
    assert hausdorff95(m, m) == 0.0
    assert assd(m, m) == 0.0


def test_shifted_cube_known_distance():
    """A cube shifted by 2 voxels along one axis: the two faces normal to
    the shift are 2 voxels apart; HD95 picks that up exactly."""
    t = _cube(lo=6, hi=14)
    p = np.roll(t, 2, axis=0)
    hd = hausdorff95(t, p)
    assert hd == pytest.approx(2.0)
    a = assd(t, p)
    assert 0.0 < a < 2.0  # most surface voxels are the (closer) side faces


def test_spacing_scales_distances():
    t = _cube(lo=6, hi=14)
    p = np.roll(t, 2, axis=0)
    assert hausdorff95(t, p, spacing=(2.0, 1.0, 1.0)) == pytest.approx(4.0)
    # shift axis with unit spacing, scale an orthogonal axis: unchanged max
    assert hausdorff95(t, p, spacing=(1.0, 3.0, 1.0)) == pytest.approx(2.0)


def test_dilated_sphere_one_voxel():
    from scipy import ndimage

    rng = np.random.default_rng(0)
    zz, yy, xx = np.mgrid[:32, :32, :32]
    t = (zz - 16) ** 2 + (yy - 16) ** 2 + (xx - 16) ** 2 < 8 ** 2
    p = ndimage.binary_dilation(t)
    assert hausdorff95(t, p) <= np.sqrt(3) + 1e-9
    assert assd(t, p) <= np.sqrt(3)


def test_empty_mask_semantics():
    z = np.zeros((8, 8, 8), bool)
    m = _cube((8, 8, 8), 2, 5)
    assert hausdorff95(z, z) == 0.0 and assd(z, z) == 0.0
    assert np.isnan(hausdorff95(z, m)) and np.isnan(assd(m, z))


def test_directed_distances_asymmetry():
    t = _cube(lo=6, hi=14)
    p = _cube(lo=6, hi=18)  # prediction over-segments one direction
    d_tp, d_pt = surface_distances(t, p)
    assert d_tp.max() <= d_pt.max()  # truth surface is inside pred


def test_voxel_spacing_from_affine():
    aff = np.diag([0.8, 0.8, 3.0, 1.0])
    assert voxel_spacing_from_affine(aff) == pytest.approx((0.8, 0.8, 3.0))
    # rotation preserves column norms
    th = 0.3
    rot = np.eye(4)
    rot[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    assert voxel_spacing_from_affine(rot @ aff) == pytest.approx(
        (0.8, 0.8, 3.0))


def test_evaluate_cli_surface_columns(tmp_path):
    from fetal_mri_segmentation_tpu.utils.nifti import NiftiImage, save_nifti

    import evaluate

    case = tmp_path / "pred" / "case_0"
    os.makedirs(case)
    t = _cube((16, 16, 16), 4, 10).astype(np.uint8)
    p = np.roll(t, 1, axis=2)
    aff = np.diag([2.0, 2.0, 2.0, 1.0])
    save_nifti(NiftiImage(t, aff), str(case / "truth.nii.gz"))
    save_nifti(NiftiImage(p, aff), str(case / "prediction.nii.gz"))
    df = evaluate.main(str(tmp_path / "pred"), [1],
                       str(tmp_path / "scores.csv"), plot=False,
                       surface_metrics=True)
    assert df.loc["case_0", "label_1_hd95_mm"] == pytest.approx(2.0)
    assert 0.0 < df.loc["case_0", "label_1_assd_mm"] < 2.0
    assert "label_1_dice" in df.columns
