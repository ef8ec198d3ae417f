"""Patch-grid math contract tests (SURVEY.md section 2 patch-engine row)."""

import numpy as np

from fetal_mri_segmentation_tpu.ops import patches as P


def test_centered_grid_negative_start():
    # shape 144, patch 64, overlap 16 -> step 48, n = ceil(144/48) = 3,
    # overflow = 48*3 - 144 + 16 = 16, start = -8
    idx = P.compute_patch_indices((144, 144, 144), (64, 64, 64), 16)
    assert idx.shape == (27, 3)
    assert idx.min() == -8
    # grid covers the volume: last corner + patch >= shape
    assert (idx.max(axis=0) + 64 >= 144).all()


def test_grid_exact_tiling_no_overlap():
    idx = P.compute_patch_indices((128, 128, 128), (64, 64, 64), 0)
    assert idx.shape == (8, 3)
    assert idx.min() == 0 and idx.max() == 64


def test_explicit_start():
    idx = P.compute_patch_indices((100, 100, 100), (50, 50, 50), 0, start=0)
    assert idx.min() == 0
    assert (idx <= 50).all()


def test_patch_extraction_zero_pad():
    vol = np.arange(4 * 4 * 4, dtype=np.float32).reshape(1, 4, 4, 4)
    patch = P.get_patch_from_3d_data(vol, (4, 4, 4), (-2, 0, 2))
    assert patch.shape == (1, 4, 4, 4)
    assert (patch[:, :2] == 0).all()          # before-volume rows zero
    assert (patch[:, :, :, 2:] == 0).all()    # beyond-volume cols zero
    assert patch[0, 2, 0, 0] == vol[0, 0, 0, 2]


def test_reconstruct_identity_on_constant_volume():
    shape = (1, 40, 40, 40)
    vol = np.full(shape, 7.0, np.float32)
    idx = P.compute_patch_indices(shape[1:], (16, 16, 16), 4)
    patches = [P.get_patch_from_3d_data(vol, (16, 16, 16), i) for i in idx]
    # mean overlap-add of a constant volume gives the constant back wherever
    # covered, except zero-padded out-of-bounds reads pull borders down —
    # so feed the *extracted* patches (which include zero pad) only inbounds.
    recon = P.reconstruct_from_patches(
        [np.full((1, 16, 16, 16), 7.0, np.float32) for _ in idx], idx, shape)
    assert np.allclose(recon, 7.0)


def test_reconstruct_identity_from_extracted_patches():
    rng = np.random.default_rng(1)
    shape = (2, 24, 24, 24)
    vol = rng.random(shape).astype(np.float32)
    idx = P.compute_patch_indices(shape[1:], (8, 8, 8), 0)
    assert idx.min() >= 0  # exact tiling -> extraction is lossless
    patches = [P.get_patch_from_3d_data(vol, (8, 8, 8), i) for i in idx]
    recon = P.reconstruct_from_patches(patches, idx, shape)
    assert np.allclose(recon, vol, atol=1e-6)


def test_reconstruct_gaussian_weighted_identity():
    rng = np.random.default_rng(2)
    shape = (1, 24, 24, 24)
    vol = np.full(shape, 3.0, np.float32)
    idx = P.compute_patch_indices(shape[1:], (16, 16, 16), 8)
    w = P.gaussian_importance_map((16, 16, 16))
    recon = P.reconstruct_from_patches(
        [np.full((1, 16, 16, 16), 3.0, np.float32) for _ in idx], idx, shape,
        weight_map=w)
    assert np.allclose(recon, 3.0, atol=1e-5)


def test_gaussian_importance_map_properties():
    w = P.gaussian_importance_map((16, 16, 16))
    assert w.shape == (16, 16, 16)
    assert abs(w.max() - 1.0) < 1e-6
    assert w.max() == w[7, 7, 7] or w.max() == w[8, 8, 8]
    assert (w > 0).all()
