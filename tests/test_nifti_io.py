"""Pure-numpy NIfTI-1 reader/writer round-trip tests."""

import numpy as np

from fetal_mri_segmentation_tpu.utils.nifti import (
    NiftiImage, load_nifti, save_nifti)


def test_roundtrip_float32(tmp_path, rng):
    data = rng.random((5, 6, 7)).astype(np.float32)
    affine = np.array([[0.8, 0, 0, -10], [0, 0.8, 0, -12],
                       [0, 0, 2.0, -5], [0, 0, 0, 1]])
    p = str(tmp_path / "x.nii.gz")
    save_nifti(data, p, affine=affine)
    img = load_nifti(p)
    assert img.shape == (5, 6, 7)
    assert np.allclose(img.get_fdata(), data, atol=1e-7)
    assert np.allclose(img.affine, affine, atol=1e-5)


def test_roundtrip_uint8_uncompressed(tmp_path):
    data = (np.arange(4 * 4 * 4) % 3).astype(np.uint8).reshape(4, 4, 4)
    p = str(tmp_path / "labels.nii")
    save_nifti(data, p, affine=np.eye(4))
    img = load_nifti(p)
    assert img.dataobj.dtype == np.uint8
    assert np.array_equal(img.dataobj, data)


def test_fortran_order_preserved(tmp_path):
    """Voxel [i,j,k] must survive the round trip exactly (x-fastest on disk)."""
    data = np.zeros((3, 4, 5), np.float32)
    data[1, 2, 3] = 42.0
    p = str(tmp_path / "o.nii")
    save_nifti(data, p)
    assert load_nifti(p).get_fdata()[1, 2, 3] == 42.0


def test_nifti_image_ducktype():
    img = NiftiImage(np.ones((2, 2, 2)), np.eye(4))
    assert img.get_fdata().dtype == np.float64
    assert img.shape == (2, 2, 2)


def test_save_nifti_atomic_no_partial_artifact(tmp_path):
    """A failed write must leave NO file at the target path (temp+rename
    publish) — serve.py's already-predicted check treats existence as
    completeness."""
    import gzip
    from unittest import mock

    import numpy as np

    from fetal_mri_segmentation_tpu.utils import nifti

    target = tmp_path / "out.nii.gz"
    real_open = gzip.open

    def exploding_open(path, mode="rb", **kw):
        f = real_open(path, mode, **kw)
        if "w" in mode:
            orig = f.write

            def bomb(data):
                orig(data[: len(data) // 2])
                raise OSError(28, "No space left on device")
            f.write = bomb
        return f

    with mock.patch.object(nifti.gzip, "open", exploding_open):
        try:
            nifti.save_nifti(np.ones((8, 8, 8), np.float32), str(target))
        except OSError:
            pass
        else:
            raise AssertionError("expected the injected OSError")
    assert not target.exists()
    assert list(tmp_path.iterdir()) == []  # no stray temp files either
    # and a normal write still round-trips
    nifti.save_nifti(np.ones((8, 8, 8), np.float32), str(target))
    assert np.allclose(nifti.load_nifti(str(target)).get_fdata(), 1.0)
