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


# ---------------------------------------------------------------------------
# Real-world robustness: big-endian NIfTI-1, NIfTI-2 (both endiannesses),
# and clear rejection of non-scalar datatypes. nibabel (the reference's
# reader) accepts all of these; scanner exports are routinely big-endian.
# ---------------------------------------------------------------------------

import gzip as _gzip
import struct as _struct

_N1_CODES = {np.dtype(np.uint8): (2, 8), np.dtype(np.int16): (4, 16),
             np.dtype(np.float32): (16, 32), np.dtype(np.float64): (64, 64)}


def _synth_nifti1(data, affine, bo="<", scl=(1.0, 0.0)):
    """Hand-built NIfTI-1 byte stream in the requested byte order."""
    code, bits = _N1_CODES[data.dtype]
    hdr = bytearray(348)
    _struct.pack_into(bo + "i", hdr, 0, 348)
    dim = [data.ndim] + list(data.shape) + [1] * (7 - data.ndim)
    _struct.pack_into(bo + "8h", hdr, 40, *dim)
    _struct.pack_into(bo + "h", hdr, 70, code)
    _struct.pack_into(bo + "h", hdr, 72, bits)
    _struct.pack_into(bo + "8f", hdr, 76, 1.0, 1, 1, 1, 1, 1, 1, 1)
    _struct.pack_into(bo + "f", hdr, 108, 352.0)
    _struct.pack_into(bo + "2f", hdr, 112, *scl)
    _struct.pack_into(bo + "2h", hdr, 252, 0, 1)  # qform=0, sform=1
    for i in range(3):
        _struct.pack_into(bo + "4f", hdr, 280 + 16 * i,
                          *[float(v) for v in affine[i]])
    hdr[344:348] = b"n+1\x00"
    body = np.asfortranarray(
        data.astype(data.dtype.newbyteorder(bo))).tobytes(order="F")
    return bytes(hdr) + b"\x00" * 4 + body


def _synth_nifti2(data, affine, bo="<"):
    """Hand-built NIfTI-2 byte stream (540-byte header, int64 dims,
    double reals, srows at 400/432/464)."""
    code, bits = _N1_CODES[data.dtype]
    hdr = bytearray(540)
    _struct.pack_into(bo + "i", hdr, 0, 540)
    hdr[4:12] = b"n+2\x00\r\n\x1a\n"
    _struct.pack_into(bo + "h", hdr, 12, code)
    _struct.pack_into(bo + "h", hdr, 14, bits)
    dim = [data.ndim] + list(data.shape) + [1] * (7 - data.ndim)
    _struct.pack_into(bo + "8q", hdr, 16, *dim)
    _struct.pack_into(bo + "8d", hdr, 104, 1.0, 1, 1, 1, 1, 1, 1, 1)
    _struct.pack_into(bo + "q", hdr, 168, 544)       # vox_offset
    _struct.pack_into(bo + "2d", hdr, 176, 1.0, 0.0)  # scl slope/inter
    _struct.pack_into(bo + "i", hdr, 344, 0)          # qform_code
    _struct.pack_into(bo + "i", hdr, 348, 1)          # sform_code
    for i, off in enumerate((400, 432, 464)):
        _struct.pack_into(bo + "4d", hdr, off,
                          *[float(v) for v in affine[i]])
    body = np.asfortranarray(
        data.astype(data.dtype.newbyteorder(bo))).tobytes(order="F")
    return bytes(hdr) + b"\x00" * 4 + body


def _affine():
    return np.array([[0.8, 0, 0, -10], [0, 0.8, 0, -12],
                     [0, 0, 2.0, -5], [0, 0, 0, 1]])


def test_big_endian_nifti1(tmp_path, rng):
    data = rng.random((5, 6, 7)).astype(np.float32)
    p = tmp_path / "be.nii.gz"
    p.write_bytes(_gzip.compress(_synth_nifti1(data, _affine(), bo=">")))
    img = load_nifti(str(p))
    assert np.allclose(img.get_fdata(), data, atol=1e-7)
    assert np.allclose(img.affine, _affine(), atol=1e-5)
    # output must be native-order (downstream jnp/h5py assume it)
    assert img.dataobj.dtype.byteorder in ("=", "<", "|")


def test_big_endian_scl_slope(tmp_path):
    data = np.arange(2 * 3 * 4, dtype=np.int16).reshape(2, 3, 4)
    p = tmp_path / "scl_be.nii"
    p.write_bytes(_synth_nifti1(data, np.eye(4), bo=">", scl=(2.0, -1.0)))
    img = load_nifti(str(p))
    assert np.allclose(img.get_fdata(), data * 2.0 - 1.0)


def test_nifti2_little_endian(tmp_path, rng):
    data = rng.random((4, 5, 6)).astype(np.float32)
    p = tmp_path / "v2.nii"
    p.write_bytes(_synth_nifti2(data, _affine(), bo="<"))
    img = load_nifti(str(p))
    assert np.allclose(img.get_fdata(), data, atol=1e-7)
    assert np.allclose(img.affine, _affine(), atol=1e-12)


def test_nifti2_big_endian_uint8(tmp_path):
    data = (np.arange(3 * 4 * 5) % 5).astype(np.uint8).reshape(3, 4, 5)
    p = tmp_path / "v2be.nii.gz"
    p.write_bytes(_gzip.compress(_synth_nifti2(data, np.eye(4), bo=">")))
    img = load_nifti(str(p))
    assert img.dataobj.dtype == np.uint8
    assert np.array_equal(img.dataobj, data)


def test_rgb_datatype_rejected_with_clear_message(tmp_path):
    data = np.zeros((2, 2, 2), np.uint8)
    raw = bytearray(_synth_nifti1(data, np.eye(4)))
    _struct.pack_into("<h", raw, 70, 128)  # RGB24
    p = tmp_path / "rgb.nii"
    p.write_bytes(bytes(raw))
    try:
        load_nifti(str(p))
    except ValueError as e:
        assert "RGB24" in str(e)
    else:
        raise AssertionError("expected ValueError for RGB datatype")


def test_not_a_nifti_rejected(tmp_path):
    p = tmp_path / "junk.nii"
    p.write_bytes(b"\x00" * 400)
    try:
        load_nifti(str(p))
    except ValueError as e:
        assert "348 or 540" in str(e)
    else:
        raise AssertionError("expected ValueError for non-NIfTI input")


def test_truncated_nifti_rejected(tmp_path):
    """Truncated files keep the malformed-input contract (ValueError, not
    struct.error): valid magic but a cut-off header, and a <4-byte file."""
    import struct

    import pytest

    p = tmp_path / "trunc.nii"
    p.write_bytes(struct.pack("<i", 348) + b"\x00" * 96)  # 100 bytes
    with pytest.raises(ValueError, match="truncated"):
        load_nifti(str(p))
    p2 = tmp_path / "tiny.nii"
    p2.write_bytes(b"\x01\x02")
    with pytest.raises(ValueError, match="not a NIfTI"):
        load_nifti(str(p2))


def test_4d_trailing_singleton_ingest(tmp_path, rng):
    """Scanner exports routinely write 3-D volumes as 4-D NIfTI with
    dim[4]=1 — the ingest paths must squeeze them (the nibabel-backed
    reference loads such files as 4-D arrays too)."""
    from fetal_mri_segmentation_tpu.utils.geometry import (
        process_case_images, read_image_files)

    vol = np.zeros((24, 24, 16), np.float32)
    vol[6:18, 6:18, 4:12] = 100.0 + rng.random((12, 12, 8)).astype(np.float32)
    p = str(tmp_path / "vol4d.nii.gz")
    save_nifti(vol[..., None], p)          # (24, 24, 16, 1) on disk
    assert load_nifti(p).shape == (24, 24, 16, 1)

    # path-based ingest (dataset build / predict --input)
    imgs = read_image_files([p], image_shape=(12, 12, 12), label_indices=[])
    assert imgs[0].shape == (12, 12, 12)
    # loaded-image ingest (serving hot path), crop + resample
    out = process_case_images([load_nifti(p)], image_shape=(12, 12, 12),
                              crop=True, label_indices=[])
    assert out[0].shape == (12, 12, 12)
    # no-resample flow still squeezes (device-preprocess ingest reads the
    # arrays straight out of the cropped images)
    out = process_case_images([load_nifti(p)], image_shape=None, crop=True,
                              label_indices=[])
    assert len(out[0].shape) == 3


def test_4d_multiframe_rejected_with_clear_message(tmp_path, rng):
    from fetal_mri_segmentation_tpu.utils.geometry import read_image_files

    data = rng.random((8, 8, 8, 3)).astype(np.float32)   # true multi-frame
    p = str(tmp_path / "frames.nii.gz")
    save_nifti(data, p)
    try:
        read_image_files([p], image_shape=(8, 8, 8), label_indices=[])
        raise AssertionError("expected ValueError for multi-frame NIfTI")
    except ValueError as e:
        assert "multi-frame" in str(e) and "separate files" in str(e)


def test_nan_scl_slope_means_no_scaling(tmp_path):
    """nibabel semantics: non-finite scl_slope/scl_inter mean NO scaling
    (scanner exports routinely carry scl_slope=NaN); applying them would
    silently turn the whole volume into NaN."""
    data = np.arange(2 * 3 * 4, dtype=np.int16).reshape(2, 3, 4)
    p = tmp_path / "nan_scl.nii"
    p.write_bytes(_synth_nifti1(data, np.eye(4), scl=(np.nan, np.nan)))
    img = load_nifti(str(p))
    assert np.isfinite(img.get_fdata()).all()
    assert np.array_equal(img.get_fdata(), data)
    # finite slope with NaN intercept: slope applies, intercept ignored
    p2 = tmp_path / "nan_inter.nii"
    p2.write_bytes(_synth_nifti1(data, np.eye(4), scl=(2.0, np.nan)))
    assert np.array_equal(load_nifti(str(p2)).get_fdata(), data * 2.0)


def test_scl_slope_zero_means_no_scaling(tmp_path):
    """nibabel semantics: scl_slope == 0 means NO scaling information — a
    garbage scl_inter (e.g. -1024 from a scanner export) must be ignored,
    not applied as a shift (it would corrupt every label value)."""
    import struct

    p = str(tmp_path / "slope0.nii")
    labels = np.arange(8, dtype=np.uint8).reshape(2, 2, 2)
    save_nifti(labels, p)
    raw = bytearray(open(p, "rb").read())
    struct.pack_into("<2f", raw, 112, 0.0, -1024.0)  # slope=0, inter=-1024
    open(p, "wb").write(bytes(raw))
    img = load_nifti(p)
    np.testing.assert_array_equal(
        np.asarray(img.get_fdata(dtype=np.float32)), labels)


def test_save_nifti_explicit_affine_overrides_image(tmp_path):
    """save_nifti(image, path, affine=new) must write the EXPLICIT affine —
    silently keeping the image's stale affine would mis-place the volume
    in world space for any caller re-stamping a resampled image."""
    p = str(tmp_path / "restamped.nii.gz")
    data = np.ones((3, 3, 3), np.float32)
    stale = np.diag([1.0, 1.0, 1.0, 1.0])
    img = NiftiImage(data, stale)
    new = np.diag([2.0, 2.0, 2.0, 1.0])
    new[:3, 3] = (5.0, 6.0, 7.0)
    save_nifti(img, p, affine=new)
    np.testing.assert_allclose(load_nifti(p).affine, new)
    # and without an explicit affine the image's own is kept
    save_nifti(img, p)
    np.testing.assert_allclose(load_nifti(p).affine, stale)


def test_builder_rejects_unknown_normalize_mode(tmp_path):
    import pytest

    from fetal_mri_segmentation_tpu.data import write_data_to_file

    with pytest.raises(ValueError, match="normalize"):
        write_data_to_file([["a.nii", "b.nii"]], str(tmp_path / "x.h5"),
                           image_shape=(8, 8, 8), normalize="per-volume")


def test_corrupt_headers_raise_clear_valueerror(tmp_path):
    """Garbage headers must fail with a clear ValueError, never numpy's
    cryptic buffer message, a struct.error, or a silent wrong read —
    serving-path error classification keys on ValueError."""
    import gzip as _gzip

    good = _synth_nifti1(np.zeros((4, 4, 4), np.float32), np.eye(4))

    import pytest

    def mutate(off, fmt, *vals):
        raw = bytearray(good)
        _struct.pack_into("<" + fmt, raw, off, *vals)
        return bytes(raw)

    cases = {
        "ndim_out_of_range": mutate(40, "h", 9),
        "ndim_zero": mutate(40, "h", 0),
        "negative_dim": mutate(40, "4h", 3, -4, 4, 4),
        "huge_dims_vs_bytes": mutate(40, "4h", 3, 30000, 30000, 30000),
        "vox_offset_into_header": mutate(108, "f", 8.0),
    }
    for name, raw in cases.items():
        p = str(tmp_path / f"{name}.nii.gz")
        with open(p, "wb") as f:
            f.write(_gzip.compress(raw))
        with pytest.raises(ValueError, match="NIfTI"):
            load_nifti(p)
    # and the untouched stream still loads
    p = str(tmp_path / "good.nii")
    with open(p, "wb") as f:
        f.write(good)
    assert load_nifti(p).shape == (4, 4, 4)
