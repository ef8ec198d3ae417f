"""Reference-dataset interop: PyTables/blosc HDF5 files (SURVEY.md §2 row 1
"blosc complevel-5" on-disk format) read without PyTables or the blosc
HDF5 filter plugin, via raw-chunk decompression through libblosc.

The test files are synthesized with h5py's allow_unknown_filter +
write_direct_chunk using frames from the SAME system libblosc the reader
uses — byte-compatible with what PyTables' blosc filter writes (the HDF5
chunk payload is a plain blosc frame either way). PyTables itself is not
in this image (skip-with-reason would apply only if libblosc were also
missing)."""

import os
import sys

import h5py
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fetal_mri_segmentation_tpu.data import open_data_file
from fetal_mri_segmentation_tpu.data.blosc_compat import (
    BLOSC_FILTER_ID, BloscDataset, blosc_available, blosc_compress,
    blosc_decompress, is_unreadable_blosc)

pytestmark = pytest.mark.skipif(
    not blosc_available(),
    reason="system libblosc not available — blosc interop is exercised "
           "on hosts that have it")


def _write_blosc_dataset(h5, name, arr, chunks, clevel=5):
    """A blosc-filtered dataset the way PyTables lays it out: HDF5 filter
    32001 on the chunk pipeline, each chunk payload one blosc frame."""
    dset = h5.create_dataset(
        name, shape=arr.shape, dtype=arr.dtype, chunks=chunks,
        compression=BLOSC_FILTER_ID,
        # PyTables cd_values: (filter ver, blosc ver, typesize, chunk bytes,
        # complevel, shuffle, compressor code)
        compression_opts=(2, 2, arr.dtype.itemsize,
                          int(np.prod(chunks)) * arr.dtype.itemsize,
                          clevel, 1, 0),
        allow_unknown_filter=True)
    for off in np.ndindex(*[int(np.ceil(s / c))
                            for s, c in zip(arr.shape, chunks)]):
        corner = tuple(o * c for o, c in zip(off, chunks))
        block = np.zeros(chunks, arr.dtype)  # edge chunks zero-padded,
        sl = tuple(slice(c0, min(c0 + c, s))  # stored FULL-SIZE (HDF5 rule)
                   for c0, c, s in zip(corner, chunks, arr.shape))
        valid = tuple(slice(0, s.stop - s.start) for s in sl)
        block[valid] = arr[sl]
        dset.id.write_direct_chunk(corner, blosc_compress(block, clevel))
    return dset


def test_blosc_frame_roundtrip():
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(4, 8, 8)).astype(np.float32)
    frame = blosc_compress(arr)
    assert len(frame) >= 16
    out = np.frombuffer(blosc_decompress(frame), np.float32).reshape(arr.shape)
    np.testing.assert_array_equal(out, arr)


def test_blosc_dataset_reads_like_h5py(tmp_path):
    rng = np.random.default_rng(1)
    # deliberately awkward chunking: partial-volume chunks + edge chunks
    arr = rng.normal(size=(5, 2, 12, 10, 7)).astype(np.float32)
    p = str(tmp_path / "ref.h5")
    with h5py.File(p, "w") as h5:
        _write_blosc_dataset(h5, "data", arr, chunks=(2, 1, 5, 10, 7))
    with h5py.File(p, "r") as h5:
        assert is_unreadable_blosc(h5["data"])
        with pytest.raises(OSError):
            h5["data"][0]  # plain h5py cannot read it
        view = BloscDataset(h5["data"])
        assert view.shape == arr.shape and view.dtype == arr.dtype
        np.testing.assert_array_equal(view[...], arr)
        np.testing.assert_array_equal(view[3], arr[3])
        np.testing.assert_array_equal(view[-1], arr[-1])
        np.testing.assert_array_equal(view[2, 1], arr[2, 1])
        np.testing.assert_array_equal(view[1:4], arr[1:4])
        assert len(view) == 5


def _write_reference_style_file(path, n=3, shape=(12, 12, 12), seed=0):
    rng = np.random.default_rng(seed)
    data = rng.normal(size=(n, 1) + shape).astype(np.float32)
    truth = (rng.random((n, 1) + shape) > 0.7).astype(np.uint8)
    affine = np.stack([np.diag([1.0, 1.0, 2.0, 1.0])] * n)
    with h5py.File(path, "w") as h5:
        _write_blosc_dataset(h5, "data", data, chunks=(1, 1, 6, 12, 12))
        _write_blosc_dataset(h5, "truth", truth, chunks=(1, 1, 12, 12, 12))
        h5.create_dataset("affine", data=affine)
        h5.create_dataset("subject_ids",
                          data=np.asarray([f"sub_{i}" for i in range(n)],
                                          dtype=object),
                          dtype=h5py.string_dtype())
        h5.attrs["normalization"] = "per_volume"
    return data, truth, affine


def test_open_data_file_reads_blosc_transparently(tmp_path):
    p = str(tmp_path / "reference_data.h5")
    data, truth, affine = _write_reference_style_file(p)
    f = open_data_file(p)
    try:
        np.testing.assert_array_equal(f.root.data[1], data[1])
        np.testing.assert_array_equal(f.root.truth[2], truth[2])
        np.testing.assert_array_equal(f.root.affine[0], affine[0])
        assert f.root.data.shape == data.shape
        assert len(f) == 3
    finally:
        f.close()


def test_generator_trains_from_blosc_file(tmp_path):
    """The training generator runs straight off a reference blosc file —
    a migrating user's fetal_data.h5 works without conversion."""
    from fetal_mri_segmentation_tpu.pipeline import (
        get_training_and_validation_generators)

    p = str(tmp_path / "reference_data.h5")
    _write_reference_style_file(p, n=4)
    f = open_data_file(p)
    try:
        tg, n_t, vg, n_v = get_training_and_validation_generators(
            f, batch_size=2, n_labels=1,
            training_keys_file=str(tmp_path / "t.pkl"),
            validation_keys_file=str(tmp_path / "v.pkl"),
            data_split=0.75, overwrite=True, patch_shape=(8, 8, 8),
            validation_patch_overlap=0, skip_blank=False, seed=0)
        x, y = next(tg)  # reference contract: channels-first batches
        assert x.shape[1:] == (1, 8, 8, 8) and y.shape[1:] == (1, 8, 8, 8)
    finally:
        f.close()


def test_convert_reference_h5(tmp_path):
    from tools.convert_reference_h5 import convert

    src = str(tmp_path / "reference_data.h5")
    dst = str(tmp_path / "native.h5")
    data, truth, affine = _write_reference_style_file(src)
    convert(src, dst, verbose=False)
    with h5py.File(dst, "r") as h5:
        np.testing.assert_array_equal(h5["data"][:], data)
        np.testing.assert_array_equal(h5["truth"][:], truth)
        np.testing.assert_array_equal(h5["affine"][:], affine)
        assert [s.decode() for s in h5["subject_ids"][:]] == \
            ["sub_0", "sub_1", "sub_2"]
        assert h5.attrs["normalization"] == "per_volume"
        assert h5["data"].compression == "gzip"  # native layout now


def test_filter_skipped_raw_chunk(tmp_path):
    """The c-blosc HDF5 filter stores incompressible chunks RAW with the
    chunk's filter-mask bit set (blosc_compress destsize==nbytes -> 0).
    The reader must honor the mask instead of decompressing raw bytes."""
    rng = np.random.default_rng(7)
    arr = rng.normal(size=(4, 6, 6)).astype(np.float32)
    chunks = (2, 6, 6)
    path = str(tmp_path / "mixed.h5")
    with h5py.File(path, "w") as f:
        dset = f.create_dataset(
            "data", shape=arr.shape, dtype=arr.dtype, chunks=chunks,
            compression=BLOSC_FILTER_ID,
            compression_opts=(2, 2, arr.dtype.itemsize,
                              int(np.prod(chunks)) * arr.dtype.itemsize,
                              5, 1, 0),
            allow_unknown_filter=True)
        # chunk 0 compressed normally, chunk 1 stored raw (mask bit 0 set)
        dset.id.write_direct_chunk((0, 0, 0), blosc_compress(arr[0:2]))
        dset.id.write_direct_chunk((2, 0, 0), arr[2:4].tobytes(),
                                   filter_mask=1)
    with h5py.File(path, "r") as f:
        view = BloscDataset(f["data"])
        np.testing.assert_array_equal(view[0], arr[0])   # compressed chunk
        np.testing.assert_array_equal(view[3], arr[3])   # raw chunk
        np.testing.assert_array_equal(view[...], arr)    # full read


def test_multi_filter_blosc_pipeline_rejected(tmp_path):
    """blosc stacked with another HDF5 filter (e.g. shuffle) must be
    rejected loudly — decoding only the blosc stage would return silently
    scrambled voxels."""
    p = str(tmp_path / "stacked.h5")
    arr = np.arange(8, dtype=np.float32).reshape(2, 4)
    with h5py.File(p, "w") as h5:
        dset = h5.create_dataset(
            "data", shape=arr.shape, dtype=arr.dtype, chunks=(2, 4),
            shuffle=True,  # HDF5 shuffle filter AHEAD of blosc
            compression=BLOSC_FILTER_ID,
            compression_opts=(2, 2, 4, 32, 5, 1, 0),
            allow_unknown_filter=True)
        dset.id.write_direct_chunk((0, 0), blosc_compress(arr))
    with h5py.File(p, "r") as h5:
        with pytest.raises(ValueError, match="pipeline"):
            is_unreadable_blosc(h5["data"])


def test_corrupt_blosc_chunk_raises_not_zeros(tmp_path):
    """A chunk that EXISTS but cannot be decoded (truncated/corrupt frame)
    must raise, not silently read back as fill-value zeros."""
    rng = np.random.default_rng(2)
    arr = rng.normal(size=(2, 4, 4)).astype(np.float32)
    p = str(tmp_path / "corrupt.h5")
    with h5py.File(p, "w") as h5:
        _write_blosc_dataset(h5, "data", arr, chunks=(1, 4, 4))
    with h5py.File(p, "w" if False else "r+") as h5:
        # overwrite chunk 0 with a garbage frame (allocated but undecodable)
        h5["data"].id.write_direct_chunk((0, 0, 0), b"\x13" * 24)
    with h5py.File(p, "r") as h5:
        view = BloscDataset(h5["data"])
        np.testing.assert_array_equal(view[1], arr[1])  # intact chunk fine
        with pytest.raises((ValueError, OSError)):
            view[0]


def test_unallocated_chunk_reads_as_fill_value(tmp_path):
    """A chunk that was never written is the HDF5 fill value (zeros) — the
    legitimate case the corrupt-chunk error path must not break."""
    arr = np.ones((2, 4, 4), np.float32)
    p = str(tmp_path / "sparse.h5")
    with h5py.File(p, "w") as h5:
        dset = h5.create_dataset(
            "data", shape=arr.shape, dtype=arr.dtype, chunks=(1, 4, 4),
            compression=BLOSC_FILTER_ID,
            compression_opts=(2, 2, 4, 64, 5, 1, 0),
            allow_unknown_filter=True)
        # write ONLY row 1; row 0's chunk is never allocated
        dset.id.write_direct_chunk((1, 0, 0), blosc_compress(arr[1:2]))
    with h5py.File(p, "r") as h5:
        view = BloscDataset(h5["data"])
        np.testing.assert_array_equal(view[1], arr[1])
        np.testing.assert_array_equal(view[0], np.zeros((4, 4), np.float32))


def test_unallocated_chunk_without_probe_api(tmp_path, monkeypatch):
    """h5py < 3.0 has no ``get_chunk_info_by_coord`` (the allocation probe
    returns None = unknown). A never-written chunk that surfaces as h5py's
    'chunk storage is not allocated' RuntimeError must still read as the
    fill value there; a GENERIC read error must still raise."""
    arr = np.ones((2, 4, 4), np.float32)
    p = str(tmp_path / "sparse_old_h5py.h5")
    with h5py.File(p, "w") as h5:
        dset = h5.create_dataset(
            "data", shape=arr.shape, dtype=arr.dtype, chunks=(1, 4, 4),
            compression=BLOSC_FILTER_ID,
            compression_opts=(2, 2, 4, 64, 5, 1, 0),
            allow_unknown_filter=True)
        dset.id.write_direct_chunk((1, 0, 0), blosc_compress(arr[1:2]))
    with h5py.File(p, "r") as h5:
        view = BloscDataset(h5["data"])
        monkeypatch.setattr(BloscDataset, "_chunk_allocated",
                            lambda self, off: None)
        real = BloscDataset._chunk_array

        def not_allocated(self, off):
            if off == (0, 0, 0):
                raise RuntimeError("chunk storage is not allocated")
            return real(self, off)

        monkeypatch.setattr(BloscDataset, "_chunk_array", not_allocated)
        np.testing.assert_array_equal(view[0], np.zeros((4, 4), np.float32))
        np.testing.assert_array_equal(view[1], arr[1])

        def generic_error(self, off):
            raise OSError("read failed (disk error)")

        monkeypatch.setattr(BloscDataset, "_chunk_array", generic_error)
        with pytest.raises(ValueError, match="truncated or corrupt"):
            view[1]
