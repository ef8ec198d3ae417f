#!/usr/bin/env python
"""Convert a reference-era PyTables/blosc dataset into the native layout.

The reference's dataset builder writes PyTables EArrays compressed with the
HDF5 blosc filter (reference: unet3d/data.py::create_data_file —
tables.Filters(complevel=5, complib='blosc')). This framework can read such
files directly (data/blosc_compat.py decompresses chunks via the system
libblosc), but every epoch pays the chunk-reassembly cost; this tool
rewrites the file ONCE into the native layout (gzip-1, one chunk per
volume — single-chunk sequential reads for the host→HBM prefetch path).

Usage:
    python tools/convert_reference_h5.py reference_data.h5 native_data.h5

The array contract (data/truth/affine [+ subject_ids]) is identical, so
training/validation split pickles and case indices carry over unchanged.
"""

from __future__ import annotations

import argparse
import os
import sys

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fetal_mri_segmentation_tpu.data.build import (create_data_file,
                                                   open_data_file)


def convert(src_path: str, dst_path: str, verbose: bool = True) -> str:
    src = open_data_file(src_path)
    try:
        data, truth = src.root.data, src.root.truth
        n, n_channels = data.shape[0], data.shape[1]
        image_shape = tuple(data.shape[2:])
        if tuple(truth.shape) != (n, 1) + image_shape:
            raise ValueError(
                f"{src_path}: truth shape {truth.shape} does not match "
                f"data shape {data.shape} — not a reference dataset file")
        dst = create_data_file(dst_path, n_channels, n, image_shape,
                               truth_dtype=truth.dtype)
        try:
            for i in range(n):  # stream one case at a time (bounded memory)
                dst["data"][i] = np.asarray(data[i], np.float32)
                dst["truth"][i] = truth[i]
                dst["affine"][i] = src.root.affine[i]
                if verbose:
                    print(f"\r[{i + 1}/{n}] cases converted", end="",
                          flush=True)
            if "subject_ids" in src._h5:
                ids = [s.decode() if isinstance(s, bytes) else str(s)
                       for s in src.root.subject_ids[:]]
                dst.create_dataset("subject_ids",
                                   data=np.asarray(ids, dtype=object),
                                   dtype=h5py.string_dtype())
            for k, v in src._h5.attrs.items():
                dst.attrs[k] = v
        finally:
            dst.close()
    finally:
        src.close()
    if verbose:
        print(f"\n{src_path} -> {dst_path} ({n} cases, "
              f"{os.path.getsize(dst_path) / 1e6:.1f} MB)")
    return dst_path


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("source", help="reference PyTables/blosc dataset file")
    ap.add_argument("dest", help="output file (native h5py/gzip layout)")
    ap.add_argument("--force", action="store_true",
                    help="overwrite an existing dest file")
    args = ap.parse_args()
    if os.path.exists(args.dest) and not args.force:
        sys.exit(f"{args.dest} exists — pass --force to overwrite")
    convert(args.source, args.dest)
