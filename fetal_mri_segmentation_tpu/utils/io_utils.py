"""Pickle helpers — the split-index files are part of the public surface.

Reference: unet3d/utils/utils.py::pickle_dump / pickle_load (used for
training_ids.pkl / validation_ids.pkl).
"""

from __future__ import annotations

import pickle


def pickle_dump(item, out_file: str) -> None:
    with open(out_file, "wb") as f:
        pickle.dump(item, f)


def pickle_load(in_file: str):
    with open(in_file, "rb") as f:
        return pickle.load(f)
