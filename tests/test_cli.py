"""train.py CLI helpers."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from train import fetch_training_data_files
from tests.synthetic import write_synthetic_dataset


def test_fetch_training_data_files(tmp_path):
    write_synthetic_dataset(str(tmp_path), n_cases=3, shape=(8, 8, 8),
                            modalities=("volume",))
    files, ids = fetch_training_data_files(str(tmp_path), ("volume",))
    assert len(files) == 3 and ids == ["case_0", "case_1", "case_2"]
    assert all(len(f) == 2 for f in files)  # [volume, truth]
    assert files[0][-1].endswith("truth.nii.gz")


def test_fetch_skips_incomplete_cases(tmp_path):
    write_synthetic_dataset(str(tmp_path), n_cases=2, shape=(8, 8, 8))
    os.remove(os.path.join(str(tmp_path), "case_1", "truth.nii.gz"))
    files, ids = fetch_training_data_files(str(tmp_path), ("volume",))
    assert ids == ["case_0"]
