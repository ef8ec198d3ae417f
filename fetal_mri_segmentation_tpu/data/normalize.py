"""Z-score normalization of stored volumes.

Reference: unet3d/normalize.py::normalize_data, normalize_data_storage.
Upstream semantics ("global"): compute per-volume per-channel mean/std,
average them over the dataset, then apply ONE global (mean, std) to every
volume. The fetal adaptation z-scores each volume independently
("per_volume") — both are implemented; `Config.normalization` selects
(default per_volume, per SURVEY.md section 2 normalization row).
"""

from __future__ import annotations

import numpy as np


def normalize_data(data: np.ndarray, mean: np.ndarray, std: np.ndarray
                   ) -> np.ndarray:
    """(data - mean) / std with per-channel broadcast over (C, D, H, W).

    Reference: normalize.py::normalize_data.
    """
    mean = np.asarray(mean, dtype=np.float32).reshape(-1, 1, 1, 1)
    std = np.asarray(std, dtype=np.float32).reshape(-1, 1, 1, 1)
    std = np.where(std == 0, 1.0, std)
    return (data - mean) / std


def normalize_data_storage(data_storage):
    """Global z-score: average the per-volume moments, apply one (mean, std).

    Reference: normalize.py::normalize_data_storage (upstream lineage).
    Returns the per-channel ``(mean, std)`` so the dataset builder can
    persist them (new cases at serving time must be normalized with the
    TRAINING distribution's moments, not their own).
    """
    means, stds = [], []
    n = data_storage.shape[0]
    for i in range(n):
        v = np.asarray(data_storage[i], dtype=np.float32)
        means.append(v.mean(axis=(1, 2, 3)))
        stds.append(v.std(axis=(1, 2, 3)))
    mean = np.mean(means, axis=0)
    std = np.mean(stds, axis=0)
    for i in range(n):
        data_storage[i] = normalize_data(
            np.asarray(data_storage[i], dtype=np.float32), mean, std)
    return mean, std


def normalize_data_storage_per_volume(data_storage) -> None:
    """Per-volume z-score (fetal-fork semantics)."""
    n = data_storage.shape[0]
    for i in range(n):
        v = np.asarray(data_storage[i], dtype=np.float32)
        data_storage[i] = normalize_data(
            v, v.mean(axis=(1, 2, 3)), v.std(axis=(1, 2, 3)))


def window_intensities(data: np.ndarray, lower_percentile: float = 1.0,
                       upper_percentile: float = 99.0) -> np.ndarray:
    """Percentile windowing: clip each channel to its [p_lo, p_hi] range.

    Reference: fetal-fork percentile/window normalization variant
    (SURVEY.md section 2 normalization row, tagged [V] — MRI intensity tails
    are clipped before z-scoring so bias-field outliers don't dominate the
    moments).
    """
    out = np.empty_like(data, dtype=np.float32)
    for c in range(data.shape[0]):
        lo, hi = np.percentile(data[c], [lower_percentile, upper_percentile])
        out[c] = np.clip(data[c], lo, hi)
    return out


def normalize_case(data: np.ndarray, mode: str,
                   mean=None, std=None,
                   lower_percentile: float = 1.0,
                   upper_percentile: float = 99.0) -> np.ndarray:
    """Normalize ONE in-memory case ``(C, D, H, W)`` exactly like the
    dataset builder normalized the stored volumes (same `mode` semantics as
    ``write_data_to_file(normalize=...)``) — the serving-time twin of the
    ingest-time pass, for predicting cases that were never ingested.

    ``mode="global"`` requires the training dataset's persisted per-channel
    ``(mean, std)`` (HDF5 attrs ``norm_mean``/``norm_std``; see
    data/build.py) — a new case must be shifted into the TRAINING
    distribution, not z-scored against itself.
    """
    data = np.asarray(data, dtype=np.float32)
    if mode is None or mode == "none":
        return data
    if mode == "global":
        if mean is None or std is None:
            raise ValueError(
                "normalize_case(mode='global') needs the training "
                "dataset's (mean, std) — rebuild the HDF5 with this "
                "version (attrs norm_mean/norm_std) or pass them explicitly")
        return normalize_data(data, mean, std)
    if mode == "windowed":
        data = window_intensities(data, lower_percentile, upper_percentile)
    elif mode != "per_volume":
        raise ValueError(f"unknown normalization mode: {mode!r}")
    return normalize_data(data, data.mean(axis=(1, 2, 3)),
                          data.std(axis=(1, 2, 3)))


def normalize_data_storage_windowed(data_storage,
                                    lower_percentile: float = 1.0,
                                    upper_percentile: float = 99.0) -> None:
    """Percentile-window then per-volume z-score ("windowed" mode)."""
    n = data_storage.shape[0]
    for i in range(n):
        v = window_intensities(np.asarray(data_storage[i], dtype=np.float32),
                               lower_percentile, upper_percentile)
        data_storage[i] = normalize_data(
            v, v.mean(axis=(1, 2, 3)), v.std(axis=(1, 2, 3)))
