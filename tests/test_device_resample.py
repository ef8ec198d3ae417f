"""Device-side ingest resample (ops/resample.py) vs the scipy host oracle.

The device path must reproduce utils/geometry.py::resample_to_shape
(scipy.ndimage.zoom, grid_mode=True, mode="nearest") and
data/normalize.py::normalize_case at floating-point-level parity — it is
the serving hot path's replacement for both.
"""

import os
import sys

import numpy as np
import pytest
from scipy import ndimage

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from fetal_mri_segmentation_tpu.ops.resample import (
    BUCKET_STEP, DevicePreprocessor, bucket_shape, resample_3d)


def _scipy_zoom(a, out_shape, order):
    z = np.asarray(out_shape) / np.asarray(a.shape, dtype=np.float64)
    return ndimage.zoom(a, z, order=order, mode="nearest", grid_mode=True,
                        prefilter=False)


def _device_zoom(a, out_shape, order):
    true = np.asarray(a.shape, np.int32)
    bucket = bucket_shape(a.shape)
    padded = np.zeros(bucket, np.float32)
    padded[: true[0], : true[1], : true[2]] = a
    out = resample_3d(jnp.asarray(padded)[None], jnp.asarray(true),
                      out_shape, order=order)
    return np.asarray(out[0])


SHAPES = [
    ((37, 52, 41), (32, 32, 32)),    # downscale, aniso
    ((20, 20, 20), (64, 48, 32)),    # upscale, aniso out
    ((64, 64, 64), (32, 32, 32)),    # exact 2x down (half-point coords)
    ((16, 16, 16), (16, 16, 16)),    # identity
    ((100, 80, 60), (64, 64, 64)),
]


@pytest.mark.parametrize("in_shape,out_shape", SHAPES)
def test_linear_matches_scipy(in_shape, out_shape):
    rng = np.random.default_rng(hash(in_shape) % 2**32)
    a = rng.normal(size=in_shape).astype(np.float32) * 100
    ref = _scipy_zoom(a, out_shape, 1)
    got = _device_zoom(a, out_shape, 1)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize("in_shape,out_shape", SHAPES)
def test_nearest_matches_scipy(in_shape, out_shape):
    rng = np.random.default_rng(hash(out_shape) % 2**32)
    a = rng.integers(0, 4, size=in_shape).astype(np.float32)
    ref = _scipy_zoom(a, out_shape, 0)
    got = _device_zoom(a, out_shape, 0)
    np.testing.assert_array_equal(got, ref)


def test_padding_is_invisible():
    """Extra pad beyond the bucket minimum must not change the result."""
    rng = np.random.default_rng(0)
    a = rng.normal(size=(30, 30, 30)).astype(np.float32)
    true = jnp.asarray(a.shape, jnp.int32)
    small = np.zeros((32, 32, 32), np.float32)
    small[:30, :30, :30] = a
    big = np.zeros((64, 48, 32), np.float32)
    big[:30, :30, :30] = a
    r1 = resample_3d(jnp.asarray(small)[None], true, (24, 24, 24))
    r2 = resample_3d(jnp.asarray(big)[None], true, (24, 24, 24))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_bucket_shape():
    assert bucket_shape((1, 16, 17)) == (BUCKET_STEP, 16, 32)


@pytest.mark.parametrize("mode", ["per_volume", "global", "windowed", "none"])
def test_preprocessor_matches_host_normalize(mode):
    """Full device preprocess (zoom + normalize) vs host zoom + normalize."""
    from fetal_mri_segmentation_tpu.data.normalize import normalize_case

    rng = np.random.default_rng(7)
    vols = [rng.normal(loc=300, scale=80, size=(41, 37, 29)
                       ).astype(np.float32) for _ in range(2)]
    out_shape = (32, 32, 32)
    moments = ((np.float32(290.0), np.float32(310.0)),
               (np.float32(75.0), np.float32(85.0)))
    pre = DevicePreprocessor(
        out_shape, mode,
        moments=moments if mode == "global" else None)
    got = np.asarray(pre(vols))

    host = np.stack([_scipy_zoom(v, out_shape, 1) for v in vols])
    ref = normalize_case(host, mode,
                         mean=moments[0] if mode == "global" else None,
                         std=moments[1] if mode == "global" else None)
    np.testing.assert_allclose(got, ref, atol=5e-3, rtol=1e-3)


def test_preprocessor_program_cache_by_bucket():
    pre = DevicePreprocessor((16, 16, 16), "per_volume")
    a = np.random.default_rng(1).normal(size=(14, 15, 16)).astype(np.float32)
    b = np.random.default_rng(2).normal(size=(30, 25, 22)).astype(np.float32)
    pre([a])                           # (16, 16, 16) bucket
    pre([a * 2])                       # same bucket -> cached program
    assert len(pre._programs) == 1
    pre([b])                           # (32, 32, 32) bucket -> new program
    assert len(pre._programs) == 2


def test_preprocessor_rejects_mismatched_modalities():
    pre = DevicePreprocessor((8, 8, 8), "per_volume")
    a = np.zeros((10, 10, 10), np.float32)
    b = np.zeros((10, 10, 9), np.float32)
    with pytest.raises(ValueError, match="share the crop shape"):
        pre([a, b])


def test_preprocess_case_device_matches_host(tmp_path):
    """End-to-end: preprocess_case with device_pre vs the host path on a
    synthetic NIfTI case — near-identical data, identical affine/truth."""
    from fetal_mri_segmentation_tpu.config import Config
    from fetal_mri_segmentation_tpu.inference.predict import preprocess_case
    from fetal_mri_segmentation_tpu.ops.resample import DevicePreprocessor
    from fetal_mri_segmentation_tpu.utils.nifti import NiftiImage, save_nifti

    rng = np.random.default_rng(3)
    shape = (48, 40, 36)
    vol = np.zeros(shape, np.float32)
    vol[8:40, 6:34, 5:30] = rng.normal(
        loc=200, scale=50, size=(32, 28, 25)).astype(np.float32)
    truth = (vol > 220).astype(np.float32)
    affine = np.diag([1.0, 1.2, 0.9, 1.0]).astype(np.float64)
    affine[:3, 3] = (-10, 4, 2)
    case = tmp_path / "case1"
    case.mkdir()
    save_nifti(vol, str(case / "t2.nii.gz"), affine=affine)
    save_nifti(truth, str(case / "truth.nii.gz"), affine=affine)

    cfg = Config(image_shape=(32, 32, 32), training_modalities=["t2"],
                 normalization="per_volume", n_labels=1)
    host_data, host_aff, host_truth = preprocess_case(str(case), cfg)
    pre = DevicePreprocessor(cfg.image_shape, cfg.normalization)
    dev_data, dev_aff, dev_truth = preprocess_case(
        str(case), cfg, device_pre=pre)

    np.testing.assert_allclose(np.asarray(dev_data), host_data,
                               atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(dev_aff, host_aff, atol=1e-9)
    np.testing.assert_array_equal(
        dev_truth.get_fdata(dtype=np.float32),
        host_truth.get_fdata(dtype=np.float32))


def test_preprocessor_bf16_transfer_close():
    """bf16 raw staging (thin-link mode) stays within bf16 rounding of the
    f32 path — ~0.4% relative on the normalized output."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    vols = [rng.normal(loc=300, scale=80, size=(41, 37, 29)
                       ).astype(np.float32)]
    out_shape = (32, 32, 32)
    f32 = np.asarray(DevicePreprocessor(out_shape, "per_volume")(vols))
    b16 = np.asarray(DevicePreprocessor(
        out_shape, "per_volume", transfer_dtype=jnp.bfloat16)(vols))
    # max-norm: worst single voxel of bf16 rounding (~0.4% of the raw
    # intensity, amplified by the z-score's 1/std) stays under 5% of a
    # standard deviation; the mean error is an order of magnitude lower
    err_max = np.abs(b16 - f32).max() / f32.std()
    err_mean = np.abs(b16 - f32).mean() / f32.std()
    assert err_max < 5e-2, err_max
    assert err_mean < 1e-2, err_mean


def test_preprocess_case_device_multimodal(tmp_path):
    """Two-modality case through the device ingest: both channels ride one
    zoom+normalize program and match the host path channel-for-channel."""
    from fetal_mri_segmentation_tpu.config import Config
    from fetal_mri_segmentation_tpu.inference.predict import preprocess_case
    from fetal_mri_segmentation_tpu.ops.resample import DevicePreprocessor
    from fetal_mri_segmentation_tpu.utils.nifti import save_nifti

    rng = np.random.default_rng(4)
    shape = (40, 36, 32)
    base = np.zeros(shape, np.float32)
    base[6:34, 5:30, 4:28] = rng.normal(
        loc=150, scale=40, size=(28, 25, 24)).astype(np.float32)
    affine = np.diag([1.1, 0.9, 1.3, 1.0]).astype(np.float64)
    case = tmp_path / "case_mm"
    case.mkdir()
    save_nifti(base, str(case / "t1.nii.gz"), affine=affine)
    save_nifti(base * 0.5 + 10, str(case / "t2.nii.gz"), affine=affine)
    save_nifti((base > 170).astype(np.float32),
               str(case / "truth.nii.gz"), affine=affine)

    cfg = Config(image_shape=(32, 32, 32), all_modalities=("t1", "t2"),
                 normalization="per_volume", n_labels=1)
    host_data, host_aff, _ = preprocess_case(str(case), cfg)
    pre = DevicePreprocessor(cfg.image_shape, cfg.normalization)
    dev_data, dev_aff, _ = preprocess_case(str(case), cfg, device_pre=pre)
    assert np.asarray(dev_data).shape == (2, 32, 32, 32)
    np.testing.assert_allclose(np.asarray(dev_data), host_data,
                               atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(dev_aff, host_aff, atol=1e-9)


def test_make_device_preprocessor_moments_injection(tmp_path):
    """Callers that already hold the training moments (predict.py --input,
    serve.py) pass them in — the factory must NOT re-open the HDF5 file
    (which may not even exist on a serving box that got moments another
    way); without injected moments the global mode still loads from the
    dataset."""
    from fetal_mri_segmentation_tpu.config import Config
    from fetal_mri_segmentation_tpu.inference.predict import (
        make_device_preprocessor)
    from fetal_mri_segmentation_tpu.models import build_model

    cfg = Config(image_shape=(16, 16, 16), model_name="unet", depth=3,
                 n_base_filters=4, normalization="global",
                 data_file=str(tmp_path / "does_not_exist.h5"),
                 compute_dtype="float32")
    model = build_model(cfg)
    pre = make_device_preprocessor(model, cfg, moments=(12.5, 3.25))
    assert pre._host_moments == (12.5, 3.25)
    # without injection the missing dataset is a clear error, not silence
    with pytest.raises((FileNotFoundError, OSError, ValueError)):
        make_device_preprocessor(model, cfg)
