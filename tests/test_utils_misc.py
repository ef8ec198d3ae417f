"""Direct unit tests for the small shared utils that the integration suites
only exercise indirectly: bit-pack transfer format, device-residency cache,
bf16 host staging, profiling helpers."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fetal_mri_segmentation_tpu.utils.packing import (pack_bit_mask,
                                                      unpack_bit_mask)
from fetal_mri_segmentation_tpu.utils.profiling import StepTimer, trace
from fetal_mri_segmentation_tpu.utils.residency import (ResidentParamsMixin,
                                                        host_round_for_model)


def test_pack_unpack_roundtrip_all_lengths():
    """pack → unpack must be the identity for every pad remainder (lengths
    not divisible by 8 pad with zeros; unpack truncates back)."""
    rng = np.random.default_rng(0)
    for n in range(1, 26):
        mask = rng.integers(0, 2, n).astype(np.uint8)
        packed = np.asarray(pack_bit_mask(jnp.asarray(mask)))
        assert packed.dtype == np.uint8
        assert packed.shape[0] == (n + 7) // 8
        np.testing.assert_array_equal(unpack_bit_mask(packed, (n,)), mask)


def test_pack_bit_mask_msb_first_numpy_contract():
    """The device-side pack must match np.packbits' big-endian default —
    the host side uses np.unpackbits, so a bit-order drift would silently
    scramble every served mask."""
    rng = np.random.default_rng(1)
    mask = rng.integers(0, 2, 64).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(pack_bit_mask(jnp.asarray(mask))),
                                  np.packbits(mask))


def test_pack_bit_mask_under_jit_3d_shape():
    mask = (np.arange(3 * 4 * 5).reshape(3, 4, 5) % 3 == 0).astype(np.uint8)
    packed = jax.jit(lambda m: pack_bit_mask(m.reshape(-1)))(
        jnp.asarray(mask))
    np.testing.assert_array_equal(unpack_bit_mask(np.asarray(packed),
                                                  mask.shape), mask)


class _Bf16Model:
    dtype = jnp.bfloat16


class _F32Model:
    dtype = jnp.float32


def test_host_round_for_model():
    import ml_dtypes

    x = np.asarray([0.1, 1.0, -3.7], np.float32)
    rounded = host_round_for_model(x, _Bf16Model())
    assert rounded.dtype == ml_dtypes.bfloat16
    # f32 models must pass through untouched (no silent precision loss)
    same = host_round_for_model(x, _F32Model())
    assert same.dtype == np.float32
    np.testing.assert_array_equal(same, x)


class _Holder(ResidentParamsMixin):
    pass


def test_resident_params_cache_hit_and_leaf_invalidation():
    h = _Holder()
    variables = {"params": {"w": np.ones(4, np.float32),
                            "b": np.zeros(2, np.float32)}}
    dev1 = h.device_variables(variables)
    # same leaves -> cache hit (no re-upload), even via a NEW container
    assert h.device_variables(dict(variables)) is dev1
    # in-place leaf swap in the SAME container must invalidate: a
    # container-identity key would keep serving the old weights
    variables["params"]["w"] = np.full(4, 2.0, np.float32)
    dev2 = h.device_variables(variables)
    assert dev2 is not dev1
    np.testing.assert_array_equal(np.asarray(dev2["params"]["w"]),
                                  np.full(4, 2.0, np.float32))


def test_step_timer_summary():
    t = StepTimer()
    assert t.summary() == {}  # empty timer must not divide by zero
    for _ in range(5):
        with t:
            pass
    s = t.summary()
    assert s["steps"] == 5
    assert 0 <= s["p50_sec"] <= s["p90_sec"] <= s["max_sec"]
    assert s["mean_sec"] > 0


def test_trace_writes_xplane(tmp_path):
    logdir = str(tmp_path / "trace")
    with trace(logdir):
        jnp.ones(8).sum().block_until_ready()
    files = [os.path.join(dp, f) for dp, _, fs in os.walk(logdir) for f in fs]
    assert files, "jax.profiler trace produced no artifacts"


def test_device_label_map_widens_large_labels():
    """Label values >255 must widen the device label artifact instead of
    wrapping modulo 256 (ADVICE r3: the ensemble CLI exposes --labels
    directly; the device argmax path must agree with the host
    get_prediction_labels dtype)."""
    from fetal_mri_segmentation_tpu.utils.packing import device_label_map

    prob = jnp.asarray(
        np.stack([np.full((2, 2, 2), 0.9, np.float32),
                  np.full((2, 2, 2), 0.1, np.float32)]))
    out = np.asarray(device_label_map(prob, 0.5, 2, (500, 2)))
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, np.full((2, 2, 2), 500, np.uint16))
    # ordinary label sets keep the reference's uint8 artifact
    out8 = np.asarray(device_label_map(prob, 0.5, 2, (3, 2)))
    assert out8.dtype == np.uint8


def test_write_prediction_widens_binary_label(tmp_path):
    """predict.py's binary surface with labels=(500,): the written map
    carries 500, not 500 % 256 (the ensemble CLI already widened — the
    two surfaces must agree)."""
    from fetal_mri_segmentation_tpu.config import Config
    from fetal_mri_segmentation_tpu.inference.predict import (
        _scale_binary_label, _write_prediction)
    from fetal_mri_segmentation_tpu.utils.nifti import load_nifti

    config = Config(image_shape=(4, 4, 4), n_labels=1, labels=(500,))
    label_map = np.array([[[0, 1], [1, 0]], [[1, 0], [0, 1]]], np.uint8)
    scaled = _scale_binary_label(label_map, config)
    assert scaled.dtype == np.uint16 and scaled.max() == 500
    out = _write_prediction(
        label_map, config, str(tmp_path), np.eye(4),
        lambda target, fn, *a, **kw: fn(*a, **kw))
    assert out.max() == 500
    img = load_nifti(str(tmp_path / "prediction.nii.gz"))
    assert int(np.asarray(img.get_fdata()).max()) == 500
