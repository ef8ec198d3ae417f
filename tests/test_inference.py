"""Sliding-window on-device reconstruction vs the numpy oracle
(SURVEY.md section 4; BASELINE config #3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fetal_mri_segmentation_tpu.config import Config
from fetal_mri_segmentation_tpu.inference import (
    SlidingWindowPredictor, get_prediction_labels, prediction_to_image)
from fetal_mri_segmentation_tpu.models import UNet3D
from fetal_mri_segmentation_tpu.ops.patches import (
    compute_patch_indices, gaussian_importance_map, get_patch_from_3d_data,
    reconstruct_from_patches)


class IdentityModel:
    """Fake 'model' whose output equals its input — isolates reconstruction."""

    def apply(self, variables, x):
        return x


def test_scan_reconstruction_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    cfg = Config(patch_shape=(8, 8, 8), n_labels=1)
    vol = rng.random((1, 20, 20, 20)).astype(np.float32)

    pred = SlidingWindowPredictor(IdentityModel(), cfg, image_shape=(20, 20, 20),
                                  patch_shape=(8, 8, 8), overlap=4,
                                  patch_batch_size=3, use_gaussian=True)
    got = pred({}, vol)

    corners = compute_patch_indices((20, 20, 20), (8, 8, 8), 4)
    patches = [get_patch_from_3d_data(vol, (8, 8, 8), c) for c in corners]
    wmap = gaussian_importance_map((8, 8, 8),
                                   sigma_scale=cfg.gaussian_recon_sigma_scale)
    want = reconstruct_from_patches(patches, corners, (1, 20, 20, 20),
                                    weight_map=wmap)
    assert got.shape == (1, 20, 20, 20)
    assert np.allclose(got, want, atol=1e-4)


def test_scan_reconstruction_mean_no_gaussian():
    rng = np.random.default_rng(1)
    cfg = Config(patch_shape=(8, 8, 8), n_labels=1)
    vol = rng.random((1, 16, 16, 16)).astype(np.float32)
    pred = SlidingWindowPredictor(IdentityModel(), cfg, image_shape=(16, 16, 16),
                                  patch_shape=(8, 8, 8), overlap=0,
                                  patch_batch_size=4, use_gaussian=False)
    got = pred({}, vol)
    assert np.allclose(got, vol, atol=1e-5)  # exact tiling, identity model


def test_real_model_end_to_end_probabilities():
    cfg = Config(patch_shape=(8, 8, 8), n_labels=1, compute_dtype="float32")
    model = UNet3D(n_labels=1, depth=2, n_base_filters=2, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 1)))
    vol = np.random.default_rng(2).random((1, 12, 12, 12)).astype(np.float32)
    pred = SlidingWindowPredictor(model, cfg, image_shape=(12, 12, 12),
                                  patch_shape=(8, 8, 8), overlap=4,
                                  patch_batch_size=2)
    out = pred(params, vol)
    assert out.shape == (1, 12, 12, 12)
    assert (out >= 0).all() and (out <= 1).all()


def test_tta_permute_identity_model():
    """TTA over 48 symmetries of an identity model == plain prediction."""
    cfg = Config(patch_shape=(8, 8, 8), n_labels=1)
    vol = np.random.default_rng(3).random((1, 16, 16, 16)).astype(np.float32)
    plain = SlidingWindowPredictor(IdentityModel(), cfg, (16, 16, 16),
                                   (8, 8, 8), overlap=0, use_gaussian=False)
    tta = SlidingWindowPredictor(IdentityModel(), cfg, (16, 16, 16),
                                 (8, 8, 8), overlap=0, use_gaussian=False,
                                 tta_permute=True)
    a = plain({}, vol)
    b = tta({}, vol)
    assert np.allclose(a, b, atol=1e-5)


def test_prediction_to_image_binary_and_multiclass():
    prob = np.zeros((1, 4, 4, 4), np.float32)
    prob[0, :2] = 0.9
    img = prediction_to_image(prob, np.eye(4), label_map=True, labels=(7,))
    assert set(np.unique(img.dataobj)).issubset({0, 7})

    prob3 = np.random.default_rng(0).random((3, 4, 4, 4)).astype(np.float32)
    prob3[:, 0, 0, 0] = 0.0  # below threshold voxel -> 0
    labels = get_prediction_labels(prob3, threshold=0.5, labels=(2, 4, 6))
    assert labels[0, 0, 0] == 0
    assert set(np.unique(labels)).issubset({0, 2, 4, 6})


def test_predict_labels_matches_thresholded_probabilities():
    """Device-side label map (bit-packed D2H) == host threshold of probs."""
    cfg = Config(patch_shape=(8, 8, 8), n_labels=1, compute_dtype="float32")
    model = UNet3D(n_labels=1, depth=2, n_base_filters=2, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 1)))
    vol = np.random.default_rng(7).random((1, 12, 12, 12)).astype(np.float32)
    pred = SlidingWindowPredictor(model, cfg, image_shape=(12, 12, 12),
                                  patch_shape=(8, 8, 8), overlap=4,
                                  patch_batch_size=2)
    prob = pred(params, vol)
    labels = pred.predict_labels(params, vol, threshold=0.5)
    assert labels.shape == (12, 12, 12)
    assert labels.dtype == np.uint8
    assert np.array_equal(labels, (prob[0] > 0.5).astype(np.uint8))


def test_predict_labels_multiclass_argmax():
    cfg = Config(patch_shape=(8, 8, 8), n_labels=3, labels=(2, 5, 9),
                 compute_dtype="float32")

    class Fixed:
        """Model emitting a fixed per-channel ramp so argmax is known."""

        def apply(self, variables, x):
            b = x.shape[0]
            out = jnp.zeros(x.shape[:-1] + (3,), jnp.float32)
            out = out.at[..., 0].set(0.2)
            out = out.at[..., 1].set(0.9)
            out = out.at[..., 2].set(0.1)
            return out

    pred = SlidingWindowPredictor(Fixed(), cfg, image_shape=(8, 8, 8),
                                  patch_shape=(8, 8, 8), overlap=0,
                                  patch_batch_size=1)
    labels = pred.predict_labels({}, np.zeros((1, 8, 8, 8), np.float32))
    assert set(np.unique(labels)) == {5}  # channel 1 -> labels[1] == 5


def test_bf16_volume_staging_bit_identical(monkeypatch):
    """Host-side bf16 rounding before H2D (half the upload bytes) must be
    BIT-identical to uploading f32 and letting the bf16 model cast — pad,
    transpose and patch-gather all preserve values."""
    import jax

    from fetal_mri_segmentation_tpu.config import Config
    from fetal_mri_segmentation_tpu.inference import SlidingWindowPredictor
    from fetal_mri_segmentation_tpu.models import build_model

    cfg = Config(model_name="unet", depth=2, n_base_filters=2,
                 patch_shape=(8, 8, 8), image_shape=(16, 16, 16),
                 compute_dtype="bfloat16")
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), np.zeros((1, 8, 8, 8, 1),
                                                        np.float32))
    pred = SlidingWindowPredictor(model, cfg, (16, 16, 16), (8, 8, 8),
                                  overlap=4, patch_batch_size=4)
    vol = np.random.default_rng(11).normal(
        0, 1, (1, 16, 16, 16)).astype(np.float32)
    a = pred.predict_labels(params, vol)
    monkeypatch.setattr(
        pred, "_stage_volume",
        lambda d: jax.device_put(np.asarray(d, np.float32)))
    b = pred.predict_labels(params, vol)
    assert np.array_equal(a, b)


def test_device_variables_cache_invalidates_on_inplace_swap():
    """Mutating the same dict object with new params must NOT serve stale
    weights from the resident cache (leaf-identity keying)."""
    import jax

    from fetal_mri_segmentation_tpu.config import Config
    from fetal_mri_segmentation_tpu.inference import SlidingWindowPredictor
    from fetal_mri_segmentation_tpu.models import build_model

    cfg = Config(model_name="unet", depth=2, n_base_filters=2,
                 patch_shape=(8, 8, 8), image_shape=(16, 16, 16),
                 compute_dtype="float32")
    model = build_model(cfg)
    p1 = model.init(jax.random.PRNGKey(0), np.zeros((1, 8, 8, 8, 1),
                                                    np.float32))
    p2 = model.init(jax.random.PRNGKey(1), np.zeros((1, 8, 8, 8, 1),
                                                    np.float32))
    pred = SlidingWindowPredictor(model, cfg, (16, 16, 16), (8, 8, 8),
                                  overlap=4, patch_batch_size=4)
    vol = np.random.default_rng(0).normal(
        0, 1, (1, 16, 16, 16)).astype(np.float32)
    variables = dict(p1)
    a = pred(variables, vol)
    variables["params"] = p2["params"]  # in-place checkpoint swap
    b = pred(variables, vol)
    c = pred(p2, vol)
    assert np.allclose(b, c, atol=1e-6)
    assert not np.allclose(a, b, atol=1e-6)


def test_tiled_reconstruction_matches_unrolled_and_falls_back():
    """The segment-sum (tiled) overlap-add must equal the static-unrolled
    in-place-add path exactly (same math, reordered additions), and
    geometries whose corner stride shares no >=4 tile with the patch must
    fall back instead of silently mis-binning."""
    rng = np.random.default_rng(5)
    cfg = Config(patch_shape=(8, 8, 8), n_labels=1)
    vol = rng.random((1, 20, 20, 20)).astype(np.float32)

    pred = SlidingWindowPredictor(IdentityModel(), cfg,
                                  image_shape=(20, 20, 20),
                                  patch_shape=(8, 8, 8), overlap=4,
                                  patch_batch_size=3, use_gaussian=True)
    assert pred.use_tiled  # stride 4, patch 8 -> tile 4
    got_tiled = pred({}, vol)
    pred.use_tiled = False  # force the unrolled path on the same geometry
    pred._jitted = jax.jit(pred._predict_volume)
    got_unrolled = pred({}, vol)
    assert np.allclose(got_tiled, got_unrolled, atol=1e-6), \
        float(np.abs(got_tiled - got_unrolled).max())

    # overlap 5 -> stride 3, gcd(3, 8) = 1 -> tiles too small, fallback
    degenerate = SlidingWindowPredictor(IdentityModel(), cfg,
                                        image_shape=(20, 20, 20),
                                        patch_shape=(8, 8, 8), overlap=5,
                                        patch_batch_size=3)
    assert not degenerate.use_tiled
    got = degenerate({}, vol)
    assert got.shape == (1, 20, 20, 20)


def test_tiled_reconstruction_multilabel():
    """Tiled path with n_labels > 1 (rows carry the label axis through the
    segment sum)."""

    class TwoChannelModel:
        def apply(self, variables, x):
            return jnp.concatenate([x, 1.0 - x], axis=-1)

    rng = np.random.default_rng(6)
    cfg = Config(patch_shape=(8, 8, 8), n_labels=2, labels=(1, 2))
    vol = rng.random((1, 16, 16, 16)).astype(np.float32)
    pred = SlidingWindowPredictor(TwoChannelModel(), cfg,
                                  image_shape=(16, 16, 16),
                                  patch_shape=(8, 8, 8), overlap=4,
                                  patch_batch_size=4, use_gaussian=True)
    assert pred.use_tiled
    got_tiled = pred({}, vol)
    pred.use_tiled = False
    pred._jitted = jax.jit(pred._predict_volume)
    got_unrolled = pred({}, vol)
    assert got_tiled.shape == (2, 16, 16, 16)
    assert np.allclose(got_tiled, got_unrolled, atol=1e-6)


def test_tta_flips_identity_model():
    """Flips-TTA of an identity model == plain prediction (every flip is
    inverted exactly)."""
    cfg = Config(patch_shape=(8, 8, 8), n_labels=1)
    vol = np.random.default_rng(4).random((1, 16, 16, 16)).astype(np.float32)
    plain = SlidingWindowPredictor(IdentityModel(), cfg, (16, 16, 16),
                                   (8, 8, 8), overlap=0, use_gaussian=False)
    tta = SlidingWindowPredictor(IdentityModel(), cfg, (16, 16, 16),
                                 (8, 8, 8), overlap=0, use_gaussian=False,
                                 tta_permute="flips")
    np.testing.assert_allclose(plain({}, vol), tta({}, vol), atol=1e-5)


def test_tta_flips_matches_manual_average():
    """Flips-TTA == the mean of the 8 manually flipped/unflipped plain
    predictions of a REAL model (subgroup correctness oracle)."""
    import itertools

    cfg = Config(patch_shape=(8, 8, 8), n_labels=1, compute_dtype="float32")
    model = UNet3D(n_labels=1, depth=2, n_base_filters=2, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 1)))
    vol = np.random.default_rng(5).random((1, 8, 8, 8)).astype(np.float32)

    plain = SlidingWindowPredictor(model, cfg, (8, 8, 8), (8, 8, 8),
                                   overlap=0, use_gaussian=False,
                                   patch_batch_size=1)
    acc = np.zeros((1, 8, 8, 8), np.float64)
    for fx, fy, fz in itertools.product((0, 1), repeat=3):
        axes = [d + 1 for d, f in enumerate((fx, fy, fz)) if f]
        out = plain(params, np.flip(vol, axes) if axes else vol)
        acc += np.flip(out, axes) if axes else out
    want = acc / 8.0

    tta = SlidingWindowPredictor(model, cfg, (8, 8, 8), (8, 8, 8),
                                 overlap=0, use_gaussian=False,
                                 patch_batch_size=1, tta_permute="flips")
    np.testing.assert_allclose(tta(params, vol), want, atol=1e-5)


def test_tta_flips_supports_non_cubic_patches():
    """The flip subgroup never transposes axes, so non-cubic patches are
    legal — the 48-symmetry mode must reject them loudly instead."""
    cfg = Config(patch_shape=(8, 8, 4), n_labels=1)
    vol = np.random.default_rng(6).random((1, 16, 16, 8)).astype(np.float32)
    tta = SlidingWindowPredictor(IdentityModel(), cfg, (16, 16, 8),
                                 (8, 8, 4), overlap=0, use_gaussian=False,
                                 tta_permute="flips")
    np.testing.assert_allclose(tta({}, vol), vol, atol=1e-5)
    with pytest.raises(ValueError, match="cubic"):
        SlidingWindowPredictor(IdentityModel(), cfg, (16, 16, 8), (8, 8, 4),
                               overlap=0, tta_permute=True)
    with pytest.raises(ValueError, match="TTA mode"):
        SlidingWindowPredictor(IdentityModel(), cfg, (16, 16, 8), (8, 8, 4),
                               overlap=0, tta_permute="rotate")


def test_predictor_rejects_wrong_volume_shape():
    """A volume whose spatial dims differ from the predictor's image_shape
    must raise — lax.dynamic_slice would silently clamp out-of-range patch
    starts and return a normal-looking garbage volume."""
    cfg = Config(patch_shape=(8, 8, 8), n_labels=1, compute_dtype="float32")
    p = SlidingWindowPredictor(IdentityModel(), cfg,
                               image_shape=(16, 16, 16),
                               patch_shape=(8, 8, 8), overlap=4)
    bad = np.zeros((1, 12, 12, 12), np.float32)
    with pytest.raises(ValueError, match="image_shape"):
        p.predict_labels({}, bad)


def test_scan_fallback_matches_unrolled():
    """The large-grid scan fallback (host-precomputed weight field, no
    device wsum accumulation) must equal the static-unrolled path."""
    rng = np.random.default_rng(7)
    cfg = Config(patch_shape=(8, 8, 8), n_labels=1)
    vol = rng.random((1, 20, 20, 20)).astype(np.float32)
    pred = SlidingWindowPredictor(IdentityModel(), cfg,
                                  image_shape=(20, 20, 20),
                                  patch_shape=(8, 8, 8), overlap=4,
                                  patch_batch_size=3, use_gaussian=True)
    pred.use_tiled = False
    got_unrolled = pred({}, vol)
    pred.static_unroll = False  # force the scan fallback
    pred._jitted = jax.jit(pred._predict_volume)
    got_scan = pred({}, vol)
    assert np.allclose(got_scan, got_unrolled, atol=1e-5), \
        float(np.abs(got_scan - got_unrolled).max())


def test_predictor_rejects_wrong_channel_count():
    """A channel-less (D,H,W) volume or a wrong channel count must fail at
    the staging guard with a curated message, not as a raw tracer error
    deep inside jit."""
    import pytest

    cfg = Config(patch_shape=(8, 8, 8), n_labels=1)  # 1 modality
    pred = SlidingWindowPredictor(IdentityModel(), cfg,
                                  image_shape=(16, 16, 16),
                                  patch_shape=(8, 8, 8), overlap=0)
    with pytest.raises(ValueError, match="C=1"):
        pred({}, np.zeros((16, 16, 16), np.float32))  # channel axis missing
    with pytest.raises(ValueError, match="C=1"):
        pred({}, np.zeros((2, 16, 16, 16), np.float32))  # 2 modalities
    with pytest.raises(ValueError, match="image_shape"):
        pred({}, np.zeros((1, 8, 16, 16), np.float32))  # wrong geometry
