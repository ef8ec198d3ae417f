"""GSPMD spatial / hybrid data+spatial sharding (SURVEY section 5.7 analogue)
on the virtual 8-device CPU mesh: sharded steps must equal the
single-device step on the same global batch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fetal_mri_segmentation_tpu.config import Config
from fetal_mri_segmentation_tpu.models import build_model
from fetal_mri_segmentation_tpu.parallel import (
    make_direct_predictor, make_gspmd_eval_step, make_gspmd_train_step,
    make_hybrid_mesh, make_spatial_predictor, shard_batch_spatial)
from fetal_mri_segmentation_tpu.training import (create_train_state,
                                                 make_train_step)


def tiny_config(**kw):
    defaults = dict(model_name="unet", depth=2, n_base_filters=2,
                    patch_shape=(16, 16, 16), batch_size=2,
                    compute_dtype="float32", augment=False,
                    initial_learning_rate=1e-2)
    defaults.update(kw)
    return Config(**defaults)


def make_batch(b=2, d=16, seed=0):
    rng = np.random.default_rng(seed)
    shape = (b, 1, d, 16, 16)
    y = np.zeros(shape, np.float32)
    y[:, :, 4:12, 4:12, 4:12] = 1.0
    x = (y * 2 + rng.normal(0, 0.3, shape)).astype(np.float32)
    return x, y


@pytest.mark.parametrize("n_data,n_spatial", [(1, 8), (2, 4), (8, 1)])
def test_gspmd_step_matches_single_device(n_data, n_spatial):
    """Halo exchange + global reductions inserted by XLA SPMD must reproduce
    the single-device step exactly (params compared post-SGD)."""
    import optax

    cfg = tiny_config(batch_size=max(2, n_data))
    model = build_model(cfg)
    tx = optax.sgd(1.0)
    x, y = make_batch(b=max(2, n_data))
    rng = jax.random.PRNGKey(5)

    s1 = create_train_state(model, cfg, jax.random.PRNGKey(0), tx=tx)
    new1, m1 = make_train_step(model, cfg)(s1, jnp.asarray(x), jnp.asarray(y),
                                           rng, x.shape[0])

    mesh = make_hybrid_mesh(n_data, n_spatial)
    sg = create_train_state(model, cfg, jax.random.PRNGKey(0), tx=tx)
    step = make_gspmd_train_step(model, cfg, mesh)
    xs, ys = shard_batch_spatial(mesh, x, y)
    newg, mg = step(sg, xs, ys, rng, jnp.asarray(x.shape[0]))

    assert np.allclose(float(m1["loss"]), float(mg["loss"]), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(new1.params),
                    jax.tree_util.tree_leaves(newg.params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5), \
            float(np.abs(np.asarray(a) - np.asarray(b)).max())


def test_gspmd_eval_step_matches_single():
    cfg = tiny_config()
    model = build_model(cfg)
    x, y = make_batch()
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    from fetal_mri_segmentation_tpu.training import make_eval_step
    m1 = make_eval_step(model, cfg)(state, jnp.asarray(x), jnp.asarray(y))

    mesh = make_hybrid_mesh(2, 4)
    es = make_gspmd_eval_step(model, cfg, mesh)
    mg = es(state, *shard_batch_spatial(mesh, x, y), None)
    assert np.allclose(float(m1["loss"]), float(mg["loss"]), atol=1e-6)


def test_spatial_predictor_matches_single_device():
    """Whole-volume forward with depth sharded 8-way == unsharded forward."""
    cfg = tiny_config()
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    variables = {"params": state.params}
    vol = np.random.default_rng(7).normal(
        0, 1, (1, 32, 16, 16)).astype(np.float32)

    x = jnp.transpose(jnp.asarray(vol), (1, 2, 3, 0))[None]
    want = np.transpose(np.asarray(model.apply(variables, x))[0],
                        (3, 0, 1, 2))

    mesh = make_hybrid_mesh(1, 8)
    predict = make_spatial_predictor(model, cfg, mesh)
    got = predict(variables, vol)
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-5), \
        float(np.abs(got - want).max())


def test_shard_batch_spatial_divisibility_error():
    mesh = make_hybrid_mesh(2, 4)
    x = np.zeros((2, 1, 10, 8, 8), np.float32)  # D=10 not divisible by 4
    with pytest.raises(ValueError, match="not divisible"):
        shard_batch_spatial(mesh, x)


def test_run_validation_cases_spatial_mode(tmp_path):
    """Whole-volume spatially-sharded inference writes the same output tree
    (prediction.nii.gz per case) with a sensible binary label map."""
    from fetal_mri_segmentation_tpu.data import (open_data_file,
                                                 write_data_to_file)
    from fetal_mri_segmentation_tpu.inference import run_validation_cases
    from fetal_mri_segmentation_tpu.utils.io_utils import pickle_dump
    from fetal_mri_segmentation_tpu.utils.nifti import load_nifti
    from tests.synthetic import write_synthetic_dataset

    files = write_synthetic_dataset(str(tmp_path / "nii"), n_cases=2,
                                    shape=(20, 20, 20))
    h5p = str(tmp_path / "d.h5")
    write_data_to_file(files, h5p, image_shape=(16, 16, 16),
                       normalize="per_volume", crop=False)
    keys = str(tmp_path / "v.pkl")
    pickle_dump([0, 1], keys)

    cfg = tiny_config(patch_shape=(16, 16, 16), image_shape=(16, 16, 16))
    model = build_model(cfg)
    variables = {"params": create_train_state(
        model, cfg, jax.random.PRNGKey(0)).params}
    with open_data_file(h5p) as f:
        run_validation_cases(keys, model, variables, f, cfg,
                             output_dir=str(tmp_path / "sp"),
                             spatial_mesh=make_hybrid_mesh(1, 8))
    for case in ("validation_case_0", "validation_case_1"):
        p = load_nifti(str(tmp_path / "sp" / case /
                           "prediction.nii.gz")).get_fdata()
        assert p.shape == (16, 16, 16)
        assert set(np.unique(p)).issubset({0.0, 1.0})


def test_train_model_on_hybrid_mesh(tmp_path):
    """Full epoch loop (prefetch, checkpoint, CSV) over the data x spatial
    GSPMD mesh — loss must improve and a checkpoint must land."""
    import os

    from fetal_mri_segmentation_tpu.training import (create_train_state,
                                                     train_model)

    cfg = tiny_config(batch_size=2, n_epochs=5, early_stop=0,
                      model_file=str(tmp_path / "m.ckpt"),
                      training_log=str(tmp_path / "t.log"))
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))

    x, y = make_batch(b=4, seed=1)

    def gen():
        while True:
            yield x[:2], y[:2]
            yield x[2:], y[2:]

    mesh = make_hybrid_mesh(2, 4)
    state = train_model(model, state, cfg, gen(), gen(), 2, 1,
                        mesh=mesh, verbose=False)
    assert os.path.exists(cfg.model_file)
    import csv
    with open(cfg.training_log) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 5
    losses = [float(r["loss"]) for r in rows]
    # single epoch-to-epoch comparisons are noisy at 2 tiny steps/epoch
    # (the keras-exact Adam eps change legitimately moved the trajectory);
    # require the tail to improve on the start
    assert np.mean(losses[-2:]) < losses[0], losses


def test_spatial_mode_rejects_incompatible_options(tmp_path):
    """Patch-grid --num-devices must fail loudly with spatial mode instead
    of being silently ignored (volume-level TTA, by contrast, now composes
    with the whole-volume predictors — see the tta tests below)."""
    from fetal_mri_segmentation_tpu.data import (open_data_file,
                                                 write_data_to_file)
    from fetal_mri_segmentation_tpu.inference import run_validation_cases
    from fetal_mri_segmentation_tpu.parallel import make_mesh
    from fetal_mri_segmentation_tpu.utils.io_utils import pickle_dump
    from tests.synthetic import write_synthetic_dataset

    files = write_synthetic_dataset(str(tmp_path / "nii"), n_cases=1,
                                    shape=(20, 20, 20))
    h5p = str(tmp_path / "d.h5")
    write_data_to_file(files, h5p, image_shape=(16, 16, 16),
                       normalize="per_volume", crop=False)
    keys = str(tmp_path / "v.pkl")
    pickle_dump([0], keys)
    cfg = tiny_config(patch_shape=(16, 16, 16), image_shape=(16, 16, 16))
    model = build_model(cfg)
    variables = {"params": create_train_state(
        model, cfg, jax.random.PRNGKey(0)).params}
    smesh = make_hybrid_mesh(1, 8)
    with open_data_file(h5p) as f:
        with pytest.raises(ValueError, match="mutually exclusive"):
            run_validation_cases(keys, model, variables, f, cfg,
                                 output_dir=str(tmp_path / "x"),
                                 spatial_mesh=smesh, mesh=make_mesh(8))


def test_direct_predictor_matches_spatial_sharded():
    """make_direct_predictor (1-device mesh, collectives compiled away) must
    produce the same label map as the 8-way depth-sharded predictor —
    including through the bit-packed D2H path."""
    from fetal_mri_segmentation_tpu.parallel import make_direct_predictor

    cfg = tiny_config()
    model = build_model(cfg)
    variables = {"params": create_train_state(
        model, cfg, jax.random.PRNGKey(0)).params}
    vol = np.random.default_rng(3).normal(
        0, 1, (1, 32, 16, 16)).astype(np.float32)

    direct = make_direct_predictor(model, cfg)
    sharded = make_spatial_predictor(model, cfg, make_hybrid_mesh(1, 8))

    lab_d = direct.predict_labels(variables, vol)
    lab_s = sharded.predict_labels(variables, vol)
    assert lab_d.shape == (32, 16, 16)
    assert lab_d.dtype == np.uint8
    np.testing.assert_array_equal(lab_d, lab_s)

    # bit-packed labels must agree with thresholding the probability map
    prob = direct(variables, vol)
    np.testing.assert_array_equal(lab_d, (prob[0] > 0.5).astype(np.uint8))


def test_direct_predictor_shape_validation():
    """Volumes whose dims don't survive the pooling halvings must fail with
    a clear error instead of a shape crash inside the model."""
    from fetal_mri_segmentation_tpu.parallel import make_direct_predictor

    cfg = tiny_config(depth=3)
    model = build_model(cfg)
    variables = {"params": create_train_state(
        model, cfg, jax.random.PRNGKey(0)).params}
    bad = np.zeros((1, 18, 16, 16), np.float32)  # 18 % 2^(3-1) != 0
    with pytest.raises(ValueError, match="divisible"):
        make_direct_predictor(model, cfg).predict_labels(variables, bad)


def test_direct_close_to_sliding_window_on_trained_model():
    """Direct whole-volume inference vs Gaussian sliding-window on a
    quick-trained model: the two modes differ only at former patch borders,
    so the masks must agree almost everywhere (beyond-parity serving mode's
    quality contract)."""
    import optax

    from fetal_mri_segmentation_tpu.inference import SlidingWindowPredictor
    from fetal_mri_segmentation_tpu.parallel import make_direct_predictor

    cfg = tiny_config(patch_shape=(16, 16, 16), image_shape=(32, 32, 32),
                      initial_learning_rate=1e-2)
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               tx=optax.adam(1e-2))
    step = make_train_step(model, cfg)

    rng = np.random.default_rng(0)
    y = np.zeros((2, 1, 16, 16, 16), np.float32)
    y[:, :, 4:12, 4:12, 4:12] = 1.0
    x = (y * 2 + rng.normal(0, 0.3, y.shape)).astype(np.float32)
    for i in range(30):
        state, metrics = step(state, jnp.asarray(x), jnp.asarray(y),
                              jax.random.PRNGKey(i))
    assert float(metrics["dice"]) > 0.9  # converged enough to compare modes

    yv = np.zeros((1, 32, 32, 32), np.float32)
    yv[:, 8:24, 8:24, 8:24] = 1.0
    xv = (yv * 2 + rng.normal(0, 0.3, yv.shape)).astype(np.float32)
    variables = {"params": state.params}

    sw = SlidingWindowPredictor(model, cfg, image_shape=(32, 32, 32),
                                overlap=4)
    lab_sw = sw.predict_labels(variables, xv)
    lab_d = make_direct_predictor(model, cfg).predict_labels(variables, xv)

    inter = np.sum((lab_sw > 0) & (lab_d > 0))
    denom = np.sum(lab_sw > 0) + np.sum(lab_d > 0)
    dice = 2.0 * inter / max(denom, 1)
    assert dice > 0.95, f"direct vs sliding-window mask dice {dice:.4f}"


def test_run_validation_cases_direct_mode(tmp_path):
    """--direct (1-device spatial mesh) drives the PIPELINED
    run_validation_cases path end-to-end and writes the same output tree."""
    from jax.sharding import Mesh

    from fetal_mri_segmentation_tpu.data import (open_data_file,
                                                 write_data_to_file)
    from fetal_mri_segmentation_tpu.inference import run_validation_cases
    from fetal_mri_segmentation_tpu.utils.io_utils import pickle_dump
    from fetal_mri_segmentation_tpu.utils.nifti import load_nifti
    from tests.synthetic import write_synthetic_dataset

    files = write_synthetic_dataset(str(tmp_path / "nii"), n_cases=2,
                                    shape=(20, 20, 20))
    h5p = str(tmp_path / "d.h5")
    write_data_to_file(files, h5p, image_shape=(16, 16, 16),
                       normalize="per_volume", crop=False)
    keys = str(tmp_path / "v.pkl")
    pickle_dump([0, 1], keys)

    cfg = tiny_config(patch_shape=(16, 16, 16), image_shape=(16, 16, 16))
    model = build_model(cfg)
    variables = {"params": create_train_state(
        model, cfg, jax.random.PRNGKey(0)).params}
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("spatial",))
    with open_data_file(h5p) as f:
        run_validation_cases(keys, model, variables, f, cfg,
                             output_dir=str(tmp_path / "direct"),
                             spatial_mesh=mesh1)
    for case in ("validation_case_0", "validation_case_1"):
        p = load_nifti(str(tmp_path / "direct" / case /
                           "prediction.nii.gz")).get_fdata()
        assert p.shape == (16, 16, 16)
        assert set(np.unique(p)).issubset({0.0, 1.0})


def test_spatial_predictor_rejects_wrong_channel_count():
    import pytest

    cfg = Config(model_name="unet", depth=2, n_base_filters=2,
                 patch_shape=None, image_shape=(8, 8, 8),
                 compute_dtype="float32")
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    pred = make_direct_predictor(model, cfg)
    with pytest.raises(ValueError, match="C=1"):
        pred.predict_labels({"params": state.params},
                            np.zeros((8, 8, 8), np.float32))
    with pytest.raises(ValueError, match="C=1"):
        pred.predict_labels({"params": state.params},
                            np.zeros((3, 8, 8, 8), np.float32))


def test_gspmd_steps_accept_omitted_n_valid():
    """The GSPMD step variants must be callable without n_valid, like every
    other step variant — and must equal an explicit full-batch n_valid."""
    cfg = Config(model_name="unet", depth=2, n_base_filters=2,
                 patch_shape=(8, 8, 8), batch_size=4, augment=False,
                 compute_dtype="float32")
    model = build_model(cfg)
    mesh = make_hybrid_mesh(2, 4)
    rng = np.random.default_rng(0)
    y = np.zeros((4, 1, 8, 8, 8), np.float32)
    y[:, :, 2:6, 2:6, 2:6] = 1.0
    x = (y * 2 + rng.normal(0, 0.3, y.shape)).astype(np.float32)
    xs, ys = shard_batch_spatial(mesh, x, y)

    state0 = create_train_state(model, cfg, jax.random.PRNGKey(0))
    step = make_gspmd_train_step(model, cfg, mesh)
    _, m_default = step(state0, xs, ys, jax.random.PRNGKey(1))
    state1 = create_train_state(model, cfg, jax.random.PRNGKey(0))
    _, m_explicit = step(state1, xs, ys, jax.random.PRNGKey(1),
                         jnp.asarray(4))
    np.testing.assert_allclose(float(m_default["loss"]),
                               float(m_explicit["loss"]), rtol=1e-6)

    es = make_gspmd_eval_step(model, cfg, mesh)
    ev_default = es(create_train_state(model, cfg, jax.random.PRNGKey(0)),
                    xs, ys)
    assert np.isfinite(float(ev_default["loss"]))


# ---------------------------------------------------------------- direct TTA

def test_direct_tta_flips_matches_manual_average():
    """Volume-level 8-way flip TTA on the direct predictor == averaging 8
    manually flipped direct predictions (any shape — non-cubic here)."""
    from fetal_mri_segmentation_tpu.parallel import make_direct_predictor

    cfg = tiny_config()
    model = build_model(cfg)
    variables = {"params": create_train_state(
        model, cfg, jax.random.PRNGKey(0)).params}
    vol = np.random.default_rng(11).normal(
        0, 1, (1, 32, 16, 16)).astype(np.float32)

    plain = make_direct_predictor(model, cfg)
    acc = np.zeros((1, 32, 16, 16), np.float32)
    for idx in range(8):
        bits = [(idx >> 2) & 1, (idx >> 1) & 1, idx & 1]
        xp = vol
        for ax, b in zip((1, 2, 3), bits):  # spatial axes of (C, D, H, W)
            if b:
                xp = np.flip(xp, axis=ax)
        yp = plain(variables, np.ascontiguousarray(xp))
        for ax, b in zip((1, 2, 3), bits):
            if b:
                yp = np.flip(yp, axis=ax)
        acc += yp
    want = acc / 8.0

    got = make_direct_predictor(model, cfg, tta="flips")(variables, vol)
    assert np.allclose(got, want, atol=1e-5), \
        float(np.abs(got - want).max())


def test_direct_tta_permute_matches_single_patch_sliding_window():
    """Volume-level 48-symmetry TTA == patch-level TTA when the patch IS the
    whole (cubic) volume: one sliding-window patch covering the full volume
    makes the two estimators mathematically identical."""
    from fetal_mri_segmentation_tpu.inference.sliding_window import (
        SlidingWindowPredictor)
    from fetal_mri_segmentation_tpu.parallel import make_direct_predictor

    cfg = tiny_config(patch_shape=(16, 16, 16), image_shape=(16, 16, 16))
    model = build_model(cfg)
    variables = {"params": create_train_state(
        model, cfg, jax.random.PRNGKey(0)).params}
    vol = np.random.default_rng(13).normal(
        0, 1, (1, 16, 16, 16)).astype(np.float32)

    sw = SlidingWindowPredictor(model, cfg, image_shape=(16, 16, 16),
                                overlap=0, patch_batch_size=1,
                                tta_permute="permute")
    want = sw(variables, vol)
    got = make_direct_predictor(model, cfg, tta="permute")(variables, vol)
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-4), \
        float(np.abs(got - want).max())

    # the label path must ride the same TTA-averaged probabilities
    lab = make_direct_predictor(model, cfg, tta="permute").predict_labels(
        variables, vol)
    np.testing.assert_array_equal(lab, (got[0] > 0.5).astype(np.uint8))


def test_direct_tta_permute_requires_cubic_volume():
    """48-symmetry TTA transposes axes — a non-cubic volume must fail with
    the curated error pointing at tta='flips'."""
    from fetal_mri_segmentation_tpu.parallel import make_direct_predictor

    cfg = tiny_config()
    model = build_model(cfg)
    variables = {"params": create_train_state(
        model, cfg, jax.random.PRNGKey(0)).params}
    vol = np.zeros((1, 32, 16, 16), np.float32)
    with pytest.raises(ValueError, match="CUBIC"):
        make_direct_predictor(model, cfg, tta="permute").predict_labels(
            variables, vol)


def test_direct_tta_unknown_mode_rejected():
    cfg = tiny_config()
    model = build_model(cfg)
    with pytest.raises(ValueError, match="unknown TTA mode"):
        make_direct_predictor(model, cfg, tta="rotations")


def test_direct_predictor_prob_async_surface():
    """SpatialPredictor duck-types the async probability surface (so
    --direct --prob-map batches ride the two-stage pipeline): fp32 async ==
    sync __call__; fp16 transfer within the documented 4.9e-4 quantization."""
    from fetal_mri_segmentation_tpu.parallel import make_direct_predictor

    cfg = tiny_config()
    model = build_model(cfg)
    variables = {"params": create_train_state(
        model, cfg, jax.random.PRNGKey(0)).params}
    vol = np.random.default_rng(17).normal(
        0, 1, (1, 32, 16, 16)).astype(np.float32)

    pred = make_direct_predictor(model, cfg)
    want = pred(variables, vol)
    got32 = pred.unpack_prob(pred.predict_prob_async(variables, vol))
    assert got32.dtype == np.float32
    np.testing.assert_allclose(got32, want, atol=1e-6)
    got16 = pred.unpack_prob(
        pred.predict_prob_async(variables, vol, transfer_dtype="float16"))
    assert got16.dtype == np.float32  # materialized back to f32
    assert float(np.abs(got16 - want).max()) <= 5e-4


def test_build_serving_predictor_direct_fails_fast_on_bad_geometry():
    """A misconfigured --direct server must die at STARTUP, not quarantine
    every case forever: build_serving_predictor validates config.image_shape
    (what serving preprocesses every case to) at construction — permute TTA
    on a non-cubic shape, and the 2^(depth-1) divisibility guard."""
    from fetal_mri_segmentation_tpu.inference.predict import (
        build_serving_predictor)

    cfg = tiny_config(image_shape=(32, 16, 16))
    model = build_model(cfg)
    with pytest.raises(ValueError, match="CUBIC"):
        build_serving_predictor(model, cfg, direct=True, tta="permute")
    cfg_odd = tiny_config(image_shape=(18, 16, 16), depth=3)
    model_odd = build_model(cfg_odd)
    with pytest.raises(ValueError, match="divisible"):
        build_serving_predictor(model_odd, cfg_odd, direct=True)
    # the good geometry still constructs (cubic, divisible)
    cfg_ok = tiny_config(image_shape=(16, 16, 16))
    build_serving_predictor(model, cfg_ok, direct=True, tta="permute")
