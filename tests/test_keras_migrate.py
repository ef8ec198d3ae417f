"""Config-free Keras .h5 migration (utils/keras_migrate.py).

The reference's `load_old_model` is ONE call with ZERO config: keras
``load_model(model.h5)`` rebuilds the ARCHITECTURE from the file's
``model_config`` attribute, then restores weights and optimizer state
(reference: unet3d/training.py::load_old_model; predict.py loads the model
file directly — SURVEY.md section 3.2). These tests pin that surface here:
derive the Config from a reference-style whole-model .h5, import everything,
and continue training / predict with NO hand-written model fields.
"""

import os
import sys

import numpy as np
import pytest

keras = pytest.importorskip("keras")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fetal_mri_segmentation_tpu.config import Config
from fetal_mri_segmentation_tpu.utils.keras_migrate import (
    derive_arch_from_weight_list, derive_config_from_keras_h5,
    load_old_model, read_keras_model_config)
from tests.test_keras_opt import LR, SHAPE, _batch, _build_keras_unet


@pytest.fixture(scope="module")
def whole_model_h5(tmp_path_factory):
    """A reference-style whole-model legacy .h5 (arch + weights + Adam
    state — exactly what the reference's ModelCheckpoint writes), plus the
    live model's weight list after ONE further train step (the pure-Keras
    continuation ground truth) and its forward output on a fixed input."""
    from fetal_mri_segmentation_tpu.utils.keras_import import (
        keras_weight_list_from_model)

    kmodel = _build_keras_unet()
    for s in range(3):
        x, y = _batch(s)
        kmodel.train_on_batch(x, y)
    path = str(tmp_path_factory.mktemp("mig") / "model.h5")
    kmodel.save(path)
    rng = np.random.default_rng(7)
    x_probe = rng.normal(0, 1, (2,) + SHAPE + (1,)).astype(np.float32)
    y_probe = np.asarray(kmodel(x_probe))
    xb, yb = _batch(99)
    kmodel.train_on_batch(xb, yb)
    return path, keras_weight_list_from_model(kmodel), x_probe, y_probe


def test_derive_config_matches_saved_architecture(whole_model_h5):
    """Every model field a reference user would otherwise hand-copy is
    reconstructed from the .h5 alone."""
    path = whole_model_h5[0]
    with pytest.warns(UserWarning, match="overrides the config"):
        # the default Config disagrees on depth/filters — the derivation
        # must win AND say so
        cfg = derive_config_from_keras_h5(path, verbose=True)
    assert cfg.model_name == "unet"
    assert cfg.depth == 2
    assert cfg.n_base_filters == 2
    assert cfg.deconvolution is True
    assert cfg.batch_normalization is False
    assert cfg.n_labels == 1
    assert cfg.activation_name == "sigmoid"
    assert cfg.patch_shape == SHAPE
    assert cfg.compute_dtype == "float32"
    assert abs(cfg.initial_learning_rate - LR) < 1e-9
    assert cfg.nb_channels == 1  # input layer channels kept ("volume")


def test_load_old_model_forward_parity(whole_model_h5):
    """predict-path semantics: model + weights from the file alone produce
    the same probabilities as the live Keras model."""
    path, _, x_probe, y_probe = whole_model_h5
    model, state, cfg = load_old_model(path, with_optimizer=False,
                                       verbose=False)
    got = np.asarray(model.apply({"params": state.params},
                                 jnp.asarray(x_probe)))
    assert got.shape == y_probe.shape
    assert np.allclose(got, y_probe, atol=2e-5), \
        float(np.abs(got - y_probe).max())


def test_load_old_model_continued_step_matches_keras(whole_model_h5):
    """THE reference contract: one call on the .h5, one further train step,
    and the weights land where a pure-Keras continuation lands — zero
    hand-written model config anywhere in this test."""
    from fetal_mri_segmentation_tpu.ops.dice import dice_coefficient_loss
    from fetal_mri_segmentation_tpu.utils.keras_import import (
        import_keras_unet_weights)

    path, continued_weights, _, _ = whole_model_h5
    model, state, cfg = load_old_model(path, verbose=False)
    assert int(state.step) == 3
    assert abs(state.learning_rate - LR) < 1e-9

    xb, yb = _batch(99)

    @jax.jit
    def step(state, x, y):
        def loss_fn(p):
            pred = model.apply({"params": p}, x)
            return dice_coefficient_loss(jnp.asarray(y), pred)
        _, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads)

    state = step(state, jnp.asarray(xb), jnp.asarray(yb))
    want = import_keras_unet_weights(state.params, continued_weights)
    worst = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                for a, b in zip(jax.tree_util.tree_leaves(state.params),
                                jax.tree_util.tree_leaves(want)))
    assert worst < 1e-6, worst


def test_weights_only_fallback_derives_from_shapes(tmp_path):
    """Files without a model_config attr (save_weights) still derive the
    architecture — from weight names/shapes; the optimizer starts fresh and
    the spatial patch geometry keeps the base config's."""
    kmodel = _build_keras_unet()
    path = str(tmp_path / "w.weights.h5")
    kmodel.save_weights(path)
    assert read_keras_model_config(path) is None
    base = Config(patch_shape=(16, 16, 16), image_shape=(16, 16, 16))
    cfg = derive_config_from_keras_h5(path, base=base, verbose=False)
    assert cfg.model_name == "unet" and cfg.depth == 2
    assert cfg.n_base_filters == 2 and cfg.deconvolution is True
    assert cfg.n_labels == 1
    assert cfg.patch_shape == (16, 16, 16)  # not recoverable from kernels
    model, state, _ = load_old_model(path, config=base, verbose=False)
    assert int(state.step) == 0  # no slots in a weights-only file


def test_derive_arch_rejects_garbage():
    with pytest.raises(ValueError, match="no conv layers"):
        derive_arch_from_weight_list([("dense", [np.zeros((4, 4))])])
    with pytest.raises(ValueError, match="cannot reconstruct"):
        derive_arch_from_weight_list(
            [(f"conv3d_{i}", [np.zeros((3, 3, 3, 2, 2)), np.zeros(2)])
             for i in range(6)])  # 6 convs: not 4*depth-1 for any depth


@pytest.fixture(scope="module")
def isensee_h5(tmp_path_factory):
    """A tiny Keras Isensee2017 twin saved whole (strided convs, residual
    adds, GroupNormalization-as-InstanceNorm, deep supervision)."""
    from keras import layers

    depth, nbf, n_seg, shape = 3, 2, 2, (8, 8, 8)

    def conv_block(x, f, strides=1, kernel=3):
        x = layers.Conv3D(f, kernel, strides=strides, padding="same")(x)
        x = layers.GroupNormalization(groups=-1, epsilon=1e-3)(x)
        return layers.LeakyReLU(negative_slope=0.3)(x)

    inp = keras.Input(shape=shape + (1,))
    x = inp
    level_outputs, level_filters = [], []
    for level in range(depth):
        f = nbf * 2 ** level
        level_filters.append(f)
        in_conv = conv_block(x, f, strides=1 if level == 0 else 2)
        h = conv_block(in_conv, f)
        h = conv_block(h, f)
        x = layers.Add()([in_conv, h])
        level_outputs.append(x)
    seg_layers = []
    for level in range(depth - 2, -1, -1):
        f = level_filters[level]
        x = layers.UpSampling3D(2)(x)
        x = conv_block(x, f)
        x = layers.Concatenate()([level_outputs[level], x])
        x = conv_block(x, f)
        x = conv_block(x, f, kernel=1)
        if level < n_seg:
            seg_layers.insert(0, layers.Conv3D(1, 1)(x))
    out = None
    for level in reversed(range(n_seg)):
        out = seg_layers[level] if out is None else layers.Add()(
            [out, seg_layers[level]])
        if level > 0:
            out = layers.UpSampling3D(2)(out)
    out = layers.Activation("sigmoid")(out)
    kmodel = keras.Model(inp, out)
    kmodel.compile(optimizer=keras.optimizers.Adam(5e-4), loss="mse")
    path = str(tmp_path_factory.mktemp("mig_i") / "isensee.h5")
    kmodel.save(path)
    rng = np.random.default_rng(3)
    x_probe = rng.normal(0, 1, (1,) + shape + (1,)).astype(np.float32)
    return path, x_probe, np.asarray(kmodel(x_probe))


def test_isensee_derive_and_forward(isensee_h5):
    """The Isensee graph (the reference's north-star config #4) derives and
    loads config-free too: strided-conv depth, deep-supervision head count,
    and labels all come from the file."""
    path, x_probe, y_probe = isensee_h5
    cfg = derive_config_from_keras_h5(path, verbose=False)
    assert cfg.model_name == "isensee"
    assert cfg.depth == 3
    assert cfg.n_base_filters == 2
    assert cfg.n_segmentation_levels == 2
    assert cfg.n_labels == 1
    assert cfg.activation_name == "sigmoid"
    assert abs(cfg.initial_learning_rate - 5e-4) < 1e-9

    model, state, _ = load_old_model(path, verbose=False)
    got = np.asarray(model.apply({"params": state.params},
                                 jnp.asarray(x_probe)))
    assert np.allclose(got, y_probe, atol=5e-5), \
        float(np.abs(got - y_probe).max())


def test_train_cli_from_keras_end_to_end(whole_model_h5, tmp_path):
    """train.py --from-keras: synthetic NIfTI cases + ONLY data/schedule
    knobs in the config — the architecture comes from the .h5 — trains an
    epoch and checkpoints; rerunning against the fresh checkpoint without
    --overwrite is refused (resume vs import ambiguity)."""
    import train as train_cli
    from tests.synthetic import write_synthetic_dataset

    path = whole_model_h5[0]
    cases = str(tmp_path / "cases")
    write_synthetic_dataset(cases, n_cases=4, shape=(12, 12, 12))
    cfg = Config(image_shape=SHAPE, validation_patch_overlap=2,
                 training_patch_start_offset=(2, 2, 2),
                 batch_size=2, n_epochs=1, num_devices=1,
                 data_file=str(tmp_path / "data.h5"),
                 model_file=str(tmp_path / "model.ckpt"),
                 training_file=str(tmp_path / "training_ids.pkl"),
                 validation_file=str(tmp_path / "validation_ids.pkl"),
                 training_log=str(tmp_path / "training.log"))
    train_cli.main(cfg, cases, verbose=False, from_keras=path)
    assert os.path.exists(str(tmp_path / "model.ckpt"))
    assert os.path.exists(str(tmp_path / "training.log"))

    cfg2 = Config(**{**{f.name: getattr(cfg, f.name)
                        for f in __import__("dataclasses").fields(Config)}})
    with pytest.raises(SystemExit, match="from-keras"):
        train_cli.main(cfg2, cases, verbose=False, from_keras=path)


def test_predict_cli_from_keras_input(whole_model_h5, tmp_path):
    """predict.py --from-keras --input: one call, zero model config, a
    prediction.nii.gz on disk."""
    import predict as predict_cli
    from fetal_mri_segmentation_tpu.utils.nifti import load_nifti
    from tests.synthetic import write_synthetic_dataset

    path = whole_model_h5[0]
    cases = str(tmp_path / "cases")
    write_synthetic_dataset(cases, n_cases=1, shape=(12, 12, 12))
    base = Config(image_shape=SHAPE, validation_patch_overlap=2)
    out = str(tmp_path / "pred")
    predict_cli.main(base, output_dir=out, overlap=2,
                     inputs=[os.path.join(cases, "case_0")],
                     from_keras=path)
    pred = os.path.join(out, "case_0", "prediction.nii.gz")
    assert os.path.exists(pred)
    img = np.asarray(load_nifti(pred).dataobj)
    assert img.shape == SHAPE
    assert set(np.unique(img)) <= {0, 1}
