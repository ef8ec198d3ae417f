"""Multi-class end-to-end: one-hot pipeline, weighted dice training,
argmax label-map prediction, per-label evaluation (reference BRATS-legacy
multi-label path: generator.py::get_multi_class_labels +
prediction.py::get_prediction_labels + metrics.py weighted dice)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fetal_mri_segmentation_tpu.config import Config
from fetal_mri_segmentation_tpu.data import open_data_file, write_data_to_file
from fetal_mri_segmentation_tpu.inference import SlidingWindowPredictor
from fetal_mri_segmentation_tpu.models import build_model
from fetal_mri_segmentation_tpu.ops.dice import hard_dice
from fetal_mri_segmentation_tpu.pipeline import data_generator
from fetal_mri_segmentation_tpu.training import (create_train_state,
                                                 make_train_step)
from fetal_mri_segmentation_tpu.utils.nifti import save_nifti


@pytest.fixture(scope="module")
def multiclass_h5(tmp_path_factory):
    """Cases with nested labels: 5 = outer shell ('body'), 2 = core ('brain')."""
    d = tmp_path_factory.mktemp("mc")
    files = []
    for i in range(3):
        rng = np.random.default_rng(i)
        zz, yy, xx = np.mgrid[:20, :20, :20]
        r2 = (zz - 10) ** 2 + (yy - 10) ** 2 + (xx - 10) ** 2
        truth = np.zeros((20, 20, 20), np.uint8)
        truth[r2 < 64] = 5
        truth[r2 < 16] = 2
        vol = (truth == 5) * 1.0 + (truth == 2) * 3.0 + rng.normal(
            0, 0.2, truth.shape)
        case = d / f"case_{i}"
        case.mkdir()
        save_nifti(vol.astype(np.float32), str(case / "volume.nii.gz"))
        save_nifti(truth, str(case / "truth.nii.gz"))
        files.append([str(case / "volume.nii.gz"), str(case / "truth.nii.gz")])
    out = str(d / "mc.h5")
    write_data_to_file(files, out, image_shape=(16, 16, 16),
                       normalize="per_volume", crop=False)
    f = open_data_file(out)
    yield f
    f.close()


def test_multiclass_end_to_end(multiclass_h5):
    cfg = Config(model_name="unet", depth=2, n_base_filters=4,
                 patch_shape=(16, 16, 16), image_shape=(16, 16, 16),
                 # sigmoid (the reference default): per-channel independent
                 # probabilities + threshold-then-argmax — softmax would be
                 # wrong here because background belongs to NEITHER label
                 n_labels=2, labels=(2, 5), activation_name="sigmoid",
                 batch_size=2, compute_dtype="float32", augment=False,
                 include_label_wise_dice_coefficients=True,
                 initial_learning_rate=5e-3)
    # one-hot expansion via the generator (whole-volume "patches")
    gen = data_generator(multiclass_h5, [0, 1, 2], batch_size=2, n_labels=2,
                         labels=(2, 5), patch_shape=None, skip_blank=True,
                         seed=0)
    x, y = next(gen)
    assert y.shape[1] == 2
    assert set(np.unique(y)).issubset({0.0, 1.0})
    # nested labels: core voxels are label-2-channel only
    assert (y[:, 0] * y[:, 1]).sum() == 0

    # weighted-dice training improves (config-#4-style loss on multi-class)
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, cfg)
    rng = jax.random.PRNGKey(0)
    first = last = None
    for i in range(150):
        rng, k = jax.random.split(rng)
        state, m = step(state, jnp.asarray(x), jnp.asarray(y), k, None)
        if first is None:
            first = float(m["loss"])
        last = float(m["loss"])
    assert last < first
    assert "label_0_dice_coef" in m and "label_1_dice_coef" in m

    # argmax label-map prediction path produces the configured label values
    pred = SlidingWindowPredictor(model, cfg, image_shape=(16, 16, 16),
                                  patch_shape=(16, 16, 16), overlap=0,
                                  patch_batch_size=1)
    data = np.asarray(multiclass_h5.root.data[0], np.float32)
    labels = pred.predict_labels({"params": state.params}, data)
    assert labels.dtype == np.uint8
    assert set(np.unique(labels)).issubset({0, 2, 5})

    # quality signal: core label recovers reasonably after 60 steps
    truth = np.asarray(multiclass_h5.root.truth[0][0])
    d2 = hard_dice(truth == 2, labels == 2)
    d5 = hard_dice(truth == 5, labels == 5)
    assert d2 > 0.5 and d5 > 0.3, (d2, d5)
