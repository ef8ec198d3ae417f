"""Multi-modality (n_channels > 1) end-to-end coverage.

The reference trains on a configurable list of modalities stacked on the
channel axis (reference: train.py config["training_modalities"] →
data.py::write_data_to_file storing (N, n_channels, *shape); generator
feeds all channels; prediction.py::run_validation_case dumps one
data_<modality>.nii.gz per input channel). This exercises the same
contract through our stack with two modalities.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fetal_mri_segmentation_tpu.config import Config
from fetal_mri_segmentation_tpu.data import open_data_file, write_data_to_file
from fetal_mri_segmentation_tpu.inference import (SlidingWindowPredictor,
                                                  run_validation_cases)
from fetal_mri_segmentation_tpu.models import build_model
from fetal_mri_segmentation_tpu.pipeline import (
    get_training_and_validation_generators)
from fetal_mri_segmentation_tpu.training import (create_train_state,
                                                 make_train_step)
from fetal_mri_segmentation_tpu.utils.io_utils import pickle_dump
from fetal_mri_segmentation_tpu.utils.nifti import load_nifti
from tests.synthetic import write_synthetic_dataset

MODALITIES = ("t2", "flair")


def _build(tmp_path):
    files = write_synthetic_dataset(str(tmp_path / "nii"), n_cases=4,
                                    shape=(20, 20, 20),
                                    modalities=MODALITIES)
    h5p = str(tmp_path / "d.h5")
    write_data_to_file(files, h5p, image_shape=(16, 16, 16),
                       normalize="per_volume", crop=False)
    return files, h5p


def _config(**kw):
    defaults = dict(model_name="unet", depth=2, n_base_filters=2,
                    patch_shape=(16, 16, 16), image_shape=(16, 16, 16),
                    batch_size=2, compute_dtype="float32", augment=False,
                    all_modalities=MODALITIES,
                    initial_learning_rate=1e-2)
    defaults.update(kw)
    return Config(**defaults)


def test_two_modalities_stored_and_generated(tmp_path):
    """HDF5 stores (N, 2, *shape); the generator yields 2-channel batches."""
    _, h5p = _build(tmp_path)
    cfg = _config()
    assert cfg.nb_channels == 2
    with open_data_file(h5p) as f:
        assert f.root.data.shape[1] == 2
        train_gen, n_steps, _, _ = get_training_and_validation_generators(
            f, batch_size=2, n_labels=1,
            training_keys_file=str(tmp_path / "t.pkl"),
            validation_keys_file=str(tmp_path / "v.pkl"),
            data_split=0.75, patch_shape=None, skip_blank=False)
        x, y = next(train_gen)
        assert x.shape == (2, 2, 16, 16, 16)
        assert y.shape == (2, 1, 16, 16, 16)


def test_two_modality_train_and_predict(tmp_path):
    """Jitted step trains a 2-channel model; sliding-window predicts from a
    (2, D, H, W) volume; run_validation_cases dumps one NIfTI per modality."""
    _, h5p = _build(tmp_path)
    cfg = _config()
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, cfg)

    rng = np.random.default_rng(0)
    y = np.zeros((2, 1, 16, 16, 16), np.float32)
    y[:, :, 4:12, 4:12, 4:12] = 1.0
    x = np.stack([y[:, 0] * 2, y[:, 0] * -1], axis=1) + rng.normal(
        0, 0.3, (2, 2, 16, 16, 16))
    x = x.astype(np.float32)
    for i in range(3):
        state, m = step(state, jnp.asarray(x), jnp.asarray(y),
                        jax.random.PRNGKey(i))
    assert np.isfinite(float(m["loss"]))

    variables = {"params": state.params}
    pred = SlidingWindowPredictor(model, cfg, image_shape=(16, 16, 16),
                                  overlap=4)
    lab = pred.predict_labels(variables, x[0])
    assert lab.shape == (16, 16, 16) and lab.dtype == np.uint8

    keys = str(tmp_path / "v.pkl")
    pickle_dump([0, 1], keys)
    with open_data_file(h5p) as f:
        run_validation_cases(keys, model, variables, f, cfg,
                             output_dir=str(tmp_path / "pred"), overlap=4)
    case = tmp_path / "pred" / "validation_case_0"
    for m_ in MODALITIES:
        img = load_nifti(str(case / f"data_{m_}.nii.gz")).get_fdata()
        assert img.shape == (16, 16, 16)
    assert (case / "prediction.nii.gz").exists()
