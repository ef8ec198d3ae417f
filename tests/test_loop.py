"""End-to-end epoch-loop integration test on synthetic data
(SURVEY.md section 4 integration row): train -> log -> checkpoint -> resume."""

import os

import jax
import numpy as np
import pytest

from fetal_mri_segmentation_tpu.config import Config
from fetal_mri_segmentation_tpu.data import open_data_file, write_data_to_file
from fetal_mri_segmentation_tpu.models import build_model
from fetal_mri_segmentation_tpu.pipeline import (
    get_training_and_validation_generators)
from fetal_mri_segmentation_tpu.training import (
    CheckpointIO, create_train_state, train_model)
from tests.synthetic import write_synthetic_dataset


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("loop")
    files = write_synthetic_dataset(str(d / "nii"), n_cases=4,
                                    shape=(20, 20, 20))
    write_data_to_file(files, str(d / "data.h5"), image_shape=(16, 16, 16),
                       normalize="per_volume", crop=False)
    return d


def make_cfg(d, **kw):
    defaults = dict(
        image_shape=(16, 16, 16), patch_shape=(8, 8, 8), depth=2,
        n_base_filters=2, batch_size=4, validation_batch_size=4, n_epochs=2,
        compute_dtype="float32", augment=True, flip=True, permute=True,
        contrast=0.1, initial_learning_rate=1e-2, early_stop=50,
        data_file=str(d / "data.h5"), model_file=str(d / "model.ckpt"),
        training_file=str(d / "t.pkl"), validation_file=str(d / "v.pkl"),
        training_log=str(d / "training.log"))
    defaults.update(kw)
    return Config(**defaults)


def test_train_model_end_to_end_and_resume(workdir):
    d = workdir
    cfg = make_cfg(d)
    model = build_model(cfg)
    data_file = open_data_file(cfg.data_file)
    try:
        tg, n_t, vg, n_v = get_training_and_validation_generators(
            data_file, batch_size=cfg.batch_size, n_labels=1,
            training_keys_file=cfg.training_file,
            validation_keys_file=cfg.validation_file,
            data_split=0.75, overwrite=True, patch_shape=cfg.patch_shape,
            validation_batch_size=cfg.validation_batch_size,
            training_patch_start_offset=(2, 2, 2), skip_blank=True, seed=0)

        state = create_train_state(model, cfg, jax.random.PRNGKey(0))
        state = train_model(model, state, cfg, tg, vg, n_t, n_v,
                            verbose=False)

        # CSV log written with the expected columns
        assert os.path.exists(cfg.training_log)
        header = open(cfg.training_log).readline().strip().split(",")
        for col in ("epoch", "loss", "val_loss", "dice_coefficient",
                    "val_dice_coefficient", "lr", "patches_per_sec"):
            assert col in header
        n_rows = sum(1 for _ in open(cfg.training_log)) - 1
        assert n_rows == 2

        # best checkpoint saved
        assert CheckpointIO(cfg.model_file).exists()

        # resume: runs epochs 2.. from the checkpoint without error
        cfg2 = make_cfg(d, n_epochs=3)
        state2 = create_train_state(model, cfg2, jax.random.PRNGKey(0))
        state2 = train_model(model, state2, cfg2, tg, vg, n_t, n_v,
                             verbose=False)
        assert int(state2.step) > 0
    finally:
        data_file.close()


def test_train_model_multi_device_mesh(workdir):
    """Same loop through the DP path on the virtual 8-device mesh."""
    from fetal_mri_segmentation_tpu.parallel import make_mesh

    d = workdir
    cfg = make_cfg(d, model_file=str(d / "model_dp.ckpt"),
                   training_log=str(d / "training_dp.log"),
                   batch_size=8, validation_batch_size=8, n_epochs=1)
    model = build_model(cfg)
    data_file = open_data_file(cfg.data_file)
    try:
        tg, n_t, vg, n_v = get_training_and_validation_generators(
            data_file, batch_size=cfg.batch_size, n_labels=1,
            training_keys_file=str(d / "t_dp.pkl"),
            validation_keys_file=str(d / "v_dp.pkl"),
            data_split=0.75, overwrite=True, patch_shape=cfg.patch_shape,
            validation_batch_size=cfg.validation_batch_size,
            skip_blank=True, seed=0)
        state = create_train_state(model, cfg, jax.random.PRNGKey(0))
        state = train_model(model, state, cfg, tg, vg, n_t, n_v,
                            mesh=make_mesh(8), verbose=False)
        assert os.path.exists(cfg.training_log)
    finally:
        data_file.close()


def test_resume_preserves_dropped_learning_rate(workdir, tmp_path):
    """A resumed run must keep the checkpoint's (dropped) LR — the plateau
    scheduler is rebuilt from the RESTORED state, not the fresh config."""
    from fetal_mri_segmentation_tpu.training import CheckpointIO

    d = tmp_path
    cfg = make_cfg(workdir, model_file=str(d / "m.ckpt"),
                   training_log=str(d / "log.csv"), n_epochs=1)
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    # simulate a mid-training checkpoint with a dropped LR
    state = state.set_learning_rate(cfg.initial_learning_rate * 0.25)
    CheckpointIO(cfg.model_file).save(state, epoch=1, best_val=-0.3)

    data_file = open_data_file(cfg.data_file)
    try:
        tg, n_t, vg, n_v = get_training_and_validation_generators(
            data_file, batch_size=cfg.batch_size, n_labels=1,
            training_keys_file=str(d / "t.pkl"),
            validation_keys_file=str(d / "v.pkl"),
            data_split=0.75, overwrite=True, patch_shape=cfg.patch_shape,
            validation_batch_size=cfg.validation_batch_size,
            skip_blank=True, seed=0)
        cfg2 = make_cfg(workdir, model_file=str(d / "m.ckpt"),
                        training_log=str(d / "log.csv"), n_epochs=2)
        fresh = create_train_state(model, cfg2, jax.random.PRNGKey(0))
        out_state = train_model(model, fresh, cfg2, tg, vg, n_t, n_v,
                                verbose=False)
        # lr stayed at (or below) the restored dropped value
        assert out_state.learning_rate <= cfg.initial_learning_rate * 0.25 + 1e-12
    finally:
        data_file.close()


def test_detect_dice_collapse():
    """Saturation-collapse detector: fires only after `patience` consecutive
    near-zero training-dice epochs (the lr-too-high soft-Dice failure mode;
    see training/loop.py::detect_dice_collapse)."""
    from fetal_mri_segmentation_tpu.training.loop import detect_dice_collapse

    assert not detect_dice_collapse([])
    assert not detect_dice_collapse([0.001, 0.002])          # too short
    assert detect_dice_collapse([0.001, 0.002, 0.0005])      # 3 low epochs
    assert not detect_dice_collapse([0.001, 0.3, 0.0005])    # interrupted
    # healthy-then-collapsed history: the window is the LAST 3 epochs
    assert detect_dice_collapse([0.9, 0.95, 0.002, 0.001, 0.003])
    # healthy run never fires
    assert not detect_dice_collapse([0.1, 0.5, 0.8, 0.9])
