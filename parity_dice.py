#!/usr/bin/env python
"""Dice-parity harness: this framework vs CPU-Keras on one synthetic set.

BASELINE's quality axis is "per-case Dice parity with the reference"
(BASELINE.md; SURVEY.md section 3.4 names evaluate.py as the parity metric).
The reference itself is a Keras pipeline, so the measurement is: train the
SAME depth-3 U-Net config in both frameworks on the SAME HDF5 dataset and
split pickles, predict the SAME validation cases, and compare the per-case
hard Dice that evaluate.py reports.

  python parity_dice.py [--out-dir /tmp/parity] [--epochs 30]

Writes <out-dir>/parity_dice.csv (per-case: ours, keras, delta) and prints a
summary; the committed result table lives in docs/PARITY.md.

Kept small enough for the 1-core CPU Keras side: 12 ellipsoid cases at
32^3, whole-volume training (patch_shape == image_shape), n_base_filters=8.
Weight inits differ between frameworks, so parity is statistical
(|delta mean| within run-to-run noise), not bitwise.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tests"))

IMAGE = (32, 32, 32)
N_CASES = 12
LR = 5e-4


def build_dataset(out_dir: str):
    from fetal_mri_segmentation_tpu.data import write_data_to_file
    from synthetic import write_synthetic_dataset

    files = write_synthetic_dataset(os.path.join(out_dir, "cases"),
                                    n_cases=N_CASES, shape=(36, 36, 36))
    h5 = os.path.join(out_dir, "data.h5")
    if not os.path.exists(h5):
        write_data_to_file(files, h5, image_shape=IMAGE,
                           normalize="per_volume", crop=False)
    return h5


def make_config(out_dir: str, h5: str, epochs: int):
    from fetal_mri_segmentation_tpu.config import Config

    return Config(model_name="unet", depth=3, n_base_filters=8,
                  image_shape=IMAGE, patch_shape=IMAGE,  # whole-volume
                  batch_size=3, validation_batch_size=3,
                  n_epochs=epochs, early_stop=0, patience=epochs,
                  initial_learning_rate=LR, validation_split=0.75,
                  augment=False, flip=False, permute=False, contrast=None,
                  skip_blank=False, validation_patch_overlap=0,
                  training_patch_start_offset=None,
                  data_file=h5,
                  model_file=os.path.join(out_dir, "ours.ckpt"),
                  training_file=os.path.join(out_dir, "training_ids.pkl"),
                  validation_file=os.path.join(out_dir, "validation_ids.pkl"),
                  training_log=os.path.join(out_dir, "ours_training.log"))


def train_and_predict_ours(config, h5: str, out_dir: str):
    import jax

    from fetal_mri_segmentation_tpu.data import open_data_file
    from fetal_mri_segmentation_tpu.inference import run_validation_cases
    from fetal_mri_segmentation_tpu.models import build_model
    from fetal_mri_segmentation_tpu.pipeline import (
        get_training_and_validation_generators)
    from fetal_mri_segmentation_tpu.training import (create_train_state,
                                                     train_model)

    with open_data_file(h5) as data_file:
        model = build_model(config)
        state = create_train_state(model, config, jax.random.PRNGKey(0))
        tg, n_train, vg, n_val = get_training_and_validation_generators(
            data_file, batch_size=config.batch_size, n_labels=config.n_labels,
            training_keys_file=config.training_file,
            validation_keys_file=config.validation_file,
            data_split=config.validation_split, labels=config.labels,
            patch_shape=config.patch_shape,
            validation_batch_size=config.validation_batch_size,
            skip_blank=config.skip_blank, seed=0)
        state = train_model(model, state, config, tg, vg, n_train, n_val,
                            verbose=False)
        pred_dir = os.path.join(out_dir, "ours_prediction")
        run_validation_cases(config.validation_file, model,
                             {"params": state.params}, data_file, config,
                             output_dir=pred_dir, overlap=0)
    return pred_dir


def train_and_predict_keras(config, h5: str, out_dir: str, epochs: int):
    from baseline_keras import build_keras_unet3d
    from fetal_mri_segmentation_tpu.data import open_data_file
    from fetal_mri_segmentation_tpu.utils.io_utils import pickle_load
    from fetal_mri_segmentation_tpu.utils.nifti import save_nifti

    kmodel = build_keras_unet3d(depth=3, n_base_filters=8, input_shape=IMAGE,
                                learning_rate=LR)
    train_ids = pickle_load(config.training_file)
    val_ids = pickle_load(config.validation_file)
    with open_data_file(h5) as f:
        data = np.asarray(f.root.data[:], np.float32)      # (N, 1, *IMAGE)
        truth = (np.asarray(f.root.truth[:]) > 0).astype(np.float32)
        affines = np.asarray(f.root.affine[:])
    x = np.transpose(data, (0, 2, 3, 4, 1))                # NDHWC
    y = np.transpose(truth, (0, 2, 3, 4, 1))
    kmodel.fit(x[train_ids], y[train_ids], batch_size=config.batch_size,
               epochs=epochs, shuffle=True, verbose=0)

    pred_dir = os.path.join(out_dir, "keras_prediction")
    probs = kmodel.predict(x[val_ids], batch_size=config.batch_size,
                           verbose=0)
    for idx, prob in zip(val_ids, probs):
        case_dir = os.path.join(pred_dir, f"validation_case_{idx}")
        os.makedirs(case_dir, exist_ok=True)
        save_nifti(truth[idx, 0].astype(np.uint8),
                   os.path.join(case_dir, "truth.nii.gz"),
                   affine=affines[idx])
        save_nifti((prob[..., 0] > 0.5).astype(np.uint8),
                   os.path.join(case_dir, "prediction.nii.gz"),
                   affine=affines[idx])
    return pred_dir


def main(out_dir: str, epochs: int):
    import evaluate as evaluate_cli

    os.makedirs(out_dir, exist_ok=True)
    h5 = build_dataset(out_dir)
    config = make_config(out_dir, h5, epochs)

    ours_dir = train_and_predict_ours(config, h5, out_dir)
    keras_dir = train_and_predict_keras(config, h5, out_dir, epochs)

    df_ours = evaluate_cli.main(ours_dir, labels=[1],
                                output_csv=os.path.join(out_dir, "ours.csv"),
                                plot=False)
    df_keras = evaluate_cli.main(keras_dir, labels=[1],
                                 output_csv=os.path.join(out_dir, "keras.csv"),
                                 plot=False)
    merged = df_ours[["label_1_dice"]].rename(
        columns={"label_1_dice": "ours_dice"}).join(
        df_keras[["label_1_dice"]].rename(
            columns={"label_1_dice": "keras_dice"}))
    merged["delta"] = merged["ours_dice"] - merged["keras_dice"]
    csv_path = os.path.join(out_dir, "parity_dice.csv")
    merged.to_csv(csv_path)
    summary = {"ours_mean_dice": round(float(merged["ours_dice"].mean()), 4),
               "keras_mean_dice": round(float(merged["keras_dice"].mean()), 4),
               "delta_mean": round(float(merged["delta"].mean()), 4),
               "n_val_cases": int(len(merged)),
               "epochs": epochs}
    print(merged)
    print(json.dumps(summary))
    return merged, summary


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out-dir", default="/tmp/parity_dice")
    ap.add_argument("--epochs", type=int, default=30)
    args = ap.parse_args()
    main(args.out_dir, args.epochs)
