#!/usr/bin/env python
"""Multi-class end-to-end quality loop: train → predict → evaluate.

The reference's multi-class surface (one-hot labels → softmax + weighted
dice → argmax → labels[i]; reference: generator.py::get_multi_class_labels,
metrics.py::weighted_dice_coefficient_loss,
prediction.py::get_prediction_labels) demonstrated to convergence on
synthetic 3-structure volumes: outer shell (label 1), core (label 2) and a
disjoint nodule (label 4), plus an explicit background channel (label 0)
so the softmax partition is well-posed. Runs the REAL CLIs (train.py /
predict.py / evaluate.py mains) on a held-out split; the committed result
table lives in docs/PARITY.md.

    python tools/multiclass_quality.py [--out-dir /tmp/mc_quality]
                                       [--epochs 40]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

IMAGE = (32, 32, 32)
N_CASES = 24
LABELS = (0, 1, 2, 4)  # explicit background channel for softmax
FOREGROUND = (1, 2, 4)


def make_config(out_dir: str, epochs: int):
    from fetal_mri_segmentation_tpu.config import Config

    return Config(model_name="unet", depth=3, n_base_filters=8,
                  image_shape=IMAGE, patch_shape=IMAGE,  # whole-volume
                  n_labels=len(LABELS), labels=LABELS,
                  activation_name="softmax",
                  include_label_wise_dice_coefficients=True,
                  batch_size=3, validation_batch_size=3,
                  n_epochs=epochs, early_stop=0, patience=epochs,
                  initial_learning_rate=5e-4, validation_split=0.75,
                  skip_blank=False,
                  data_file=os.path.join(out_dir, "data.h5"),
                  model_file=os.path.join(out_dir, "model.ckpt"),
                  training_file=os.path.join(out_dir, "training_ids.pkl"),
                  validation_file=os.path.join(out_dir, "validation_ids.pkl"),
                  training_log=os.path.join(out_dir, "training.log"))


def main(out_dir: str, epochs: int):
    from synthetic import write_multiclass_dataset

    os.makedirs(out_dir, exist_ok=True)
    cases_dir = os.path.join(out_dir, "cases")
    write_multiclass_dataset(cases_dir, n_cases=N_CASES, shape=(36, 36, 36))
    cfg = make_config(out_dir, epochs)
    cfg.save(os.path.join(out_dir, "config.json"))

    import train as train_cli
    train_cli.main(cfg, cases_dir, overwrite=False, verbose=True)

    import predict as predict_cli
    pred_dir = os.path.join(out_dir, "prediction")
    predict_cli.main(cfg, output_dir=pred_dir)

    import evaluate as evaluate_cli
    scores_csv = os.path.join(out_dir, "scores.csv")
    evaluate_cli.main(pred_dir, list(FOREGROUND), scores_csv,
                      training_log=cfg.training_log, plot=False)

    # summarize per-label held-out hard Dice
    import csv
    with open(scores_csv) as f:
        rows = list(csv.DictReader(f))
    print(f"\nheld-out cases: {len(rows)}")
    summary = {}
    for lab in FOREGROUND:
        vals = [float(r[f"label_{lab}_dice"]) for r in rows]
        summary[lab] = (float(np.mean(vals)), float(np.min(vals)))
        print(f"label {lab}: mean dice {np.mean(vals):.4f} "
              f"min {np.min(vals):.4f}")
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump({str(k): v for k, v in summary.items()}, f, indent=1)
    ok = all(m >= 0.95 for m, _ in summary.values())
    print("PASS: all labels >= 0.95 mean held-out dice" if ok
          else "BELOW TARGET")
    return summary


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out-dir", default="/tmp/mc_quality")
    ap.add_argument("--epochs", type=int, default=40)
    args = ap.parse_args()
    main(args.out_dir, args.epochs)
