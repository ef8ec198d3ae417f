#!/usr/bin/env python
"""Multi-class end-to-end quality loop: train → predict → evaluate.

The reference's multi-class surface (one-hot labels → per-label channels +
weighted dice → argmax → labels[i]; reference: generator.py::
get_multi_class_labels, metrics.py::weighted_dice_coefficient_loss,
prediction.py::get_prediction_labels) demonstrated to convergence on
synthetic 3-structure volumes: outer shell (label 1), core (label 2) and a
disjoint nodule (label 4). Default mode is the reference's default
activation (sigmoid — independent channels); --softmax runs the
softmax+background variant, which reproducibly KILLS the smallest
structure's channel (weighted dice through a softmax has zero gradient
once a channel's probability underflows — a failure mode shared with the
reference's loss; documented in docs/PARITY.md). Runs the REAL CLIs
(train.py / predict.py / evaluate.py mains) on a held-out split.

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

IMAGE = (40, 40, 40)
N_CASES = 24
# Reference-default multi-class mode: one sigmoid channel per label +
# weighted dice (unet_model_3d(activation_name="sigmoid") — channels are
# independent, so no channel can die). The softmax+background variant
# (labels (0,1,2,4)) is measured separately via --softmax: weighted dice
# through a softmax PERMANENTLY kills any channel whose probability
# underflows early (gradient ∝ p → 0) — a failure mode shared with the
# reference's loss; see docs/PARITY.md.
LABELS = (1, 2, 4)
FOREGROUND = (1, 2, 4)


def make_config(out_dir: str, epochs: int, softmax: bool = False,
                distort: float = None):
    from fetal_mri_segmentation_tpu.config import Config

    labels = (0,) + LABELS if softmax else LABELS
    return Config(model_name="unet", depth=3, n_base_filters=8,
                  distort=distort,
                  image_shape=IMAGE, patch_shape=IMAGE,  # whole-volume
                  n_labels=len(labels), labels=labels,
                  activation_name="softmax" if softmax else "sigmoid",
                  include_label_wise_dice_coefficients=True,
                  batch_size=3, validation_batch_size=3,
                  n_epochs=epochs, early_stop=0, patience=epochs,
                  initial_learning_rate=5e-4, validation_split=0.75,
                  skip_blank=False, validation_patch_overlap=0,
                  data_file=os.path.join(out_dir, "data.h5"),
                  model_file=os.path.join(out_dir, "model.ckpt"),
                  training_file=os.path.join(out_dir, "training_ids.pkl"),
                  validation_file=os.path.join(out_dir, "validation_ids.pkl"),
                  training_log=os.path.join(out_dir, "training.log"))


def main(out_dir: str, epochs: int, softmax: bool = False,
         distort: float = None):
    from synthetic import write_multiclass_dataset

    os.makedirs(out_dir, exist_ok=True)
    cases_dir = os.path.join(out_dir, "cases")
    write_multiclass_dataset(cases_dir, n_cases=N_CASES, shape=(40, 40, 40))
    cfg = make_config(out_dir, epochs, softmax=softmax, distort=distort)
    cfg.save(os.path.join(out_dir, "config.json"))

    import time as _time
    t0 = _time.perf_counter()
    import train as train_cli
    train_cli.main(cfg, cases_dir, overwrite=False, verbose=True)
    train_wall = _time.perf_counter() - t0
    print(f"train wall: {train_wall:.1f} s (distort={distort})")

    import predict as predict_cli
    pred_dir = os.path.join(out_dir, "prediction")
    # patch_shape == image_shape: a nonzero overlap would predict through
    # 8 shifted, half-out-of-volume patches (distribution shift at the
    # zero-padded borders); one centered whole-volume patch is the match
    # for how the model trained
    predict_cli.main(cfg, output_dir=pred_dir, overlap=0)

    import evaluate as evaluate_cli
    scores_csv = os.path.join(out_dir, "scores.csv")
    # merged-region row alongside per-label Dice: the union mask is how
    # the reference's BRATS-era evaluate scores nested structures, and it
    # is robust to the argmax failure (PARITY mode 3) where a shell claims
    # its nested core — per-label core Dice collapses, region Dice doesn't
    regions = {"whole": list(FOREGROUND)}
    evaluate_cli.main(pred_dir, list(FOREGROUND), scores_csv,
                      training_log=cfg.training_log, plot=False,
                      regions=regions)

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
    for name in regions:
        vals = [float(r[f"region_{name}_dice"]) for r in rows]
        summary[f"region_{name}"] = (float(np.mean(vals)), float(np.min(vals)))
        print(f"region {name}: mean dice {np.mean(vals):.4f} "
              f"min {np.min(vals):.4f}")
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump({**{str(k): v for k, v in summary.items()},
                   "train_wall_s": round(train_wall, 1),
                   "distort": distort}, f, indent=1)
    ok = all(m >= 0.95 for m, _ in summary.values())
    print("PASS: all labels >= 0.95 mean held-out dice" if ok
          else "BELOW TARGET")
    return summary


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out-dir", default="/tmp/mc_quality")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--softmax", action="store_true",
                    help="softmax + explicit background channel variant "
                         "(demonstrates the dead-channel failure mode)")
    ap.add_argument("--distort", type=float, default=None,
                    help="enable scale-distortion augmentation (the "
                         "reference generator's default is 0.25; ours is "
                         "off — docs/PARITY.md deviation row)")
    args = ap.parse_args()
    main(args.out_dir, args.epochs, softmax=args.softmax,
         distort=args.distort)
