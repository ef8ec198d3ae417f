#!/usr/bin/env python
"""Per-case hard-Dice reporting: CSV + boxplot.

Reference surface: evaluate.py::main — glob prediction dirs, load truth vs
prediction NIfTIs, hard Dice per case per label → scores CSV (pandas), Dice
boxplot PNG (matplotlib), optional training-curve plot from training.log.
This defines the parity metric (SURVEY.md section 3.4). Device-free.

Merged-region evaluation (reference: the BRATS-era
`get_whole_tumor_mask`-style label masks — evaluate the UNION of several
labels as one binary mask): pass `--regions whole:1,2,4 core:1,4`.
Region Dice is robust to the nested-structure argmax failure documented
in docs/PARITY.md (multi-class failure mode 3): per-label Dice collapses
when argmax picks the wrong member of a nested pair, but their union is
still segmented correctly.

Usage:
    python evaluate.py [--prediction-dir prediction] [--labels 1]
                       [--regions whole:1,2 ...]
                       [--output scores.csv] [--training-log training.log]
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np
import pandas as pd

from fetal_mri_segmentation_tpu.ops.dice import hard_dice
from fetal_mri_segmentation_tpu.utils.nifti import load_nifti


def parse_regions(specs) -> dict:
    """['whole:1,2,4', 'core:1,4'] → {'whole': [1,2,4], 'core': [1,4]}."""
    regions = {}
    for spec in specs or ():
        name, sep, labs = spec.partition(":")
        name = name.strip()
        if not sep or not name or not labs.strip():
            raise SystemExit(
                f"bad --regions spec {spec!r}: expected NAME:LAB[,LAB...] "
                f"e.g. whole:1,2,4")
        try:
            label_list = [int(tok) for tok in labs.split(",") if tok.strip()]
        except ValueError:
            raise SystemExit(f"bad --regions spec {spec!r}: labels must be "
                             f"integers (got {labs!r})")
        if not label_list:
            # 'whole: ,' passes the labs.strip() check above but yields no
            # labels — an all-False mask would score empty-vs-empty Dice 1.0
            raise SystemExit(f"bad --regions spec {spec!r}: no label values "
                             f"(got {labs!r})")
        if name in regions:
            raise SystemExit(f"duplicate region name {name!r} in --regions")
        regions[name] = label_list
    return regions


def _region_mask(volume: np.ndarray, label_list) -> np.ndarray:
    return np.isin(volume, np.asarray(label_list))


def _check_prediction_is_label_map(pred: np.ndarray, case_dir: str):
    """Reject probability maps being scored as hard labels.

    `predict.py --prob-map` writes float probability volumes under the
    same prediction.nii.gz name (reference layout); scoring those with
    `truth == lab` silently produces garbage Dice. Detect the two
    prob-map signatures: 4-D multi-channel, or non-integer voxels.
    """
    if pred.ndim == 4 and pred.shape[-1] > 1:
        raise SystemExit(
            f"{case_dir}/prediction.nii.gz is 4-D ({pred.shape}) — this "
            "looks like a probability map (predict.py --prob-map), not a "
            "label map. Convert it first (tools/ensemble.py writes label "
            "maps) or re-run predict.py without --prob-map.")
    if pred.dtype.kind == "f" and not np.array_equal(pred, np.round(pred)):
        raise SystemExit(
            f"{case_dir}/prediction.nii.gz has non-integer voxel values — "
            "this looks like a probability map (predict.py --prob-map), "
            "not a label map. Convert it first (tools/ensemble.py writes "
            "label maps) or re-run predict.py without --prob-map.")


def evaluate_case(case_dir: str, labels, surface_metrics: bool = False,
                  regions: dict = None):
    truth_img = load_nifti(os.path.join(case_dir, "truth.nii.gz"))
    truth = truth_img.get_fdata()
    pred = load_nifti(os.path.join(case_dir, "prediction.nii.gz")).get_fdata()
    _check_prediction_is_label_map(pred, case_dir)
    row = {f"label_{lab}_dice": hard_dice(truth == lab, pred == lab)
           for lab in labels}
    regions = regions or {}
    for name, labs in regions.items():
        # merged-region (label-union) hard Dice — reference evaluate.py's
        # get_whole_tumor_mask-style masks (SURVEY §2 CLI-evaluate row)
        row[f"region_{name}_dice"] = hard_dice(_region_mask(truth, labs),
                                               _region_mask(pred, labs))
    if surface_metrics:
        # beyond-parity: boundary-error metrics in mm (the reference
        # reports overlap only); see utils/surface_metrics.py for the
        # empty-mask semantics
        from fetal_mri_segmentation_tpu.utils.surface_metrics import (
            surface_metric_pair, voxel_spacing_from_affine)
        spacing = voxel_spacing_from_affine(truth_img.affine)
        for lab in labels:
            hd95, assd_mm = surface_metric_pair(truth == lab, pred == lab,
                                                spacing)
            row[f"label_{lab}_hd95_mm"] = hd95
            row[f"label_{lab}_assd_mm"] = assd_mm
        for name, labs in regions.items():
            hd95, assd_mm = surface_metric_pair(_region_mask(truth, labs),
                                                _region_mask(pred, labs),
                                                spacing)
            row[f"region_{name}_hd95_mm"] = hd95
            row[f"region_{name}_assd_mm"] = assd_mm
    # deviation flag (see docs/PARITY.md): the reference's hard dice is NaN
    # on empty-vs-empty; ours scores 1.0 and marks the case instead, so
    # mean/boxplot aggregation stays finite without hiding the condition.
    row["empty_truth"] = int(all(not np.any(truth == lab) for lab in labels))
    return row


def main(prediction_dir: str, labels, output_csv: str,
         training_log: str = None, plot: bool = True,
         surface_metrics: bool = False, regions: dict = None):
    rows = {}
    no_truth = []
    for case_dir in sorted(glob.glob(os.path.join(prediction_dir, "*"))):
        if not os.path.isdir(case_dir):
            continue
        if not os.path.exists(os.path.join(case_dir, "prediction.nii.gz")):
            continue
        if not os.path.exists(os.path.join(case_dir, "truth.nii.gz")):
            # legitimate for serve.py output trees (new scans have no
            # ground truth) — skip with a note instead of a traceback
            no_truth.append(os.path.basename(case_dir))
            continue
        rows[os.path.basename(case_dir)] = evaluate_case(
            case_dir, labels, surface_metrics=surface_metrics,
            regions=regions)
    if no_truth:
        print(f"skipped {len(no_truth)} case(s) without truth.nii.gz "
              f"(nothing to score against): {', '.join(no_truth[:5])}"
              + (" ..." if len(no_truth) > 5 else ""))

    if not rows:
        raise SystemExit(
            f"no scorable prediction cases under {prediction_dir}"
            + (" — the cases there have predictions but no truth.nii.gz "
               "(serve.py trees are unscored; predict.py validation "
               "trees include the truth)" if no_truth else ""))

    df = pd.DataFrame.from_dict(rows, orient="index")
    df.to_csv(output_csv)
    print(df.describe().loc[["mean", "std", "min", "max"]])
    print(f"wrote {output_csv} ({len(df)} cases)")

    if plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        # Dice boxplot (reference: evaluate.py boxplot of per-label scores)
        fig, ax = plt.subplots(figsize=(6, 4))
        df[[c for c in df.columns if c.endswith("_dice")]].boxplot(ax=ax)
        ax.set_ylabel("Dice coefficient")
        ax.set_title("Per-case hard Dice")
        fig.tight_layout()
        fig.savefig(os.path.splitext(output_csv)[0] + "_boxplot.png", dpi=120)

        # training curves from training.log (reference: loss graph PNG)
        if training_log and os.path.exists(training_log):
            log = pd.read_csv(training_log)
            fig, ax = plt.subplots(figsize=(6, 4))
            for col in ("loss", "val_loss"):
                if col in log:
                    ax.plot(log["epoch"], log[col], label=col)
            ax.set_xlabel("epoch")
            ax.set_ylabel("loss (negative dice)")
            ax.legend()
            fig.tight_layout()
            fig.savefig(os.path.splitext(training_log)[0] + "_curves.png",
                        dpi=120)
    return df


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--prediction-dir", default="prediction")
    ap.add_argument("--labels", type=int, nargs="+", default=[1])
    ap.add_argument("--output", default="scores.csv")
    ap.add_argument("--training-log", default="training.log")
    ap.add_argument("--no-plot", action="store_true")
    ap.add_argument("--surface-metrics", action="store_true",
                    help="add HD95 and ASSD columns (mm; boundary error "
                         "the Dice overlap score cannot see)")
    ap.add_argument("--regions", nargs="+", metavar="NAME:LAB[,LAB...]",
                    help="merged-region (label-union) masks to score as one "
                         "binary mask each, e.g. --regions whole:1,2,4 "
                         "core:1,4 (reference: get_whole_tumor_mask-style "
                         "BRATS region evaluation)")
    args = ap.parse_args()
    main(args.prediction_dir, args.labels, args.output,
         training_log=args.training_log, plot=not args.no_plot,
         surface_metrics=args.surface_metrics,
         regions=parse_regions(args.regions))
