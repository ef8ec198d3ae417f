"""evaluate.py CLI semantics: per-case hard-Dice CSV (SURVEY.md section 3.4)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import evaluate
from fetal_mri_segmentation_tpu.utils.nifti import save_nifti


@pytest.fixture
def prediction_tree(tmp_path):
    """Two fake cases with known overlap."""
    for name, (t_sl, p_sl) in {
        "case_a": (slice(0, 4), slice(0, 4)),     # perfect -> dice 1
        "case_b": (slice(0, 4), slice(2, 6)),     # half overlap -> dice 0.5
    }.items():
        d = tmp_path / name
        d.mkdir()
        truth = np.zeros((8, 8, 8), np.uint8)
        pred = np.zeros((8, 8, 8), np.uint8)
        truth[t_sl] = 1
        pred[p_sl] = 1
        save_nifti(truth, str(d / "truth.nii.gz"))
        save_nifti(pred, str(d / "prediction.nii.gz"))
    return tmp_path


def test_evaluate_scores_csv(prediction_tree, tmp_path):
    out = str(tmp_path / "scores.csv")
    df = evaluate.main(str(prediction_tree), labels=[1], output_csv=out,
                       plot=False)
    assert sorted(df.index) == ["case_a", "case_b"]
    assert abs(df.loc["case_a", "label_1_dice"] - 1.0) < 1e-12
    assert abs(df.loc["case_b", "label_1_dice"] - 0.5) < 1e-12
    assert os.path.exists(out)


def test_evaluate_plots(prediction_tree, tmp_path):
    out = str(tmp_path / "scores.csv")
    # training log for the curves plot
    log = tmp_path / "training.log"
    log.write_text("epoch,loss,val_loss\n0,-0.1,-0.08\n1,-0.3,-0.2\n")
    evaluate.main(str(prediction_tree), labels=[1], output_csv=out,
                  training_log=str(log), plot=True)
    assert os.path.exists(str(tmp_path / "scores_boxplot.png"))
    assert os.path.exists(str(tmp_path / "training_curves.png"))


def test_evaluate_empty_dir_errors(tmp_path):
    with pytest.raises(SystemExit, match="no scorable prediction cases"):
        evaluate.main(str(tmp_path / "nothing"), labels=[1],
                      output_csv=str(tmp_path / "s.csv"), plot=False)


def test_evaluate_skips_truthless_cases(tmp_path, capsys):
    """A serve.py output tree (prediction.nii.gz, no truth) must be skipped
    with a note — and explained, not a FileNotFoundError traceback, when
    nothing is scorable."""
    import numpy as np

    from fetal_mri_segmentation_tpu.utils.nifti import save_nifti

    served = tmp_path / "served" / "case_a"
    served.mkdir(parents=True)
    save_nifti(np.ones((4, 4, 4), np.uint8), str(served / "prediction.nii.gz"))
    with pytest.raises(SystemExit, match="no truth.nii.gz"):
        evaluate.main(str(tmp_path / "served"), labels=[1],
                      output_csv=str(tmp_path / "s.csv"), plot=False)
    assert "skipped 1 case(s) without truth" in capsys.readouterr().out

    # mixed tree: scorable cases still score, truthless ones are skipped
    scored = tmp_path / "served" / "case_b"
    scored.mkdir()
    save_nifti(np.ones((4, 4, 4), np.uint8), str(scored / "prediction.nii.gz"))
    save_nifti(np.ones((4, 4, 4), np.uint8), str(scored / "truth.nii.gz"))
    evaluate.main(str(tmp_path / "served"), labels=[1],
                  output_csv=str(tmp_path / "s.csv"), plot=False)
    import csv
    with open(tmp_path / "s.csv") as f:
        names = [r[0] for r in csv.reader(f)][1:]
    assert names == ["case_b"]


def test_parse_regions():
    from evaluate import parse_regions
    assert parse_regions(["whole:1,2,4", "core:1,4"]) == {
        "whole": [1, 2, 4], "core": [1, 4]}
    assert parse_regions(None) == {}
    for bad in (["whole"], ["whole:"], [":1,2"], ["whole:a,b"],
                ["w:1", "w:2"],
                # blank tokens only: labs.strip() is truthy but no labels
                # survive — an empty label list would score all-False
                # masks as empty-vs-empty Dice 1.0
                ["whole: ,"], ["whole:,"], ["whole:,,"]):
        with pytest.raises(SystemExit):
            parse_regions(bad)


def test_merged_region_dice_nested_structures(tmp_path):
    """The exact failure docs/PARITY.md (multi-class mode 3) measures:
    argmax maps a nested core to the shell's label, so per-label core
    Dice collapses to 0 — but the label UNION is segmented perfectly,
    which merged-region evaluation (the reference's BRATS-era
    get_whole_tumor_mask-style masks) is built to see."""
    truth = np.zeros((16, 16, 16), np.uint8)
    truth[4:12, 4:12, 4:12] = 1          # shell
    truth[6:10, 6:10, 6:10] = 2          # nested core
    pred = np.zeros_like(truth)
    pred[4:12, 4:12, 4:12] = 1           # argmax gave everything the shell label
    d = tmp_path / "case_n"
    d.mkdir()
    save_nifti(truth, str(d / "truth.nii.gz"))
    save_nifti(pred, str(d / "prediction.nii.gz"))

    df = evaluate.main(str(tmp_path), labels=[1, 2],
                       output_csv=str(tmp_path / "s.csv"), plot=False,
                       regions={"whole": [1, 2]})
    row = df.loc["case_n"]
    assert row["label_2_dice"] == 0.0          # per-label: core lost to argmax
    assert row["label_1_dice"] < 1.0           # shell polluted by core voxels
    assert abs(row["region_whole_dice"] - 1.0) < 1e-12  # union: perfect
    # region columns flow into the CSV and (ending in _dice) the boxplot set
    import csv
    with open(tmp_path / "s.csv") as f:
        header = next(csv.reader(f))
    assert "region_whole_dice" in header


def test_merged_region_surface_metrics(tmp_path):
    truth = np.zeros((12, 12, 12), np.uint8)
    truth[2:8, 2:8, 2:8] = 1
    truth[4:6, 4:6, 4:6] = 2
    pred = truth.copy()
    d = tmp_path / "case_s"
    d.mkdir()
    save_nifti(truth, str(d / "truth.nii.gz"))
    save_nifti(pred, str(d / "prediction.nii.gz"))
    df = evaluate.main(str(tmp_path), labels=[1, 2],
                       output_csv=str(tmp_path / "s.csv"), plot=False,
                       surface_metrics=True, regions={"whole": [1, 2]})
    row = df.loc["case_s"]
    assert row["region_whole_hd95_mm"] == 0.0
    assert row["region_whole_assd_mm"] == 0.0


def test_prob_map_predictions_rejected(tmp_path):
    """A --prob-map tree scored as labels must error, not emit garbage
    Dice: 4-D multi-channel and non-integer 3-D volumes are both
    probability-map signatures."""
    truth = np.zeros((8, 8, 8), np.uint8)
    truth[0:4] = 1

    d4 = tmp_path / "four_d" / "case_a"
    d4.mkdir(parents=True)
    save_nifti(truth, str(d4 / "truth.nii.gz"))
    save_nifti(np.random.default_rng(0).uniform(
        size=(8, 8, 8, 3)).astype(np.float32),
        str(d4 / "prediction.nii.gz"))
    with pytest.raises(SystemExit, match="probability map"):
        evaluate.main(str(tmp_path / "four_d"), labels=[1],
                      output_csv=str(tmp_path / "s.csv"), plot=False)

    d3 = tmp_path / "float3d" / "case_a"
    d3.mkdir(parents=True)
    save_nifti(truth, str(d3 / "truth.nii.gz"))
    save_nifti(np.random.default_rng(1).uniform(
        size=(8, 8, 8)).astype(np.float32),
        str(d3 / "prediction.nii.gz"))
    with pytest.raises(SystemExit, match="probability map"):
        evaluate.main(str(tmp_path / "float3d"), labels=[1],
                      output_csv=str(tmp_path / "s.csv"), plot=False)
