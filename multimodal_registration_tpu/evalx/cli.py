"""Evaluator CLIs — drop-in equivalents of the reference's three evaluation
scripts, writing byte-compatible CSV schemas:

  * ``eval_on_sc_seg``    ← `eval_reg_on_sc_seg.py` (metrics_on_sc_seg.csv;
    includes the min-dice exit-code gate that drives the opt-affine pipeline,
    `eval_reg_on_sc_seg.py:103-104`)
  * ``eval_with_mi``      ← `eval_reg_with_mi.py` (nmi.csv)
  * ``eval_with_jacobian``← `eval_reg_with_jacobian.py` (jacobian_det.csv)
"""

from __future__ import annotations

import argparse
import csv
import datetime
import os
import threading

import numpy as np

from multimodal_registration_tpu.evalx.jacobian import folding_summary
from multimodal_registration_tpu.evalx.nmi import detect_zero_padding, normalized_mutual_information
from multimodal_registration_tpu.evalx.overlap import overlap_metrics
from multimodal_registration_tpu.utils import nifti


def _load(path):
    # extension detection on the BASENAME — a dotted directory in the path
    # must not make an extension-less stem look like a full filename
    if "." in os.path.basename(path):
        return nifti.load(path, cached=True)
    return nifti.load(f"{path}.nii.gz", cached=True)


# serializes header-check + append when evaluators run from `--jobs N`
# pipeline worker threads (pipeline/batch.py); interleaved partial rows
# would corrupt the CSVs
_CSV_LOCK = threading.Lock()


def _write_row(out_file: str, header: list, values: list, append: bool):
    with _CSV_LOCK:
        if not append or not os.path.isfile(out_file):
            with open(out_file, "w", newline="") as f:
                csv.DictWriter(f, fieldnames=header).writeheader()
        with open(out_file, "a", newline="") as f:
            w = csv.writer(f, delimiter=",")
            w.writerow([datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")] + [str(v) for v in values])


def eval_on_sc_seg(argv=None) -> int:
    p = argparse.ArgumentParser(description="Evaluate registration on SC segmentations")
    p.add_argument("--fx-seg-path", required=True)
    p.add_argument("--moving-seg-path", required=True)
    p.add_argument("--warped-seg-path", required=True)
    p.add_argument("--sub-id", required=True)
    p.add_argument("--out-file", default="metrics_on_sc_seg.csv")
    p.add_argument("--append", type=int, default=1, choices=[0, 1])
    p.add_argument("--min-dice", type=int, default=0)
    p.add_argument("--last-eval", type=int, default=1, choices=[0, 1])
    a = p.parse_args(argv)

    fx = _load(a.fx_seg_path).get_fdata()
    moving = _load(a.moving_seg_path).get_fdata()
    moved = _load(a.warped_seg_path).get_fdata()

    m_mov = overlap_metrics(fx, moving)
    m_mvd = overlap_metrics(fx, moved)

    # the affine-fallback gate (`eval_reg_on_sc_seg.py:103-104`)
    if 100 * m_mvd["dice"] < a.min_dice and not a.last_eval:
        return 1

    header = [
        "Timestamp", "Subject", "Dice_before_registration", "Dice_after_registration",
        "Jaccard_before", "Jaccard_after", "Sensitivity_before", "Sensitivity_after",
        "Precision_before", "Precision_after", "Specificity_before", "Specificity_after",
        "Accuracy_before", "Accuracy_after",
    ]
    values = [
        a.sub_id, m_mov["dice"], m_mvd["dice"], m_mov["jaccard"], m_mvd["jaccard"],
        m_mov["sensitivity"], m_mvd["sensitivity"], m_mov["precision"], m_mvd["precision"],
        m_mov["specificity"], m_mvd["specificity"], m_mov["accuracy"], m_mvd["accuracy"],
    ]
    _write_row(a.out_file, header, values, bool(a.append))
    return 0


def eval_with_mi(argv=None) -> int:
    p = argparse.ArgumentParser(description="Evaluate registration with NMI")
    p.add_argument("--fx-im-path", required=True)
    p.add_argument("--moving-im-path", required=True)
    p.add_argument("--warped-im-path", required=True)
    p.add_argument("--sub-id", required=True)
    p.add_argument("--out-file", default="nmi.csv")
    p.add_argument("--append", type=int, default=1, choices=[0, 1])
    a = p.parse_args(argv)

    fx = _load(a.fx_im_path).get_fdata()
    moving = _load(a.moving_im_path).get_fdata()
    moved = _load(a.warped_im_path).get_fdata()

    x0, y0, z0, x1, y1, z1 = detect_zero_padding(moving)
    box = (slice(x0, x1 + 1), slice(y0, y1 + 1), slice(z0, z1 + 1))
    fx, moving, moved = fx[box], moving[box], moved[box]

    nmi_fm = normalized_mutual_information(fx, moving)
    nmi_fd = normalized_mutual_information(fx, moved)
    nmi_md = normalized_mutual_information(moving, moved)
    perc = 100 * (nmi_fd - nmi_fm) / nmi_fm

    header = [
        "Timestamp", "Subject", "NMI_before_registration", "NMI_after_registration",
        "NMI_between_moving_and_moved_images", "Percentage_nmi_improvement_registration",
    ]
    _write_row(a.out_file, header, [a.sub_id, nmi_fm, nmi_fd, nmi_md, np.round(perc, 2)], bool(a.append))
    return 0


def eval_with_jacobian(argv=None) -> int:
    p = argparse.ArgumentParser(description="Evaluate a deformation field's Jacobian")
    p.add_argument("--def-field-path", required=True)
    p.add_argument("--sub-id", required=True)
    p.add_argument("--out-file", default="jacobian_det.csv")
    p.add_argument("--out-im-path", default="detJa.nii.gz")
    p.add_argument("--append", type=int, default=1, choices=[0, 1])
    a = p.parse_args(argv)

    img = _load(a.def_field_path)
    summary = folding_summary(img.get_fdata())
    det = summary.pop("det")
    nifti.save(nifti.NiftiImage(det[..., None].astype(np.float64), img.affine), a.out_im_path)

    header = [
        "Timestamp", "Subject", "Percentage_negative_detJa[%]", "Median_detJa",
        "Mean_detJa", "Std_detJa", "N_total_voxels", "N_voxels_negatives_detJa",
    ]
    _write_row(
        a.out_file, header,
        [a.sub_id, summary["percentage_negative_detJa"], summary["median_detJa"],
         summary["mean_detJa"], summary["std_detJa"], summary["n_total_detJa"],
         summary["n_negatives_detJa"]],
        bool(a.append),
    )
    return 0
