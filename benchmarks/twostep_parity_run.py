"""Two-step (cascade) quality artifact on LARGELY-DISPLACED subjects.

The reference's two-step pipeline exists for "data that have been randomly
affine transformed (translation, scaling and rotation) which is not
necessarily the case when using a single registration model"
(`/root/reference/README.md:150-158`). This run demonstrates that claim with
OUR trained models: the same held-out synthetic BIDS subjects as the
quality-parity artifact, but with the moving contrast additionally displaced
by a large random rigid transform, pushed through ``pipeline/batch.py`` in
two arms:

  * ``single``: the 50k flagship fine model alone
    (`learned_ref_160x160x192_26lab.npz`), and
  * ``two_step``: smooth step-1 model (`learned_model1_160x160x192_26lab.npz`,
    trained with vel_res [32, 64] — `README.md:157`) cascaded with the
    flagship (``--model2-path`` path, field composition per
    `bids_two_steps_registration.py:317-325`).

Writes ``benchmarks/twostep_parity_artifact.json`` with per-arm SC-Dice /
NMI / folding and the two-step-vs-single deltas.

Usage:
  python benchmarks/twostep_parity_run.py            # full (TPU)
  python benchmarks/twostep_parity_run.py --quick    # CPU smoke (tiny)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from multimodal_registration_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

HERE = os.path.dirname(os.path.abspath(__file__))
CKPT2 = os.path.join(HERE, "learned_ref_160x160x192_26lab.npz")  # fine
CKPT1 = os.path.join(HERE, "learned_model1_160x160x192_26lab.npz")  # smooth
ARTIFACT = os.path.join(HERE, "twostep_parity_artifact.json")


def displace_moving(root, subjects, seed_base=500):
    """Apply a large random rigid transform to each subject's moving (T1w)
    contrast in place — the 'initially in different affine spaces' setting."""
    import numpy as np

    from learn_model1_workload import rigid_displace
    from multimodal_registration_tpu.utils import nifti

    for s, sub in enumerate(subjects):
        p = os.path.join(root, sub, "anat", f"{sub}_T1w.nii.gz")
        im = nifti.load(p)
        data = np.asarray(im.get_fdata(np.float32))
        lab = np.zeros_like(data)  # labels unused; rigid_displace needs a pair
        mov, _ = rigid_displace(data, lab, seed_base + s)
        nifti.save(nifti.NiftiImage(mov, im.affine), p)


def collect(out, subjects):
    import csv

    def rows(path):
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return list(csv.DictReader(f))

    # search only THIS arm's output tree — a cwd fallback could silently pick
    # up stale CSVs from unrelated runs (review finding)
    found = {}
    for name in ("metrics_on_sc_seg.csv", "nmi.csv", "jacobian_det.csv"):
        for c in (os.path.join(out, "log"), out,
                  os.path.join(out, "data_processed")):
            p = os.path.join(c, name)
            if os.path.exists(p):
                found[name] = p
                break

    sc_rows = rows(found.get("metrics_on_sc_seg.csv", ""))
    nmi_rows = rows(found.get("nmi.csv", ""))
    jac_rows = rows(found.get("jacobian_det.csv", ""))

    def last_for(rws, sub):
        hits = [r for r in rws if r.get("Subject") == sub]
        return hits[-1] if hits else {}

    per, dices, gains, folds = [], [], [], []
    for sub in subjects:
        sc, mi, ja = (last_for(r, sub) for r in (sc_rows, nmi_rows, jac_rows))
        per.append({"subject": sub, "sc": sc, "nmi": mi, "jacobian": ja})
        if sc:
            dices.append((round(float(sc["Dice_before_registration"]), 4),
                          round(float(sc["Dice_after_registration"]), 4)))
        if mi:
            gains.append(float(mi["Percentage_nmi_improvement_registration"]))
        if ja:
            folds.append(float(ja["Percentage_negative_detJa[%]"]))
    return {"per_subject": per, "dice_before_after": dices,
            "nmi_percent_improvement": gains, "folding_percent": folds}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="tiny CPU smoke run")
    ap.add_argument("--subjects", type=int, default=3)
    ap.add_argument("--keep", default="", help="keep outputs under this dir")
    ap.add_argument("--model1-sigma", type=float, default=3.0,
                    help="step-1 SVF smoothing sigma for the two_step_smooth "
                         "arm (voxels at the SVF grid; "
                         "benchmarks/cascade_smoothing_sweep.py)")
    args = ap.parse_args()

    if args.quick:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from pipeline_parity_run import build_dataset
    from multimodal_registration_tpu.pipeline.batch import run_batch
    from multimodal_registration_tpu.pipeline.segment import ThresholdSegmenter
    from multimodal_registration_tpu.train.config import TrainConfig
    from multimodal_registration_tpu.train.trainer import Trainer

    if args.quick:
        shape, num_labels = (48, 48, 48), 8
        tcfg = TrainConfig.from_dict(dict(
            in_shape=list(shape), num_labels=num_labels, num_maps=2,
            im_scales=[8], def_scales=[8], enc=[4] * 4, dec=[4] * 6,
            compute_dtype="float32", epochs=1,
        ))
        from multimodal_registration_tpu.models.vxm_dense import (
            VxmConfig, params_template)
        from multimodal_registration_tpu.train.trainer import _flatten_params

        wdir = tempfile.mkdtemp()
        m2 = os.path.join(wdir, "w2.npz")
        m1 = os.path.join(wdir, "w1.npz")
        tmpl = _flatten_params(params_template(
            VxmConfig(enc=(4,) * 4, dec=(4,) * 6, compute_dtype="float32")))
        np.savez(m2, **tmpl)
        np.savez(m1, **tmpl)
        infer_cfg = dict(enc=[4] * 4, dec=[4] * 6, compute_dtype="float32")
    else:
        shape, num_labels = (160, 160, 192), 26
        tcfg = TrainConfig.from_dict(dict(
            in_shape=list(shape), num_labels=num_labels, num_maps=2,
            batch_size=1, epochs=1,
        ))
        m1, m2 = CKPT1, CKPT2
        for p in (m1, m2):
            assert os.path.exists(p), f"missing checkpoint {p}"
        infer_cfg = dict(enc=list(tcfg.enc), dec=list(tcfg.dec),
                         int_steps=tcfg.int_steps, int_res=tcfg.int_res,
                         svf_res=tcfg.svf_res)

    engine_cfg = Trainer(tcfg).engine_cfg

    root = args.keep or tempfile.mkdtemp(prefix="twostep_bids_")
    data = os.path.join(root, "data")
    subjects = build_dataset(data, shape, num_labels, args.subjects,
                             engine_cfg, (tcfg.im_scales, tcfg.def_scales),
                             maps_seed=888)
    displace_moving(data, subjects)

    cfg_path = os.path.join(root, "cfg_inference.json")
    with open(cfg_path, "w") as f:
        # pin raw reference compose semantics: the shipped default is now
        # model1_svf_smooth_sigma=3.0, which would silently smooth the
        # 'two_step' baseline arm too (review finding)
        json.dump({**infer_cfg, "model1_svf_smooth_sigma": 0.0}, f)
    cfg_smooth_path = os.path.join(root, "cfg_inference_smooth.json")
    with open(cfg_smooth_path, "w") as f:
        json.dump({**infer_cfg,
                   "model1_svf_smooth_sigma": args.model1_sigma}, f)

    # five arms: the fine model alone, the fine model behind the reference's
    # opt-affine gate (its OTHER large-displacement answer,
    # `pipeline_bids_register_evaluate_opt_affine.sh:145-182`), the same gate
    # with the opt-in rigid (rotation+translation) fallback (beyond-reference:
    # centermass cannot recover the ±6° component — opt_affine_rotation
    # study), the trained two-step cascade with raw reference semantics, and
    # the cascade with step-1 SVF smoothing (the anti-folding lever,
    # cascade_smoothing_sweep).
    arms = {}
    for arm, mpath, m2path, gate, cpath in (
        ("single", m2, None, False, cfg_path),
        ("opt_affine", m2, None, True, cfg_path),
        ("opt_affine_rigid", m2, None, "rigid", cfg_path),
        ("two_step", m1, m2, False, cfg_path),
        ("two_step_smooth", m1, m2, False, cfg_smooth_path),
    ):
        out = os.path.join(root, f"out_{arm}")
        kw = dict(opt_affine=bool(gate))
        if gate:
            kw["min_sc_dice"] = 80
        if gate == "rigid":
            kw["affine_fallback_mode"] = "rigid"
        results, _ = run_batch(
            path_data=data, path_output=out, model_path=mpath,
            config_path=cpath, model2_path=m2path, jobs=1,
            segmenter=ThresholdSegmenter(percentile=98.4),
            **kw,
        )
        arms[arm] = collect(out, subjects)
        arms[arm]["batch_ok"] = all(r.ok for r in results)
        arms[arm]["used_affine_fallback"] = [
            r.subject for r in results if getattr(r, "used_affine_fallback", False)]

    def mean_after(arm):
        d = arms[arm]["dice_before_after"]
        return round(float(np.mean([a for _, a in d])), 4) if d else None

    artifact = {
        "checkpoints": {"model1": os.path.basename(m1),
                        "model2": os.path.basename(m2)},
        "workload": f"{shape} / {num_labels} labels, rigid-displaced moving",
        "subjects": subjects,
        "arms": arms,
        "model1_svf_smooth_sigma": args.model1_sigma,
        "summary": {
            "sc_dice_after_single": mean_after("single"),
            "sc_dice_after_opt_affine": mean_after("opt_affine"),
            "sc_dice_after_opt_affine_rigid": mean_after("opt_affine_rigid"),
            "sc_dice_after_two_step": mean_after("two_step"),
            "sc_dice_after_two_step_smooth": mean_after("two_step_smooth"),
            "two_step_minus_single": (
                round(mean_after("two_step") - mean_after("single"), 4)
                if mean_after("single") is not None
                and mean_after("two_step") is not None else None),
            "worst_folding_two_step": (
                max(arms["two_step"]["folding_percent"])
                if arms["two_step"]["folding_percent"] else None),
            "worst_folding_two_step_smooth": (
                max(arms["two_step_smooth"]["folding_percent"])
                if arms["two_step_smooth"]["folding_percent"] else None),
        },
    }
    with open(ARTIFACT if not args.quick else ARTIFACT + ".quick", "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact["summary"], indent=1))
    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
