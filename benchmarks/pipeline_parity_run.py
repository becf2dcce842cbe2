"""End-to-end quality-parity artifact: trained checkpoint through the FULL
batch pipeline (VERDICT r3 item 1).

Builds a held-out synthetic BIDS dataset at the reference training workload
(160x160x192, 26-label maps, same-subject contrast pairs — the SynthMorph
evaluation setting), pushes it through ``pipeline/batch.py`` (register →
segment x3 → 3 evaluators → QC, opt-affine gate on, reference acceptance bar
`pipeline_bids_register_evaluate_opt_affine.sh:71`), and writes
``benchmarks/pipeline_parity_artifact.json`` recording:

  * SC-Dice before/after registration (gate: after >= 0.80),
  * %|J|<0 folding (expect ~0 — diffeomorphic guarantee),
  * NMI before/after (expect improvement > 0).

The "spinal cord" of each synthetic subject is a chosen label whose region is
brightened in both contrasts, so the pipeline's intensity segmenter tracks the
same anatomical structure across fixed/moving/moved — the synthetic analogue
of ``sct_deepseg_sc``. Usage:

  python benchmarks/pipeline_parity_run.py            # full (TPU, ~minutes)
  python benchmarks/pipeline_parity_run.py --quick    # CPU smoke (tiny)
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from multimodal_registration_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

HERE = os.path.dirname(os.path.abspath(__file__))
CKPT = os.path.join(HERE, "learned_ref_160x160x192_26lab.npz")
ARTIFACT = os.path.join(HERE, "pipeline_parity_artifact.json")


def build_dataset(root, shape, num_labels, n_subjects, engine_cfg,
                  engine_cfg_scales, maps_seed):
    """Held-out subjects: new label-map seeds (training used PRNGKey(0) maps,
    eval pairs PRNGKey(5000+i) — we draw from seed base 9000)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scipy import ndimage

    from multimodal_registration_tpu.synth.image_engine import labels_to_image
    from multimodal_registration_tpu.synth.labelmaps import generate_label_maps
    from multimodal_registration_tpu.utils import nifti

    maps = generate_label_maps(
        jax.random.PRNGKey(maps_seed), n_subjects, shape, num_labels,
        im_scales=engine_cfg_scales[0], def_scales=engine_cfg_scales[1],
    )
    aff = np.eye(4)
    subjects = []
    for i in range(n_subjects):
        sub = f"sub-{i + 1:02d}"
        lab = np.asarray(maps[i])
        # the synthetic "cord": label with voxel count closest to 1.5% of
        # the volume (bright + compact enough for the threshold segmenter)
        counts = np.bincount(lab.ravel(), minlength=num_labels)
        target = 0.015 * lab.size
        cord_label = int(np.argmin(np.abs(counts[1:] - target))) + 1

        anat = os.path.join(root, sub, "anat")
        os.makedirs(anat, exist_ok=True)
        for k, contrast in ((2 * i, "T2w"), (2 * i + 1, "T1w")):
            key = jax.random.PRNGKey(9000 + k)
            img, oh = labels_to_image(key, jnp.asarray(lab), engine_cfg)
            img = np.asarray(img, np.float32)
            # cord mask from THIS image's warped labels (each draw carries its
            # own random deformation — the bump must move with the anatomy).
            # Intensity contract with the threshold segmenter: background
            # stays <= 0.5, cord interior >= ~1.0 — an unambiguous gap so the
            # same anatomical structure segments in BOTH contrasts.
            warped_lab = np.asarray(jnp.argmax(oh, -1))
            cord_mask = ndimage.gaussian_filter(
                (warped_lab == cord_label).astype(np.float32), 1.0)
            img = 0.5 * img + 1.0 * cord_mask
            nifti.save(nifti.NiftiImage(img, aff),
                       os.path.join(anat, f"{sub}_{contrast}.nii.gz"))
        subjects.append(sub)
    return subjects


def read_csv_rows(path):
    with open(path) as f:
        return list(csv.DictReader(f))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="tiny CPU smoke run")
    ap.add_argument("--subjects", type=int, default=3)
    ap.add_argument("--keep", default="", help="keep outputs under this dir")
    ap.add_argument("--width", type=int, default=0,
                    help="256 = the PUBLISHED inference architecture "
                         "(config_inference.json:8-9) with the checkpoint "
                         "trained by learn_ref_workload --width=256; writes "
                         "a _w<width> artifact")
    ap.add_argument("--quantize", default="", choices=["", "int8"],
                    help="run the pipeline with int8 quantized inference "
                         "(models/quantize.py); lazy calibration persists the "
                         "checkpoint's .quant.json sidecar; writes a _int8 "
                         "artifact (VERDICT r4 item 1b)")
    args = ap.parse_args()

    if args.quick:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from multimodal_registration_tpu.pipeline.batch import run_batch
    from multimodal_registration_tpu.train.config import TrainConfig

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
        model_path = os.path.join(wdir, "w.npz")
        np.savez(model_path, **_flatten_params(params_template(
            VxmConfig(enc=(4,) * 4, dec=(4,) * 6, compute_dtype="float32"))))
        infer_cfg = dict(enc=[4] * 4, dec=[4] * 6, compute_dtype="float32")
    else:
        shape, num_labels = (160, 160, 192), 26
        d = dict(
            in_shape=list(shape), num_labels=num_labels, num_maps=2,
            batch_size=1, epochs=1,
        )
        if args.width:
            d["enc"] = [args.width] * 4
            d["dec"] = [args.width] * 6
        tcfg = TrainConfig.from_dict(d)
        model_path = (os.path.join(
            HERE, f"learned_w{args.width}_160x160x192_26lab.npz")
            if args.width else CKPT)
        assert os.path.exists(model_path), f"missing checkpoint {model_path}"
        # must match the checkpoint's architecture (config/config.json:41-45,
        # or config_inference.json:8-9 for --width 256)
        infer_cfg = dict(enc=list(tcfg.enc), dec=list(tcfg.dec),
                         int_steps=tcfg.int_steps, int_res=tcfg.int_res,
                         svf_res=tcfg.svf_res)

    if args.quantize:
        infer_cfg["quantize"] = args.quantize

    from multimodal_registration_tpu.train.trainer import Trainer

    engine_cfg = Trainer(tcfg).engine_cfg

    root = args.keep or tempfile.mkdtemp(prefix="parity_bids_")
    data = os.path.join(root, "data")
    out = os.path.join(root, "out")
    subjects = build_dataset(data, shape, num_labels, args.subjects,
                             engine_cfg, (tcfg.im_scales, tcfg.def_scales),
                             maps_seed=777)

    cfg_path = os.path.join(root, "cfg_inference.json")
    with open(cfg_path, "w") as f:
        json.dump(infer_cfg, f)

    from multimodal_registration_tpu.pipeline.segment import ThresholdSegmenter

    results, batch_summary = run_batch(
        path_data=data, path_output=out, model_path=model_path,
        config_path=cfg_path, jobs=1,
        # top ~1.6% of voxels ~= the cord size the dataset builder targets;
        # with the background<=0.5 / cord>=1.0 gap the threshold lands
        # between them and both contrasts segment the same structure
        segmenter=ThresholdSegmenter(percentile=98.4),
        opt_affine=True, min_sc_dice=80,
    )

    csv_dir = os.path.join(out, "log")
    # search only this run's output tree — a cwd fallback could silently pick
    # up stale CSVs from unrelated runs (review finding)
    candidates = [csv_dir, out, os.path.join(out, "data_processed")]
    found = {}
    for name in ("metrics_on_sc_seg.csv", "nmi.csv", "jacobian_det.csv"):
        for c in candidates:
            p = os.path.join(c, name)
            if os.path.exists(p):
                found[name] = p
                break

    artifact = {
        "checkpoint": os.path.basename(model_path),
        "workload": f"{shape} / {num_labels} labels",
        "subjects": subjects,
        "per_subject": [],
        "batch_ok": all(r.ok for r in results),
        "batch_summary": batch_summary,
        "used_affine_fallback": [r.subject for r in results if r.used_affine_fallback],
    }

    sc_rows = read_csv_rows(found["metrics_on_sc_seg.csv"]) if "metrics_on_sc_seg.csv" in found else []
    nmi_rows = read_csv_rows(found["nmi.csv"]) if "nmi.csv" in found else []
    jac_rows = read_csv_rows(found["jacobian_det.csv"]) if "jacobian_det.csv" in found else []

    def last_for(rows, sub):
        hits = [r for r in rows if r.get("Subject") == sub]
        return hits[-1] if hits else {}

    gate_pass, foldings, nmi_gains, dices = [], [], [], []
    for sub in subjects:
        sc = last_for(sc_rows, sub)
        mi = last_for(nmi_rows, sub)
        ja = last_for(jac_rows, sub)
        entry = {"subject": sub, "sc": sc, "nmi": mi, "jacobian": ja}
        artifact["per_subject"].append(entry)
        if sc:
            d_before = float(sc["Dice_before_registration"])
            d_after = float(sc["Dice_after_registration"])
            dices.append((round(d_before, 4), round(d_after, 4)))
            gate_pass.append(d_after >= 0.80)
        if mi:
            nmi_gains.append(float(mi["Percentage_nmi_improvement_registration"]))
        if ja:
            foldings.append(float(ja["Percentage_negative_detJa[%]"]))

    artifact["summary"] = {
        "sc_dice_gate_80_passed": bool(gate_pass) and all(gate_pass),
        "dice_before_after": dices,
        "folding_percent": foldings,
        "nmi_percent_improvement": nmi_gains,
    }

    path = ARTIFACT
    if args.width:
        path = ARTIFACT.replace(".json", f"_w{args.width}.json")
    if args.quantize:
        path = path.replace(".json", f"_{args.quantize}.json")
    if args.quick:
        path += ".quick"
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact["summary"], indent=1))
    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
