"""End-to-end batch-pipeline throughput + per-phase latency attribution.

The reference's only end-to-end number is a per-subject wall-clock line
(`pipeline_bids_register_evaluate.sh:245-253`). This bench measures the whole
production path — ``pipeline/batch.py`` (register → segment ×3 → 3 evaluators
→ QC → reorganize) — on a synthetic BIDS dataset at the reference workload
(160×160×192 / 26 labels) and reports:

  * subjects/min end-to-end for each configuration,
  * per-phase attribution (from ``SubjectResult.timings``),
  * prefetch on/off and ``--jobs`` scaling (host-I/O overlap, PERF roadmap #4).

Usage:
  python benchmarks/pipeline_throughput.py             # TPU, full workload
  python benchmarks/pipeline_throughput.py --quick     # CPU smoke (tiny)
  python benchmarks/pipeline_throughput.py --subjects 6 --configs default,jobs2

Writes ``benchmarks/pipeline_throughput_results.json``.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from multimodal_registration_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

HERE = os.path.dirname(os.path.abspath(__file__))
CKPT = os.path.join(HERE, "learned_ref_160x160x192_26lab.npz")
RESULTS = os.path.join(HERE, "pipeline_throughput_results.json")


def phase_totals(results):
    tot = {}
    for r in results:
        for k, v in (r.timings or {}).items():
            tot[k] = round(tot.get(k, 0.0) + v, 3)
    return tot


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="tiny CPU smoke run")
    ap.add_argument("--subjects", type=int, default=4)
    ap.add_argument("--configs", default="default,noprefetch,jobs2",
                    help="comma list: default | noprefetch | jobs2 | jobs4")
    ap.add_argument("--dataset-dir", default="",
                    help="persistent dataset dir: built once, reused on "
                         "re-runs (the 160^3-class build costs ~5 min on TPU)")
    args = ap.parse_args()

    if args.quick:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from benchmarks.pipeline_parity_run import build_dataset
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
        model_path = os.path.join(wdir, "w.npz")
        np.savez(model_path, **_flatten_params(params_template(
            VxmConfig(enc=(4,) * 4, dec=(4,) * 6, compute_dtype="float32"))))
        infer_cfg = dict(enc=[4] * 4, dec=[4] * 6, compute_dtype="float32")
    else:
        shape, num_labels = (160, 160, 192), 26
        tcfg = TrainConfig.from_dict(dict(
            in_shape=list(shape), num_labels=num_labels, num_maps=2,
            batch_size=1, epochs=1,
        ))
        model_path = CKPT
        assert os.path.exists(model_path), f"missing checkpoint {model_path}"
        infer_cfg = dict(enc=list(tcfg.enc), dec=list(tcfg.dec),
                         int_steps=tcfg.int_steps, int_res=tcfg.int_res,
                         svf_res=tcfg.svf_res)

    engine_cfg = Trainer(tcfg).engine_cfg

    root = tempfile.mkdtemp(prefix="ppl_bench_")
    if args.dataset_dir:
        data = args.dataset_dir
        marker = os.path.join(data, f".built_{shape[0]}x{shape[2]}_{args.subjects}")
        if os.path.exists(marker):
            subjects = sorted(
                d for d in os.listdir(data) if d.startswith("sub-")
            )[: args.subjects]
            t_build = 0.0
        else:
            t_build = time.time()
            subjects = build_dataset(data, shape, num_labels, args.subjects,
                                     engine_cfg, (tcfg.im_scales, tcfg.def_scales),
                                     maps_seed=4242)
            t_build = time.time() - t_build
            open(marker, "w").close()
    else:
        data = os.path.join(root, "data")
        t_build = time.time()
        subjects = build_dataset(data, shape, num_labels, args.subjects,
                                 engine_cfg, (tcfg.im_scales, tcfg.def_scales),
                                 maps_seed=4242)
        t_build = time.time() - t_build

    cfg_path = os.path.join(root, "cfg_inference.json")
    with open(cfg_path, "w") as f:
        json.dump(infer_cfg, f)

    MODES = {
        "default": dict(jobs=1),
        "noprefetch": dict(jobs=1, _noprefetch=True),
        "jobs2": dict(jobs=2),
        "jobs4": dict(jobs=4),
    }
    out_doc = {"workload": f"{shape} / {num_labels} labels",
               "n_subjects": len(subjects), "dataset_build_s": round(t_build, 1),
               "configs": {}}
    for name in [c.strip() for c in args.configs.split(",") if c.strip()]:
        kw = dict(MODES[name])
        noprefetch = kw.pop("_noprefetch", False)
        out = os.path.join(root, f"out_{name}")
        if noprefetch:
            os.environ["MMREG_NO_PREFETCH"] = "1"
        try:
            t0 = time.time()
            results, summary = run_batch(
                path_data=data, path_output=out, model_path=model_path,
                config_path=cfg_path,
                segmenter=ThresholdSegmenter(percentile=98.4), **kw,
            )
            wall = time.time() - t0
        finally:
            os.environ.pop("MMREG_NO_PREFETCH", None)
        # the first subject pays any jit compiles; report the steady-state
        # rate over the remaining subjects too
        per = [r.seconds for r in results]
        steady = (len(per) - 1) / max(sum(per[1:]), 1e-9) * 60 if len(per) > 1 else None
        out_doc["configs"][name] = {
            "ok": all(r.ok for r in results),
            "wall_s": round(wall, 2),
            "subjects_per_min": round(len(results) / wall * 60, 3),
            "subjects_per_min_steady": round(steady, 3) if steady else None,
            "per_subject_s": [round(s, 2) for s in per],
            "phase_totals_s": phase_totals(results),
        }
        print(name, json.dumps(out_doc["configs"][name]), flush=True)

    with open(RESULTS if not args.quick else RESULTS + ".quick", "w") as f:
        json.dump(out_doc, f, indent=1)
    print(json.dumps(out_doc, indent=1))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
