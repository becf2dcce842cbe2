"""Multi-subject batch runner (the ``sct_run_batch`` replacement).

Parity target: ``sct_run_batch -jobs N -path-data … -path-output … -script …``
(`README.md:128-132`): subject discovery, provisioning of output/QC/log
directories, per-subject execution with per-subject logs, a wall-clock report
per subject (`pipeline_bids_register_evaluate.sh:245-253`), and an error log
for missing outputs.

TPU-native design: the reference forks one shell (and one TF runtime) per
subject; on the slow-compile TPU tunnel that is catastrophic, so subjects
stream through a single process and share the compiled model. ``jobs`` is
retained for host-side work (segmentation / NIfTI IO) via a thread pool while
device work stays serialized on the chip.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from concurrent.futures import ThreadPoolExecutor

from multimodal_registration_tpu.infer.config import InferenceConfig
from multimodal_registration_tpu.infer.register import load_params_any
from multimodal_registration_tpu.infer.sharded import make_registrar
from multimodal_registration_tpu.pipeline.bids import discover_subjects
from multimodal_registration_tpu.pipeline.qc import QCReport
from multimodal_registration_tpu.pipeline.runner import PipelineConfig, run_subject
from multimodal_registration_tpu.pipeline.segment import default_segmenter


def filter_subjects(subjects, include=None, exclude=None,
                    include_list=None, exclude_list=None):
    """``sct_run_batch`` subject-selection parity (`README.md:128-132`):
    ``-include``/``-exclude`` are regex/substring patterns, ``-include-list``/
    ``-exclude-list`` are exact subject names (sub-IDs or full subject paths)."""
    import re

    def _exact(s, names):
        base = s.split("/")[0]
        return s in names or base in names

    if include:
        subjects = [s for s in subjects if any(re.search(i, s) for i in include)]
    if exclude:
        subjects = [s for s in subjects if not any(re.search(x, s) for x in exclude)]
    if include_list:
        subjects = [s for s in subjects if _exact(s, set(include_list))]
    if exclude_list:
        subjects = [s for s in subjects if not _exact(s, set(exclude_list))]
    return subjects


def run_batch(
    path_data: str,
    path_output: str,
    model_path: str,
    config_path: str | None = None,
    model2_path: str | None = None,
    jobs: int = 1,
    include: list | None = None,
    exclude: list | None = None,
    include_list: list | None = None,
    exclude_list: list | None = None,
    segmenter=None,
    sharding=None,
    **pipeline_kwargs,
):
    # pipeline stages re-read just-written volumes — opt into save-side
    # priming of the decoded-file LRU and write-behind compression (the
    # ~2-4 s/subject of gzip+disk work overlaps the next subject's device
    # wait; readers are served from the pending-content map, and the runner
    # flushes before reorganize / external consumers)
    from multimodal_registration_tpu.utils import nifti as _nifti

    _nifti.enable_save_prime()
    _nifti.enable_async_writes()
    try:
        return _run_batch_inner(
            path_data, path_output, model_path, config_path, model2_path,
            jobs, include, exclude, include_list, exclude_list, segmenter,
            sharding, pipeline_kwargs,
        )
    finally:
        # write-behind is scoped to this run: later non-pipeline code (e.g.
        # a training CLI's label-dir scan) must see synchronous saves
        _nifti.disable_async_writes()


def _run_batch_inner(
    path_data, path_output, model_path, config_path, model2_path,
    jobs, include, exclude, include_list, exclude_list, segmenter,
    sharding, pipeline_kwargs,
):
    cfg = InferenceConfig.from_json(config_path) if config_path else InferenceConfig()
    if sharding:
        cfg.sharding = {**cfg.sharding, **{k: v for k, v in sharding.items() if v}}
    pcfg = PipelineConfig(**pipeline_kwargs)
    pcfg.two_step = model2_path is not None

    os.makedirs(path_output, exist_ok=True)
    path_processed = os.path.join(path_output, "data_processed")
    path_qc = os.path.join(path_output, "qc")
    path_log = os.path.join(path_output, "log")
    for p in (path_processed, path_qc, path_log):
        os.makedirs(p, exist_ok=True)

    # honors cfg.sharding ({data, space}) — multi-chip registration in the
    # batch pipeline rides the same factory as the CLIs
    # in two-step mode `model_path` is the cascade's step-1 (smooth) model —
    # it takes the model1-specific SVF-smoothing override
    from multimodal_registration_tpu.models.quantize import sidecar_kwargs

    registrar = make_registrar(
        cfg, load_params_any(model_path, cfg),
        svf_smooth_sigma=cfg.model1_svf_smooth_sigma if model2_path else None,
        **sidecar_kwargs(model_path, cfg),
    )
    registrar2 = make_registrar(
        cfg, load_params_any(model2_path, cfg),
        **sidecar_kwargs(model2_path, cfg),
    ) if model2_path else None
    segmenter = segmenter or default_segmenter()
    qc = QCReport(path_qc)

    subjects = discover_subjects(path_data)
    subjects = filter_subjects(subjects, include, exclude, include_list, exclude_list)

    results = []
    t_start = time.time()

    # native prefetch pool: decode the next subjects' volumes concurrently
    # with device work (jobs=1) — the sct_run_batch -jobs analogue for IO.
    # Submission rides a bounded sliding window (decoded f32 volumes are
    # ~tens of MB each; submitting a whole 500-subject dataset up front would
    # hold all of them in the pool's done-map while the consumer lags).
    import threading

    prefetch = None
    tickets = {}
    _pf_lock = threading.Lock()
    _pf_iter = iter(subjects)
    _pf_window = max(2, 2 * max(jobs, 1))
    _pf_outstanding = [0]
    # MMREG_NO_PREFETCH is a deliberate A/B knob (pipeline_throughput bench),
    # kept out of the try so it isn't conflated with real import/init failures
    if not os.environ.get("MMREG_NO_PREFETCH"):
        try:
            from multimodal_registration_tpu.pipeline.bids import subject_images
            from multimodal_registration_tpu.utils.native import PrefetchPool

            prefetch = PrefetchPool(n_threads=max(jobs, 2))
        except Exception:
            prefetch = None

    def _pf_top_up():
        if prefetch is None:
            return
        with _pf_lock:
            while _pf_outstanding[0] < _pf_window:
                s = next(_pf_iter, None)
                if s is None:
                    return
                try:
                    files = subject_images(path_data, s).files
                    tickets[s] = {
                        c: prefetch.submit(p)
                        for c, p in files.items()
                        if c in (pcfg.fx_contrast, pcfg.mov_contrast)
                    }
                    _pf_outstanding[0] += 1
                except Exception:
                    return

    _pf_top_up()

    def one(subject):
        preloaded = None
        if prefetch is not None and subject in tickets:
            try:
                preloaded = {c: prefetch.wait(t) for c, t in tickets[subject].items()}
            except Exception:
                preloaded = None
            finally:
                with _pf_lock:
                    _pf_outstanding[0] -= 1
            _pf_top_up()
        res = run_subject(
            cfg, pcfg, registrar, path_data, path_processed, subject,
            segmenter=segmenter, qc=qc, registrar2=registrar2, preloaded=preloaded,
        )
        with open(os.path.join(path_log, f"{subject.replace('/', '_')}.log"), "w") as f:
            f.write(json.dumps(res.__dict__, default=str, indent=2))
        print(
            f"[{subject}] {'OK' if res.ok else 'FAIL'} in {res.seconds:.1f}s "
            + (f"dice={res.metrics.get('dice_after', float('nan')):.3f}" if res.ok else
               f"error={str(res.error)[:200]}"),
            flush=True,
        )
        return res

    if jobs > 1:
        with ThreadPoolExecutor(max_workers=jobs) as ex:
            results = list(ex.map(one, subjects))
    else:
        results = [one(s) for s in subjects]

    if prefetch is not None:
        prefetch.close()
    qc.write()
    summary = {
        "n_subjects": len(results),
        "n_ok": sum(r.ok for r in results),
        "n_affine_fallback": sum(r.used_affine_fallback for r in results),
        "total_seconds": time.time() - t_start,
        "per_subject_seconds": {r.subject: r.seconds for r in results},
    }
    with open(os.path.join(path_output, "batch_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return results, summary


def main(argv=None):
    p = argparse.ArgumentParser(
        description="BIDS batch registration+evaluation pipeline (sct_run_batch parity)."
    )
    p.add_argument("--path-data", required=True)
    p.add_argument("--path-output", required=True)
    p.add_argument("--model-path", required=True)
    p.add_argument("--model2-path", default=None, help="second model → two-step cascade")
    p.add_argument("--config-path", default=None)
    p.add_argument("--jobs", type=int, default=1)
    p.add_argument("--fx-contrast", default="T2w")
    p.add_argument("--mov-contrast", default="T1w")
    p.add_argument("--opt-affine", action="store_true",
                   help="enable the SC-Dice-gated centermass affine fallback")
    p.add_argument("--min-sc-dice", type=int, default=80)
    p.add_argument("--include", nargs="*", default=None,
                   help="regex/substring patterns; keep matching subjects")
    p.add_argument("--exclude", nargs="*", default=None,
                   help="regex/substring patterns; drop matching subjects")
    p.add_argument("--include-list", nargs="*", default=None,
                   help="exact subject names to keep (sct_run_batch -include-list)")
    p.add_argument("--exclude-list", nargs="*", default=None,
                   help="exact subject names to drop (sct_run_batch -exclude-list)")
    p.add_argument("--space", type=int, default=None,
                   help="shard each volume's X-axis over N chips (multi-chip)")
    p.add_argument("--data-shard", type=int, default=None,
                   help="shard the inference batch axis over N chips")
    a = p.parse_args(argv)
    _, summary = run_batch(
        a.path_data, a.path_output, a.model_path,
        config_path=a.config_path, model2_path=a.model2_path, jobs=a.jobs,
        include=a.include, exclude=a.exclude,
        include_list=a.include_list, exclude_list=a.exclude_list,
        fx_contrast=a.fx_contrast, mov_contrast=a.mov_contrast,
        opt_affine=a.opt_affine, min_sc_dice=a.min_sc_dice,
        sharding={"space": a.space, "data": a.data_shard},
    )
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
