"""Device-trace attribution of the fused train step.

Wall-clock probes (`train_breakdown.py`) can only split the step at jit
boundaries, and on the axon tunnel each extra jit call carries RPC latency
that poisons small deltas (`synth_breakdown.py`'s negative deltas). This
probe instead captures an XLA device trace of the REAL fused step
(`Trainer.train_step`) and aggregates per-op device time from the perfetto
JSON the profiler writes — one process, one step HLO, no latency pollution.

Prints the top device ops (by total self time) and a category rollup
(convs / gathers+scatters / elementwise fusions / reduces / copies) for the
step. Usage: train_profile.py [steps] [--small]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from multimodal_registration_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax

if os.environ.get("MMREG_FORCE_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from multimodal_registration_tpu.train.config import TrainConfig
from multimodal_registration_tpu.train.trainer import Trainer
from multimodal_registration_tpu.utils.profiling import device_trace


def categorize(name: str) -> str:
    n = name.lower()
    if "conv" in n:
        return "conv"
    if "gather" in n:
        return "gather"
    if "scatter" in n:
        return "scatter"
    if "select-and-scatter" in n:
        return "scatter"
    if "reduce-window" in n:
        return "reduce_window"
    if "all-reduce" in n or "collective" in n:
        return "collective"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "copy/transpose"
    if "dot" in n or "dot_general" in n:
        return "matmul"
    if "reduce" in n:
        return "reduce"
    if "rng" in n or "threefry" in n:
        return "rng"
    if "dynamic" in n:
        return "dynamic_slice/update"
    return "fusion/other"


def load_trace_events(log_dir: str):
    paths = glob.glob(
        os.path.join(log_dir, "plugins", "profile", "*", "*.trace.json.gz")
    )
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {log_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


def main(steps=3, small=False):
    shape = [32, 32, 48] if small else [160, 160, 192]
    L = 8 if small else 26
    cfg = TrainConfig.from_dict(
        dict(in_shape=shape, num_labels=L, batch_size=1, epochs=1,
             zero_borders_maps=True)
    )
    trainer = Trainer(cfg)
    rng = np.random.default_rng(0)
    maps = rng.integers(0, L, size=(1, *shape), dtype=np.uint8)
    params, opt_state = trainer.init_state()
    src, trg = trainer.put_batch(maps, maps.copy())
    key = jax.random.PRNGKey(0)

    # warm up (compile) outside the trace
    params, opt_state, aux = trainer.train_step(params, opt_state, key, src, trg)
    float(aux["loss"])

    log_dir = tempfile.mkdtemp(prefix="mmreg_trace_")
    with device_trace(log_dir):
        for i in range(steps):
            key, sub = jax.random.split(key)
            params, opt_state, aux = trainer.train_step(
                params, opt_state, sub, src, trg
            )
        float(aux["loss"])

    events = load_trace_events(log_dir)
    # device lanes: pid whose process_name metadata mentions TPU/device; on
    # this plugin the op events carry 'dur' (us) and a thread on the device
    # pid. Fall back to "all complete events with dur" minus obvious host
    # lanes if metadata is absent.
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e.get("pid")] = e.get("args", {}).get("name", "")
    device_pids = {
        p for p, n in pid_names.items()
        if any(k in n.lower() for k in ("tpu", "device", "xla", "accelerator"))
        and "host" not in n.lower()
    }

    host_markers = ("compile", "pjrt", "$", ".py:", "tracing", "transfer",
                    "execute", "device_trace", "stop_trace", "buffer")
    totals, counts = {}, {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        if any(m in name.lower() for m in host_markers):
            continue
        totals[name] = totals.get(name, 0.0) + e["dur"] / 1000.0
        counts[name] = counts.get(name, 0) + 1

    per_step = {k: v / steps for k, v in totals.items()}
    top = sorted(per_step.items(), key=lambda kv: -kv[1])[:40]
    print(json.dumps({"lanes": sorted(pid_names.values())}))
    for name, ms in top:
        print(json.dumps({
            "op": name[:110], "ms_per_step": round(ms, 2),
            "count": counts[name] // steps, "cat": categorize(name),
        }), flush=True)

    cats = {}
    for name, ms in per_step.items():
        cats[categorize(name)] = cats.get(categorize(name), 0.0) + ms
    print(json.dumps({
        "category_ms_per_step": {k: round(v, 1) for k, v in
                                 sorted(cats.items(), key=lambda kv: -kv[1])},
        "total_device_ms_per_step": round(sum(per_step.values()), 1),
        "trace_dir": log_dir,
    }))


if __name__ == "__main__":
    argv = list(sys.argv[1:])
    small = "--small" in argv
    if small:
        argv.remove("--small")
    main(int(argv[0]) if argv else 3, small=small)
