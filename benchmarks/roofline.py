"""Analytic roofline for the flagship forward — no device needed.

Prints per-component FLOPs and minimum HBM bytes for the SynthMorph flagship
config (enc [64]x4 / dec [64]x6, svf/int res 2, int_steps 5, bf16 compute) at
a given shape, plus speed-of-light times for a given chip spec, so measured
component times (benchmarks/ablate.py, fwd_breakdown.py, the round-3 probes)
can be quoted as fractions of machine peak in PERF.md.

Chip spec defaults to TPU v5e-class: 197 TFLOP/s bf16, 819 GB/s HBM.

Usage: python benchmarks/roofline.py [X Y Z]
"""

from __future__ import annotations

import json
import sys

BF16 = 2
F32 = 4

PEAK_FLOPS = 197e12  # bf16
PEAK_HBM = 819e9     # bytes/s


def conv_cost(spatial, cin, cout, itemsize=BF16):
    vox = 1
    for s in spatial:
        vox *= s
    flops = 2 * vox * 27 * cin * cout
    bytes_ = vox * (cin + cout) * itemsize  # activations in+out (weights tiny)
    return flops, bytes_


def warp_cost(spatial, c, payload=F32):
    vox = 1
    for s in spatial:
        vox *= s
    # packed gather: read one (8C-packed) row per voxel + write C outputs;
    # trilinear mix ~24C FLOP/voxel
    bytes_ = vox * (8 * c * payload + c * F32 + 3 * F32)
    flops = vox * 24 * c
    return flops, bytes_


def main():
    width = 64
    args = []
    for a in sys.argv[1:]:
        if a.startswith("--width"):
            width = int(a.split("=", 1)[1]) if "=" in a else 256
        else:
            args.append(a)
    shape = tuple(int(a) for a in args[:3]) or (192, 192, 192)
    if len(shape) != 3:
        shape = (192, 192, 192)
    half = tuple(s // 2 for s in shape)
    enc = [width] * 4
    dec = [width] * 6

    comps = {}

    # U-Net: enc at full, /2, /4, /8; dec mirrors back up to half-res (svf_res 2)
    total_f, total_b = 0, 0
    cin = 2
    res = shape
    for i, c in enumerate(enc):
        f, b = conv_cost(res, cin, c)
        comps[f"enc_{i}@{res[0]}"] = {"gflop": f / 1e9, "mb": b / 1e6}
        total_f += f
        total_b += b
        cin = c
        res = tuple(s // 2 for s in res)
    # decoder (mirrors models/unet.py): each level CONVS FIRST at the current
    # resolution, then upsamples + skip-concats; with nb_upsample_skips=1
    # (svf_res 2) there are len(enc)-1 upsamples, so dec_0 runs at the
    # bottleneck (1/16) with 64 in-channels and the last three dec entries
    # run at half-res. (An earlier revision upsampled before each conv,
    # shifting every decoder level one resolution up: +18% total FLOPs.)
    n_up = len(enc) - 1  # nb_levels - 1 - nb_upsample_skips
    for i, c in enumerate(dec):
        f, b = conv_cost(res, cin, c)
        comps[f"dec_{i}@{res[0]}"] = {"gflop": f / 1e9, "mb": b / 1e6}
        total_f += f
        total_b += b
        cin = c
        if i < n_up:
            res = tuple(s * 2 for s in res)
            cin = cin + enc[len(enc) - 1 - i]  # skip concat (popped deepest-first)
    # flow head (3ch) at half-res
    f, b = conv_cost(half, cin, 3)
    comps["flow_head"] = {"gflop": f / 1e9, "mb": b / 1e6}
    total_f += f
    total_b += b

    # integration: int_steps warps at half-res, C=3 (bf16 payload default)
    f = b = 0
    for _ in range(5):
        fi, bi = warp_cost(half, 3, payload=BF16)
        f, b = f + fi, b + bi
    comps["integrate_5steps"] = {"gflop": f / 1e9, "mb": b / 1e6}
    total_f += f
    total_b += b

    # rescale half->full: read half field + write full field
    vox = shape[0] * shape[1] * shape[2]
    b = (vox // 8) * 3 * F32 + vox * 3 * F32
    comps["rescale"] = {"gflop": 0.3, "mb": b / 1e6}
    total_b += b

    # moved warp at full res, C=1
    f, b = warp_cost(shape, 1)
    comps["moved_warp"] = {"gflop": f / 1e9, "mb": b / 1e6}
    total_f += f
    total_b += b

    out = {"shape": list(shape), "components": {}}
    for k, v in comps.items():
        sol_ms = max(v["gflop"] * 1e9 / PEAK_FLOPS,
                     v["mb"] * 1e6 / PEAK_HBM) * 1e3
        out["components"][k] = {**{kk: round(vv, 2) for kk, vv in v.items()},
                                "sol_ms": round(sol_ms, 3)}
    out["total"] = {
        "gflop": round(total_f / 1e9, 1),
        "mb": round(total_b / 1e6, 1),
        "sol_ms_flops": round(total_f / PEAK_FLOPS * 1e3, 2),
        "sol_ms_hbm": round(total_b / PEAK_HBM * 1e3, 2),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
