"""Mosaic bisect round 5: WHICH part of conv_pool kernel v2 kills the
hardware compiler at real size?

Rounds 2-4 established: lane-axis bf16 concat crashes (f32 ok), tiny-minor
DMA crashes, strided slices are rejected ("Only 2D gather"), scratch im2col
stores + K-split matmuls compile AT SMALL SIZE. v2 (built from the surviving
constructs) passes interpret mode and all small-size tests, but every block
variant HTTP-500s on hardware at (192,192,192,2)->64. This probe compiles
the v2 kernel body piecewise at the real tile shape to find the breaking
construct. Each section compiles one pallas_call with a 1-tile grid.

Run on TPU, one process: python benchmarks/mosaic_bisect5_probe.py
"""

from __future__ import annotations

import functools
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from multimodal_registration_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


FX, FY, Z, Cin, Cout = 4, 16, 192, 2, 64
K = 27 * Cin


def run(tag, fn):
    try:
        out = fn()
        val = float(jnp.sum(out.astype(jnp.float32)))
        print(json.dumps({tag: "ok", "sum": round(val, 2)}), flush=True)
    except Exception as e:  # noqa: BLE001
        import re

        msg = re.sub(r"\x1b\[[0-9;]*m", "", str(e))  # strip ANSI
        # the actual compiler diagnostic is usually at the END of the helper
        # output — keep head and tail
        print(json.dumps({tag: msg[:220] + " ... " + msg[-900:]}), flush=True)


def make_inputs():
    rng = np.random.default_rng(0)
    planes = [
        jnp.asarray(rng.normal(size=(1, FX + 2, FY + 2, Z)).astype(np.float32))
        .astype(jnp.bfloat16)
        for _ in range(3 * Cin)
    ]
    wt = jnp.asarray(rng.normal(size=(Cout, K)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    b2 = jnp.asarray(rng.normal(size=(Cout, 1)).astype(np.float32))
    return planes, wt, b2


def pallas(kern, out_shape, scratch=True):
    tile = pl.BlockSpec((1, FX + 2, FY + 2, Z), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    planes, wt, b2 = make_inputs()
    return pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[tile] * (3 * Cin) + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, *out_shape), lambda i: (i,) + (0,) * len(out_shape),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, *out_shape), jnp.bfloat16),
        scratch_shapes=(
            [pltpu.VMEM((K, FX, FY, Z), jnp.bfloat16)] if scratch else []
        ),
    )(*planes, wt, b2)


def store_taps(x_refs, s_ref):
    k = 0
    for c in range(Cin):
        for dx in range(3):
            for dy in range(3):
                for dz in range(3):
                    xs = x_refs[c * 3 + dz]
                    s_ref[k] = xs[0, dx:dx + FX, dy:dy + FY, :]
                    k += 1


def main():
    # a) tap stores only; reduce the scratch to prove the stores compile
    def kern_a(*refs):
        x_refs, (wt_ref, b_ref, out_ref, s_ref) = refs[:3 * Cin], refs[3 * Cin:]
        store_taps(x_refs, s_ref)
        out_ref[0] = jnp.sum(s_ref[:], axis=0).astype(out_ref.dtype)

    run("a_store_reduce", lambda: pallas(kern_a, (FX, FY, Z)))

    # b) stores + reshape + ONE big matmul, write full-res channel-first
    def kern_b(*refs):
        x_refs, (wt_ref, b_ref, out_ref, s_ref) = refs[:3 * Cin], refs[3 * Cin:]
        store_taps(x_refs, s_ref)
        acc = jnp.dot(wt_ref[:], s_ref[:].reshape(K, FX * FY * Z),
                      preferred_element_type=jnp.float32)
        out_ref[0] = acc.reshape(Cout, FX, FY, Z).astype(out_ref.dtype)

    run("b_matmul", lambda: pallas(kern_b, (Cout, FX, FY, Z)))

    # c) + bias + leaky
    def kern_c(*refs):
        x_refs, (wt_ref, b_ref, out_ref, s_ref) = refs[:3 * Cin], refs[3 * Cin:]
        store_taps(x_refs, s_ref)
        acc = jnp.dot(wt_ref[:], s_ref[:].reshape(K, FX * FY * Z),
                      preferred_element_type=jnp.float32)
        acc = acc + b_ref[:]
        acc = jnp.where(acc >= 0, acc, 0.2 * acc)
        out_ref[0] = acc.reshape(Cout, FX, FY, Z).astype(out_ref.dtype)

    run("c_bias_leaky", lambda: pallas(kern_c, (Cout, FX, FY, Z)))

    # d) + xy pool (sublane pair-split reshapes)
    def kern_d(*refs):
        x_refs, (wt_ref, b_ref, out_ref, s_ref) = refs[:3 * Cin], refs[3 * Cin:]
        store_taps(x_refs, s_ref)
        acc = jnp.dot(wt_ref[:], s_ref[:].reshape(K, FX * FY * Z),
                      preferred_element_type=jnp.float32)
        acc = acc + b_ref[:]
        acc = jnp.where(acc >= 0, acc, 0.2 * acc)
        full = acc.reshape(Cout, FX, FY, Z)
        p = full.reshape(Cout, FX // 2, 2, FY, Z).max(axis=2)
        p = p.reshape(Cout, FX // 2, FY // 2, 2, Z).max(axis=3)
        out_ref[0] = p.astype(out_ref.dtype)

    run("d_pool_xy", lambda: pallas(kern_d, (Cout, FX // 2, FY // 2, Z)))

    # e) + z pool (lane pair-split)
    def kern_e(*refs):
        x_refs, (wt_ref, b_ref, out_ref, s_ref) = refs[:3 * Cin], refs[3 * Cin:]
        store_taps(x_refs, s_ref)
        acc = jnp.dot(wt_ref[:], s_ref[:].reshape(K, FX * FY * Z),
                      preferred_element_type=jnp.float32)
        acc = acc + b_ref[:]
        acc = jnp.where(acc >= 0, acc, 0.2 * acc)
        full = acc.reshape(Cout, FX, FY, Z)
        p = full.reshape(Cout, FX // 2, 2, FY, Z).max(axis=2)
        p = p.reshape(Cout, FX // 2, FY // 2, 2, Z).max(axis=3)
        p = p.reshape(Cout, FX // 2, FY // 2, Z // 2, 2).max(axis=4)
        out_ref[0] = p.astype(out_ref.dtype)

    run("e_pool_xyz", lambda: pallas(kern_e, (Cout, FX // 2, FY // 2, Z // 2)))

    # f) f32 scratch variant of (b) — bf16-specific breakage check
    def kern_f(*refs):
        x_refs, (wt_ref, b_ref, out_ref, s_ref) = refs[:3 * Cin], refs[3 * Cin:]
        k = 0
        for c in range(Cin):
            for dx in range(3):
                for dy in range(3):
                    for dz in range(3):
                        xs = x_refs[c * 3 + dz]
                        s_ref[k] = xs[0, dx:dx + FX, dy:dy + FY, :].astype(
                            jnp.float32)
                        k += 1
        acc = jnp.dot(wt_ref[:].astype(jnp.float32),
                      s_ref[:].reshape(K, FX * FY * Z),
                      preferred_element_type=jnp.float32)
        out_ref[0] = acc.reshape(Cout, FX, FY, Z).astype(out_ref.dtype)

    tile = pl.BlockSpec((1, FX + 2, FY + 2, Z), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    planes, wt, b2 = make_inputs()

    def f():
        return pl.pallas_call(
            kern_f,
            grid=(1,),
            in_specs=[tile] * (3 * Cin) + [
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, Cout, FX, FY, Z), lambda i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, Cout, FX, FY, Z), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((K, FX, FY, Z), jnp.float32)],
        )(*planes, wt, b2)

    run("f_f32_scratch", f)

    # g) K padded to 64 (8-sublane-aligned): zero rows 54..63, wt (Cout, 64)
    KP = 64

    def kern_g(*refs):
        x_refs, (wt_ref, b_ref, out_ref, s_ref) = refs[:3 * Cin], refs[3 * Cin:]
        store_taps(x_refs, s_ref)
        for k in range(K, KP):
            s_ref[k] = jnp.zeros((FX, FY, Z), s_ref.dtype)
        acc = jnp.dot(wt_ref[:], s_ref[:].reshape(KP, FX * FY * Z),
                      preferred_element_type=jnp.float32)
        out_ref[0] = acc.reshape(Cout, FX, FY, Z).astype(out_ref.dtype)

    tile2 = pl.BlockSpec((1, FX + 2, FY + 2, Z), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    planes2, wt2, b22 = make_inputs()
    wtp = jnp.pad(wt2, ((0, 0), (0, KP - K)))

    def g():
        return pl.pallas_call(
            kern_g,
            grid=(1,),
            in_specs=[tile2] * (3 * Cin) + [
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, Cout, FX, FY, Z), lambda i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, Cout, FX, FY, Z), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((KP, FX, FY, Z), jnp.bfloat16)],
        )(*planes2, wtp, b22)

    run("g_k64_matmul", g)

    # h) 2-D scratch layout: (K, N) directly, N = FX*FY*Z — the reshape
    # inside (b) may itself be the killer, not the dot
    def kern_h(*refs):
        x_refs, (wt_ref, b_ref, out_ref, s_ref) = refs[:3 * Cin], refs[3 * Cin:]
        k = 0
        for c in range(Cin):
            for dx in range(3):
                for dy in range(3):
                    for dz in range(3):
                        xs = x_refs[c * 3 + dz]
                        s_ref[k] = xs[0, dx:dx + FX, dy:dy + FY, :].reshape(
                            FX * FY * Z)
                        k += 1
        acc = jnp.dot(wt_ref[:], s_ref[:],
                      preferred_element_type=jnp.float32)
        out_ref[0] = acc.reshape(Cout, FX, FY, Z).astype(out_ref.dtype)

    planes3, wt3, b23 = make_inputs()

    def h():
        return pl.pallas_call(
            kern_h,
            grid=(1,),
            in_specs=[tile2] * (3 * Cin) + [
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, Cout, FX, FY, Z), lambda i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, Cout, FX, FY, Z), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((K, FX * FY * Z), jnp.bfloat16)],
        )(*planes3, wt3, b23)

    run("h_2d_scratch_matmul", h)

    # i) sum of 54 rank-1 outer products (no big dot at all) — the bisect4
    # "K-split matmul" construct at real size
    def kern_i(*refs):
        x_refs, (wt_ref, b_ref, out_ref, s_ref) = refs[:3 * Cin], refs[3 * Cin:]
        store_taps(x_refs, s_ref)
        acc = jnp.zeros((Cout, FX * FY * Z), jnp.float32)
        for k in range(K):
            acc = acc + jnp.dot(
                wt_ref[:, k:k + 1], s_ref[k].reshape(1, FX * FY * Z),
                preferred_element_type=jnp.float32)
        out_ref[0] = acc.reshape(Cout, FX, FY, Z).astype(out_ref.dtype)

    planes4, wt4, b24 = make_inputs()

    def i():
        return pl.pallas_call(
            kern_i,
            grid=(1,),
            in_specs=[tile2] * (3 * Cin) + [
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, Cout, FX, FY, Z), lambda i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, Cout, FX, FY, Z), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((K, FX, FY, Z), jnp.bfloat16)],
        )(*planes4, wt4, b24)

    run("i_rank1_sum", i)


if __name__ == "__main__":
    main()
