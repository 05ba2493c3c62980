#!/usr/bin/env python
"""Measure the chip's raw arithmetic peaks for the kernels we actually run.

Emits one JSON line per probe.  The marlin_tpu field kernels are integer
VPU programs built almost entirely from u32 multiplies and adds over
[8, 128] tiles, so the numbers that matter are:

  * u32 elementwise multiply throughput (the CIOS partial-product grid)
  * u32 elementwise add throughput (diagonal sums, carries)
  * f32 multiply throughput (comparison point: is int mul emulated?)
  * bf16 MXU matmul throughput (comparison point: what we leave on the
    table by not having a matmul formulation)

Each probe is a Pallas kernel that loads one tile block, performs REPS
dependent ops in VMEM, and writes one tile back — so memory traffic is
negligible and the measurement is the ALU rate.  A dependent chain would
serialize the VPU; we instead keep 8 independent chains (ILP) to let the
pipeline fill, and count ops = rows*128*REPS*CHAINS.

KBENCH_r04 consumes these as the measured-peak denominators (replacing
kernels_bench.py's nominal 4 Tops/s guess; VERDICT r3 weak #2).
"""

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = int(os.environ.get("MARLIN_PEAK_REPS", 512))
CHAINS = 8
ROWS = 256  # 256x128 tile block per grid step
GRID = 64


def _vpu_kernel(op, dtype):
    def kernel(a_ref, o_ref):
        a = a_ref[:]
        accs = [a + jnp.asarray(i + 1, dtype) for i in range(CHAINS)]
        for _ in range(REPS):
            if op == "mul":
                accs = [x * a for x in accs]
            elif op == "add":
                accs = [x + a for x in accs]
            elif op == "mul16":
                # operands masked to 16 bits — does Mosaic specialize?
                accs = [(x & jnp.asarray(0xFFFF, dtype)) * a for x in accs]
        out = accs[0]
        for x in accs[1:]:
            out = out + x
        o_ref[:] = out

    return kernel


def _time_pallas(kernel, x, n_ops_per_call, label, results, flavor):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec = pl.BlockSpec((ROWS, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, 128), x.dtype),
        grid=(GRID,),
        in_specs=[spec],
        out_specs=spec,
    )
    f = jax.jit(call)
    y = f(x)
    y.block_until_ready()
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        y = f(x)
        y.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    tops = n_ops_per_call / best
    rec = {"metric": label, "value": round(tops / 1e12, 4), "unit": "Tops/s", "flavor": flavor}
    results.append(rec)
    print(json.dumps(rec), flush=True)
    return tops


def _mxu_probe(results, in_dtype, acc_dtype, label):
    """Back-to-back matmuls in one kernel: measures MXU rate."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = 512
    reps = 64

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        acc = jnp.zeros((M, M), acc_dtype)
        for i in range(reps):
            acc += jnp.dot(a, b, preferred_element_type=acc_dtype)
            a = (a + jnp.asarray(1, in_dtype)) if in_dtype == jnp.int8 else a * jnp.asarray(1.0001, in_dtype)
        o_ref[:] = acc

    spec = pl.BlockSpec((M, M), lambda i: (0, 0), memory_space=pltpu.VMEM)
    a = jnp.ones((M, M), in_dtype)
    b = jnp.ones((M, M), in_dtype)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, M), acc_dtype),
        grid=(GRID,),
        in_specs=[spec, spec],
        out_specs=spec,
    )
    f = jax.jit(call)
    try:
        y = f(a, b)
        y.block_until_ready()
    except Exception as e:
        print(json.dumps({"metric": label, "error": str(e)[:200]}), flush=True)
        return
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        y = f(a, b)
        y.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    flops = 2 * M * M * M * reps * GRID / best
    rec = {"metric": label, "value": round(flops / 1e12, 2), "unit": "Tops/s"}
    results.append(rec)
    print(json.dumps(rec), flush=True)


def main():
    backend = jax.default_backend()
    print(json.dumps({"metric": "backend", "value": backend}), flush=True)
    results = []

    n_vpu_ops = ROWS * 128 * REPS * CHAINS * GRID
    for dtype, name in ((jnp.uint32, "u32"), (jnp.int32, "i32"), (jnp.float32, "f32")):
        x = jnp.ones((ROWS, 128), dtype)
        for op in ("mul", "add"):
            _time_pallas(
                _vpu_kernel(op, dtype), x, n_vpu_ops, f"vpu_{name}_{op}", results, f"{name}.{op}"
            )
    _time_pallas(
        _vpu_kernel("mul16", jnp.uint32),
        jnp.full((ROWS, 128), 0x1234, jnp.uint32),
        n_vpu_ops,
        "vpu_u32_mul16masked",
        results,
        "u32.mul16",
    )

    _mxu_probe(results, jnp.bfloat16, jnp.float32, "mxu_bf16_matmul")
    _mxu_probe(results, jnp.int8, jnp.int32, "mxu_int8_matmul")
    _mxu_probe(results, jnp.float32, jnp.float32, "mxu_f32_matmul")

    out = os.environ.get("MARLIN_PEAK_OUT")
    if out:
        with open(out, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
