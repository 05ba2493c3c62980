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


def _timed_chain(f, x, n_ops_per_call):
    """Dependent-call delta timing that survives an async tunnel backend.

    On axon, block_until_ready can return before the device finishes; the
    only reliable fence is fetching result bytes to the host.  We time a
    chain of K dependent calls ending in a host fetch, for two chain
    lengths, and divide the op delta by the time delta — subtracting the
    fetch/dispatch overhead exactly.
    """
    y = f(x)
    _ = np.asarray(y)  # warm + fence

    def run(k):
        t0 = time.perf_counter()
        y = x
        for _ in range(k):
            y = f(y)
        np.asarray(jax.device_get(y[:1, :1]))
        return time.perf_counter() - t0

    k_lo, k_hi = 2, 10
    t_lo = min(run(k_lo) for _ in range(3))
    t_hi = min(run(k_hi) for _ in range(3))
    dt = max(t_hi - t_lo, 1e-9)
    return n_ops_per_call * (k_hi - k_lo) / dt


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
    tops = _timed_chain(f, x, n_ops_per_call)
    rec = {"metric": label, "value": round(tops / 1e12, 4), "unit": "Tops/s", "flavor": flavor}
    results.append(rec)
    print(json.dumps(rec), flush=True)
    return tops


def _mxu_probe(results, in_dtype, acc_dtype, label, use_pallas=True):
    """Back-to-back matmuls: measures MXU rate.

    reps dependent-ish matmuls inside one kernel (a is nudged between
    dots so none can be CSE'd); chained across calls through a cast so
    the async tunnel cannot hide execution.  use_pallas=False times the
    plain-XLA dot (fallback for dtypes the pallas remote compile rejects).
    """
    from jax.experimental import pallas as pl

    M = 512
    reps = 256

    def body(a, b):
        acc = jnp.zeros((M, M), acc_dtype)
        for i in range(reps):
            acc += jnp.dot(a, b, preferred_element_type=acc_dtype)
            a = (a + jnp.asarray(1, in_dtype)) if jnp.issubdtype(in_dtype, jnp.integer) else a * jnp.asarray(1.0001, in_dtype)
        return acc

    if use_pallas:
        spec = pl.BlockSpec((M, M), lambda: (0, 0))
        call = jax.jit(
            pl.pallas_call(
                lambda a_ref, b_ref, o_ref: o_ref.__setitem__(
                    slice(None), body(a_ref[:], b_ref[:])
                ),
                out_shape=jax.ShapeDtypeStruct((M, M), acc_dtype),
                in_specs=[spec, spec],
                out_specs=spec,
            )
        )
    else:
        call = jax.jit(body)

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 3, (M, M)), in_dtype)
    b = jnp.asarray(rng.integers(0, 3, (M, M)), in_dtype)

    # chain through a cast so each call depends on the previous result
    def chained(x):
        return call(x, b).astype(in_dtype)

    try:
        flops = _timed_chain(jax.jit(chained), a, 2 * M * M * M * reps)
    except Exception as e:
        print(json.dumps({"metric": label, "error": str(e)[:200]}), flush=True)
        return
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
    _mxu_probe(results, jnp.int8, jnp.int32, "mxu_int8_matmul_xla", use_pallas=False)
    _mxu_probe(results, jnp.uint16, jnp.uint32, "mxu_u16_matmul_xla", use_pallas=False)
    _mxu_probe(results, jnp.bfloat16, jnp.float32, "mxu_bf16_matmul_xla", use_pallas=False)

    out = os.environ.get("MARLIN_PEAK_OUT")
    if out:
        with open(out, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
