#!/usr/bin/env python
"""Multi-chip scaling sweep on the virtual CPU mesh.

Real multi-chip hardware is not available in this environment, so this
sweep captures the two things that CAN be measured without it, for the
distributed NTT (parallel/ntt_sharded.py) and MSM (parallel/msm_sharded.py)
at 1/2/4/8 devices:

* **Correctness** — sharded result bitwise-equal to the single-chip kernel
  at every mesh size.
* **Compute scaling** — per-device FLOPs of the compiled SPMD program
  (XLA cost analysis).  `compute_scaling_efficiency(D) =
  flops(1) / (D * flops(D))`; 1.0 means the work splits perfectly with no
  redundant compute.  This is the component of the BASELINE.json ">=70%
  MSM/NTT scaling efficiency" target that is hardware-independent — the
  remainder is ICI latency/bandwidth, bounded below by the collective
  volume also reported here.
* **Collective volume** — bytes moved per device per transform, counted
  from the collective ops in the optimized HLO (all-to-all for the NTT
  stage transpose, all-gather + psum for the MSM partial-sum reduction).

Reference analog: rayon thread scaling, README.md:72-79 (the reference's
only scaling axis).  Emits one JSON line per (kernel, size, D).

Env knobs: MARLIN_SWEEP_NTT_LOG2NS (default "16,18"),
MARLIN_SWEEP_MSM_LOG2NS (default "14,16").
"""

import json
import os
import re
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ["MARLIN_TPU_XLA_CACHE"] = ""  # see tests/conftest.py

import jax

try:  # drop the axon PJRT tunnel factory (tests/conftest.py does the same)
    from jax._src import xla_bridge as _xb

    for _name in list(getattr(_xb, "_backend_factories", {})):
        if _name not in ("cpu", "interpreter", "tpu"):
            _xb._backend_factories.pop(_name, None)
except Exception:  # pragma: no cover
    pass

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

_COLLECTIVE_RE = re.compile(
    r"(\S+)\s*=\s*\S+\s+(all-to-all|all-gather|all-reduce|"
    r"collective-permute|reduce-scatter)\("
)
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")

_DTYPE_BYTES = {
    "u8": 1, "s8": 1, "u16": 2, "s16": 2, "bf16": 2, "f16": 2,
    "u32": 4, "s32": 4, "f32": 4, "u64": 8, "s64": 8, "f64": 8, "pred": 1,
}


def _collective_stats(hlo_text: str):
    """(op count, output bytes moved) over the collectives in optimized HLO."""
    count = 0
    bytes_moved = 0
    for line in hlo_text.splitlines():
        m = _COLLECTIVE_RE.search(line)
        if not m:
            continue
        count += 1
        lhs = line.split("=", 1)[0]
        sm = _SHAPE_RE.search(line.split("=", 1)[1])
        if sm:
            dt, dims = sm.group(1), sm.group(2)
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            bytes_moved += n * _DTYPE_BYTES.get(dt, 4)
    return count, bytes_moved


def _compiled_stats(fn, *args):
    """Compile fn(*args) and return (per-device flops, collective count,
    collective bytes, compiled)."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns one dict per device
        cost = cost[0]
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    try:
        hlo = compiled.as_text()
    except Exception:
        hlo = ""
    ccount, cbytes = _collective_stats(hlo)
    return flops, ccount, cbytes, compiled


def main():
    from marlin_tpu.fields import bls12_381 as P
    from marlin_tpu.fields import host_curve as hc
    from marlin_tpu.ops import curve_device as cd
    from marlin_tpu.ops import fr
    from marlin_tpu.parallel.msm_sharded import msm_sharded, msm_sharded_core
    from marlin_tpu.parallel.ntt_sharded import ntt_4step, ntt_sharded_reference
    from marlin_tpu.utils.rand import ZkRng

    ntt_sizes = [
        int(s)
        for s in os.environ.get("MARLIN_SWEEP_NTT_LOG2NS", "16,18").split(",")
        if s
    ]
    msm_sizes = [
        int(s)
        for s in os.environ.get("MARLIN_SWEEP_MSM_LOG2NS", "14,16").split(",")
        if s
    ]
    devices = np.array(jax.devices())
    rng = ZkRng(7)
    results = []

    def emit(rec):
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # ---------------- NTT ----------------
    for log2n in ntt_sizes:
        n = 1 << log2n
        x = fr.from_ints(rng.rand_fr_list(n))
        want = np.asarray(ntt_sharded_reference(x))
        base_flops = None
        for d in (1, 2, 4, 8):
            mesh = Mesh(devices[:d], ("x",))
            t0 = time.perf_counter()
            flops, ccount, cbytes, compiled = _compiled_stats(
                lambda v: ntt_4step(v, mesh), x
            )
            got = np.asarray(compiled(x))
            ok = bool(np.array_equal(got, want))
            if d == 1:
                base_flops = flops
            eff = (
                round(base_flops / (d * flops), 4)
                if flops and base_flops
                else None
            )
            emit(
                {
                    "kernel": "ntt_4step",
                    "log2n": log2n,
                    "devices": d,
                    "bitwise_equal": ok,
                    "per_device_gflops": round(flops / 1e9, 4),
                    "compute_scaling_efficiency": eff,
                    "efficiency_source": "xla_cost_model",
                    "collective_ops": ccount,
                    "collective_mb_per_device": round(cbytes / 2**20, 3),
                    "wall_s": round(time.perf_counter() - t0, 2),
                }
            )

    # ---------------- MSM ----------------
    for log2n in msm_sizes:
        n = 1 << log2n
        # synthetic distinct points: cheap per-point hash-to-curve stand-in
        # (g * (i+1)) is fixed-base — fast on the host C path
        pts_aff = hc.g1_fixed_base_powers(hc.G1_GEN, list(range(1, n + 1)))
        points = cd.from_affine_ints(pts_aff)
        scal = fr.from_ints(rng.rand_fr_list(n))
        from marlin_tpu.ops import msm as msm_mod

        want = cd.to_affine_ints(msm_mod.msm_pippenger(points, scal))[0]
        base_flops = None
        for d in (1, 2, 4, 8):
            mesh = Mesh(devices[:d], ("x",))
            t0 = time.perf_counter()
            # msm_sharded's spill fallback host-syncs (not jittable);
            # compile the SPMD core for stats, then run the public
            # wrapper for the correctness check
            flops, ccount, cbytes, _ = _compiled_stats(
                lambda px, py, pz, s: msm_sharded_core((px, py, pz), s, mesh),
                *points,
                scal,
            )
            got = cd.to_affine_ints(msm_sharded(points, scal, mesh))[0]
            ok = got == want
            if d == 1:
                base_flops = flops
            eff = (
                round(base_flops / (d * flops), 4)
                if flops and base_flops
                else None
            )
            emit(
                {
                    "kernel": "msm_sharded",
                    "log2n": log2n,
                    "devices": d,
                    "bitwise_equal": ok,
                    "per_device_gflops": round(flops / 1e9, 4),
                    "compute_scaling_efficiency": eff,
                    "efficiency_source": "xla_cost_model",
                    "collective_ops": ccount,
                    "collective_mb_per_device": round(cbytes / 2**20, 3),
                    "wall_s": round(time.perf_counter() - t0, 2),
                }
            )

    # ---------------- resident chain (SURVEY §5.7) ----------------
    # NTT -> Hadamard -> iNTT with every array flat-block-sharded across the
    # mesh: per-device memory is n/D, never O(n) — the domain-sharding goal
    # the replicate-boundary kernels above do not meet.
    from marlin_tpu.ops import ntt as ntt_mod
    from marlin_tpu.parallel.ntt_sharded import block_sharding, ntt_4step_resident

    log2n = int(os.environ.get("MARLIN_SWEEP_RESIDENT_LOG2N", "20"))
    n = 1 << log2n
    d = min(8, len(devices))
    mesh = Mesh(devices[:d], ("x",))
    xs = rng.rand_fr_list(n)
    x_single = fr.from_ints(xs)
    x = jax.device_put(x_single, block_sharding(mesh))
    t0 = time.perf_counter()
    ev = ntt_4step_resident(x, mesh)
    sq = fr.mul(ev, ev)  # sharding-preserving elementwise
    back = ntt_4step_resident(sq, mesh, inverse=True)
    back.block_until_ready()
    wall = time.perf_counter() - t0
    shards = back.addressable_shards
    per_dev_rows = {s.data.shape[0] for s in shards}
    resident_ok = len({s.device for s in shards}) == d and per_dev_rows == {n // d}
    want = ntt_mod.ntt(x_single, n)
    want = fr.mul(want, want)
    want = ntt_mod.intt(want)
    ok = bool(jnp.array_equal(back, want)) and resident_ok
    emit(
        {
            "kernel": "resident_ntt_hadamard_intt",
            "log2n": log2n,
            "devices": d,
            "bitwise_equal": ok,
            "per_device_resident_mb": round(
                max(s.data.nbytes for s in shards) / 2**20, 2
            ),
            "replicated_equivalent_mb": round(back.nbytes / 2**20, 2),
            "wall_s": round(wall, 2),
        }
    )

    ok_all = all(r["bitwise_equal"] for r in results)
    print(
        json.dumps(
            {
                "metric": "scaling_sweep",
                "ok": ok_all,
                "rows": len(results),
            }
        )
    )
    if not ok_all:
        sys.exit(1)


if __name__ == "__main__":
    main()
