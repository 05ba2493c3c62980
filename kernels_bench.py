#!/usr/bin/env python
"""Kernel micro-benchmarks: NTT and MSM throughput per chip, with MFU.

Produces the MSM/NTT ops-per-second numbers BASELINE.json tracks alongside
the end-to-end prover bench (bench.py).  Prints one JSON line per kernel.

MFU model: the limb kernels are integer VPU programs (no MXU work), so
utilization is measured in 32-bit multiplies.  One Montgomery mul of an
L-limb field element costs 2*L^2 mul32 (CIOS product + reduction rows);
an NTT is (n/2)*log2(n) butterflies of one Fr mul each; the Pippenger MSM
dispatches W*(2^c*cap) mixed adds of ~11 Fq muls (identity padding slots
included — that is the dispatched work) of which n*W are useful.
`mfu_*` divides by a NOMINAL int32 peak (default 4 Tops/s, override with
MARLIN_KBENCH_PEAK_INT32_TOPS) — the v5e VPU's order of magnitude, for
round-over-round comparability rather than absolute truth.

Env knobs: MARLIN_KBENCH_LOG2N (default 14), MARLIN_KBENCH_REPS (default 5),
MARLIN_KBENCH_PEAK_INT32_TOPS (default 4).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

PEAK_INT32 = float(os.environ.get("MARLIN_KBENCH_PEAK_INT32_TOPS", "4")) * 1e12


def main():
    log2n = int(os.environ.get("MARLIN_KBENCH_LOG2N", 14))
    reps = int(os.environ.get("MARLIN_KBENCH_REPS", 5))
    n = 1 << log2n

    import jax

    from marlin_tpu.fields import host_curve as hc
    from marlin_tpu.ops import curve_device as cd
    from marlin_tpu.ops import fr, msm, ntt
    from marlin_tpu.utils.rand import ZkRng

    rng = ZkRng(42)
    results = []

    # --- NTT ---
    x = fr.from_ints(rng.rand_fr_list(n))
    e = ntt.ntt(x, n)  # compile
    e.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        e = ntt.intt(ntt.ntt(x, n))
    e.block_until_ready()
    per_ntt = (time.perf_counter() - t0) / (2 * reps)
    ntt_mul32 = (n // 2) * log2n * 2 * fr.L * fr.L
    results.append(
        {
            "metric": f"ntt_elements_per_second@2^{log2n}",
            "value": round(n / per_ntt, 1),
            "unit": "elements/s",
            "seconds_per_transform": round(per_ntt, 5),
            "mul32_tops": round(ntt_mul32 / per_ntt / 1e12, 4),
            "mfu_nominal": round(ntt_mul32 / per_ntt / PEAK_INT32, 4),
        }
    )

    # --- field mul throughput ---
    y = fr.from_ints(rng.rand_fr_list(n))
    z = fr.mul(x, y)
    z.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps * 4):
        z = fr.mul(z, y)
    z.block_until_ready()
    per_mul = (time.perf_counter() - t0) / (reps * 4)
    mul_mul32 = n * 2 * fr.L * fr.L
    results.append(
        {
            "metric": f"fr_mul_elements_per_second@2^{log2n}",
            "value": round(n / per_mul, 1),
            "unit": "elements/s",
            "mul32_tops": round(mul_mul32 / per_mul / 1e12, 4),
            "mfu_nominal": round(mul_mul32 / per_mul / PEAK_INT32, 4),
        }
    )

    # --- MSM ---
    m = min(n, 1 << 14)
    pts = cd.from_affine_ints(hc.g1_fixed_base_powers(hc.G1_GEN, list(range(1, m + 1))))
    scal = fr.from_ints(rng.rand_fr_list(m))
    out = msm.msm(pts, scal)  # compile
    out[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(max(1, reps // 2)):
        out = msm.msm(pts, scal)
    out[0].block_until_ready()
    per_msm = (time.perf_counter() - t0) / max(1, reps // 2)
    # dispatched vs useful work (ops/msm.py sizing): the bucket matrix is
    # padded to a fixed capacity, so dispatched madds exceed useful n*W
    from marlin_tpu.ops import fq

    log2m = m.bit_length() - 1
    c = min(13, max(6, log2m - 6))
    W = -(-255 // c)
    cap = 1 << max(3, (2 * max(1, m // (1 << c)) - 1).bit_length())
    fq_mul32 = 2 * fq.L * fq.L
    dispatched = W * (1 << c) * cap * 11 * fq_mul32  # 11-mul mixed adds
    useful = W * m * 11 * fq_mul32
    results.append(
        {
            "metric": f"msm_points_per_second@2^{log2m}",
            "value": round(m / per_msm, 1),
            "unit": "points/s",
            "seconds_per_msm": round(per_msm, 4),
            "mul32_tops_dispatched": round(dispatched / per_msm / 1e12, 4),
            "mfu_nominal_dispatched": round(dispatched / per_msm / PEAK_INT32, 4),
            "mfu_nominal_useful": round(useful / per_msm / PEAK_INT32, 4),
        }
    )

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
