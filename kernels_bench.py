#!/usr/bin/env python
"""Kernel micro-benchmarks: NTT and MSM throughput per chip.

Produces the MSM/NTT ops-per-second numbers BASELINE.json tracks alongside
the end-to-end prover bench (bench.py).  Prints one JSON line per kernel.

Env knobs: MARLIN_KBENCH_LOG2N (default 14), MARLIN_KBENCH_REPS (default 5).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))


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
    results.append(
        {
            "metric": f"ntt_elements_per_second@2^{log2n}",
            "value": round(n / per_ntt, 1),
            "unit": "elements/s",
            "seconds_per_transform": round(per_ntt, 5),
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
    results.append(
        {
            "metric": f"fr_mul_elements_per_second@2^{log2n}",
            "value": round(n / per_mul, 1),
            "unit": "elements/s",
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
    results.append(
        {
            "metric": f"msm_points_per_second@2^{m.bit_length() - 1}",
            "value": round(m / per_msm, 1),
            "unit": "points/s",
            "seconds_per_msm": round(per_msm, 4),
        }
    )

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
