#!/usr/bin/env python
"""A/B microbench for the MSM bucket-fold kernel on the real TPU.

Compares the round-3 kernel (tensorized Montgomery mul + always-double
mixed add: MARLIN_TPU_MULV=tensor, exact=True) against the round-4 kernel
(fori-CIOS mul + no-double madd with degenerate flag).  Emits one JSON
line per variant: wall seconds per fold and the implied ns per dispatched
madd.

The matrix mirrors the 2^14 headline MSM's fold shape (c=8: 256 buckets x
32 windows = 8192 lanes, cap=128 -> 1,048,576 dispatched mixed adds).
Points are random Fq residues in affine form — the group law's cost is
data-independent, so timing needs no curve membership.

Run on the axon tunnel; block_until_ready is unreliable there, so each
timed call is fenced by fetching the flag scalar, and a fetch-only
baseline is subtracted.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    cap = int(os.environ.get("FOLD_CAP", 128))
    lanes = int(os.environ.get("FOLD_LANES", 8192))
    reps = int(os.environ.get("FOLD_REPS", 3))

    import jax
    import jax.numpy as jnp

    from marlin_tpu.fields import bls12_381 as P
    from marlin_tpu.ops import fq
    from marlin_tpu.ops.pallas import curve as pcurve

    print(json.dumps({"backend": jax.default_backend(), "cap": cap, "lanes": lanes}), flush=True)

    rng = np.random.default_rng(5)
    n = cap * lanes

    def rand_fq(k):
        # random residues < q via rejection-free top-limb clamp
        limbs = rng.integers(0, 1 << 16, (k, fq.L), dtype=np.uint32)
        limbs[:, -1] &= 0x19FF  # below q's top limb
        return jnp.asarray(limbs)

    X = rand_fq(n).reshape(cap, lanes, fq.L)
    Y = rand_fq(n).reshape(cap, lanes, fq.L)
    mask = jnp.ones((cap, lanes), jnp.uint32)
    mat = pcurve.pack_points_xy(X, Y)

    def fence(val):
        np.asarray(jax.device_get(val))

    # RTT baseline: time fetches of an already-computed scalar
    s = jnp.zeros((), jnp.uint32) + 1
    fence(s)
    t0 = time.perf_counter()
    for _ in range(reps):
        fence(s + 1)
    rtt = (time.perf_counter() - t0) / reps

    for name, exact in (("r4_fast", False), ("r3_exact", True)):
        t_compile0 = time.perf_counter()
        out, flag = pcurve.bucket_fold(mat, mask, cap, exact=exact)
        fence(flag)
        compile_s = time.perf_counter() - t_compile0
        t0 = time.perf_counter()
        for _ in range(reps):
            out, flag = pcurve.bucket_fold(mat, mask, cap, exact=exact)
            fence(flag)
        per = (time.perf_counter() - t0) / reps - rtt
        madds = (cap - 1) * lanes
        print(
            json.dumps(
                {
                    "variant": name,
                    "mulv": os.environ.get("MARLIN_TPU_MULV", "cios"),
                    "fold_s": round(per, 4),
                    "ns_per_madd": round(per * 1e9 / madds, 2),
                    "compile_s": round(compile_s, 1),
                    "flag": int(np.asarray(flag)),
                    "rtt_s": round(rtt, 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
