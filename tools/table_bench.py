#!/usr/bin/env python
"""Piecewise timing of the fixed-base-table MSM path on the live backend.

Splits the round-1-commit-shaped work into (a) digits+layout build,
(b) bucket folds given layouts, (c) the full fused group kernel — all
fenced by fetching result bytes (block_until_ready does not fence on the
axon tunnel; see peak_bench).

Env: TB_LOG2N (constraint count shape to mimic, default 12), TB_REPS.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fetch(x):
    return np.asarray(__import__("jax").device_get(x))


def main():
    import jax
    import jax.numpy as jnp

    from marlin_tpu.fields import bls12_381 as P
    from marlin_tpu.ops import bigint as bi
    from marlin_tpu.ops import curve_device as cd
    from marlin_tpu.ops import fr, msm
    from marlin_tpu.snark import ahp, serial
    from marlin_tpu.utils.rand import test_rng

    log2n = int(os.environ.get("TB_LOG2N", "12"))
    reps = int(os.environ.get("TB_REPS", "3"))
    n = 1 << log2n
    rng = test_rng()

    t0 = time.perf_counter()
    srs = serial.cached_srs(ahp.max_degree(n, n, 3 * n), rng)
    print(f"[tb] srs loaded {time.perf_counter()-t0:.1f}s", flush=True)
    points = srs.powers_of_g
    N = points[0].shape[0]
    c = msm._fixed_c(N)
    t0 = time.perf_counter()
    table = msm.build_fixed_table(points, c)
    fetch(table.points[0][:1])
    print(f"[tb] table built (c={c}, W={table.num_windows}) {time.perf_counter()-t0:.1f}s", flush=True)

    # round-1 job shapes: 3 polys of ~n plus the 3n mask poly
    sizes = [n + 1, n + 1, n + 1]
    mask_sizes = [3 * n + 2]
    jobs = [(0, fr.from_ints(rng.rand_fr_list(s))) for s in sizes]
    mask_jobs = [(0, fr.from_ints(rng.rand_fr_list(s))) for s in mask_sizes]
    for _, s in jobs + mask_jobs:
        fetch(s[:1])

    W = table.num_windows
    nb = (1 << (c - 1)) + 1

    def group_args(jobset):
        szs = tuple(int(s.shape[0]) for _, s in jobset)
        lam = max(1, (max(szs) * (W - 1)) // (nb - 1))
        cap = int(np.ceil((lam + 6 * np.sqrt(lam) + 8) / 8.0)) * 8
        scal_cat = jnp.concatenate([s for _, s in jobset], axis=0)
        offs = tuple(int(o) for o, _ in jobset)
        return scal_cat, szs, offs, cap

    def make_layouts_only(sizes, offsets, cap, nb_top, cap_top):
        @jax.jit
        def layouts_only(scal_cat):
            scal16 = bi.from_mont(fr.CTX, scal_cat)
            n_base = table.points[0].shape[0] // W
            outs = []
            pos = 0
            spill = jnp.zeros((), jnp.uint32)
            for n_j, off in zip(sizes, offsets):
                lay, tlay, s = msm._signed_layout_device(
                    scal16[pos : pos + n_j], c, W, nb, cap, n_base, off, nb_top, cap_top
                )
                outs.append(lay)
                outs.append(tlay)
                spill += s
                pos += n_j
            return outs, spill

        return layouts_only

    for label, jobset in (("3x n-poly", jobs), ("mask 3n", mask_jobs)):
        scal_cat, szs, offs, cap = group_args(jobset)
        nb_top, cap_top = msm._top_fold_shape(max(szs), c, W)
        lay_fn = make_layouts_only(szs, offs, cap, nb_top, cap_top)

        # (a) layout only
        outs, spill = lay_fn(scal_cat)
        fetch(outs[0][:1])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            outs, spill = lay_fn(scal_cat)
            fetch(outs[0][:8]); fetch(outs[-1][:8])
            ts.append(time.perf_counter() - t0)
        print(f"[tb] {label}: layouts {min(ts)*1e3:.0f} ms  (spill={int(fetch(spill))})", flush=True)

        # (b) fold only, layouts precomputed on device
        big = (
            jnp.stack(outs[0::2]).reshape(len(szs), cap, nb).swapaxes(0, 1).reshape(-1)
        )
        big_top = (
            jnp.stack(outs[1::2]).reshape(len(szs), cap_top, nb_top).swapaxes(0, 1).reshape(-1)
        )
        fetch(big[:1]); fetch(big_top[:1])
        t, _ = msm._single_window_kernel(table.points, big, len(szs), nb, int(cap))
        fetch(t[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            tot, fl = msm._single_window_kernel(table.points, big, len(szs), nb, int(cap))
            fetch(tot[0])
            ts.append(time.perf_counter() - t0)
        print(f"[tb] {label}: merged fold (slots={cap*nb*len(szs)}) {min(ts)*1e3:.0f} ms", flush=True)
        tt, _ = msm._single_window_kernel(table.points, big_top, len(szs), nb_top, int(cap_top))
        fetch(tt[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            tot, fl = msm._single_window_kernel(table.points, big_top, len(szs), nb_top, int(cap_top))
            fetch(tot[0])
            ts.append(time.perf_counter() - t0)
        print(f"[tb] {label}: top fold (slots={cap_top*nb_top*len(szs)}) {min(ts)*1e3:.0f} ms", flush=True)

        # (c) full fused group kernel (what _run_msm_jobs dispatches)
        out = msm.msm_fixed_many(table, jobset)
        fetch(out[0][0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = msm.msm_fixed_many(table, jobset)
            fetch(out[0][0])
            ts.append(time.perf_counter() - t0)
        print(f"[tb] {label}: full msm_fixed_many {min(ts)*1e3:.0f} ms (flag={msm.fold_flags_fired()})", flush=True)


if __name__ == "__main__":
    main()
