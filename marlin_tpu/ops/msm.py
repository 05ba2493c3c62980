"""Multi-scalar multiplication on device.

The `PC::commit` hot loop (reference call sites src/lib.rs:125,172,193,213,
292 — SURVEY.md §2c item 3) rebuilt TPU-first.

Current production path: batched double-and-add over all points (one
compiled kernel, fully lane-parallel) followed by a fan-in-16 tree
reduction.  This trades ~2x arithmetic against the scatter-style Pippenger
bucket walk, which does not vectorize on the TPU; XLA compile size (the
binding constraint for deep point-arithmetic graphs) stays small because the
whole MSM reuses two fixed kernels.  A sorted-segmented-scan Pippenger
(windowed digits, segment-boundary bucket sums, suffix-scan combine) is the
planned upgrade once per-level scans are split into separately-compiled
stages.

The multi-chip variant (partition points across the mesh, reduce partial
sums) lives in parallel/msm_sharded.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fields import bls12_381 as P
from . import bigint as bi
from . import curve_device as cd
from . import fr

FR_BITS = 255


def msm(points: cd.Point, scalars_mont: jnp.ndarray, c: int | None = None) -> cd.Point:
    """Σ_i s_i P_i -> single Jacobian point (shape [1]).

    points: [n] Jacobian batch (Z=1 for affine inputs, Z=0 identity).
    scalars_mont: [n, 16] Fr Montgomery limbs.  `c` is accepted for API
    compatibility with the windowed variant.
    """
    scal = bi.from_mont(fr.CTX, scalars_mont)
    muls = cd.scalar_mul_batch(points, scal, FR_BITS)
    return cd.tree_reduce_add(muls)


def msm_many(powers: cd.Point, jobs: list) -> list:
    """Batch several MSMs over slices of one fixed point array.

    jobs: list of (offset, scalars_mont [n_j, 16]) — the points of job j are
    powers[offset : offset+n_j].  All jobs share a single double-and-add
    ladder pass (the expensive 255-iteration kernel), then each segment is
    tree-reduced separately.  This is how a whole commit round's MSMs run as
    one kernel launch (SURVEY.md §2c item 4: fused per-round multi-MSM).
    """
    if not jobs:
        return []
    pts_parts = []
    scal_parts = []
    bounds = [0]
    for off, scal in jobs:
        n_j = scal.shape[0]
        pts_parts.append(tuple(powers[i][off : off + n_j] for i in range(3)))
        scal_parts.append(scal)
        bounds.append(bounds[-1] + n_j)
    pts = tuple(jnp.concatenate([p[i] for p in pts_parts], axis=0) for i in range(3))
    scal = jnp.concatenate(scal_parts, axis=0)
    muls = cd.scalar_mul_batch(pts, bi.from_mont(fr.CTX, scal), FR_BITS)
    out = []
    for j in range(len(jobs)):
        seg = tuple(muls[i][bounds[j] : bounds[j + 1]] for i in range(3))
        out.append(cd.tree_reduce_add(seg))
    return out


def fixed_base_powers(base_affine: tuple, scalar_ints: list) -> cd.Point:
    """[s_0*G, s_1*G, ...] as a Jacobian batch — batched double-and-add.

    Used by KZG setup to produce the powers-of-tau SRS (SURVEY.md §3.1).
    """
    from .limbs import ints_to_limbs

    base = cd.from_affine_ints([base_affine] * len(scalar_ints))
    limbs = jnp.asarray(ints_to_limbs([s % P.R_MODULUS for s in scalar_ints], 16))
    return cd.scalar_mul_batch(base, limbs, FR_BITS)
