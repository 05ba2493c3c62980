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


def fixed_base_powers(base_affine: tuple, scalar_ints: list) -> cd.Point:
    """[s_0*G, s_1*G, ...] as a Jacobian batch — batched double-and-add.

    Used by KZG setup to produce the powers-of-tau SRS (SURVEY.md §3.1).
    """
    from .limbs import ints_to_limbs

    base = cd.from_affine_ints([base_affine] * len(scalar_ints))
    limbs = jnp.asarray(ints_to_limbs([s % P.R_MODULUS for s in scalar_ints], 16))
    return cd.scalar_mul_batch(base, limbs, FR_BITS)
