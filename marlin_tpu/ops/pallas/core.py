"""In-kernel Montgomery limb arithmetic for Pallas TPU kernels.

The compute layout every marlin_tpu Pallas kernel uses is **limb-major**:
an element batch is a `[L, rows, 128]` uint32 array, so each limb plane
`x[i]` is a `(rows, 128)` tile that fills the VPU's sublane x lane grid.
(The public `[n, L]` layout puts the 16-limb axis in the 128-wide lane
dimension — measured 8-12x slower on v5e for the same CIOS schedule.)

These are plain traced functions meant to be *composed inside* kernels
(NTT stages, Jacobian adds), not pallas_calls themselves; the callable
kernels live in field.py / ntt.py / curve.py.

Functional equivalence target: ops/bigint.py (the XLA path) — both
implement the CIOS Montgomery schedule of ark-ff's MontBackend
(reference arkworks dependency, SURVEY.md §2b row 1).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..limbs import LIMB_BITS, LIMB_MASK


def mod_consts(ctx):
    """Static (n_limbs tuple, np0) for a bigint.ModCtx — bake into kernels."""
    n_tuple = tuple(int(x) for x in ctx.n_limbs)
    np0 = int(ctx.nprime) & LIMB_MASK
    return n_tuple, np0


def mm_mul(a, b, n_tuple, np0):
    """CIOS Montgomery product of [L, ...] stacked limb planes.

    Accumulator positions stay < 2^22 (at most four sub-2^16 contributions
    per position per step plus the running shift) so no inner carry pass is
    needed; one fused finalize handles carries + conditional subtract.
    """
    L = len(n_tuple)
    shape = a.shape[1:]
    acc = [jnp.zeros(shape, jnp.uint32) for _ in range(L + 1)]
    for i in range(L):
        ai = a[i]
        for j in range(L):
            p = ai * b[j]
            acc[j] = acc[j] + (p & LIMB_MASK)
            acc[j + 1] = acc[j + 1] + (p >> LIMB_BITS)
        m = (acc[0] * jnp.uint32(np0)) & LIMB_MASK
        for j in range(L):
            mn = m * jnp.uint32(n_tuple[j])
            acc[j] = acc[j] + (mn & LIMB_MASK)
            acc[j + 1] = acc[j + 1] + (mn >> LIMB_BITS)
        carry0 = acc[0] >> LIMB_BITS
        acc = acc[1:] + [jnp.zeros(shape, jnp.uint32)]
        acc[0] = acc[0] + carry0
    return _finalize(acc, n_tuple)


def _finalize(acc, n_tuple):
    """Redundant [L+1] accumulator (< 2N) -> normalized reduced [L] planes.

    One pass computes the carry-propagated limbs and the borrow chain of
    (value - N); a final select picks the representative < N.
    """
    L = len(n_tuple)
    shape = acc[0].shape
    n_pad = tuple(n_tuple) + (0,)
    carry = jnp.zeros(shape, jnp.uint32)
    borrow = jnp.zeros(shape, jnp.int32)
    limbs_l, diffs_l = [], []
    for i in range(L + 1):
        s = acc[i] + carry
        limb = s & LIMB_MASK
        carry = s >> LIMB_BITS
        d = limb.astype(jnp.int32) - jnp.int32(n_pad[i]) - borrow
        borrow = (d < 0).astype(jnp.int32)
        limbs_l.append(limb)
        diffs_l.append((d + (borrow << LIMB_BITS)).astype(jnp.uint32))
    limbs = jnp.stack(limbs_l, axis=0)
    diffs = jnp.stack(diffs_l, axis=0)
    return jnp.where((borrow != 0)[None], limbs, diffs)[:L]


def mm_sqr(a, n_tuple, np0):
    return mm_mul(a, a, n_tuple, np0)


def mm_add(a, b, n_tuple):
    """(a + b) mod N over [L, ...] planes."""
    L = len(n_tuple)
    acc = [a[i] + b[i] for i in range(L)] + [jnp.zeros(a.shape[1:], jnp.uint32)]
    return _finalize(acc, n_tuple)


def mm_sub(a, b, n_tuple):
    """(a - b) mod N over [L, ...] planes."""
    L = len(n_tuple)
    shape = a.shape[1:]
    borrow = jnp.zeros(shape, jnp.int32)
    diffs = []
    for i in range(L):
        d = a[i].astype(jnp.int32) - b[i].astype(jnp.int32) - borrow
        borrow = (d < 0).astype(jnp.int32)
        diffs.append((d + (borrow << LIMB_BITS)).astype(jnp.uint32))
    # if borrowed, add N back (cannot re-borrow: diff + N < 2^(16L))
    carry = jnp.zeros(shape, jnp.uint32)
    underflow = borrow != 0
    outs = []
    for i in range(L):
        s = diffs[i] + jnp.where(underflow, jnp.uint32(n_tuple[i]), jnp.uint32(0)) + carry
        outs.append(s & LIMB_MASK)
        carry = s >> LIMB_BITS
    return jnp.stack(outs, axis=0)


def mm_dbl(a, n_tuple):
    return mm_add(a, a, n_tuple)


def mm_select(cond, a, b):
    """cond has the batch shape (no limb axis); selects per element."""
    return jnp.where(cond[None], a, b)


def mm_is_zero(a):
    return jnp.all(a == 0, axis=0)
