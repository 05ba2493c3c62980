"""Fused Pallas TPU kernels for BLS12-381 G1 Jacobian group ops.

One kernel per group operation: the ~18 Fq Montgomery muls of a complete
branchless Jacobian add (add-2007-bl + dbl-2009-l + edge-case selects,
same math as ops/curve_device.py) execute back-to-back in VMEM with no
HBM round-trips between field ops.  This is the production TPU path for
`curve_device.add/double` — the decomposed per-field-op version pays
~100 us of serial kernel latency per mul, which dominated MSM round 1.

Layout: limb-major [24, rows, 128] uint32 planes per coordinate (see
core.py).  Public wrappers take the repo-wide [.., 24] point layout.

Reference analog: ark-ec's short_weierstrass_jacobian group law reached
through every PC::commit MSM (SURVEY.md §2b row 2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import core
from .field import LANE, from_lm, pad_target as field_pad_target, to_lm

# rows per grid step (Mosaic requires multiples of 8 in the sublane dim);
# the add kernel keeps ~30 live Fq temporaries, so the block stays small
_RT = 8
_TILE = LANE * _RT


def _fold_rt() -> int:
    """Rows per fold grid step (more rows = more parallel accumulator
    rows and fewer sequential steps; A/B knob for the dominant kernel)."""
    import os

    return int(os.environ.get("MARLIN_TPU_FOLD_RT", "8"))


def _jac_double_planes(X, Y, Z, n_tuple, np0):
    mul = lambda a, b: core.mm_mul(a, b, n_tuple, np0)
    add = lambda a, b: core.mm_add(a, b, n_tuple)
    sub = lambda a, b: core.mm_sub(a, b, n_tuple)

    A = mul(X, X)
    B = mul(Y, Y)
    YZ = mul(Y, Z)
    C = mul(B, B)
    XB = add(X, B)
    t = mul(XB, XB)
    tAC = sub(sub(t, A), C)
    D = add(tAC, tAC)
    E = add(add(A, A), A)
    F = mul(E, E)
    X3 = sub(F, add(D, D))
    C4 = add(add(C, C), add(C, C))
    C8 = add(C4, C4)
    Y3 = sub(mul(E, sub(D, X3)), C8)
    Z3 = add(YZ, YZ)
    return X3, Y3, Z3


def _jac_add_planes(X1, Y1, Z1, X2, Y2, Z2, n_tuple, np0):
    mul = lambda a, b: core.mm_mul(a, b, n_tuple, np0)
    add = lambda a, b: core.mm_add(a, b, n_tuple)
    sub = lambda a, b: core.mm_sub(a, b, n_tuple)

    Z1Z1 = mul(Z1, Z1)
    Z2Z2 = mul(Z2, Z2)
    U1 = mul(X1, Z2Z2)
    U2 = mul(X2, Z1Z1)
    A1 = mul(Y1, Z2)
    A2 = mul(Y2, Z1)
    S1 = mul(A1, Z2Z2)
    S2 = mul(A2, Z1Z1)
    H = sub(U2, U1)
    HH = add(H, H)
    S2S1 = sub(S2, S1)
    r = add(S2S1, S2S1)
    I = mul(HH, HH)
    rsq = mul(r, r)
    zsum = add(Z1, Z2)
    ZZ = mul(zsum, zsum)
    Z3 = mul(sub(sub(ZZ, Z1Z1), Z2Z2), H)
    J = mul(H, I)
    V = mul(U1, I)
    X3 = sub(sub(rsq, J), add(V, V))
    S1J = mul(S1, J)
    rVX = mul(r, sub(V, X3))
    Y3 = sub(rVX, add(S1J, S1J))

    h_zero = core.mm_is_zero(H)
    r_zero = core.mm_is_zero(S2S1)
    p_inf = core.mm_is_zero(Z1)
    q_inf = core.mm_is_zero(Z2)

    dX, dY, dZ = _jac_double_planes(X1, Y1, Z1, n_tuple, np0)
    use_dbl = h_zero & r_zero & ~p_inf & ~q_inf
    X3 = core.mm_select(use_dbl, dX, X3)
    Y3 = core.mm_select(use_dbl, dY, Y3)
    Z3 = core.mm_select(use_dbl, dZ, Z3)
    X3 = core.mm_select(q_inf, X1, core.mm_select(p_inf, X2, X3))
    Y3 = core.mm_select(q_inf, Y1, core.mm_select(p_inf, Y2, Y3))
    Z3 = core.mm_select(q_inf, Z1, core.mm_select(p_inf, Z2, Z3))
    return X3, Y3, Z3


def _jac_madd_planes(X1, Y1, Z1, X2, Y2, Z2, n_tuple, np0):
    """Mixed addition: Jacobian (X1,Y1,Z1) + affine-form (X2,Y2,Z2∈{0,1}).

    The general add with Z2 = 1 substituted: U1 = X1, S1 = Y1, and
    Z3 = 2·Z1·H — 11 Montgomery muls instead of 16.  Bit-identical to
    _jac_add_planes on affine-form inputs (Montgomery muls by one_mont are
    exact identities and 2·Z1·H equals the general ((Z1+Z2)²-Z1Z1-Z2Z2)·H
    reduction), which the bucket matrix guarantees: gathered SRS points
    carry Z ∈ {0, 1}.  Identity slots (Z2 = 0) are handled by the q_inf
    select exactly as in the general kernel."""
    mul = lambda a, b: core.mm_mul(a, b, n_tuple, np0)
    add = lambda a, b: core.mm_add(a, b, n_tuple)
    sub = lambda a, b: core.mm_sub(a, b, n_tuple)

    Z1Z1 = mul(Z1, Z1)
    U2 = mul(X2, Z1Z1)
    A2 = mul(Y2, Z1)
    S2 = mul(A2, Z1Z1)
    H = sub(U2, X1)
    HH = add(H, H)
    S2S1 = sub(S2, Y1)
    r = add(S2S1, S2S1)
    I = mul(HH, HH)
    rsq = mul(r, r)
    Z3 = mul(add(Z1, Z1), H)
    J = mul(H, I)
    V = mul(X1, I)
    X3 = sub(sub(rsq, J), add(V, V))
    S1J = mul(Y1, J)
    rVX = mul(r, sub(V, X3))
    Y3 = sub(rVX, add(S1J, S1J))

    h_zero = core.mm_is_zero(H)
    r_zero = core.mm_is_zero(S2S1)
    p_inf = core.mm_is_zero(Z1)
    q_inf = core.mm_is_zero(Z2)

    dX, dY, dZ = _jac_double_planes(X1, Y1, Z1, n_tuple, np0)
    use_dbl = h_zero & r_zero & ~p_inf & ~q_inf
    X3 = core.mm_select(use_dbl, dX, X3)
    Y3 = core.mm_select(use_dbl, dY, Y3)
    Z3 = core.mm_select(use_dbl, dZ, Z3)
    X3 = core.mm_select(q_inf, X1, core.mm_select(p_inf, X2, X3))
    Y3 = core.mm_select(q_inf, Y1, core.mm_select(p_inf, Y2, Y3))
    Z3 = core.mm_select(q_inf, Z1, core.mm_select(p_inf, Z2, Z3))
    return X3, Y3, Z3


def _add_kernel(x1, y1, z1, x2, y2, z2, ox, oy, oz, *, n_tuple, np0):
    X3, Y3, Z3 = _jac_add_planes(
        x1[:], y1[:], z1[:], x2[:], y2[:], z2[:], n_tuple, np0
    )
    ox[:], oy[:], oz[:] = X3, Y3, Z3


def _double_kernel(x1, y1, z1, ox, oy, oz, *, n_tuple, np0):
    X, Y, Z = x1[:], y1[:], z1[:]
    X3, Y3, Z3 = _jac_double_planes(X, Y, Z, n_tuple, np0)
    y_zero = core.mm_is_zero(Y) | core.mm_is_zero(Z)
    zero = jnp.zeros_like(Z3)
    ox[:], oy[:], oz[:] = X3, Y3, core.mm_select(y_zero, zero, Z3)


@functools.lru_cache(maxsize=None)
def _fq_consts():
    from .. import fq

    return core.mod_consts(fq.CTX)


@functools.lru_cache(maxsize=None)
def _fq_one_tuple():
    from .. import fq

    return tuple(int(v) for v in fq.CTX.one_limbs)


@functools.lru_cache(maxsize=None)
def _build(kind: str, rows: int, interpret: bool):
    from jax.experimental import pallas as pl

    n_tuple, np0 = _fq_consts()
    L = len(n_tuple)
    spec = pl.BlockSpec((L, _RT, LANE), lambda i: (0, i, 0))
    out_shape = tuple(
        jax.ShapeDtypeStruct((L, rows, LANE), jnp.uint32) for _ in range(3)
    )
    n_in = 6 if kind == "add" else 3
    kernel = functools.partial(
        _add_kernel if kind == "add" else _double_kernel, n_tuple=n_tuple, np0=np0
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(rows // _RT,),
        in_specs=[spec] * n_in,
        out_specs=(spec,) * 3,
        interpret=interpret,
    )


def _prep_coords(coords):
    """Broadcast [.., 24] coordinate arrays to a shared batch, flatten and
    pad to whole tiles -> (lm arrays, batch shape, true n)."""
    L = coords[0].shape[-1]
    shape = jnp.broadcast_shapes(*(c.shape[:-1] for c in coords))
    n = int(np.prod(shape)) if shape else 1
    pad_to = field_pad_target(n)
    out = []
    for c in coords:
        flat = jnp.broadcast_to(c, (*shape, L)).reshape(n, L)
        if n < pad_to:
            flat = jnp.pad(flat, ((0, pad_to - n), (0, 0)))
        out.append(to_lm(flat))
    return out, shape, n


def _post_coords(lm_coords, shape, n):
    out = []
    for c in lm_coords:
        L = c.shape[0]
        out.append(from_lm(c)[:n].reshape(*shape, L))
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _add_jit(interpret: bool):
    def f(x1, y1, z1, x2, y2, z2):
        lm, shape, n = _prep_coords((x1, y1, z1, x2, y2, z2))
        call = _build("add", lm[0].shape[1], interpret)
        return _post_coords(call(*lm), shape, n)

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _double_jit(interpret: bool):
    def f(x1, y1, z1):
        lm, shape, n = _prep_coords((x1, y1, z1))
        call = _build("double", lm[0].shape[1], interpret)
        return _post_coords(call(*lm), shape, n)

    return jax.jit(f)


def add(p, q, interpret: bool = False):
    """Fused complete Jacobian add over [.., 24]-layout point tuples."""
    return _add_jit(interpret)(*p, *q)


def double(p, interpret: bool = False):
    """Fused Jacobian doubling over a [.., 24]-layout point tuple."""
    return _double_jit(interpret)(*p)


# --------------------------------------------------------------------------
# bucket fold: the Pippenger inner loop as ONE kernel
#
# The bucket matrix holds cap candidate points per bucket; summing the cap
# slots per bucket is the MSM's dominant work (ops/msm.py).  Folding with
# per-step XLA/Pallas round trips reads and writes the [lanes] accumulator
# through HBM cap times; this kernel keeps the accumulator block in VMEM
# across the whole fold (output-revisiting sequential grid) and only
# writes it once.


def _jac_madd_planes_fast(X1, Y1, Z1, X2, Y2, Z2, n_tuple, np0):
    """_jac_madd_planes minus the unconditional doubling branch (7 of its
    18 Montgomery muls).  Returns (X3, Y3, Z3, needs_double): when the two
    operands are equal nonidentity points the formula degenerates (H = 0,
    r = 0) and the result is garbage — the caller must check the flag and
    rerun an exact path.  For MSM bucket folds over a trusted SRS the flag
    firing would exhibit a nontrivial discrete-log relation between
    powers-of-τ points, so the fallback is (beyond) cosmically cold; it
    exists for exactness, and the synthetic repeated-point unit test
    exercises it."""
    mul = lambda a, b: core.mm_mul(a, b, n_tuple, np0)
    add = lambda a, b: core.mm_add(a, b, n_tuple)
    sub = lambda a, b: core.mm_sub(a, b, n_tuple)

    Z1Z1 = mul(Z1, Z1)
    U2 = mul(X2, Z1Z1)
    A2 = mul(Y2, Z1)
    S2 = mul(A2, Z1Z1)
    H = sub(U2, X1)
    HH = add(H, H)
    S2S1 = sub(S2, Y1)
    r = add(S2S1, S2S1)
    I = mul(HH, HH)
    rsq = mul(r, r)
    Z3 = mul(add(Z1, Z1), H)
    J = mul(H, I)
    V = mul(X1, I)
    X3 = sub(sub(rsq, J), add(V, V))
    S1J = mul(Y1, J)
    rVX = mul(r, sub(V, X3))
    Y3 = sub(rVX, add(S1J, S1J))

    h_zero = core.mm_is_zero(H)
    r_zero = core.mm_is_zero(S2S1)
    p_inf = core.mm_is_zero(Z1)
    q_inf = core.mm_is_zero(Z2)

    needs_double = h_zero & r_zero & ~p_inf & ~q_inf
    X3 = core.mm_select(q_inf, X1, core.mm_select(p_inf, X2, X3))
    Y3 = core.mm_select(q_inf, Y1, core.mm_select(p_inf, Y2, Y3))
    Z3 = core.mm_select(q_inf, Z1, core.mm_select(p_inf, Z2, Z3))
    return X3, Y3, Z3, needs_double


def _fold_kernel(
    pk, m, ox, oy, oz, oflag, *, n_tuple, np0, one_tuple, nsteps, exact, rt=_RT
):
    """Slot points arrive PACKED: one [L, rt, LANE] u32 plane stack where
    plane p of the first L/2 holds X limbs (2p, 2p+1) as lo|hi<<16 and the
    second L/2 the same for Y — half the gather and HBM stream of split
    u32-limb planes (the byte-bound slot gather was the commit kernel's
    top cost).  A [rt, LANE] tri-state mask rides along: 0 = empty slot,
    1 = add the point, 2 = add its negation (signed-digit layouts); Z is
    rebuilt in-register from the one_mont constant."""
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    packed = pk[:]
    mv = m[:]
    L = len(n_tuple)
    lo = packed & jnp.uint32(0xFFFF)
    hi = packed >> jnp.uint32(16)
    X = jnp.stack([(lo if i % 2 == 0 else hi)[i // 2] for i in range(L)])
    Y = jnp.stack([(lo if i % 2 == 0 else hi)[L // 2 + i // 2] for i in range(L)])
    neg = mv == 2
    Y = core.mm_select(neg, core.mm_sub(jnp.zeros_like(Y), Y, n_tuple), Y)
    mask = mv != 0
    Z = jnp.stack(
        [jnp.where(mask, jnp.uint32(one_tuple[i]), jnp.uint32(0)) for i in range(len(one_tuple))]
    )

    @pl.when(j == 0)
    def _init():
        ox[:], oy[:], oz[:] = X, Y, Z
        oflag[:] = jnp.zeros_like(oflag)

    @pl.when(j > 0)
    def _accum():
        # slot points are affine-form (Z ∈ {0,1}): mixed add, 11 muls
        if exact:
            A, B, C = _jac_madd_planes(ox[:], oy[:], oz[:], X, Y, Z, n_tuple, np0)
        else:
            A, B, C, flag = _jac_madd_planes_fast(
                ox[:], oy[:], oz[:], X, Y, Z, n_tuple, np0
            )
            oflag[:] = oflag[:] | flag.astype(jnp.uint32)
        ox[:], oy[:], oz[:] = A, B, C

    @pl.when(j == nsteps - 1)
    def _reduce_rows():
        # collapse the rt sublane rows into row 0 (log2(rt) roll-halving adds)
        X3, Y3, Z3 = ox[:], oy[:], oz[:]
        s = rt // 2
        shifts = []
        while s >= 1:
            shifts.append(s)
            s //= 2
        for s in shifts:
            X3, Y3, Z3 = _jac_add_planes(
                X3,
                Y3,
                Z3,
                jnp.roll(X3, -s, axis=1),
                jnp.roll(Y3, -s, axis=1),
                jnp.roll(Z3, -s, axis=1),
                n_tuple,
                np0,
            )
        ox[:], oy[:], oz[:] = X3, Y3, Z3


@functools.lru_cache(maxsize=None)
def _build_fold(cap: int, lanes: int, interpret: bool, exact: bool = False):
    from jax.experimental import pallas as pl

    n_tuple, np0 = _fq_consts()
    L = len(n_tuple)
    rt = _fold_rt()
    if cap % rt or (rt & (rt - 1)):
        # the final roll-halving row reduce assumes a power-of-two row
        # tile; a non-pow2 rt that merely divides cap would silently skip
        # rows (ADVICE r4)
        rt = _RT
    assert cap % rt == 0 and lanes % LANE == 0
    nsteps = cap // rt
    in_spec = pl.BlockSpec((L, rt, LANE), lambda i, j: (0, j, i))
    mask_spec = pl.BlockSpec((rt, LANE), lambda i, j: (j, i))
    out_spec = pl.BlockSpec((L, rt, LANE), lambda i, j: (0, 0, i))
    flag_spec = pl.BlockSpec((rt, LANE), lambda i, j: (0, i))
    kernel = functools.partial(
        _fold_kernel,
        n_tuple=n_tuple,
        np0=np0,
        one_tuple=_fq_one_tuple(),
        nsteps=nsteps,
        exact=exact,
        rt=rt,
    )
    return pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((L, rt, lanes), jnp.uint32) for _ in range(3)
        )
        + (jax.ShapeDtypeStruct((rt, lanes), jnp.uint32),),
        grid=(lanes // LANE, nsteps),
        in_specs=[in_spec, mask_spec],
        out_specs=(out_spec,) * 3 + (flag_spec,),
        interpret=interpret,
    )


def _combine_kernel(x, y, z, ox, oy, oz, *, n_tuple, np0, c, max_dbl):
    """total = Σ_w 2^(c*w) T_w in one kernel: every lane doubles in
    parallel (lane w needs c*w doublings; masked), then a roll-based
    lane-tree reduction.  Replaces ~W*(c+1) sequential [1]-point kernel
    launches (the Horner form) with one launch."""
    X, Y, Z = x[:], y[:], z[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, X.shape[1:], dimension=1)

    def body(i, pt):
        X, Y, Z = pt
        dX, dY, dZ = _jac_double_planes(X, Y, Z, n_tuple, np0)
        y_zero = core.mm_is_zero(Y) | core.mm_is_zero(Z)
        dZ = core.mm_select(y_zero, jnp.zeros_like(dZ), dZ)
        cond = i < lane * c
        return (
            core.mm_select(cond, dX, X),
            core.mm_select(cond, dY, Y),
            core.mm_select(cond, dZ, Z),
        )

    X, Y, Z = jax.lax.fori_loop(0, max_dbl, body, (X, Y, Z))
    for s in (64, 32, 16, 8, 4, 2, 1):
        X, Y, Z = _jac_add_planes(
            X,
            Y,
            Z,
            jnp.roll(X, -s, axis=2),
            jnp.roll(Y, -s, axis=2),
            jnp.roll(Z, -s, axis=2),
            n_tuple,
            np0,
        )
    ox[:], oy[:], oz[:] = X, Y, Z


@functools.lru_cache(maxsize=None)
def _build_combine(c: int, num_windows: int, interpret: bool):
    from jax.experimental import pallas as pl

    n_tuple, np0 = _fq_consts()
    L = len(n_tuple)
    kernel = functools.partial(
        _combine_kernel,
        n_tuple=n_tuple,
        np0=np0,
        c=c,
        max_dbl=c * (num_windows - 1),
    )
    spec = pl.BlockSpec((L, _RT, LANE), lambda: (0, 0, 0))
    return pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((L, _RT, LANE), jnp.uint32) for _ in range(3)
        ),
        in_specs=[spec] * 3,
        out_specs=(spec,) * 3,
        interpret=interpret,
    )


def combine_windows(stacked, c: int, interpret: bool = False):
    """Σ_w 2^(c*w) T_w over a [W, 1]-batch Point of window sums -> [1]."""
    W = stacked[0].shape[0]
    assert W <= LANE, "window count exceeds one lane tile"
    planes = []
    for coord in stacked:
        flat = coord.reshape(W, coord.shape[-1])  # [W, 24]
        lm = jnp.moveaxis(flat, -1, 0)  # [24, W]
        lm = jnp.pad(lm, ((0, 0), (0, LANE - W)))[:, None, :]  # [24, 1, 128]
        planes.append(jnp.pad(lm, ((0, 0), (0, _RT - 1), (0, 0))))
    out = _build_combine(c, W, interpret)(*planes)
    return tuple(jnp.moveaxis(o[:, 0, 0:1], 0, -1) for o in out)


def pack_points_xy(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """[.., 24] u32 limb arrays -> [.., 24] packed rows: col p < 12 holds
    X limbs (2p, 2p+1) as lo | hi<<16, cols 12.. the same for Y.  The
    fold's slot gather is byte-bound (~4 GB/s measured), so packing the
    16-bit limbs halves its cost — and halves the resident table."""
    xp = x[..., 0::2] | (x[..., 1::2] << 16)
    yp = y[..., 0::2] | (y[..., 1::2] << 16)
    return jnp.concatenate([xp, yp], axis=-1)


def bucket_fold(packed, trimask, cap: int, interpret: bool = False, exact: bool = False):
    """Σ over the cap axis of a [cap, lanes] affine-form point batch.

    packed: [cap, lanes, 24] pack_points_xy rows (slot j of bucket lane b
    at [j, b]); trimask: [cap, lanes] — 0 = empty slot (identity), 1 = add
    the point, 2 = add its NEGATION (signed-digit layouts negate Y
    in-kernel; G1 has prime order, so y != 0 for every real point).  The Z
    coordinate is implied (affine one for filled slots) and never
    streamed.  Returns a ([lanes]-batch Point of bucket sums,
    doubling-needed count) — the count is 0 unless the no-double fast madd
    degenerated somewhere (see _jac_madd_planes_fast); with exact=True the
    complete madd runs and the count is always 0.  cap must be a multiple
    of 8; lanes is padded to a whole number of 128-lane tiles internally.
    """
    lanes = packed.shape[1]
    pad = -lanes % LANE
    lm = jnp.moveaxis(packed, -1, 0)  # [24, cap, lanes]
    m = trimask.astype(jnp.uint32)
    if pad:
        lm = jnp.pad(lm, ((0, 0), (0, 0), (0, pad)))
        m = jnp.pad(m, ((0, 0), (0, pad)))
    call = _build_fold(cap, lanes + pad, interpret, exact)
    *out, flags = call(lm, m)
    # row 0 of the 8-row accumulator holds the fold result
    return (
        tuple(jnp.moveaxis(o[:, 0, :lanes], 0, -1) for o in out),
        jnp.sum(flags, dtype=jnp.uint32),
    )
