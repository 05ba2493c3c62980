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
