"""Batched BLS12-381 G1 arithmetic on device (Jacobian over Fq limbs).

The curve layer the polynomial-commitment kernels (ops/msm.py, snark/kzg.py)
run on — re-implementing the `ark-ec` group-operation surface the reference
reaches through every `PC::commit/open` call (SURVEY.md §2b row 2).

Representation: a point batch is a dict-free tuple (X, Y, Z) of `[.., 24]`
Fq Montgomery limb arrays, Jacobian coordinates, identity <=> Z == 0.
All group-law edge cases (identity operands, P == Q, P == -Q) are resolved
branchlessly with selects so the same compiled program serves every lane —
the TPU-native replacement for arkworks' per-point branches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import active as P
from . import fq
from .limbs import ints_to_limbs

Point = tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # (X, Y, Z) Jacobian


def from_affine_ints(points: list) -> Point:
    """List of affine (x, y) int tuples (None = identity) -> device batch."""
    xs, ys, zs = [], [], []
    for p in points:
        if p is None:
            xs.append(0)
            ys.append(1)
            zs.append(0)
        else:
            xs.append(p[0])
            ys.append(p[1])
            zs.append(1)
    mont = lambda vs: ints_to_limbs([v * P.FQ_MONT_R % P.Q_MODULUS for v in vs], fq.L)
    return (
        jnp.asarray(mont(xs)),
        jnp.asarray(mont(ys)),
        jnp.asarray(mont(zs)),
    )


def to_affine_ints(pt: Point) -> list:
    """Device batch -> list of affine (x, y) tuples / None (host sync)."""
    X, Y, Z = pt
    zinv = fq.inv(Z)
    zinv2 = fq.sqr(zinv)
    x = fq.mul(X, zinv2)
    y = fq.mul(Y, fq.mul(zinv2, zinv))
    xs = fq.to_ints(x)
    ys = fq.to_ints(y)
    inf = np.asarray(jax.device_get(fq.is_zero(Z))).reshape(-1)
    return [None if i else (a, b) for a, b, i in zip(xs, ys, inf)]


def to_affine_ints_host(pt: Point) -> list:
    """Like `to_affine_ints` but with the normalization on the HOST.

    The device version runs a batched Fermat inversion — appropriate when
    the batch stays on device, but a ~10 s stall per call on the XLA:CPU
    backend.  Here only the raw Jacobian limbs transfer (no device
    compute) and the Z inversions collapse into ONE modular inverse via
    the Montgomery prefix-product trick in host ints.

    All three coordinate planes come back in a single device_get: on the
    tunneled TPU each fetch costs a ~30-45 ms round trip, and the commit
    path syncs here 4x per prove (VERDICT r4 task 2: audit the fetch)."""
    x_raw, y_raw, z_raw = jax.device_get((pt[0], pt[1], pt[2]))
    return affine_ints_from_raw(x_raw, y_raw, z_raw)


def affine_ints_from_raw(x_raw, y_raw, z_raw) -> list:
    """Host-side tail of to_affine_ints_host over already-fetched limb
    arrays (callers piggyback extra scalars on the same device_get)."""
    q = P.Q_MODULUS
    xs = fq.to_ints(x_raw)
    ys = fq.to_ints(y_raw)
    zs = fq.to_ints(z_raw)
    nonzero = [z for z in zs if z != 0]
    if not nonzero:
        return [None] * len(zs)
    prefix = []
    acc = 1
    for z in nonzero:
        acc = acc * z % q
        prefix.append(acc)
    inv_all = pow(acc, -1, q)
    invs = [0] * len(nonzero)
    for i in range(len(nonzero) - 1, -1, -1):
        invs[i] = inv_all * (prefix[i - 1] if i else 1) % q
        inv_all = inv_all * nonzero[i] % q
    out = []
    k = 0
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(None)
            continue
        zi = invs[k]
        k += 1
        zi2 = zi * zi % q
        out.append((x * zi2 % q, y * zi2 % q * zi % q))
    return out


def identity(shape=()) -> Point:
    return (fq.zeros(shape), fq.ones(shape), fq.zeros(shape))


def is_identity(p: Point) -> jnp.ndarray:
    return fq.is_zero(p[2])


def negate(p: Point) -> Point:
    return (p[0], fq.neg(p[1]), p[2])


def _bmul(pairs):
    """One stacked mont_mul for several independent products.

    Collapsing a group-law layer's muls into a single wider kernel keeps the
    compiled graph small (TPU compile time scales badly with the number of
    mont_mul instances) and gives the VPU wider lanes.
    """
    a = jnp.stack([x for x, _ in pairs])
    b = jnp.stack([y for _, y in pairs])
    out = fq.mul(a, b)
    return [out[i] for i in range(len(pairs))]


def double(p: Point) -> Point:
    """Jacobian doubling, a = 0 (dbl-2009-l).  Y=0 or Z=0 -> Z3=0 (identity).

    On TPU this is one fused Pallas kernel (pallas/curve.py); the
    decomposed per-field-op form below serves CPU and is the
    bit-equivalence reference for the kernel.
    """
    from .pallas import curve as pcurve
    from .pallas import routing as _routing

    if _routing.use_pallas():
        return pcurve.double(p)
    return _double_xla(p)


def _double_xla(p: Point) -> Point:
    X, Y, Z = p
    A, B, YZ = _bmul([(X, X), (Y, Y), (Y, Z)])
    C, t = _bmul([(B, B), (fq.add(X, B), fq.add(X, B))])
    tAC = fq.sub(fq.sub(t, A), C)
    D = fq.add(tAC, tAC)  # 2*((X+B)^2 - A - C)
    E = fq.add(fq.add(A, A), A)
    F, = _bmul([(E, E)])
    X3 = fq.sub(F, fq.add(D, D))
    C4 = fq.add(fq.add(C, C), fq.add(C, C))
    C8 = fq.add(C4, C4)
    EDX, = _bmul([(E, fq.sub(D, X3))])
    Y3 = fq.sub(EDX, C8)
    Z3 = fq.add(YZ, YZ)
    return (X3, Y3, Z3)


def add(p: Point, q: Point) -> Point:
    """Complete branchless Jacobian addition (add-2007-bl + selects).

    On TPU: one fused Pallas kernel.  CPU: layers of stacked XLA muls.
    """
    from .pallas import curve as pcurve
    from .pallas import routing as _routing

    if _routing.use_pallas():
        return pcurve.add(p, q)
    return _add_xla(p, q)


def _add_xla(p: Point, q: Point) -> Point:
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    Z1Z1, Z2Z2 = _bmul([(Z1, Z1), (Z2, Z2)])
    U1, U2, A1, A2 = _bmul([(X1, Z2Z2), (X2, Z1Z1), (Y1, Z2), (Y2, Z1)])
    zsum = fq.add(Z1, Z2)
    S1, S2, ZZ = _bmul([(A1, Z2Z2), (A2, Z1Z1), (zsum, zsum)])
    H = fq.sub(U2, U1)
    HH = fq.add(H, H)
    S2S1 = fq.sub(S2, S1)
    r = fq.add(S2S1, S2S1)
    I, rsq, Z3 = _bmul([(HH, HH), (r, r), (fq.sub(fq.sub(ZZ, Z1Z1), Z2Z2), H)])
    J, V = _bmul([(H, I), (U1, I)])
    X3 = fq.sub(fq.sub(rsq, J), fq.add(V, V))
    S1J, rVX = _bmul([(S1, J), (r, fq.sub(V, X3))])
    Y3 = fq.sub(rVX, fq.add(S1J, S1J))

    h_zero = fq.is_zero(H)
    r_zero = fq.is_zero(S2S1)
    p_inf = fq.is_zero(Z1)
    q_inf = fq.is_zero(Z2)

    dbl = double(p)
    # same x: r==0 -> doubling; r!=0 -> opposite points -> identity (Z3=0 already)
    use_dbl = h_zero & r_zero & ~p_inf & ~q_inf
    X3 = fq.select(use_dbl, dbl[0], X3)
    Y3 = fq.select(use_dbl, dbl[1], Y3)
    Z3 = fq.select(use_dbl, dbl[2], Z3)
    # identity operands
    X3 = fq.select(q_inf, X1, fq.select(p_inf, X2, X3))
    Y3 = fq.select(q_inf, Y1, fq.select(p_inf, Y2, Y3))
    Z3 = fq.select(q_inf, Z1, fq.select(p_inf, Z2, Z3))
    return (X3, Y3, Z3)


def select_point(cond: jnp.ndarray, a: Point, b: Point) -> Point:
    return (
        fq.select(cond, a[0], b[0]),
        fq.select(cond, a[1], b[1]),
        fq.select(cond, a[2], b[2]),
    )


def gather(p: Point, idx: jnp.ndarray) -> Point:
    return (p[0][idx], p[1][idx], p[2][idx])


@jax.jit
def tree_reduce_add(p: Point) -> Point:
    """Sum a [n]-batch of points to a single [1]-point.

    Fan-in-16 levels: each level reshapes to [m, 16] and folds the 16
    columns with a fori_loop, so the compiled graph contains only
    ~log16(n) point-add instances (XLA compile time on this graph is the
    binding constraint, not FLOPs).
    """
    FAN = 16
    n = p[0].shape[0]
    while n > 1:
        pad = (-n) % FAN
        if pad:
            ident = identity((pad,))
            p = tuple(jnp.concatenate([p[i], ident[i]]) for i in range(3))
            n += pad
        m = n // FAN
        cols = tuple(p[i].reshape(m, FAN, -1) for i in range(3))

        def body(j, acc, cols=cols):
            nxt = tuple(
                jax.lax.dynamic_slice_in_dim(cols[i], j, 1, axis=1)[:, 0] for i in range(3)
            )
            return add(acc, nxt)

        acc0 = tuple(cols[i][:, 0] for i in range(3))
        p = jax.lax.fori_loop(1, FAN, body, acc0)
        n = m
    return p


@jax.jit
def normalize_batch(p: Point) -> Point:
    """Jacobian -> affine-form Jacobian (Z in {0,1}) via batched inversion.

    The arkworks analog is `batch_normalization` (affine conversion with
    shared inversions); here Fermat inversion over the whole batch.
    """
    X, Y, Z = p
    zinv = fq.inv(Z)  # 0 stays 0
    zinv2 = fq.sqr(zinv)
    x = fq.mul(X, zinv2)
    y = fq.mul(Y, fq.mul(zinv2, zinv))
    inf = fq.is_zero(Z)
    one = fq.ones(Z.shape[:-1])
    return (
        fq.select(inf, fq.zeros(Z.shape[:-1]), x),
        fq.select(inf, one, y),
        fq.select(inf, fq.zeros(Z.shape[:-1]), one),
    )


@functools.partial(jax.jit, static_argnums=(2,))
def scalar_mul_batch(points: Point, scalar_limbs: jnp.ndarray, num_bits: int = 255) -> Point:
    """Elementwise s_i * P_i over a batch (double-and-add, MSB-first).

    scalar_limbs: [n, 16] canonical (non-Montgomery) base-2^16 Fr limbs.
    Used for SRS generation (powers of tau) and small commitment fixups.
    """

    def bit_at(k):
        limb = scalar_limbs[..., k // 16]
        return (limb >> (k % 16)) & 1

    def body(i, acc):
        k = num_bits - 1 - i
        acc = double(acc)
        added = add(acc, points)
        return select_point(bit_at(k) == 1, added, acc)

    n = points[0].shape[0]
    return jax.lax.fori_loop(0, num_bits, body, identity((n,)))
