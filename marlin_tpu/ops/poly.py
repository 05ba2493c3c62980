"""Dense polynomial kernels over Fr (device).

The `ark-poly` DensePolynomial operation set the reference pins
(SURVEY.md §1 row 7), as array programs over `[len, 16]` Montgomery limb
coefficient vectors.  Lengths are static per call; callers (the AHP
orchestrator) pad to a small set of power-of-two-aligned sizes to bound
recompilation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields import active as P
from . import fr, ntt

R = P.R_MODULUS


def pad_to(p: jnp.ndarray, length: int) -> jnp.ndarray:
    if p.shape[0] < length:
        return jnp.pad(p, ((0, length - p.shape[0]), (0, 0)))
    return p


def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    n = max(a.shape[0], b.shape[0])
    return fr.add(pad_to(a, n), pad_to(b, n))


def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    n = max(a.shape[0], b.shape[0])
    return fr.sub(pad_to(a, n), pad_to(b, n))


def scale(p: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """p * c for a scalar field element c ([16] limbs)."""
    return fr.mul(p, c[None, :])


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Polynomial product via NTT (ark-poly's `&a * &b`, e.g. z_a * z_b at
    reference src/ahp/prover.rs:467)."""
    out_len = a.shape[0] + b.shape[0] - 1
    from ..snark.domains import compute_size_of_domain

    n = compute_size_of_domain(max(1, out_len))
    if n is None:
        # ark-poly panics the same way: the field's subgroup structure
        # cannot host an evaluation domain for this product degree
        raise ValueError(
            f"no evaluation domain of size >= {out_len} is constructible"
        )
    ea, eb = ntt.ntt_many([a, b], n)
    return ntt.intt(fr.mul(ea, eb))[:out_len]


def mul_by_vanishing(p: jnp.ndarray, domain_size: int) -> jnp.ndarray:
    """p(x) * (x^n - 1)  (reference src/ahp/prover.rs:512)."""
    lp = p.shape[0]
    out = jnp.zeros((lp + domain_size, fr.L), dtype=jnp.uint32)
    out = out.at[domain_size:].set(p)
    return fr.sub(out, pad_to(p, lp + domain_size))


def divide_by_vanishing(p: jnp.ndarray, domain_size: int):
    """(quotient, remainder) of p / (x^n - 1).

    Since x^(kn) ≡ 1 (mod x^n - 1): split p into degree-<n blocks B_i;
    remainder = Σ B_i, quotient block i = Σ_{j>i} B_j — a reversed
    exclusive block cumsum, O(len) field adds with no sequential recurrence
    (TPU-friendly replacement for ark-poly's coefficient recurrence;
    reference call sites src/ahp/prover.rs:353,550,686).
    """
    n = domain_size
    lp = p.shape[0]
    if lp <= n:
        return jnp.zeros((1, fr.L), jnp.uint32), pad_to(p, n)[:n]
    nb = -(-lp // n)
    blocks = pad_to(p, nb * n).reshape(nb, n, fr.L)
    # suffix[i] = Σ_{j >= i} B_j via log-depth doubling: nb can be large
    # when the divisor domain is small (w / v_X has nb = |H|/|X| blocks),
    # and a sequential block loop costs nb eager dispatches on the tunnel
    suffix = blocks
    s = 1
    while s < nb:
        shifted = jnp.concatenate(
            [suffix[s:], jnp.zeros((s,) + suffix.shape[1:], suffix.dtype)], axis=0
        )
        suffix = fr.add(suffix, shifted)
        s *= 2
    remainder = suffix[0][:n]
    quotient = suffix[1:].reshape((nb - 1) * n, fr.L)[: lp - n]
    return quotient, remainder


@functools.partial(jax.jit, static_argnums=(1,))
def powers(z: jnp.ndarray, n: int) -> jnp.ndarray:
    """[n, 16] array of [1, z, z^2, ...] via log-depth bit recombination."""
    k = max(1, (n - 1).bit_length())
    out = fr.ones((n,))
    idx = jnp.arange(n, dtype=jnp.uint32)
    z2j = z
    for j in range(k):
        bit = (idx >> j) & 1
        out = fr.select(bit == 1, fr.mul(out, z2j[None, :]), out)
        z2j = fr.sqr(z2j)
    return out


def evaluate(p: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """p(z) -> [16] limbs (z: [16] limbs)."""
    pw = powers(z, p.shape[0])
    return fr.modsum(fr.mul(p, pw))


def evaluate_many(p: jnp.ndarray, zs: list[jnp.ndarray]) -> list[jnp.ndarray]:
    return [evaluate(p, z) for z in zs]


@jax.jit
def evaluate_batch(coeffs: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Evaluate a stack of (padded) polynomials at one point.

    coeffs: [m, len, 16]; z: [16] -> [m, 16].  One kernel for all the
    query-set evaluations of a round (reference src/lib.rs:272-287).
    """
    pw = powers(z, coeffs.shape[1])
    prods = fr.mul(coeffs, pw[None, :, :])
    return jax.vmap(fr.modsum)(prods)


def _suffix_sums(x: jnp.ndarray) -> jnp.ndarray:
    """Reversed inclusive prefix-sum over Fr (log-depth associative scan)."""
    return jax.lax.associative_scan(fr.add, x, reverse=True)


@jax.jit
def div_by_linear(p: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """(p(x) - p(z)) / (x - z) -> [len-1, 16]; the KZG witness polynomial.

    TPU-friendly closed form (no sequential synthetic division): with
    u_i = p_i z^i and suffix sums S_j = Σ_{i>j} u_i, the quotient is
    w_j = S_j * z^{-(j+1)}.  Requires z != 0 (query points are random field
    elements; z = 0 cannot occur for sampled challenges).
    """
    n = p.shape[0]
    zpow = powers(z, n)
    u = fr.mul(p, zpow)
    s = _suffix_sums(u)  # S'_j = Σ_{i>=j} u_i ; we need shifted-by-one sums
    s_shift = jnp.concatenate([s[1:], fr.zeros((1,))], axis=0)  # Σ_{i>j}
    zinv = fr.inv(z)
    zinv_pows = powers(zinv, n)  # zinv^j
    w = fr.mul(fr.mul(s_shift, zinv_pows), zinv[None, :])  # * zinv^{j+1}
    return w[: n - 1]


def degree(p: jnp.ndarray) -> int:
    """Actual degree (host sync; for asserts/tests only)."""
    nz = jnp.any(p != 0, axis=-1)
    idx = jnp.where(nz, jnp.arange(p.shape[0]), -1)
    return int(jnp.max(idx))
