"""Radix-2 NTT over Fr on device.

Re-implements ark-poly's radix-2 FFT/iFFT (the reference's single hottest
non-MSM primitive: ~15 transforms per prove, SURVEY.md §3.3) as a batched
JAX butterfly network over `[n, 16]` Montgomery limb vectors.

Single-chip path: iterative decimation-in-time — bit-reverse gather, then
log2(n) stages; each stage is one batched field mul + add/sub over the whole
vector, which XLA fuses into wide VPU code.  The multi-chip Bailey four-step
variant lives in parallel/ntt_sharded.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import active as P
from . import fr
from .limbs import ints_to_limbs

R = P.R_MODULUS


@functools.lru_cache(maxsize=None)
def _plan(n: int, inverse: bool, root: int | None = None):
    """(bitrev permutation [n], per-stage twiddles tuple) — host precompute.

    `root` overrides the canonical 2-adic generator (the mixed-radix
    decomposition runs its radix-2 inner transforms with ω^{n1}, which is a
    different primitive 2^k-th root than Radix2Domain's); the butterfly
    network is root-agnostic.  When `root` is given it must already be
    inverted for inverse transforms.
    """
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    # bit-reversal permutation
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    # stage twiddles: stage s operates on half-blocks of m = 2^s,
    # twiddle w_{2m}^j for j < m, w_{2m} = g^(n / 2m)
    if root is None:
        from ..snark.domains import Radix2Domain

        dom = Radix2Domain(n)
        g = dom.group_gen_inv if inverse else dom.group_gen
    else:
        g = root
    stages = []
    for s in range(log_n):
        m = 1 << s
        w = pow(g, n // (2 * m), R)
        tw = [1] * m
        for j in range(1, m):
            tw[j] = tw[j - 1] * w % R
        mont = [t * P.FR_MONT_R % R for t in tw]
        stages.append(ints_to_limbs(mont, fr.L))
    return rev, tuple(stages)


@functools.lru_cache(maxsize=None)
def _plan_planes(n: int, inverse: bool, root: int | None = None):
    """Per-stage FULL twiddle planes for the fused Pallas kernel
    (pallas/ntt.py): TW_s[i] = mont(w_{2m}^{i mod m}) tiled to the kernel
    block length B — the plane is m-periodic, so one [B, L] block serves
    every grid block of every transform in a batch."""
    from .pallas import ntt as pntt

    b = pntt.block_size(n)
    log_b = b.bit_length() - 1
    if root is None:
        from ..snark.domains import Radix2Domain

        dom = Radix2Domain(n)
        g = dom.group_gen_inv if inverse else dom.group_gen
    else:
        g = root
    planes = []
    for s in range(log_b):
        m = 1 << s
        w = pow(g, n // (2 * m), R)
        tw = [1] * m
        for j in range(1, m):
            tw[j] = tw[j - 1] * w % R
        mont = [t * P.FR_MONT_R % R for t in tw]
        planes.append(ints_to_limbs(mont * (b // m), fr.L))
    return tuple(planes)


def _use_fused(n: int) -> bool:
    import os

    from .pallas import routing as _routing

    return (
        _routing.use_pallas()
        and n >= 1024
        and os.environ.get("MARLIN_TPU_FUSE_NTT", "1") == "1"
    )


@functools.lru_cache(maxsize=None)
def _mixed_plan(n: int, inverse: bool):
    """Host precompute for the Cooley-Tukey n = n1 * n2 decomposition
    (n1 = base^s small-DFT part, n2 = 2^k butterfly part):
    (n1, n2, radix-2 plan for n2 with root ω^{n1},
     twiddle matrix W[j1, k2] = ω^{j1 k2},
     small-DFT matrix M[k1, j1] = (ω^{n2})^{j1 k1})."""
    from ..snark.domains import MixedRadixDomain, factor_size

    two, base, exp = factor_size(n)
    n1, n2 = base**exp, 1 << two
    assert n1 > 1, "mixed plan requires a small-subgroup factor"
    dom = MixedRadixDomain(n)
    w = dom.group_gen_inv if inverse else dom.group_gen
    rev, stages = (np.zeros(1, np.int32), ()) if n2 == 1 else _plan(
        n2, inverse, root=pow(w, n1, R)
    )
    mont = lambda v: v * P.FR_MONT_R % R
    W = ints_to_limbs(
        [mont(pow(w, j1 * k2, R)) for j1 in range(n1) for k2 in range(n2)], fr.L
    ).reshape(n1, n2, fr.L)
    wn2 = pow(w, n2, R)
    M = ints_to_limbs(
        [mont(pow(wn2, j1 * k1, R)) for k1 in range(n1) for j1 in range(n1)], fr.L
    ).reshape(n1, n1, fr.L)
    return n1, n2, rev, stages, W, M


def _ntt_core(x: jnp.ndarray, rev: jnp.ndarray, stages, planes=None) -> jnp.ndarray:
    n = x.shape[0]
    x = x[rev]
    skip = 0
    if planes:
        from .pallas import ntt as pntt

        x = pntt.fused_stages(x, [jnp.asarray(p) for p in planes], fr.CTX)
        skip = len(planes)
    for tw in stages[skip:]:
        m = tw.shape[0]
        x = x.reshape(n // (2 * m), 2, m, fr.L)
        e, o = x[:, 0], x[:, 1]
        t = fr.mul(o, tw[None, :, :])
        x = jnp.stack([fr.add(e, t), fr.sub(e, t)], axis=1)
    return x.reshape(n, fr.L)


@functools.partial(jax.jit, static_argnums=(1,))
def _ntt_jit(x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    n = x.shape[0]
    rev, stages = _plan(n, inverse)
    planes = _plan_planes(n, inverse) if _use_fused(n) else None
    out = _ntt_core(x, jnp.asarray(rev), [jnp.asarray(s) for s in stages], planes)
    if inverse:
        n_inv = fr.from_int(pow(n, -1, R))
        out = fr.mul(out, n_inv[None, :])
    return out


def _ntt_mixed_core(x, rev, stages, W, M, n1: int, n2: int, planes=None) -> jnp.ndarray:
    """Cooley-Tukey: input split j = j1 + n1*j2, output k = k1*n2 + k2.

    Inner: n1 batched radix-2 NTTs of size n2 (root ω^{n1}) — through the
    fused Pallas stage kernel when available (each kernel block lies
    inside one transform, and the m-periodic twiddle planes are shared by
    every transform in the batch); twiddle by W[j1, k2]; outer: direct
    small DFT over j1 (n1 = base^s <= 9, so the matrix product is a
    handful of batched field mul-adds — VPU-friendly, no scalar loops)."""
    n = n1 * n2
    x = x.reshape(n2, n1, fr.L).swapaxes(0, 1)  # [n1, n2, L]: [j1, j2]
    x = x[:, rev, :]
    skip = 0
    if planes:
        from .pallas import ntt as pntt

        flat = pntt.fused_stages(
            x.reshape(n1 * n2, fr.L), [jnp.asarray(p) for p in planes], fr.CTX
        )
        x = flat.reshape(n1, n2, fr.L)
        skip = len(planes)
    for tw in stages[skip:]:
        m = tw.shape[0]
        x = x.reshape(n1, n2 // (2 * m), 2, m, fr.L)
        e, o = x[:, :, 0], x[:, :, 1]
        t = fr.mul(o, tw[None, None])
        x = jnp.stack([fr.add(e, t), fr.sub(e, t)], axis=2)
    x = x.reshape(n1, n2, fr.L)
    x = fr.mul(x, W)
    acc = fr.mul(x[0][None], M[:, 0][:, None])  # [n1(k1), n2, L]
    for j1 in range(1, n1):
        acc = fr.add(acc, fr.mul(x[j1][None], M[:, j1][:, None]))
    return acc.reshape(n, fr.L)


@functools.partial(jax.jit, static_argnums=(1,))
def _ntt_mixed_jit(x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    n = x.shape[0]
    n1, n2, rev, stages, W, M = _mixed_plan(n, inverse)
    planes = None
    if _use_fused(n2):
        from ..snark.domains import MixedRadixDomain

        w = MixedRadixDomain(n).group_gen_inv if inverse else MixedRadixDomain(n).group_gen
        planes = _plan_planes(n2, inverse, root=pow(w, n1, R))
    out = _ntt_mixed_core(
        x,
        jnp.asarray(rev),
        [jnp.asarray(s) for s in stages],
        jnp.asarray(W),
        jnp.asarray(M),
        n1,
        n2,
        planes,
    )
    if inverse:
        n_inv = fr.from_int(pow(n, -1, R))
        out = fr.mul(out, n_inv[None, :])
    return out


def _ntt_core_batched(x: jnp.ndarray, rev: jnp.ndarray, stages, planes=None) -> jnp.ndarray:
    """[B, n, L] batched butterfly network (shared plan across the batch).

    The fused Pallas stage kernel sees the flattened [B*n, L] array: each
    grid block lies inside ONE transform (n % block == 0), and the
    m-periodic twiddle planes are identical for every transform, so the
    same compiled kernel serves any batch size with one launch."""
    bsz, n, _ = x.shape
    x = x[:, rev]
    skip = 0
    if planes:
        from .pallas import ntt as pntt

        flat = pntt.fused_stages(
            x.reshape(bsz * n, fr.L), [jnp.asarray(p) for p in planes], fr.CTX
        )
        x = flat.reshape(bsz, n, fr.L)
        skip = len(planes)
    for tw in stages[skip:]:
        m = tw.shape[0]
        x = x.reshape(bsz, n // (2 * m), 2, m, fr.L)
        e, o = x[:, :, 0], x[:, :, 1]
        t = fr.mul(o, tw[None, None])
        x = jnp.stack([fr.add(e, t), fr.sub(e, t)], axis=2)
    return x.reshape(bsz, n, fr.L)


@functools.partial(jax.jit, static_argnums=(1,))
def _ntt_batch_jit(x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    n = x.shape[1]
    rev, stages = _plan(n, inverse)
    planes = _plan_planes(n, inverse) if _use_fused(n) else None
    out = _ntt_core_batched(
        x, jnp.asarray(rev), [jnp.asarray(s) for s in stages], planes
    )
    if inverse:
        n_inv = fr.from_int(pow(n, -1, R))
        out = fr.mul(out, n_inv[None, None, :])
    return out


def _batchable(n: int, count: int) -> bool:
    from ..parallel import context as pctx

    return count > 1 and not (n & (n - 1)) and (
        pctx.current() is None or n < pctx.NTT_MIN_SHARDED
    )


def ntt_many(polys: list, n: int) -> list:
    """Forward NTTs of several polynomials onto one shared size-n domain in
    a single launch (VERDICT r4 task 5: the prover issues ~15 transforms
    per prove — reference src/ahp/prover.rs:326,488,532-535 — and batching
    the independent ones amortizes dispatch and fills the VPU).

    Falls back to per-poly `ntt` for mixed-radix sizes and mesh-sharded
    transforms (both have their own routers).  Bit-identical to the
    per-poly path."""
    if not _batchable(n, len(polys)):
        return [ntt(p, n) for p in polys]
    stacked = jnp.stack([_pad_for(p, n) for p in polys])
    out = _ntt_batch_jit(stacked, False)
    return [out[i] for i in range(len(polys))]


def intt_many(evals: list) -> list:
    """Inverse NTTs of several same-size evaluation vectors, one launch."""
    n = evals[0].shape[0]
    assert all(e.shape[0] == n for e in evals)
    if not _batchable(n, len(evals)):
        return [intt(e) for e in evals]
    out = _ntt_batch_jit(jnp.stack(evals), True)
    return [out[i] for i in range(len(evals))]


def _pad_for(coeffs: jnp.ndarray, n: int) -> jnp.ndarray:
    ln = coeffs.shape[0]
    if ln > n:
        raise ValueError(f"poly of length {ln} does not fit domain of size {n}")
    if ln < n:
        return jnp.pad(coeffs, ((0, n - ln), (0, 0)))
    return coeffs


def _sharded_or_none(x: jnp.ndarray, inverse: bool):
    """Four-step mesh NTT when a parallel context is active and the size
    divides over the mesh (the rayon-parallel-FFT analog; see
    parallel/context.py)."""
    from ..parallel import context as pctx

    ctx = pctx.current()
    n = x.shape[0]
    if ctx is None or n < pctx.NTT_MIN_SHARDED:
        return None
    d = ctx.num_devices
    log_n = n.bit_length() - 1
    n1 = 1 << (log_n // 2)
    if n1 % d or (n // n1) % d:
        return None
    from ..parallel.ntt_sharded import ntt_4step_resident

    # resident variant: flat block sharding at BOTH ends, so chained
    # NTT -> elementwise -> iNTT sequences inside a round never gather a
    # full copy per device (SURVEY §5.7 domain sharding; VERDICT r3 #4)
    return ntt_4step_resident(x, ctx.mesh, ctx.axis, inverse=inverse)


def ntt(coeffs: jnp.ndarray, n: int | None = None) -> jnp.ndarray:
    """Forward NTT: coefficients -> evaluations at [1, g, g^2, ...].

    Zero-pads to `n` (or next power of two) like ark-poly's
    `domain.fft(&poly)` (reference src/ahp/prover.rs:326).
    """
    ln = coeffs.shape[0]
    if n is None:
        from ..snark.domains import compute_size_of_domain

        n = compute_size_of_domain(max(1, ln))
        if n is None:
            raise ValueError(f"no evaluation domain of size >= {ln}")
    if ln < n:
        coeffs = jnp.pad(coeffs, ((0, n - ln), (0, 0)))
    elif ln > n:
        raise ValueError(f"poly of length {ln} does not fit domain of size {n}")
    if n & (n - 1):
        return _ntt_mixed_jit(coeffs, False)
    out = _sharded_or_none(coeffs, False)
    return out if out is not None else _ntt_jit(coeffs, False)


def intt(evals: jnp.ndarray) -> jnp.ndarray:
    """Inverse NTT: evaluations on the size-n domain -> coefficients.

    Matches `Evaluations::interpolate` (reference
    src/ahp/constraint_systems.rs:234-239 and throughout the prover).
    """
    n = evals.shape[0]
    if n & (n - 1):
        return _ntt_mixed_jit(evals, True)
    out = _sharded_or_none(evals, True)
    return out if out is not None else _ntt_jit(evals, True)


@functools.lru_cache(maxsize=None)
def domain_elements(n: int) -> jnp.ndarray:
    """[n, 16] device array of [1, g, g^2, ...] in Montgomery form (cached)."""
    from ..snark.domains import domain_of_size

    dom = domain_of_size(n)
    elems = dom.elements()
    return jnp.asarray(ints_to_limbs([e * P.FR_MONT_R % R for e in elems], fr.L))

