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
def _plan(n: int, inverse: bool):
    """(bitrev permutation [n], per-stage twiddles tuple) — host precompute."""
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    # bit-reversal permutation
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    # stage twiddles: stage s operates on half-blocks of m = 2^s,
    # twiddle w_{2m}^j for j < m, w_{2m} = g^(n / 2m)
    from ..snark.domains import Radix2Domain

    dom = Radix2Domain(n)
    g = dom.group_gen_inv if inverse else dom.group_gen
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


def _ntt_core(x: jnp.ndarray, rev: jnp.ndarray, stages) -> jnp.ndarray:
    n = x.shape[0]
    x = x[rev]
    for tw in stages:
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
    out = _ntt_core(x, jnp.asarray(rev), [jnp.asarray(s) for s in stages])
    if inverse:
        n_inv = fr.from_int(pow(n, -1, R))
        out = fr.mul(out, n_inv[None, :])
    return out


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
    from ..parallel.ntt_sharded import ntt_4step

    return ntt_4step(x, ctx.mesh, ctx.axis, inverse=inverse)


def ntt(coeffs: jnp.ndarray, n: int | None = None) -> jnp.ndarray:
    """Forward NTT: coefficients -> evaluations at [1, g, g^2, ...].

    Zero-pads to `n` (or next power of two) like ark-poly's
    `domain.fft(&poly)` (reference src/ahp/prover.rs:326).
    """
    ln = coeffs.shape[0]
    if n is None:
        n = 1 << max(0, (ln - 1)).bit_length()
    if ln < n:
        coeffs = jnp.pad(coeffs, ((0, n - ln), (0, 0)))
    elif ln > n:
        raise ValueError(f"poly of length {ln} does not fit domain of size {n}")
    out = _sharded_or_none(coeffs, False)
    return out if out is not None else _ntt_jit(coeffs, False)


def intt(evals: jnp.ndarray) -> jnp.ndarray:
    """Inverse NTT: evaluations on the size-n domain -> coefficients.

    Matches `Evaluations::interpolate` (reference
    src/ahp/constraint_systems.rs:234-239 and throughout the prover).
    """
    n = evals.shape[0]
    assert n & (n - 1) == 0, "evaluation vector must have power-of-two length"
    out = _sharded_or_none(evals, True)
    return out if out is not None else _ntt_jit(evals, True)


@functools.lru_cache(maxsize=None)
def domain_elements(n: int) -> jnp.ndarray:
    """[n, 16] device array of [1, g, g^2, ...] in Montgomery form (cached)."""
    from ..snark.domains import Radix2Domain

    dom = Radix2Domain(n)
    elems = dom.elements()
    return jnp.asarray(ints_to_limbs([e * P.FR_MONT_R % R for e in elems], fr.L))

