"""Distributed NTT: Bailey four-step over a device mesh.

The reference's FFTs parallelize over rayon threads in shared memory
(SURVEY.md §1 row 9); the TPU-native equivalent shards the coefficient
vector across chips and exchanges data once per transform with an
`all_to_all` over ICI (SURVEY.md §2c item 2, §5.7).

Decomposition (n = n1 * n2, ω the size-n root):
    coeffs viewed as A[i1, i2] with flat index i = i1 + n1*i2, rows sharded;
    1. size-n2 NTTs along rows (local),
    2. twiddle A[i1, k2] *= ω^(i1*k2) (local),
    3. all_to_all transpose to column sharding,
    4. size-n1 NTTs along columns (local);
    output O[k1, k2] holds eval at index k = k1*n2 + k2 (row-major natural
    order), sharded over k2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as PS

from ..fields import active as P
from ..ops import fr, ntt
from ..ops.limbs import ints_to_limbs
from ..snark.domains import Radix2Domain

R = P.R_MODULUS


@functools.lru_cache(maxsize=None)
def _outer_twiddles(n1: int, n2: int, inverse: bool) -> np.ndarray:
    """[n1, n2, 16] Montgomery twiddles ω^(i1*k2)."""
    dom = Radix2Domain(n1 * n2)
    w = dom.group_gen_inv if inverse else dom.group_gen
    rows = []
    for i1 in range(n1):
        wi = pow(w, i1, R)
        acc = 1
        row = []
        for _ in range(n2):
            row.append(acc * P.FR_MONT_R % R)
            acc = acc * wi % R
        rows.extend(row)
    return ints_to_limbs(rows, fr.L).reshape(n1, n2, fr.L)


def _local_ntt_rows(x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    """NTT along axis 1 of [r, c, 16] (vmapped single-chip kernel)."""
    return jax.vmap(lambda v: ntt._ntt_jit(v, inverse))(x)


def ntt_4step(coeffs: jnp.ndarray, mesh: Mesh, axis="x", inverse: bool = False):
    """Distributed NTT of a [n, 16] vector sharded over `axis`.

    `axis` may be one mesh-axis name or a tuple of names treated as one
    flattened data axis (the (dcn, ici) topology — parallel/multihost.py);
    the all_to_all then rides ICI for the intra-slice portion and DCN only
    for the cross-host residual.  Returns evaluations in natural order,
    sharded over the second decomposition axis.  n must split as n1*n2
    with n1 % D == 0 and n2 % D == 0 (D = total data-axis size).
    """
    from .multihost import axis_size

    n = coeffs.shape[0]
    d = axis_size(mesh, axis)
    log_n = n.bit_length() - 1
    n1 = 1 << (log_n // 2)
    n2 = n // n1
    assert n1 % d == 0 and n2 % d == 0, f"n1={n1}, n2={n2} not divisible by mesh {d}"

    tw = jnp.asarray(_outer_twiddles(n1, n2, inverse))

    def local(a, tw_local):
        # a: [n1/d, n2, 16] — this shard's rows (i1 block)
        a = _local_ntt_rows(a, inverse)  # size-n2 NTTs along i2
        a = fr.mul(a, tw_local)  # twiddle ω^(i1*k2)
        # transpose: reshard so each device owns a k2 block
        a = jax.lax.all_to_all(a, axis, split_axis=1, concat_axis=0, tiled=True)
        # now a: [n1, n2/d, 16]; size-n1 NTTs along i1 (axis 0)
        a = jnp.moveaxis(_local_ntt_rows(jnp.moveaxis(a, 0, 1), inverse), 0, 1)
        return a

    # lay out as A[i1, i2] with flat index i = i1 + n1*i2 (column-major read)
    mat = coeffs.reshape(n2, n1, fr.L).swapaxes(0, 1)  # [n1, n2, 16]
    sharded = jax.shard_map(
        local,
        mesh=mesh,
        check_vma=False,
        in_specs=(PS(axis, None, None), PS(axis, None, None)),
        out_specs=PS(None, axis, None),
    )
    out = sharded(mat, tw)  # [n1, n2, 16], natural order on flatten
    # inverse scaling: the two local stages already contribute 1/n2 * 1/n1 = 1/n
    return out.reshape(n, fr.L)


def ntt_sharded_reference(coeffs: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Single-chip result for bitwise-equality tests against ntt_4step."""
    return ntt._ntt_jit(coeffs, inverse)


# --------------------------------------------------------------------------
# resident variant: block-sharded flat vector in, block-sharded flat out
#
# `ntt_4step` above replicates at both boundaries (its i1-sharded input and
# k2-sharded output are both strided sets of the flat index, so entering and
# leaving it from flat arrays reshards/gathers), so a prover chaining
# transforms materializes O(n) per device between calls (VERDICT r2 weak §4
# / SURVEY §5.7).  This variant keeps the FLAT BLOCK sharding at both ends:
#
#   flat i = i1 + n1*i2  ->  matrix A[i2, i1] (reshape [n2, n1] row-major);
#   flat blocks == i2 blocks, so the input is PS(axis) on axis 0 as-is.
#     1. all_to_all #1: transpose to i1-sharded        [n2, n1/d]
#     2. size-n2 NTTs along i2 (local)                 B[k2, i1]
#     3. twiddle ω^(i1*k2) (local)
#     4. all_to_all #2: transpose to k2-sharded        [n2/d, n1]
#     5. size-n1 NTTs along i1 (local)                 X[k2, k1]
#     6. all_to_all #3: transpose to k1-sharded, swap  [n1/d, n2]
#   output flat index k = k1*n2 + k2 (natural order); flat blocks == k1
#   blocks, so the output leaves PS(axis)-sharded with no gather.
#
# Three n/D-sized all_to_alls per transform — strictly less traffic than
# one all_to_all plus the O(n)-per-device gather boundaries of ntt_4step.


def block_sharding(mesh: Mesh, axis="x"):
    """NamedSharding for a [n, L] vector block-sharded over `axis`."""
    from jax.sharding import NamedSharding

    return NamedSharding(mesh, PS(axis, None))


def ntt_4step_resident(coeffs: jnp.ndarray, mesh: Mesh, axis="x", inverse: bool = False):
    """Distributed NTT whose input and output are flat block-sharded.

    coeffs: [n, L] (ideally already placed with `block_sharding`; a
    replicated input is sliced, never gathered).  Returns evaluations in
    natural order, block-sharded over `axis` — safe to chain into further
    sharded elementwise/NTT calls with zero resharding.
    """
    from .multihost import axis_size

    n = coeffs.shape[0]
    d = axis_size(mesh, axis)
    log_n = n.bit_length() - 1
    n1 = 1 << (log_n // 2)
    n2 = n // n1
    assert n1 % d == 0 and n2 % d == 0, f"n1={n1}, n2={n2} not divisible by mesh {d}"

    tw = jnp.asarray(_outer_twiddles(n1, n2, inverse))  # [n1, n2] ω^(i1*k2)

    def local(a, twb):
        # a: [n2/d, n1, L] — this device's flat block (i2 block, all i1)
        # twb: [n1/d, n2, L] — ω^(i1*k2) rows for the i1 block it will own
        a = jax.lax.all_to_all(a, axis, split_axis=1, concat_axis=0, tiled=True)
        # [n2, n1/d, L]: complete i2 — size-n2 NTTs along axis 0
        a = jnp.moveaxis(_local_ntt_rows(jnp.moveaxis(a, 0, 1), inverse), 0, 1)
        # B[k2, i1_local]; twiddle ω^(i1*k2)
        a = fr.mul(a, jnp.swapaxes(twb, 0, 1))
        a = jax.lax.all_to_all(a, axis, split_axis=0, concat_axis=1, tiled=True)
        # [n2/d, n1, L]: complete i1 — size-n1 NTTs along axis 1
        a = _local_ntt_rows(a, inverse)
        # X[k2_local, k1]; transpose to k1-sharded flat blocks
        a = jax.lax.all_to_all(a, axis, split_axis=1, concat_axis=0, tiled=True)
        # [n2, n1/d, L] -> [n1/d, n2, L] rows k1_local
        return jnp.swapaxes(a, 0, 1)

    mat = coeffs.reshape(n2, n1, fr.L)  # A[i2, i1]; flat blocks = i2 blocks
    sharded = jax.shard_map(
        local,
        mesh=mesh,
        check_vma=False,
        in_specs=(PS(axis, None, None), PS(axis, None, None)),
        out_specs=PS(axis, None, None),
    )
    out = sharded(mat, tw)  # [n1, n2, L] k1-sharded = flat blocks
    return out.reshape(n, fr.L)
