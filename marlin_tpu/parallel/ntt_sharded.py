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
