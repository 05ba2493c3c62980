"""Distributed MSM over a device mesh.

The rayon-parallel Pippenger inside the reference's `PC::commit`
(SURVEY.md §2c item 3) becomes pure data parallelism over chips: each
device computes the MSM of its (points, scalars) shard with the single-chip
kernel, then the per-device partial sums are gathered and tree-reduced —
the point-add analog of a psum (point addition is not an XLA reduction
primitive, so the combine is an explicit all_gather + fold).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as PS

from ..ops import bigint as bi
from ..ops import curve_device as cd
from ..ops import fr

FR_BITS = 255


def msm_sharded(points: cd.Point, scalars_mont: jnp.ndarray, mesh: Mesh, axis: str = "x") -> cd.Point:
    """Σ_i s_i P_i with (points, scalars) sharded over `axis`.

    Result is replicated on every device (shape [1] Jacobian point).
    """

    def local(px, py, pz, scal):
        canonical = bi.from_mont(fr.CTX, scal)
        part = cd.scalar_mul_batch((px, py, pz), canonical, FR_BITS)
        part = cd.tree_reduce_add(part)  # [1] local partial
        gathered = tuple(
            jax.lax.all_gather(part[i], axis, axis=0, tiled=True) for i in range(3)
        )
        return cd.tree_reduce_add(gathered)

    shard = jax.shard_map(
        local,
        mesh=mesh,
        check_vma=False,
        in_specs=(PS(axis, None), PS(axis, None), PS(axis, None), PS(axis, None)),
        out_specs=(PS(None, None), PS(None, None), PS(None, None)),
    )
    return shard(points[0], points[1], points[2], scalars_mont)
