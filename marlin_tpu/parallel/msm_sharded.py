"""Distributed MSM over a device mesh.

The rayon-parallel Pippenger inside the reference's `PC::commit`
(SURVEY.md §2c item 3) becomes pure data parallelism over chips: each
device runs a full windowed-bucket **Pippenger** over its (points,
scalars) shard — bucket accumulation, bucket combine, and window Horner
are all linear, so they complete shard-locally — and the per-device
partial sums are gathered and tree-reduced (the point-add analog of a
psum; point addition is not an XLA reduction primitive, so the combine is
an explicit all_gather + fold).

The shard-local kernel is `ops.msm.pippenger_device`, the jit/shard_map
twin of the host-orchestrated single-chip path.  Its statically-capped
bucket matrix can (with cosmically small probability for FS-derived
scalars) drop entries; every device reports a spill count, and the
wrapper reruns the exact single-chip path when any shard spilled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as PS

from ..ops import bigint as bi
from ..ops import curve_device as cd
from ..ops import fr
from ..ops import msm as msm_mod

from ..fields import active as P

FR_BITS = P.FR_BITS


def _local_pippenger(px, py, pz, scal, axis, c: int):
    canonical = bi.from_mont(fr.CTX, scal)
    part, spill = msm_mod.pippenger_device((px, py, pz), canonical, c)
    gathered = tuple(
        jax.lax.all_gather(part[i], axis, axis=0, tiled=True) for i in range(3)
    )
    total = cd.tree_reduce_add(gathered)
    return total + (jax.lax.psum(spill, axis),)


def _local_window_block(px, py, pz, scal_shard, n: int, axis, c: int, wpd: int):
    """Window-sharded body: this device owns windows [idx*wpd, (idx+1)*wpd)
    over the FULL point set (points arrive replicated).  Per-window bucket
    statistics match the single-chip kernel regardless of D, fixing the
    small-n/D efficiency collapse of point sharding (per-shard windows
    shrink as n/D drops).  The cross-device combine is an all_gather of
    D*wpd window sums (tiny) + the standard Horner combine.

    Scalars arrive SHARDED: the Montgomery->canonical conversion is ~9%
    of the whole MSM's flops, so running it replicated capped scaling
    efficiency — each device converts its n/D slice and the canonical
    limbs (n*64B, tiny) are all_gathered."""
    from .multihost import axis_flat_index

    canon_local = bi.from_mont(fr.CTX, scal_shard)
    canonical = jax.lax.all_gather(canon_local, axis, axis=0, tiled=True)[:n]
    w0 = axis_flat_index(axis) * wpd
    stacked, spill = msm_mod.pippenger_device_window_block(
        (px, py, pz), canonical, c, wpd, w0
    )
    gathered = tuple(
        jax.lax.all_gather(stacked[i], axis, axis=0, tiled=True) for i in range(3)
    )
    total = msm_mod._combine_windows(gathered, c)
    return total + (jax.lax.psum(spill, axis),)


def _local_ladder(px, py, pz, scal, axis):
    canonical = bi.from_mont(fr.CTX, scal)
    part = cd.scalar_mul_batch((px, py, pz), canonical, FR_BITS)
    part = cd.tree_reduce_add(part)
    gathered = tuple(
        jax.lax.all_gather(part[i], axis, axis=0, tiled=True) for i in range(3)
    )
    return cd.tree_reduce_add(gathered)


def msm_sharded_core(
    points: cd.Point, scalars_mont: jnp.ndarray, mesh: Mesh, axis="x"
):
    """Jittable SPMD body: returns (point, spill_count).

    `spill` is a replicated int32 scalar (always 0 on the small-n ladder
    path).  Callers that cannot host-sync (inside jit, or compile-stat
    probes) use this directly; `msm_sharded` adds the host spill check.
    `axis` may be a tuple of mesh-axis names flattened into one data axis
    (the (dcn, ici) topology — parallel/multihost.py).
    """
    from .multihost import axis_size

    n = points[0].shape[0]
    n_local = n // axis_size(mesh, axis)

    if n_local < msm_mod._PIPPENGER_MIN:
        shard = jax.shard_map(
            lambda px, py, pz, s: _local_ladder(px, py, pz, s, axis),
            mesh=mesh,
            check_vma=False,
            in_specs=(PS(axis, None),) * 4,
            out_specs=(PS(None, None),) * 3,
        )
        pt = shard(points[0], points[1], points[2], scalars_mont)
        return pt, jnp.int32(0)

    d = axis_size(mesh, axis)
    if n_local < (1 << 14):
        # small shards: point sharding shrinks per-shard windows (c falls
        # with n_local) and efficiency collapses; shard by WINDOW instead —
        # replicate the points, full-n window statistics per device
        c = min(13, max(6, n.bit_length() - 6))
        num_windows = -(-FR_BITS // c)
        wpd = -(-num_windows // d)
        pad = -n % d
        scal_p = (
            jnp.pad(scalars_mont, ((0, pad), (0, 0))) if pad else scalars_mont
        )
        shard = jax.shard_map(
            lambda px, py, pz, s: _local_window_block(
                px, py, pz, s, n, axis, c, wpd
            ),
            mesh=mesh,
            check_vma=False,
            in_specs=(PS(None, None),) * 3 + (PS(axis, None),),
            out_specs=(PS(None, None),) * 3 + (PS(),),
        )
        x, y, z, spill = shard(points[0], points[1], points[2], scal_p)
        return (x, y, z), spill

    c = min(13, max(6, n_local.bit_length() - 6))
    shard = jax.shard_map(
        lambda px, py, pz, s: _local_pippenger(px, py, pz, s, axis, c),
        mesh=mesh,
        check_vma=False,
        in_specs=(PS(axis, None),) * 4,
        out_specs=(PS(None, None),) * 3 + (PS(),),
    )
    x, y, z, spill = shard(points[0], points[1], points[2], scalars_mont)
    return (x, y, z), spill


def msm_sharded(
    points: cd.Point, scalars_mont: jnp.ndarray, mesh: Mesh, axis="x", exact: bool = False
) -> cd.Point:
    """Σ_i s_i P_i with (points, scalars) sharded over `axis`.

    Result is replicated on every device (shape [1] Jacobian point).
    The spill fallback runs the single-chip path with exact=True: it is
    taken precisely when a bucket overflowed or a fold degenerated, so the
    rerun must not revisit the non-exact fast-madd path (ADVICE r4).
    """
    pt, spill = msm_sharded_core(points, scalars_mont, mesh, axis)
    if int(jax.device_get(spill)) != 0:
        # exact host-layout single-chip path (NOT msm_mod.msm, which would
        # re-enter this router under an active parallel context)
        return msm_mod.msm_pippenger(points, scalars_mont, exact=True)
    return pt
