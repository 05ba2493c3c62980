"""Mesh context: opt-in multi-chip execution for the whole prove path.

The reference's one parallelism knob is rayon's implicit global thread
pool (`RAYON_NUM_THREADS`, benches/bench.rs:2) — every FFT/MSM call site
transparently parallelizes.  The TPU-native analog is a process-wide mesh
context: inside `use_mesh(mesh)`, the hot kernels (`ops.ntt.ntt/intt`,
`ops.msm.msm/msm_many`) transparently route to their sharded variants
(parallel/ntt_sharded.py four-step NTT, parallel/msm_sharded.py
distributed Pippenger) whenever the operand shape divides over the mesh.
Protocol code — prover rounds, KZG commit/open — is untouched; the same
`Marlin.prove` runs single-chip or across a pod depending on the ambient
context, and results are bitwise identical (tests/test_sharded.py,
tests/test_marlin_sharded.py).
"""

from __future__ import annotations

from contextlib import contextmanager
from dataclasses import dataclass

from jax.sharding import Mesh

# route only sizes where collective+reshard overhead can pay off
NTT_MIN_SHARDED = 1 << 12
MSM_MIN_SHARDED = 1 << 12


@dataclass(frozen=True)
class ParallelContext:
    mesh: Mesh
    # a single mesh-axis name, or a tuple of names treated as one flattened
    # data axis (the (dcn, ici) two-level topology — parallel/multihost.py)
    axis: str | tuple = "x"

    @property
    def num_devices(self) -> int:
        from .multihost import axis_size

        return axis_size(self.mesh, self.axis)


_current: ParallelContext | None = None


def current() -> ParallelContext | None:
    return _current


@contextmanager
def use_mesh(mesh: Mesh, axis: str | tuple = "x"):
    """Run the enclosed block with sharded NTT/MSM kernels over `mesh`."""
    global _current
    prev = _current
    _current = ParallelContext(mesh, axis)
    try:
        yield _current
    finally:
        _current = prev
