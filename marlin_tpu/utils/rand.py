"""Deterministic randomness sources.

`ZkRng` supplies the prover's blinding values (the reference threads a
user-supplied `zk_rng` — src/lib.rs:151; tests pin `ark_std::test_rng()`
for reproducibility, SURVEY.md §4 row 6).  Bulk sampling is vectorized via
numpy so mask-polynomial generation stays off the Python hot path.
"""

from __future__ import annotations

import numpy as np

from ..fields import active as P

R = P.R_MODULUS


class ZkRng:
    """Seedable Fr sampler (PCG64-backed; not a transcript object)."""

    def __init__(self, seed: int | None = 0):
        self._gen = np.random.Generator(np.random.PCG64(seed))

    def rand_fr(self) -> int:
        while True:
            b = self._gen.bytes(P.FR_BYTES)
            v = int.from_bytes(b, "little") & ((1 << P.FR_BITS) - 1)
            if v < R:
                return v

    def rand_fr_list(self, n: int) -> list[int]:
        nb = P.FR_BYTES
        out: list[int] = []
        while len(out) < n:
            chunk = self._gen.bytes(nb * (n - len(out)))
            for i in range(0, len(chunk), nb):
                v = int.from_bytes(chunk[i : i + nb], "little") & ((1 << P.FR_BITS) - 1)
                if v < R:
                    out.append(v)
        return out


def test_rng() -> ZkRng:
    """Fixed-seed rng for reproducible proofs (ark_std::test_rng analog)."""
    return ZkRng(0)
