"""Limb-vector representation of big integers for TPU kernels.

Field elements are `uint32` arrays of shape `[..., L]` holding base-2^16
limbs, least-significant first.  16-bit limbs are the TPU-native choice:
the VPU has no widening 64-bit multiplier, but a full 16x16 product fits a
32-bit lane exactly, so schoolbook products accumulate in uint32 with
headroom for ~2^5 unpropagated carries (see ops/bigint.py).

Fr (255-bit) uses L=16 (R = 2^256); Fq (381-bit) uses L=24 (R = 2^384) —
the same Montgomery radix as arkworks' 4x64 / 6x64 reprs
(SURVEY.md §2b row 1), just sliced for the VPU.
"""

from __future__ import annotations

import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(x: int, L: int) -> np.ndarray:
    """Non-negative int -> [L] uint32 base-2^16 limbs (LSB first)."""
    b = int(x).to_bytes(2 * L, "little")
    return np.frombuffer(b, dtype="<u2").astype(np.uint32)


def limbs_to_int(limbs) -> int:
    """[L] limbs -> int.  Accepts redundant (unnormalized) limbs."""
    arr = np.asarray(limbs)
    acc = 0
    for i in range(arr.shape[-1] - 1, -1, -1):
        acc = (acc << LIMB_BITS) + int(arr[i])
    return acc


def ints_to_limbs(xs, L: int) -> np.ndarray:
    """Iterable of ints -> [n, L] uint32 (bulk, via byte packing)."""
    xs = list(xs)
    buf = b"".join(int(x).to_bytes(2 * L, "little") for x in xs)
    return np.frombuffer(buf, dtype="<u2").reshape(len(xs), L).astype(np.uint32)


def limbs_to_ints(arr) -> list[int]:
    """[n, L] normalized (16-bit) limbs -> list of ints (bulk)."""
    arr = np.asarray(arr)
    flat = arr.reshape(-1, arr.shape[-1])
    if flat.size and flat.max() <= LIMB_MASK:
        packed = flat.astype("<u2").tobytes()
        w = 2 * flat.shape[1]
        return [int.from_bytes(packed[i * w : (i + 1) * w], "little") for i in range(flat.shape[0])]
    return [limbs_to_int(row) for row in flat]
