"""Backend routing for the Pallas production kernels.

On a TPU backend the hot field ops run as fused limb-major Pallas kernels;
everywhere else (CPU tests, the virtual multi-chip mesh) the XLA limb path
in ops/bigint.py serves.  `MARLIN_TPU_PALLAS=0` forces the XLA path on TPU
(escape hatch for kernel triage).

The decision is made at trace time: inside a jitted program
`jax.default_backend()` reflects the backend the program is being compiled
for, so CPU-jitted round kernels never capture a Pallas call.
"""

from __future__ import annotations

import os

import jax


def use_pallas() -> bool:
    if os.environ.get("MARLIN_TPU_PALLAS", "1") == "0":
        return False
    return jax.default_backend() == "tpu"


def binop(kind, ctx, a, b):
    from . import field

    return field.binop(kind, ctx, a, b)


def inv(ctx, x):
    from . import field

    return field.inv(ctx, x)
