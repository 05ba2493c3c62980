"""The active curve configuration.

The reference selects its curve with type-level generics resolved at
compile time (`Marlin<F, PC, FS>` type aliases — reference src/test.rs:
128-130, benches/bench.rs:79-84); one process = one concrete curve.  The
TPU framework mirrors that with process-level selection: `MARLIN_TPU_CURVE`
names a config module in this package (default `bls12_381`), and every
curve-parameterized module imports `from ..fields import active as P`.

Selection happens once at first import (changing the env var mid-process
has no effect, exactly like the reference's monomorphization).
"""

import importlib
import os
import sys

_name = os.environ.get("MARLIN_TPU_CURVE", "bls12_381")
_mod = importlib.import_module(f"{__package__}.{_name}")
if not hasattr(_mod, "CURVE_NAME"):
    _mod.CURVE_NAME = _name
sys.modules[__name__] = _mod
