"""marlin_tpu — a TPU-native Marlin preprocessing zkSNARK framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
arkworks-rs/marlin (the [CHMMVW20] universal-SRS zkSNARK for R1CS) plus the
arkworks dependency stack it leans on (fields, FFT, curves, MSM, KZG
polynomial commitments, R1CS constraint system) — see SURVEY.md.

Layering (mirrors the reference's layer map, SURVEY.md §1):
    snark.marlin      — driver: universal_setup / index / prove / verify
    snark.{indexer,prover,verifier,lc}  — the AHP (pure Fr array programs)
    snark.kzg         — KZG10 + Marlin/Sonic degree-bound commitments
    snark.r1cs        — constraint-system builder (ark-relations semantics)
    ops.*             — device kernels: limb bigint, NTT, curve, MSM
    fields.*          — host golden-reference field/curve/pairing layer
    parallel.*        — multi-chip sharding (mesh NTT, sharded MSM)
"""

import os as _os

import jax as _jax

# Persistent XLA compilation cache: the limb kernels trace to large graphs
# (Fermat inversion alone is a 255-step fori_loop) and recompiling them per
# process would dominate test time.
_cache_dir = _os.environ.get("MARLIN_TPU_XLA_CACHE", _os.path.expanduser("~/.cache/marlin_tpu_xla"))
if _cache_dir:  # empty string disables (CPU executable (de)serialization can crash)
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    except Exception:  # pragma: no cover - older jax
        pass

try:
    from .snark.marlin import Marlin, MarlinSonic  # noqa: E402,F401
    from .snark.errors import (  # noqa: E402,F401
        AHPError,
        IndexTooLargeError,
        MarlinError,
        PolynomialCommitmentError,
    )
except (ImportError, AttributeError):  # pragma: no cover
    # AttributeError: Fr-only configs (fields/test_wide750.py) have no curve
    # layer; the AHP modules remain importable individually.
    Marlin = None
