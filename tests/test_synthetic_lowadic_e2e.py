"""End-to-end Marlin over the synthetic low-2-adicity pairing curve.

This is the capability the MNT-753 benchmark configs exercise in the
reference (benches/bench.rs:5-11): a full prove+verify where the
evaluation domains CANNOT all be radix-2.  Fr here has 2-adicity 13 with
a 3^3 small subgroup (fields/synthetic_lowadic.py), so:

* the plain e2e runs the whole stack (curve, generic pairing, PC,
  driver) over the new field with radix-2 domains (sizes < 2^13), and
* the capped e2e (MARLIN_TPU_FR_TWO_ADICITY_CAP=5, the established
  simulation knob from tests/test_mixed_radix.py) forces H/K onto
  mixed-radix 2^a 3^b domains THROUGH THE PAIRING-ENABLED STACK — the
  piece wide750 (AHP-only, no pairing) could not cover.

Curve selection is process-level, so these drive fresh interpreters.
"""

import os
import subprocess
import sys

import pytest

_PROG = r"""
from marlin_tpu.snark.marlin import {cls}
from marlin_tpu.utils.rand import test_rng
from marlin_tpu.snark.r1cs import lc
from marlin_tpu.snark.data_structures import Proof

class C:
    def generate_constraints(self, cs):
        x = cs.new_witness_variable(lambda: 3)
        y = cs.new_witness_variable(lambda: 5)
        out = cs.new_input_variable(lambda: 15)
        for _ in range(24):
            cs.enforce_constraint(lc(x), lc(y), lc(out))

rng = test_rng()
srs = {cls}.universal_setup(128, 128, 384, rng)
pk, vk = {cls}.index(srs, C())
from marlin_tpu.snark.domains import MixedRadixDomain, Radix2Domain
if {mixed}:
    assert isinstance(pk.index.domain_k, MixedRadixDomain), type(pk.index.domain_k)
proof = {cls}.prove(pk, C(), rng)
assert {cls}.verify(vk, [15], proof, rng)
assert not {cls}.verify(vk, [16], proof, rng)
blob = proof.to_bytes()
rt = Proof.from_bytes(blob)
assert rt.to_bytes() == blob
assert {cls}.verify(vk, [15], rt, rng)
print("OK", proof.serialized_size())
"""


def _run(cls: str, cap: str | None) -> str:
    env = dict(
        os.environ,
        MARLIN_TPU_CURVE="synthetic_lowadic",
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        TF_CPP_MIN_LOG_LEVEL="3",
        MARLIN_TPU_XLA_CACHE="",
    )
    if cap is not None:
        env["MARLIN_TPU_FR_TWO_ADICITY_CAP"] = cap
    else:
        env.pop("MARLIN_TPU_FR_TWO_ADICITY_CAP", None)
    out = subprocess.run(
        [sys.executable, "-c", _PROG.format(cls=cls, mixed=repr(cap is not None))],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


@pytest.mark.slow
def test_synthetic_marlin_pc_e2e():
    assert "OK" in _run("Marlin", None)


@pytest.mark.slow
def test_synthetic_sonic_pc_e2e():
    assert "OK" in _run("MarlinSonic", None)


@pytest.mark.slow
def test_synthetic_marlin_pc_mixed_radix_e2e():
    """2-adicity capped to 5: K (and the mul domains) must go mixed-radix
    while the pairing-based PC checks still pass."""
    assert "OK" in _run("Marlin", "5")


@pytest.mark.slow
def test_synthetic_sonic_pc_mixed_radix_e2e():
    assert "OK" in _run("MarlinSonic", "5")
