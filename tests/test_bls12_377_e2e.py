"""End-to-end Marlin over the BLS12-377 configuration.

The reference runs its integration tests over one curve and benches five
via type-level generics (reference src/test.rs:128-130,
benches/bench.rs:5-11); curve selection here is process-level
(MARLIN_TPU_CURVE, fields/active.py), so these tests drive a fresh
interpreter per curve.  Covers: both PC schemes e2e with negative checks,
and proof serialization round-trip under the 48-byte Fq codec (377-bit field).
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
        cs.enforce_constraint(lc(x), lc(y), lc(out))

rng = test_rng()
srs = {cls}.universal_setup(32, 32, 96, rng)
pk, vk = {cls}.index(srs, C())
# key serialization round-trips under the 48-byte Fq codec (377-bit field)
import tempfile, os
from marlin_tpu.snark import serial
with tempfile.TemporaryDirectory() as d:
    serial.save_index_vk(vk, os.path.join(d, "vk.npz"))
    vk = serial.load_index_vk(os.path.join(d, "vk.npz"))
    serial.save_index_pk(pk, os.path.join(d, "pk.npz"))
    pk = serial.load_index_pk(os.path.join(d, "pk.npz"))
proof = {cls}.prove(pk, C(), rng)
assert {cls}.verify(vk, [15], proof, rng)
assert not {cls}.verify(vk, [16], proof, rng)
blob = proof.to_bytes()
rt = Proof.from_bytes(blob)
assert rt.to_bytes() == blob
assert {cls}.verify(vk, [15], rt, rng)
print("OK", proof.serialized_size())
"""


def _run(cls: str) -> str:
    env = dict(
        os.environ,
        MARLIN_TPU_CURVE="bls12_377",
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        TF_CPP_MIN_LOG_LEVEL="3",
        MARLIN_TPU_XLA_CACHE="",
    )
    out = subprocess.run(
        [sys.executable, "-c", _PROG.format(cls=cls)],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


@pytest.mark.slow
def test_bls12_377_marlin_pc_e2e():
    assert "OK" in _run("Marlin")


@pytest.mark.slow
def test_bls12_377_sonic_pc_e2e():
    assert "OK" in _run("MarlinSonic")
