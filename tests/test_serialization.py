"""Artifact serialization round-trips (the reference's CanonicalSerialize
boundaries — SURVEY.md §5.4): SRS to disk, proof to bytes and back through
a fresh verify."""

import os
import tempfile

import pytest
from circuits import DummyCircuit

from marlin_tpu import Marlin
from marlin_tpu.fields import bls12_381 as P
from marlin_tpu.snark import serial
from marlin_tpu.snark.data_structures import Proof
from marlin_tpu.utils.rand import test_rng

R = P.R_MODULUS


@pytest.mark.slow
def test_srs_roundtrip_and_proof_bytes():
    rng = test_rng()
    srs = Marlin.universal_setup(60, 60, 3 * 60, rng)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "srs.npz")
        serial.save_srs(srs, path)
        srs2 = serial.load_srs(path)
    assert srs2.max_degree() == srs.max_degree()
    assert srs2.g == srs.g and srs2.beta_h == srs.beta_h

    a, b = 3, 9
    circ = DummyCircuit(a, b, num_variables=10, num_constraints=30)
    pk, vk = Marlin.index(srs2, circ)
    proof = Marlin.prove(pk, circ, rng)

    blob = proof.to_bytes()
    proof2 = Proof.from_bytes(blob)
    assert proof2.to_bytes() == blob
    assert Marlin.verify(vk, [a * b % R], proof2, rng)
    assert not Marlin.verify(vk, [1], proof2, rng)
