"""End-to-end test of the Sonic-style PC variant (reference benches/bench.rs)."""

import pytest
from circuits import DummyCircuit

from marlin_tpu.fields import bls12_381 as P
from marlin_tpu.snark.marlin import MarlinSonic
from marlin_tpu.utils.rand import test_rng

R = P.R_MODULUS


@pytest.mark.slow
def test_sonic_end_to_end():
    rng = test_rng()
    a, b = 7, 11
    circ = DummyCircuit(a, b, num_variables=10, num_constraints=40)
    srs = MarlinSonic.universal_setup(64, 64, 3 * 64, rng)
    pk, vk = MarlinSonic.index(srs, circ)
    proof = MarlinSonic.prove(pk, circ, rng)
    # sonic commitments carry no shifted part -> smaller proofs
    assert all(c.shifted_comm is None for rc in proof.commitments for c in rc)
    assert MarlinSonic.verify(vk, [a * b % R], proof, rng)
    assert not MarlinSonic.verify(vk, [a * b % R + 1], proof, rng)
