"""Adversarial-proof tests: verify() must reject (return False) or the
codec must raise ValueError for malformed/tampered proofs — never accept
and never escape with an unrelated exception.

Reference behavior: Marlin::verify returns Ok(false)/Err cleanly
(src/lib.rs:413-433); ark CanonicalDeserialize validates point
compression, curve membership, and subgroup membership on decode.
"""

import pytest

from circuits import DummyCircuit
from marlin_tpu import Marlin
from marlin_tpu.fields import bls12_381 as P
from marlin_tpu.fields import host_curve as hc
from marlin_tpu.snark.data_structures import Proof
from marlin_tpu.utils.rand import test_rng

R = P.R_MODULUS


@pytest.fixture(scope="module")
def proof_ctx():
    rng = test_rng()
    a, b = 17, 23
    circ = DummyCircuit(a, b, num_variables=10, num_constraints=24)
    srs = Marlin.universal_setup(24, 24, 72, rng)
    pk, vk = Marlin.index(srs, circ)
    proof = Marlin.prove(pk, circ, rng)
    assert Marlin.verify(vk, [a * b % R], proof, rng)
    return vk, [a * b % R], proof, proof.to_bytes()


def _rejects(vk, x, blob) -> bool:
    """True iff the tampered blob is rejected (decode error or verify False)."""
    rng = test_rng()
    try:
        p = Proof.from_bytes(blob)
    except ValueError:
        return True
    return not Marlin.verify(vk, x, p, rng)


def test_bit_flip_sweep(proof_ctx):
    """Flipping any single byte anywhere in the proof must reject.
    Sweep a stride-7 sample of positions plus both endpoints."""
    vk, x, _proof, blob = proof_ctx
    positions = sorted(set(range(0, len(blob), 7)) | {0, len(blob) - 1})
    for pos in positions:
        bad = bytearray(blob)
        bad[pos] ^= 0x40
        assert _rejects(vk, x, bytes(bad)), f"byte flip at {pos} accepted"


def test_truncation_and_trailing(proof_ctx):
    vk, x, _proof, blob = proof_ctx
    for cut in (0, 7, 8, 56, len(blob) // 2, len(blob) - 1):
        with pytest.raises(ValueError):
            Proof.from_bytes(blob[:cut])
    with pytest.raises(ValueError):
        Proof.from_bytes(blob + b"\x00")


def test_huge_length_prefix(proof_ctx):
    """A forged u64 length prefix must raise, not allocate."""
    _vk, _x, _proof, blob = proof_ctx
    bad = bytearray(blob)
    bad[0:8] = (1 << 60).to_bytes(8, "little")
    with pytest.raises(ValueError):
        Proof.from_bytes(bytes(bad))


def test_off_curve_point_rejected():
    """A compressed x whose curve equation has no square root."""
    for x in range(2, 40):
        y2 = (x * x * x + P.CURVE_B) % P.Q_MODULUS
        if pow(y2, (P.Q_MODULUS - 1) // 2, P.Q_MODULUS) != 1:
            blob = int(x).to_bytes(P.FQ_BYTES, "little")
            with pytest.raises(ValueError):
                hc.g1_decompress(blob)
            return
    pytest.fail("no non-residue x found in range")


def test_out_of_subgroup_point_rejected():
    """On-curve but cofactor-order component: G1's cofactor is nontrivial,
    so some curve points are not in the prime-order subgroup."""
    found = 0
    for x in range(1, 200):
        y2 = (x * x * x + P.CURVE_B) % P.Q_MODULUS
        y = pow(y2, (P.Q_MODULUS + 1) // 4, P.Q_MODULUS)
        if y * y % P.Q_MODULUS != y2:
            continue
        found += 1
        if not hc.g1_in_subgroup((x, y)):
            blob = bytearray(int(x).to_bytes(P.FQ_BYTES, "little"))
            if y > P.Q_MODULUS - y:
                blob[-1] |= 1 << 7
            with pytest.raises(ValueError):
                hc.g1_decompress(bytes(blob))
            return
    pytest.fail(f"no out-of-subgroup point among {found} curve points")


def test_coordinate_out_of_range_rejected():
    blob = bytearray(int(P.Q_MODULUS).to_bytes(P.FQ_BYTES, "little"))
    with pytest.raises(ValueError):
        hc.g1_decompress(bytes(blob))


def test_eval_out_of_range_rejected(proof_ctx):
    """Scalar >= r in the evaluations section must fail decode."""
    vk, x, proof, blob = proof_ctx
    # locate the first evaluation: after the commitments section
    comm_bytes = 8
    for rc in proof.commitments:
        comm_bytes += 8
        for c in rc:
            comm_bytes += P.FQ_BYTES + 1
            if c.shifted_comm is not None:
                comm_bytes += P.FQ_BYTES
    off = comm_bytes + 8  # skip evaluations length prefix
    bad = bytearray(blob)
    bad[off : off + P.FR_BYTES] = int(R).to_bytes(P.FR_BYTES, "little")
    with pytest.raises(ValueError):
        Proof.from_bytes(bytes(bad))


def test_wrong_shapes_return_false(proof_ctx):
    vk, x, proof, _blob = proof_ctx
    rng = test_rng()
    # dropped evaluation
    p2 = Proof(proof.commitments, proof.evaluations[:-1], proof.prover_messages, proof.pc_proof)
    assert not Marlin.verify(vk, x, p2, rng)
    # missing round
    p3 = Proof(proof.commitments[:2], proof.evaluations, proof.prover_messages, proof.pc_proof)
    assert not Marlin.verify(vk, x, p3, rng)
    # swapped rounds
    p4 = Proof(
        [proof.commitments[1], proof.commitments[0], proof.commitments[2]],
        proof.evaluations,
        proof.prover_messages,
        proof.pc_proof,
    )
    assert not Marlin.verify(vk, x, p4, rng)
    # non-empty prover message
    p5 = Proof(proof.commitments, proof.evaluations, [[1], [], []], proof.pc_proof)
    assert not Marlin.verify(vk, x, p5, rng)
