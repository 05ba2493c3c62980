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


def test_index_key_roundtrip():
    """Index/pk/vk persistence: index once, reload both keys from disk,
    prove and verify with the reloaded objects (the reference's
    setup -> index -> prove process split; CanonicalSerialize derives at
    src/ahp/indexer.rs:113-127, src/data_structures.rs:25-79)."""
    rng = test_rng()
    srs = Marlin.universal_setup(60, 60, 3 * 60, rng)
    a, b = 5, 7
    circ = DummyCircuit(a, b, num_variables=10, num_constraints=30)
    pk, vk = Marlin.index(srs, circ)

    with tempfile.TemporaryDirectory() as d:
        pk_path = os.path.join(d, "pk.npz")
        vk_path = os.path.join(d, "vk.npz")
        serial.save_index_pk(pk, pk_path)
        serial.save_index_vk(vk, vk_path)
        pk2 = serial.load_index_pk(pk_path)
        vk2 = serial.load_index_vk(vk_path)

    assert vk2.to_bytes() == vk.to_bytes()  # transcript-identical vk
    assert pk2.index_vk.to_bytes() == vk.to_bytes()
    proof = Marlin.prove(pk2, circ, rng)
    assert Marlin.verify(vk2, [a * b % R], proof, rng)
    assert not Marlin.verify(vk2, [a * b % R + 1], proof, rng)

    # SRS-less archive reattaches to an externally stored SRS
    with tempfile.TemporaryDirectory() as d:
        pk_path = os.path.join(d, "pk_lean.npz")
        serial.save_index_pk(pk, pk_path, include_srs=False)
        pk3 = serial.load_index_pk(pk_path, srs=srs)
    proof3 = Marlin.prove(pk3, circ, rng)
    assert Marlin.verify(vk, [a * b % R], proof3, rng)


def test_tampered_vk_archive_rejected():
    """Key archives validate on decode (reference CanonicalDeserialize
    semantics): an off-curve commitment or vk point must raise, not load."""
    import json

    import numpy as np

    rng = test_rng()
    srs = Marlin.universal_setup(60, 60, 3 * 60, rng)
    circ = DummyCircuit(3, 9, num_variables=10, num_constraints=30)
    pk, vk = Marlin.index(srs, circ)
    with tempfile.TemporaryDirectory() as d:
        vk_path = os.path.join(d, "vk.npz")
        serial.save_index_vk(vk, vk_path)
        with np.load(vk_path, allow_pickle=False) as z:
            meta = json.loads(str(z["meta"]))
        # flip a commitment x-coordinate off the curve
        meta["index_comms"][0]["comm"][0] = int(meta["index_comms"][0]["comm"][0]) ^ 1
        np.savez(vk_path, meta=json.dumps(meta, default=str))
        with pytest.raises(ValueError):
            serial.load_index_vk(vk_path)

        # and a tampered verifier-key point
        serial.save_index_vk(vk, vk_path)
        with np.load(vk_path, allow_pickle=False) as z:
            meta = json.loads(str(z["meta"]))
        meta["verifier_key"]["g"][1] = int(meta["verifier_key"]["g"][1]) ^ 1
        np.savez(vk_path, meta=json.dumps(meta, default=str))
        with pytest.raises(ValueError):
            serial.load_index_vk(vk_path)


def test_tampered_srs_archive_rejected():
    rng = test_rng()
    srs = Marlin.universal_setup(40, 40, 3 * 40, rng)
    import json

    import numpy as np

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "srs.npz")
        serial.save_srs(srs, path)
        with np.load(path, allow_pickle=False) as z:
            arrays = {k: z[k] for k in z.files}
            meta = json.loads(str(z["meta"]))
        meta["beta_h"][0][0] = int(meta["beta_h"][0][0]) ^ 1
        arrays["meta"] = json.dumps(meta, default=str)
        np.savez(path, **arrays)
        with pytest.raises(ValueError):
            serial.load_srs(path)
