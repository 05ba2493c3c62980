"""Keys, proof, and transcript/byte codecs (reference src/data_structures.rs).

Byte layouts follow the arkworks `ToBytes` conventions the FS transcript
depends on (SURVEY.md §7 "bit-exact transcript" note): little-endian field
reprs, u64 counters, points as x||y||infinity-byte, Option as 1-byte flag.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..fields import bls12_381 as P
from ..fields import host_curve as hc
from ..fields import host_field as hf
from .indexer import Index, IndexInfo
from .kzg import BatchLCProof, Commitment, CommitterKey, Randomness, VerifierKey

R = P.R_MODULUS


def commitment_to_bytes(c: Commitment) -> bytes:
    """marlin_pc Commitment ToBytes: comm, then Option<shifted_comm>."""
    out = hc.g1_to_bytes(c.comm)
    if c.shifted_comm is None:
        out += b"\x00"
    else:
        out += b"\x01" + hc.g1_to_bytes(c.shifted_comm)
    return out


def field_vec_to_bytes(vals: list) -> bytes:
    return b"".join(hf.fr_to_bytes(v) for v in vals)


@dataclass
class IndexVerifierKey:
    """Reference src/data_structures.rs:26-62."""

    index_info: IndexInfo
    index_comms: list  # [6] Commitment in INDEXER_POLYNOMIALS order
    verifier_key: VerifierKey

    def to_bytes(self) -> bytes:
        """Transcript encoding (reference data_structures.rs:36-43)."""
        out = self.index_info.to_bytes()
        for c in self.index_comms:
            out += commitment_to_bytes(c)
        return out


@dataclass
class IndexProverKey:
    """Reference src/data_structures.rs:70-79."""

    index_vk: IndexVerifierKey
    index_comm_rands: list  # [6] Randomness
    index: Index
    committer_key: CommitterKey


@dataclass
class Proof:
    """Reference src/data_structures.rs:101-110."""

    commitments: list  # [3] lists of Commitment (per round)
    evaluations: list  # label-sorted ints (zero-eval LCs excluded)
    prover_messages: list  # [3] lists of field elements (always empty in Marlin)
    pc_proof: BatchLCProof

    def serialized_size(self) -> int:
        return len(self.to_bytes())

    def to_bytes(self) -> bytes:
        """Compressed proof encoding (arkworks CanonicalSerialize layout:
        length-prefixed vectors, compressed points)."""
        out = hf.u64_to_bytes(len(self.commitments))
        for round_comms in self.commitments:
            out += hf.u64_to_bytes(len(round_comms))
            for c in round_comms:
                out += hc.g1_compress(c.comm)
                out += b"\x01" + hc.g1_compress(c.shifted_comm) if c.shifted_comm else b"\x00"
        out += hf.u64_to_bytes(len(self.evaluations))
        out += field_vec_to_bytes(self.evaluations)
        out += hf.u64_to_bytes(len(self.prover_messages))
        for msg in self.prover_messages:
            if msg:
                out += b"\x01" + hf.u64_to_bytes(len(msg)) + field_vec_to_bytes(msg)
            else:
                out += b"\x00"
        out += hf.u64_to_bytes(len(self.pc_proof.proofs))
        for pp in self.pc_proof.proofs:
            out += hc.g1_compress(pp.w)
            if pp.random_v is None:
                out += b"\x00"
            else:
                out += b"\x01" + hf.fr_to_bytes(pp.random_v)
        return out

    @staticmethod
    def from_bytes(data: bytes) -> "Proof":
        """Inverse of to_bytes (proof interchange / checkpoint)."""
        from .kzg import BatchLCProof, Commitment, PointProof

        off = 0

        def u64():
            nonlocal off
            v = int.from_bytes(data[off : off + 8], "little")
            off += 8
            return v

        def point():
            nonlocal off
            p = hc.g1_decompress(data[off : off + P.FQ_BYTES])
            off += P.FQ_BYTES
            return p

        def fr():
            nonlocal off
            v = hf.fr_from_bytes(data[off : off + P.FR_BYTES])
            off += P.FR_BYTES
            return v

        commitments = []
        for _ in range(u64()):
            row = []
            for _ in range(u64()):
                comm = point()
                shifted = None
                flag = data[off]
                off += 1
                if flag:
                    shifted = point()
                row.append(Commitment(comm=comm, shifted_comm=shifted))
            commitments.append(row)
        evaluations = [fr() for _ in range(u64())]
        prover_messages = []
        for _ in range(u64()):
            flag = data[off]
            off += 1
            if flag:
                prover_messages.append([fr() for _ in range(u64())])
            else:
                prover_messages.append([])
        proofs = []
        for _ in range(u64()):
            w = point()
            flag = data[off]
            off += 1
            rv = fr() if flag else None
            proofs.append(PointProof(w=w, random_v=rv))
        return Proof(
            commitments=commitments,
            evaluations=evaluations,
            prover_messages=prover_messages,
            pc_proof=BatchLCProof(proofs=proofs),
        )

    def print_size_info(self) -> dict:
        """Proof-size statistics (reference data_structures.rs:129-187)."""
        num_plain = sum(
            1 for rc in self.commitments for c in rc if c.shifted_comm is None
        )
        num_bounded = sum(
            1 for rc in self.commitments for c in rc if c.shifted_comm is not None
        )
        stats = {
            "argument_size_bytes": self.serialized_size(),
            "num_comms_without_degree_bounds": num_plain,
            "num_comms_with_degree_bounds": num_bounded,
            "num_evaluations": len(self.evaluations),
            "num_opening_proofs": len(self.pc_proof.proofs),
        }
        return stats
