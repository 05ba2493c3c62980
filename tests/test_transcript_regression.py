"""Golden-vector transcript regression (SURVEY.md §4: "golden-vector tests
at each FS absorb point").

Pins the Fiat-Shamir challenges and key/proof byte layouts for a fixed tiny
circuit under the fixed test rng.  Any change to the byte codecs, absorb
order, or sampling semantics shows up here as a challenge mismatch — the
transcript contract that makes proofs interchangeable between versions.
"""

import pytest
from circuits import DummyCircuit

from marlin_tpu import Marlin
from marlin_tpu.snark import marlin as marlin_mod
from marlin_tpu.snark import verifier as vmod
from marlin_tpu.utils.rand import test_rng

GOLDEN = {
    "alpha": 0x4A378ED0215833CFAC80F82F3FF6AE0356B00E78252067F7A88381952BE1FB09,
    "eta_a": 0x6F8377849D493939FCBD1373F08E5301A2C2CC7EBC3C092199249728F0330C95,
    "beta": 0x57025124D7340C726B9AA2179B80CCE1F112B4A08C5EB1395DA296F4B33B8A4C,
    "gamma": 0x5EAB0EF50DBD11A102CAD8541542E729CB4069EB106FB986D3A6B03761F33776,
}
GOLDEN_VK_HEAD = bytes.fromhex(
    "100000000000000010000000000000002d000000000000000c7130e11e737e4b757f22560e5afa20f6c913e6b3231568"
)


@pytest.mark.slow
def test_transcript_challenges_frozen(monkeypatch):
    seen = {}
    orig_first = vmod.verifier_first_round
    orig_second = vmod.verifier_second_round
    orig_third = vmod.verifier_third_round

    def first(info, fs):
        msg, st = orig_first(info, fs)
        seen.setdefault("alpha", msg.alpha)
        seen.setdefault("eta_a", msg.eta_a)
        return msg, st

    def second(st, fs):
        msg, st = orig_second(st, fs)
        seen.setdefault("beta", msg.beta)
        return msg, st

    def third(st, fs):
        st = orig_third(st, fs)
        seen.setdefault("gamma", st.gamma)
        return st

    monkeypatch.setattr(marlin_mod.verifier_mod, "verifier_first_round", first)
    monkeypatch.setattr(marlin_mod.verifier_mod, "verifier_second_round", second)
    monkeypatch.setattr(marlin_mod.verifier_mod, "verifier_third_round", third)

    rng = test_rng()
    circ = DummyCircuit(5, 6, num_variables=10, num_constraints=16)
    srs = Marlin.universal_setup(16, 16, 48, rng)
    pk, vk = Marlin.index(srs, circ)
    assert vk.to_bytes()[:48] == GOLDEN_VK_HEAD
    Marlin.prove(pk, circ, rng)
    for name, val in GOLDEN.items():
        assert seen[name] == val, f"{name} challenge drifted from the frozen transcript"
