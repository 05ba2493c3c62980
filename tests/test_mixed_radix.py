"""Mixed-radix evaluation domains + NTT (ark-poly MixedRadixEvaluationDomain).

The reference exercises this path through the MNT*-753 benches
(reference benches/bench.rs:161-175: GeneralEvaluationDomain falls back to
MixedRadix when the next power of two exceeds the field's 2-adicity).
Here the substrate is BN254's Fr (2^28 * 3^2 subgroup); these tests run in
subprocesses with MARLIN_TPU_CURVE=bn254 since curve selection is
process-level.  MARLIN_TPU_FR_TWO_ADICITY_CAP simulates a low-2-adicity
field so the fallback engages at small sizes, the way 2-adicity 15 forces
it at 2^16 on MNT4-753.
"""

import os
import subprocess
import sys

import pytest


def _run(prog: str, **env_extra) -> str:
    env = dict(
        os.environ,
        MARLIN_TPU_CURVE="bn254",
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        TF_CPP_MIN_LOG_LEVEL="3",
        MARLIN_TPU_XLA_CACHE="",
        **env_extra,
    )
    out = subprocess.run(
        [sys.executable, "-c", prog], env=env, capture_output=True, text=True, timeout=900
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return out.stdout


def test_domain_selection_and_factoring():
    out = _run(
        r"""
from marlin_tpu.snark.domains import (
    compute_size_of_domain, new_domain, factor_size, MixedRadixDomain, Radix2Domain)
# radix-2 preferred when in reach
assert compute_size_of_domain(100) == 128
assert isinstance(new_domain(100), Radix2Domain)
import os
os.environ["MARLIN_TPU_FR_TWO_ADICITY_CAP"] = "5"
assert compute_size_of_domain(100) == 144  # 2^4 * 3^2
dom = new_domain(100)
assert isinstance(dom, MixedRadixDomain) and dom.size == 144
assert factor_size(144) == (4, 3, 2)
from marlin_tpu.fields import active as P
g = dom.group_gen
R = P.R_MODULUS
assert pow(g, 144, R) == 1 and pow(g, 48, R) != 1 and pow(g, 72, R) != 1
print("OK")
"""
    )
    assert "OK" in out


def test_mixed_ntt_matches_naive_dft():
    out = _run(
        r"""
import random
from marlin_tpu.ops import fr, ntt
from marlin_tpu.snark.domains import domain_of_size
from marlin_tpu.fields import active as P
R = P.R_MODULUS
rng = random.Random(5)
for n in (3, 9, 12, 48, 144, 288):
    dom = domain_of_size(n)
    xs = [rng.randrange(R) for _ in range(n)]
    x = fr.from_ints(xs)
    got = fr.to_ints(ntt.ntt(x, n))
    want = [sum(c * pow(e, i, R) for i, c in enumerate(xs)) % R
            for e in dom.elements()]
    assert got == want, n
    assert fr.to_ints(ntt.intt(ntt.ntt(x, n))) == xs, n
print("OK")
"""
    )
    assert "OK" in out


def test_mixed_poly_mul_and_vanishing():
    out = _run(
        r"""
import os, random
os.environ["MARLIN_TPU_FR_TWO_ADICITY_CAP"] = "4"
from marlin_tpu.ops import fr, poly
from marlin_tpu.fields import active as P
R = P.R_MODULUS
rng = random.Random(7)
la, lb = 40, 50  # product needs a size-89 domain -> 96 = 3 * 2^5? no: cap 4 -> 144
a_int = [rng.randrange(R) for _ in range(la)]
b_int = [rng.randrange(R) for _ in range(lb)]
c = poly.mul(fr.from_ints(a_int), fr.from_ints(b_int))
got = fr.to_ints(c)
want = [0] * (la + lb - 1)
for i, ai in enumerate(a_int):
    for j, bj in enumerate(b_int):
        want[i + j] = (want[i + j] + ai * bj) % R
assert got == want
# unsupported product degree raises (ark-poly panic analog)
import pytest
big = fr.from_ints([1] * 100)
try:
    poly.mul(big, big)   # needs >= 199 > max 144
    raise SystemExit("expected ValueError")
except ValueError:
    pass
print("OK")
"""
    )
    assert "OK" in out


@pytest.mark.slow
def test_mixed_radix_marlin_e2e():
    out = _run(
        r"""
import sys; sys.path.insert(0, "tests")
from circuits import DummyCircuit, R
from marlin_tpu import Marlin
from marlin_tpu.utils.rand import test_rng

rng = test_rng()
a, b = rng.rand_fr(), rng.rand_fr()
circ = DummyCircuit(a, b, num_variables=10, num_constraints=80)
srs = Marlin.universal_setup(80, 80, 280, rng)
pk, vk = Marlin.index(srs, circ)
assert pk.index.domain_h.size == 96 and pk.index.domain_k.size == 288
proof = Marlin.prove(pk, circ, rng)
pub = [a * b % R]
assert Marlin.verify(vk, pub, proof, rng)
assert not Marlin.verify(vk, [(pub[0] + 1) % R], proof, rng)
print("OK")
""",
        MARLIN_TPU_FR_TWO_ADICITY_CAP="6",
        MARLIN_TPU_DEBUG_CHECKS="1",
    )
    assert "OK" in out
