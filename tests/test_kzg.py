"""PC-layer unit tests: commit/open/check round-trips with degree bounds and
hiding, for both the Marlin and Sonic schemes (ark-poly-commit's own test
strategy applied to our rebuild)."""

import pytest

from marlin_tpu.fields import bls12_381 as P
from marlin_tpu.ops import fr
from marlin_tpu.snark import kzg, sonic
from marlin_tpu.snark.lc import LinearCombination
from marlin_tpu.snark.prover import LabeledPoly
from marlin_tpu.utils.rand import ZkRng, test_rng

R = P.R_MODULUS


def _mk_polys(rng, bound):
    # p1 unbounded+hiding, p2 bounded (deg <= bound) + hiding, p3 plain
    p1 = LabeledPoly("p1", fr.from_ints(rng.rand_fr_list(8)), None, 1)
    p2 = LabeledPoly("p2", fr.from_ints(rng.rand_fr_list(bound + 1)), bound, 1)
    p3 = LabeledPoly("p3", fr.from_ints(rng.rand_fr_list(5)), None, None)
    return {p.label: p for p in (p1, p2, p3)}


def _host_eval(coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % R
    return acc


@pytest.mark.parametrize("scheme", [kzg, sonic])
def test_pc_roundtrip(scheme):
    rng = test_rng()
    max_degree = 16
    bound = 6
    pp = scheme.setup(max_degree, rng)
    ck, vk = scheme.trim(pp, max_degree, 1, [bound])

    polys = _mk_polys(rng, bound)
    comms, rands = scheme.commit(ck, list(polys.values()), rng)
    labeled_comms = {
        lp.label: kzg.LabeledCommitment(lp.label, c, lp.degree_bound)
        for lp, c in zip(polys.values(), comms)
    }
    rand_map = {lp.label: r for lp, r in zip(polys.values(), rands)}

    # singleton LCs + one mixed LC over the unbounded polys
    lcs = [
        LinearCombination("p1", [(1, "p1")]),
        LinearCombination("p2", [(1, "p2")]),
        LinearCombination("mix", [(2, "p1"), (3, "p3"), (7, None)]),
    ]
    z1, z2 = rng.rand_fr(), rng.rand_fr()
    query_set = [
        ("p1", ("z1", z1)),
        ("p2", ("z1", z1)),
        ("mix", ("z2", z2)),
    ]
    # true evaluations
    ints = {l: fr.to_ints(polys[l].coeffs) for l in polys}
    evals = {
        ("p1", z1): _host_eval(ints["p1"], z1),
        ("p2", z1): _host_eval(ints["p2"], z1),
        ("mix", z2): (2 * _host_eval(ints["p1"], z2) + 3 * _host_eval(ints["p3"], z2) + 7) % R,
    }

    chi = rng.rand_fr()
    proof = scheme.open_combinations(ck, lcs, polys, rand_map, query_set, chi)
    ok = scheme.check_combinations(vk, lcs, labeled_comms, query_set, evals, proof, chi, rng)
    assert ok, f"{scheme.__name__} valid opening rejected"

    bad = dict(evals)
    bad[("p2", z1)] = (bad[("p2", z1)] + 1) % R
    assert not scheme.check_combinations(
        vk, lcs, labeled_comms, query_set, bad, proof, chi, test_rng()
    ), f"{scheme.__name__} accepted a wrong evaluation"


def test_degree_bound_enforced():
    rng = test_rng()
    pp = kzg.setup(16, rng)
    ck, vk = kzg.trim(pp, 16, 1, [4])
    too_big = LabeledPoly("q", fr.from_ints(rng.rand_fr_list(8)), 4, None)
    with pytest.raises(kzg.PCError):
        kzg.commit(ck, [too_big], rng)
