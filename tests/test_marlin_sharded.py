"""Full prove under a mesh context must be bitwise-identical to
single-chip (the distributed dimension the reference never had to test —
SURVEY.md §4 "Implication"; rayon parallel feature analog, Cargo.toml:64).
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from circuits import DummyCircuit
from marlin_tpu import Marlin
from marlin_tpu.fields import bls12_381 as P
from marlin_tpu.parallel import context as pctx
from marlin_tpu.utils.rand import test_rng

R = P.R_MODULUS


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("x",))


@pytest.mark.slow
def test_prove_sharded_bitwise_equal(mesh, monkeypatch):
    # lower the routing thresholds so a |H|=256 circuit exercises the
    # sharded NTT and MSM paths on the virtual mesh
    monkeypatch.setattr(pctx, "NTT_MIN_SHARDED", 128)
    monkeypatch.setattr(pctx, "MSM_MIN_SHARDED", 16)

    nc = 200
    a, b = 11, 13
    circ = DummyCircuit(a, b, num_variables=10, num_constraints=nc)
    srs = Marlin.universal_setup(nc, nc, 3 * nc, test_rng())
    pk, vk = Marlin.index(srs, circ)

    proof_single = Marlin.prove(pk, circ, test_rng())
    proof_sharded = Marlin.prove(pk, circ, test_rng(), mesh=mesh)

    assert proof_sharded.to_bytes() == proof_single.to_bytes()
    assert Marlin.verify(vk, [a * b % R], proof_sharded, test_rng())
