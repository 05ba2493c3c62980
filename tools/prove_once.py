#!/usr/bin/env python
"""One traced prove on the current backend using the bench's cached
SRS/index keys — for phase-level profiling without the full bench loop.

Env: PROVE_ONCE_LOG2N (default 12), PROVE_ONCE_REPS (default 2: first is
warmup, later ones are warm traces).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("MARLIN_TPU_TRACE", "1")


def main():
    log2n = int(os.environ.get("PROVE_ONCE_LOG2N", "12"))
    reps = int(os.environ.get("PROVE_ONCE_REPS", "2"))
    n = 1 << log2n

    from circuits import DummyCircuit

    from marlin_tpu import Marlin
    from marlin_tpu.fields import bls12_381 as P
    from marlin_tpu.snark import ahp, serial
    from marlin_tpu.utils.rand import test_rng

    rng = test_rng()
    a, b = rng.rand_fr(), rng.rand_fr()
    circ = DummyCircuit(a, b, num_variables=10, num_constraints=n)
    srs = serial.cached_srs(ahp.max_degree(n, n, 3 * n), rng)
    idx_dir = os.path.expanduser("~/.cache/marlin_tpu_srs")
    pk_path = os.path.join(idx_dir, f"bench_idx_{n}_pk.npz")
    vk_path = os.path.join(idx_dir, f"bench_idx_{n}_vk.npz")
    if os.path.exists(pk_path):
        pk = serial.load_index_pk(pk_path, srs=srs)
        vk = serial.load_index_vk(vk_path)
    else:
        pk, vk = Marlin.index(srs, circ)
    for i in range(reps):
        t0 = time.perf_counter()
        proof = Marlin.prove(pk, circ, rng)
        print(f"[prove_once] rep {i}: {time.perf_counter()-t0:.2f}s", flush=True)
    assert Marlin.verify(vk, [a * b % P.R_MODULUS], proof, rng)
    print("[prove_once] verified", flush=True)


if __name__ == "__main__":
    main()
