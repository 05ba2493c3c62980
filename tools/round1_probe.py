#!/usr/bin/env python
"""Fenced timing of round-1's constituent costs on the live backend:
upload bandwidth, spmv, NTT chain, divide-by-vanishing — to find where
the warm round-1 commit fetch goes (it syncs all of round 1's async
dispatches).  Env: RP_LOG2N (default 12)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from circuits import DummyCircuit
    from marlin_tpu import Marlin
    from marlin_tpu.ops import fr, ntt, poly, sparse
    from marlin_tpu.snark import ahp, serial
    from marlin_tpu.snark.prover import prover_init
    from marlin_tpu.utils.rand import test_rng

    def fetch(x):
        return np.asarray(jax.device_get(x))

    log2n = int(os.environ.get("RP_LOG2N", "12"))
    n = 1 << log2n
    rng = test_rng()

    # upload bandwidth probe: 1 MB and 4 MB uint32
    for mb in (1, 4):
        arr = np.arange(mb * 262144, dtype=np.uint32)
        dev = jax.device_put(arr)
        fetch(dev[:1])
        t0 = time.perf_counter()
        dev = jax.device_put(arr + 1)
        fetch(dev[:1])
        dt = time.perf_counter() - t0
        print(f"[rp] upload {mb} MB: {dt*1e3:.0f} ms ({mb/dt:.1f} MB/s)", flush=True)

    # download probe
    t0 = time.perf_counter()
    got = fetch(dev)
    dt = time.perf_counter() - t0
    print(f"[rp] download 4 MB: {dt*1e3:.0f} ms ({4/dt:.1f} MB/s)", flush=True)

    a, b = rng.rand_fr(), rng.rand_fr()
    circ = DummyCircuit(a, b, num_variables=10, num_constraints=n)
    srs = serial.cached_srs(ahp.max_degree(n, n, 3 * n), rng)
    idx_dir = os.path.expanduser("~/.cache/marlin_tpu_srs")
    pk = serial.load_index_pk(os.path.join(idx_dir, f"bench_idx_{n}_pk.npz"), srs=srs)

    # prover_init (includes 2 spmv dispatches) then force
    st = prover_init(pk.index, circ)
    fetch(st.z_a[:1]); fetch(st.z_b[:1])
    t0 = time.perf_counter()
    st = prover_init(pk.index, circ)
    t1 = time.perf_counter()
    fetch(st.z_a[:1]); fetch(st.z_b[:1])
    t2 = time.perf_counter()
    print(f"[rp] prover_init dispatch {t1-t0:.3f}s sync {t2-t1:.3f}s", flush=True)

    # NTT chain at the round-1 sizes: intt(h), ntt(h), intt 3 more, divide
    h = n
    v = fr.from_ints(rng.rand_fr_list(h))
    fetch(v[:1])
    p = ntt.intt(v); fetch(p[:1])
    t0 = time.perf_counter()
    p = ntt.intt(v); fetch(p[:1])
    print(f"[rp] intt({h}) warm {time.perf_counter()-t0:.3f}s", flush=True)
    e = ntt.ntt(p, h); fetch(e[:1])
    t0 = time.perf_counter()
    e = ntt.ntt(p, h); fetch(e[:1])
    print(f"[rp] ntt({h}) warm {time.perf_counter()-t0:.3f}s", flush=True)

    w = poly.pad_to(p, h + 1)
    q, _ = poly.divide_by_vanishing(w, n // 256 if n >= 256 else 4)
    fetch(q[:1])
    t0 = time.perf_counter()
    q, _ = poly.divide_by_vanishing(w, n // 256 if n >= 256 else 4)
    fetch(q[:1])
    print(f"[rp] divide_by_vanishing warm {time.perf_counter()-t0:.3f}s", flush=True)

    # full first round warm (prover_first_round + fetch one coeff of each)
    from marlin_tpu.snark.prover import prover_first_round
    from marlin_tpu.utils.rand import ZkRng

    zk = test_rng()
    oracles, st = prover_first_round(st, zk)
    for o in oracles.values():
        fetch(o.coeffs[:1])
    st2 = prover_init(pk.index, circ)
    t0 = time.perf_counter()
    oracles, st2 = prover_first_round(st2, zk)
    t1 = time.perf_counter()
    for o in oracles.values():
        fetch(o.coeffs[:1])
    t2 = time.perf_counter()
    print(f"[rp] first_round dispatch {t1-t0:.3f}s sync {t2-t1:.3f}s", flush=True)


if __name__ == "__main__":
    main()
