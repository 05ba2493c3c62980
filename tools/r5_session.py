#!/usr/bin/env python
"""Interactive round-5 TPU experiment session (run: python -i tools/r5_session.py).

Loads the bench SRS + index keys for 2^14, defines helpers to time proves
with per-phase spans, and leaves everything in scope for iterative
experiments without paying per-process warmup again.
"""

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_ROOT, "tests"))
sys.path.insert(0, _ROOT)

os.environ.setdefault("MARLIN_TPU_TRACE", "1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

LOG2N = int(os.environ.get("R5_LOG2N", "14"))
N = 1 << LOG2N

t_start = time.perf_counter()


def log(msg):
    print(f"[r5 +{time.perf_counter() - t_start:7.1f}s] {msg}", flush=True)


log("importing jax + marlin_tpu")
import jax  # noqa: E402

from circuits import DummyCircuit  # noqa: E402

from marlin_tpu import Marlin  # noqa: E402
from marlin_tpu.fields import bls12_381 as P  # noqa: E402
from marlin_tpu.snark import ahp, serial  # noqa: E402
from marlin_tpu.utils.rand import test_rng  # noqa: E402

log(f"backend: {jax.default_backend()} devices: {jax.devices()}")

rng = test_rng()
a, b = rng.rand_fr(), rng.rand_fr()
circ = DummyCircuit(a, b, num_variables=10, num_constraints=N)
log(f"loading SRS (2^{LOG2N})")
srs = serial.cached_srs(ahp.max_degree(N, N, 3 * N), rng)
idx_dir = os.path.expanduser("~/.cache/marlin_tpu_srs")
pk_path = os.path.join(idx_dir, f"bench_idx_{N}_pk.npz")
vk_path = os.path.join(idx_dir, f"bench_idx_{N}_vk.npz")
log("loading index keys")
pk = serial.load_index_pk(pk_path, srs=srs)
vk = serial.load_index_vk(vk_path)
log("keys ready")


def prove(reps=1, trace=None):
    """Timed prove(s); returns the last proof."""
    if trace is not None:
        os.environ["MARLIN_TPU_TRACE"] = "1" if trace else "0"
    proof = None
    for i in range(reps):
        t0 = time.perf_counter()
        proof = Marlin.prove(pk, circ, rng)
        log(f"prove rep {i}: {time.perf_counter() - t0:.3f}s")
    return proof


def check(proof):
    ok = Marlin.verify(vk, [a * b % P.R_MODULUS], proof, rng)
    log(f"verify: {ok}")
    return ok


log("session ready: prove(reps=1), check(proof)")
