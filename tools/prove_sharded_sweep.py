#!/usr/bin/env python
"""Full sharded prove at scale on the virtual CPU mesh (BASELINE config 4).

Runs a DummyCircuit prove at 2^LOG2N constraints with the Sonic PC over an
8-device mesh — every round NTT through ntt_4step_resident (flat block
sharding at both ends) and every commit MSM through the sharded Pippenger
— then the single-chip reference, asserting the proofs are BITWISE equal
and the proof verifies.  Records per-device shard bytes of the round
oracles (the §5.7 bounded-memory claim) and wall times.

Emits one JSON line (append to SCALING_r04.jsonl).

Env: MARLIN_SWEEP_PROVE_LOG2N (default 20), MARLIN_SWEEP_PROVE_PC
(sonic|marlin, default sonic), MARLIN_SWEEP_DEVICES (default 8).
"""

import json
import os
import resource
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ["MARLIN_TPU_XLA_CACHE"] = ""
# eager primitives: fused 2^20-shape round graphs take tens of minutes to
# compile on XLA:CPU (bench.py's CPU-fallback lesson)
os.environ["MARLIN_TPU_FUSE_ROUNDS"] = "0"
# commit MSMs through the native C Pippenger by default: the XLA:CPU limb
# curve kernels are ~100x slower, making device-sharded commit MSMs at
# 2^20 infeasible on a virtual CPU mesh.  The sharded-MSM path is
# validated separately (tests/test_sharded.py, scaling_sweep.py); the
# 2^20 row's deliverable is the resident domain sharding — every round
# NTT still runs as the block-sharded 4-step transform.  Proofs are
# bit-identical either way.  (Recorded as msm_route in the output row.)
#
# MARLIN_SWEEP_SHARDED_MSM=1 (VERDICT r5 task 4's second row) instead
# routes the SHARDED prove's commit MSMs through the distributed
# Pippenger (parallel/msm_sharded.py) so the sharded commit path is
# exercised inside a full prove; index and the single-chip reference
# still use the C route (route choice cannot affect proof bytes).
_SHARDED_MSM = os.environ.get("MARLIN_SWEEP_SHARDED_MSM") == "1"
os.environ.setdefault("MARLIN_TPU_HOST_MSM", "1")

import jax

try:
    from jax._src import xla_bridge as _xb

    for _name in list(getattr(_xb, "_backend_factories", {})):
        if _name not in ("cpu", "interpreter", "tpu"):
            _xb._backend_factories.pop(_name, None)
except Exception:
    pass

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", int(os.environ.get("MARLIN_SWEEP_DEVICES", "8")))

import numpy as np
from jax.sharding import Mesh

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    log2n = int(os.environ.get("MARLIN_SWEEP_PROVE_LOG2N", "20"))
    pc = os.environ.get("MARLIN_SWEEP_PROVE_PC", "sonic")
    d = int(os.environ.get("MARLIN_SWEEP_DEVICES", "8"))
    n = 1 << log2n

    from circuits import DummyCircuit

    from marlin_tpu import Marlin, MarlinSonic
    from marlin_tpu.fields import bls12_381 as P
    from marlin_tpu.snark import serial
    from marlin_tpu.utils.rand import test_rng

    M = MarlinSonic if pc == "sonic" else Marlin
    devs = np.array(jax.devices()[:d])
    mesh = Mesh(devs, ("x",))

    t0 = time.perf_counter()

    def log(msg):
        print(f"[psweep +{time.perf_counter()-t0:8.1f}s] {msg}", flush=True)

    a, b = 3, 7
    circ = DummyCircuit(a, b, num_variables=10, num_constraints=n)
    log(f"SRS for 2^{log2n} ({pc})")
    from marlin_tpu.snark import ahp

    max_degree = ahp.max_degree(n, n, 3 * n)
    srs = serial.cached_srs(max_degree, test_rng(), flavor=pc if pc == "sonic" else "marlin")
    # index keys are deterministic (curve, circuit, pc) artifacts — reuse
    # bench.py's cache (bench.py:88-105) when the size matches; note the
    # bench circuit uses test_rng()-drawn a,b, so adopt those here too
    idx_dir = os.path.expanduser("~/.cache/marlin_tpu_srs")
    suffix = "" if pc == "marlin" else f"_{pc}"
    pk_path = os.path.join(idx_dir, f"bench_idx_{n}{suffix}_pk.npz")
    vk_path = os.path.join(idx_dir, f"bench_idx_{n}{suffix}_vk.npz")
    _brng = test_rng()
    ba, bb = _brng.rand_fr(), _brng.rand_fr()
    if os.path.exists(pk_path) and os.path.exists(vk_path):
        log(f"loading cached index keys ({pk_path})")
        a, b = ba, bb
        circ = DummyCircuit(a, b, num_variables=10, num_constraints=n)
        pk = serial.load_index_pk(pk_path, srs=srs)
        vk = serial.load_index_vk(vk_path)
    else:
        log("index")
        pk, vk = M.index(srs, circ)
    log("sharded prove" + (" (sharded commit MSMs)" if _SHARDED_MSM else ""))
    if _SHARDED_MSM:
        os.environ["MARLIN_TPU_HOST_MSM"] = "0"
    t_sh = time.perf_counter()
    proof_sharded = M.prove(pk, circ, test_rng(), mesh=mesh)
    sharded_bytes = proof_sharded.to_bytes()
    t_sh = time.perf_counter() - t_sh
    if _SHARDED_MSM:
        os.environ["MARLIN_TPU_HOST_MSM"] = "1"
    log(f"sharded prove done in {t_sh:.1f}s; verifying")
    ok_verify = M.verify(vk, [a * b % P.R_MODULUS], proof_sharded, test_rng())
    log(f"verify: {ok_verify}; single-chip reference prove")
    t_single = time.perf_counter()
    proof_single = M.prove(pk, circ, test_rng())
    t_single = time.perf_counter() - t_single
    bitwise = proof_single.to_bytes() == sharded_bytes
    log(f"single-chip done in {t_single:.1f}s; bitwise_equal={bitwise}")

    # bounded-memory evidence: a block-sharded [n,16] oracle holds n/D rows
    # per device; report the largest per-device shard the resident NTT path
    # produces for an |H|-sized vector on this mesh
    from marlin_tpu.ops import fr
    from marlin_tpu.parallel.ntt_sharded import block_sharding, ntt_4step_resident

    x = jax.device_put(
        fr.from_ints([1] * n), block_sharding(mesh)
    )
    ev = ntt_4step_resident(x, mesh)
    shard_rows = {s.data.shape[0] for s in ev.addressable_shards}
    per_dev_mb = max(shard_rows) * 16 * 4 / 2**20
    peak_rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20

    rec = {
        "kernel": f"sharded_prove_{pc}",
        "log2n": log2n,
        "devices": d,
        "msm_route": "sharded_prove=sharded_pippenger" if _SHARDED_MSM else "host_c",
        "bitwise_equal": bool(bitwise),
        "verified": bool(ok_verify),
        "prove_wall_s_sharded": round(t_sh, 1),
        "prove_wall_s_single": round(t_single, 1),
        "resident_ntt_per_device_mb": round(per_dev_mb, 2),
        "resident_ntt_shard_rows": sorted(shard_rows),
        "host_peak_rss_gb": round(peak_rss_gb, 2),
    }
    print(json.dumps(rec), flush=True)
    if not (bitwise and ok_verify):
        sys.exit(1)


if __name__ == "__main__":
    main()
