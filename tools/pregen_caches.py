#!/usr/bin/env python
"""Pre-generate the bench's SRS + index-key caches on the CPU backend.

The driver's end-of-round bench.py run pays for any cold cache out of its
~900 s kill budget; index keys and SRS archives are deterministic
artifacts of (curve, circuit, pc) and do not depend on the backend that
computed them (the CPU route uses the native C Pippenger — bit-identical
commitments), so warming them here keeps the TPU free for the capture
itself.  Mirrors bench.py's cache naming exactly (bench.py:88-105).

Env: PREGEN_CONFIGS — comma list of log2n:pc pairs (default
"16:marlin,16:sonic,18:marlin").
"""

import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ.setdefault("MARLIN_TPU_HOST_MSM", "1")
os.environ.setdefault("MARLIN_TPU_FUSE_ROUNDS", "0")

import jax

try:
    from jax._src import xla_bridge as _xb

    for _name in list(getattr(_xb, "_backend_factories", {})):
        if _name not in ("cpu", "interpreter", "tpu"):
            _xb._backend_factories.pop(_name, None)
except Exception:
    pass
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    configs = os.environ.get("PREGEN_CONFIGS", "16:marlin,16:sonic,18:marlin")

    from circuits import DummyCircuit

    from marlin_tpu import Marlin, MarlinSonic
    from marlin_tpu.snark import ahp, serial
    from marlin_tpu.utils.rand import test_rng

    idx_dir = os.path.expanduser("~/.cache/marlin_tpu_srs")
    t0 = time.perf_counter()
    for item in configs.split(","):
        log2n, pc = item.strip().split(":")
        n = 1 << int(log2n)
        M = MarlinSonic if pc == "sonic" else Marlin
        suffix = "" if pc == "marlin" else f"_{pc}"
        pk_path = os.path.join(idx_dir, f"bench_idx_{n}{suffix}_pk.npz")
        vk_path = os.path.join(idx_dir, f"bench_idx_{n}{suffix}_vk.npz")
        rng = test_rng()
        a, b = rng.rand_fr(), rng.rand_fr()
        circ = DummyCircuit(a, b, num_variables=10, num_constraints=n)
        print(f"[pregen +{time.perf_counter()-t0:7.1f}s] SRS 2^{log2n} {pc}", flush=True)
        srs = serial.cached_srs(
            ahp.max_degree(n, n, 3 * n), rng, flavor="sonic" if pc == "sonic" else "marlin"
        )
        if os.path.exists(pk_path) and os.path.exists(vk_path):
            print(f"[pregen] index keys already cached: {pk_path}", flush=True)
            continue
        print(f"[pregen +{time.perf_counter()-t0:7.1f}s] index 2^{log2n} {pc}", flush=True)
        pk, vk = M.index(srs, circ)
        serial.save_index_pk(pk, pk_path, include_srs=False)
        serial.save_index_vk(vk, vk_path)
        print(f"[pregen +{time.perf_counter()-t0:7.1f}s] cached {pk_path}", flush=True)
    print(f"[pregen] done in {time.perf_counter()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
