#!/usr/bin/env python
"""Marlin prover benchmark — prints ONE JSON line.

Methodology mirrors reference benches/bench.rs: DummyCircuit with
`num_constraints` constraints / 10 witness variables, universal SRS sized
(n, n, 3n), mean prover wall time over reps, reported as ns/constraint
(benches/bench.rs:94-107).  PC scheme is the Marlin KZG10 variant.

Env knobs: MARLIN_BENCH_CONSTRAINTS (default 2^14), MARLIN_BENCH_REPS
(default 3).  `vs_baseline` compares against the reference's multi-threaded
Xeon 6136 per-constraint time at 2^16 (BASELINE.md — the repo publishes
graphs, not numbers; 25 µs/constraint is the documented estimate used
here).  vs_baseline > 1 means faster than the reference baseline.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

BASELINE_NS_PER_CONSTRAINT = 25_000.0


def _warm_manifest(backend: str) -> str:
    return os.path.expanduser(f"~/.cache/marlin_tpu_srs/bench_warm_{backend}.json")


def _warm_sizes(backend: str) -> set:
    try:
        with open(_warm_manifest(backend)) as f:
            return set(json.load(f).get("warm_log2", []))
    except Exception:
        return set()


def _record_warm(backend: str, log2n: int) -> None:
    try:
        sizes = _warm_sizes(backend)
        sizes.add(log2n)
        path = _warm_manifest(backend)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump({"warm_log2": sorted(sizes)}, f)
    except Exception:
        pass


def _probe_backend(timeout_s: int = 600) -> str:
    """Name of the usable backend, probing in a subprocess.

    The axon TPU tunnel can sit in a multi-minute claim-retry loop (or be
    hard-down) — probing in-process would wedge the bench with no output.
    On failure the bench falls back to CPU so a number is still captured;
    the emitted JSON names the backend measured.  MARLIN_BENCH_BACKEND
    overrides (e.g. =cpu, or =tpu to skip the probe)."""
    import subprocess

    forced = os.environ.get("MARLIN_BENCH_BACKEND")
    if forced:
        return forced
    if os.environ.get("JAX_PLATFORMS", "") in ("cpu",):
        return "cpu"
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True,
            timeout=timeout_s,
            env=dict(os.environ, TF_CPP_MIN_LOG_LEVEL="3"),
        )
        return "tpu" if r.returncode == 0 else "cpu"
    except subprocess.TimeoutExpired:
        # a hung claim-retry loop counts as unavailable
        return "cpu"


def main():
    num_constraints = int(os.environ.get("MARLIN_BENCH_CONSTRAINTS", 1 << 14))
    reps = int(os.environ.get("MARLIN_BENCH_REPS", 1))

    backend = _probe_backend()
    if backend == "cpu":
        print(
            "[bench] TPU backend unavailable or forced off; measuring the "
            "XLA:CPU backend (JSON line carries backend=cpu)",
            file=sys.stderr,
            flush=True,
        )
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
        os.environ.setdefault(
            "MARLIN_TPU_XLA_CACHE", os.path.expanduser("~/.cache/marlin_tpu_xla_cpu")
        )
        # commit MSMs on the CPU backend route to the native C Pippenger
        # (~100x the XLA:CPU limb path; bit-identical proofs)
        os.environ.setdefault("MARLIN_TPU_HOST_MSM", "1")
        # at bench sizes the fused round jits buy nothing on CPU (warm
        # 24.6 vs 26 s at 2^12) but cost ~25 min of XLA:CPU compile per
        # size; run the rounds as eager cached primitives instead
        os.environ.setdefault("MARLIN_TPU_FUSE_ROUNDS", "0")
        # the axon plugin registers at interpreter start (sitecustomize),
        # so env mutation alone cannot stop a later claim attempt — drop
        # the tunnel factory and pin the platform (tests/conftest.py does
        # the same)
        import jax

        try:
            from jax._src import xla_bridge as _xb

            for _name in list(getattr(_xb, "_backend_factories", {})):
                if _name not in ("cpu", "interpreter", "tpu"):
                    _xb._backend_factories.pop(_name, None)
        except Exception:
            pass
        jax.config.update("jax_platforms", "cpu")
        # CPU can't absorb the 2^14 default inside a capture budget
        if "MARLIN_BENCH_CONSTRAINTS" not in os.environ:
            num_constraints = 1 << 12

    # The one-time remote-compile cost of a cold size is hours on the
    # tunneled TPU (BASELINE.md); a bench invocation that dies in compiles
    # reports nothing.  Unless MARLIN_BENCH_STRICT=1 pins the requested
    # size, fall back to the largest size a previous invocation completed
    # end-to-end (recorded in the warm manifest) so a number is always
    # captured; the emitted metric names the size it measured.
    if os.environ.get("MARLIN_BENCH_STRICT") != "1" and backend == "tpu":
        warm = _warm_sizes(backend)
        want = num_constraints.bit_length() - 1
        if warm and want not in warm:
            le = [w for w in warm if w <= want]
            best = max(le) if le else min(warm)
            if best != want:
                print(
                    f"[bench] 2^{want} not warm; measuring warm 2^{best} instead "
                    f"(MARLIN_BENCH_STRICT=1 to force)",
                    file=sys.stderr,
                    flush=True,
                )
                num_constraints = 1 << best

    t0 = time.perf_counter()

    def progress(msg):
        print(f"[bench +{time.perf_counter() - t0:7.1f}s] {msg}", file=sys.stderr, flush=True)

    progress(f"importing (2^{num_constraints.bit_length() - 1} constraints)")
    from circuits import DummyCircuit

    from marlin_tpu import Marlin
    from marlin_tpu.fields import bls12_381 as P
    from marlin_tpu.utils.rand import test_rng

    rng = test_rng()
    a = rng.rand_fr()
    b = rng.rand_fr()
    circ = DummyCircuit(a, b, num_variables=10, num_constraints=num_constraints)

    # SRS sizing follows universal_setup(n, n, 3n) (benches/bench.rs:83);
    # the powers-of-tau artifact is cached on disk across runs.
    from marlin_tpu.snark import ahp, serial

    max_degree = ahp.max_degree(num_constraints, num_constraints, 3 * num_constraints)
    progress(f"loading/generating SRS (max_degree {max_degree})")
    srs = serial.cached_srs(max_degree, rng)
    progress("indexing")
    pk, vk = Marlin.index(srs, circ)

    progress("warmup prove (compiles kernel shapes; cached across runs)")
    proof = Marlin.prove(pk, circ, rng)
    progress("warmup verify")
    assert Marlin.verify(vk, [a * b % P.R_MODULUS], proof, rng), "bench proof must verify"

    progress(f"timed region: {reps} rep(s)")
    start = time.perf_counter()
    for _ in range(reps):
        proof = Marlin.prove(pk, circ, rng)
    elapsed = time.perf_counter() - start
    progress(f"done ({elapsed / reps:.2f} s/prove)")

    _record_warm(backend, num_constraints.bit_length() - 1)
    ns_per_constraint = elapsed / reps / num_constraints * 1e9
    print(
        json.dumps(
            {
                "metric": f"prover_ns_per_constraint@2^{num_constraints.bit_length() - 1}",
                "value": round(ns_per_constraint, 1),
                "unit": "ns/constraint",
                "vs_baseline": round(BASELINE_NS_PER_CONSTRAINT / ns_per_constraint, 4),
                "backend": backend,
            }
        )
    )


if __name__ == "__main__":
    main()
