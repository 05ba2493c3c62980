#!/usr/bin/env python
"""Marlin prove+verify benchmark — prints ONE JSON line.

Methodology mirrors reference benches/bench.rs: DummyCircuit with
`num_constraints` constraints / 10 witness variables, universal SRS sized
(n, n, 3n); prover = mean wall time over reps as ns/constraint
(benches/bench.rs:94-107); verifier = mean of 50 verifies in ms
(benches/bench.rs:111-159).

FROZEN HEADLINE CONTRACT (longitudinally comparable across BENCH_r*.json):
the headline metric is always `prover_ns_per_constraint@2^14` with the
Marlin KZG10 variant over BLS12-381 — the size never auto-shrinks and
never silently substitutes a warmer size.  The backend may fall back to
XLA:CPU when the TPU pool is down (the JSON line names the backend
measured); everything else is pinned.

UN-DROPPABLE EMISSION (VERDICT r5 task 1): the headline JSON line is
printed and FLUSHED immediately after the headline capture — before any
secondary runs — so a driver timeout during a secondary can never destroy
the record.  If secondaries complete, a second, extended JSON line (a
strict superset of the first) is printed; consumers taking the last JSON
line get the extended record, consumers that killed the process mid-
secondary still find the headline line.

SECONDARY CAPTURES (extended line, extra keys; VERDICT r4 task 3): the
reference's exact bench point — 2^16 constraints with the SonicKZG10
variant (benches/bench.rs:13,22) — plus MarlinKZG10 at 2^16, captured
after the headline when the wall budget allows.  Disable with
MARLIN_BENCH_SECONDARY=0; budget via MARLIN_BENCH_BUDGET_S (default 600,
under the driver's observed ~900 s kill ceiling: secondaries are skipped
once elapsed wall passes it).

Env knobs (extras, not the contract): MARLIN_BENCH_CONSTRAINTS overrides
the headline size for ad-hoc runs, MARLIN_BENCH_REPS the rep count,
MARLIN_BENCH_BACKEND=cpu|tpu skips the probe.  `vs_baseline` compares
against the reference's multi-threaded Xeon 6136 per-constraint time at
2^16 (BASELINE.md; the repo publishes graphs, not numbers; 25 µs/constraint
is the documented estimate).  vs_baseline > 1 means faster than baseline.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

BASELINE_NS_PER_CONSTRAINT = 25_000.0
HEADLINE_LOG2 = 14
VERIFY_REPS = 50


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


def _load_keys(M, circ, srs, num_constraints, pc_name, progress):
    """Index keys are deterministic artifacts of (curve, circuit, pc) —
    cached like the SRS.  On the tunneled TPU, compiled executables do NOT
    persist across processes, so re-indexing costs many minutes of
    trace/compile per invocation; loading the npz skips that."""
    from marlin_tpu.snark import serial

    idx_dir = os.path.expanduser("~/.cache/marlin_tpu_srs")
    suffix = "" if pc_name == "marlin" else f"_{pc_name}"
    idx_key = f"bench_idx_{num_constraints}{suffix}"
    pk_path = os.path.join(idx_dir, f"{idx_key}_pk.npz")
    vk_path = os.path.join(idx_dir, f"{idx_key}_vk.npz")
    if os.path.exists(pk_path) and os.path.exists(vk_path):
        progress(f"loading cached index keys ({idx_key})")
        pk = serial.load_index_pk(pk_path, srs=srs)
        vk = serial.load_index_vk(vk_path)
    else:
        progress(f"indexing ({pc_name} 2^{num_constraints.bit_length() - 1})")
        pk, vk = M.index(srs, circ)
        try:
            serial.save_index_pk(pk, pk_path, include_srs=False)
            serial.save_index_vk(vk, vk_path)
        except Exception as e:  # cache failure must not kill the capture
            print(f"[bench] index cache write failed: {e}", file=sys.stderr)
    return pk, vk


def _run_config(M, num_constraints, reps, pc_name, progress, verify_reps):
    """One (PC scheme, size) capture -> dict of metrics."""
    from marlin_tpu.fields import bls12_381 as P
    from marlin_tpu.snark import ahp, serial
    from marlin_tpu.utils.rand import test_rng

    from circuits import DummyCircuit

    rng = test_rng()
    a = rng.rand_fr()
    b = rng.rand_fr()
    circ = DummyCircuit(a, b, num_variables=10, num_constraints=num_constraints)

    max_degree = ahp.max_degree(num_constraints, num_constraints, 3 * num_constraints)
    progress(f"loading/generating SRS (max_degree {max_degree}, {pc_name})")
    srs = serial.cached_srs(max_degree, rng, flavor="sonic" if pc_name == "sonic" else "marlin")
    pk, vk = _load_keys(M, circ, srs, num_constraints, pc_name, progress)

    def prove_with_retry():
        # the axon tunnel's remote_compile can drop mid-request; the backend
        # usually survives, so retry in-process (keeps warm kernels) before
        # the outer retry loop restarts the whole process
        for attempt in range(3):
            try:
                return M.prove(pk, circ, rng)
            except Exception as e:
                if "remote_compile" not in str(e) or attempt == 2:
                    raise
                print(f"[bench] tunnel hiccup, in-process retry: {e}", file=sys.stderr)

    progress("warmup prove (compiles kernel shapes; cached across runs)")
    proof = prove_with_retry()
    public_input = [a * b % P.R_MODULUS]
    assert M.verify(vk, public_input, proof, rng), "bench proof must verify"

    progress(f"timed prove region: {reps} rep(s)")
    start = time.perf_counter()
    for _ in range(reps):
        proof = prove_with_retry()
    elapsed = time.perf_counter() - start
    progress(f"prove done ({elapsed / reps:.2f} s/prove)")

    verify_ms = None
    if verify_reps:
        # verifier: mean of 50, reference benches/bench.rs:23,144-157
        progress(f"timed verify region: {verify_reps} reps")
        vstart = time.perf_counter()
        for _ in range(verify_reps):
            ok = M.verify(vk, public_input, proof, rng)
        verify_ms = (time.perf_counter() - vstart) / verify_reps * 1e3
        assert ok, "bench proof must verify"
        progress(f"verify done ({verify_ms:.1f} ms/verify)")

    return {
        "ns_per_constraint": elapsed / reps / num_constraints * 1e9,
        "verify_ms": verify_ms,
        "proof_bytes": proof.serialized_size(),
    }


def main():
    num_constraints = int(os.environ.get("MARLIN_BENCH_CONSTRAINTS", 1 << HEADLINE_LOG2))
    reps = int(os.environ.get("MARLIN_BENCH_REPS", 1))
    budget_s = float(os.environ.get("MARLIN_BENCH_BUDGET_S", "600"))

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

    t0 = time.perf_counter()

    def progress(msg):
        print(f"[bench +{time.perf_counter() - t0:7.1f}s] {msg}", file=sys.stderr, flush=True)

    log2 = num_constraints.bit_length() - 1
    progress(f"importing (2^{log2} constraints)")
    from marlin_tpu import Marlin, MarlinSonic

    head = _run_config(Marlin, num_constraints, reps, "marlin", progress, VERIFY_REPS)
    ns = head["ns_per_constraint"]
    record = {
        "metric": f"prover_ns_per_constraint@2^{log2}",
        "value": round(ns, 1),
        "unit": "ns/constraint",
        "vs_baseline": round(BASELINE_NS_PER_CONSTRAINT / ns, 4),
        "backend": backend,
        "verify_ms_mean50": round(head["verify_ms"], 2),
        "proof_bytes": head["proof_bytes"],
    }

    # UN-DROPPABLE: the headline record is on stdout before any secondary
    # can burn budget (VERDICT r4 weak #1 — the r4 capture died mid-Sonic
    # with the whole record unprinted).
    print(json.dumps(record), flush=True)

    secondary_on = (
        os.environ.get("MARLIN_BENCH_SECONDARY", "1") == "1"
        and num_constraints == (1 << HEADLINE_LOG2)
    )
    if secondary_on and time.perf_counter() - t0 < budget_s:
        # the reference's exact bench configuration: 2^16 constraints,
        # SonicKZG10 (benches/bench.rs:13,22)
        try:
            sonic16 = _run_config(MarlinSonic, 1 << 16, 1, "sonic", progress, 0)
            record["sonic_ns_per_constraint@2^16"] = round(sonic16["ns_per_constraint"], 1)
            record["sonic_vs_baseline@2^16"] = round(
                BASELINE_NS_PER_CONSTRAINT / sonic16["ns_per_constraint"], 4
            )
            record["sonic_proof_bytes"] = sonic16["proof_bytes"]
            # progressive extended record (strict superset of the headline
            # line): each completed secondary re-prints, so a driver kill
            # during a LATER secondary can only lose that secondary
            print(json.dumps(record), flush=True)
        except Exception as e:
            progress(f"sonic 2^16 capture failed: {e}")
    if secondary_on and time.perf_counter() - t0 < budget_s:
        try:
            m16 = _run_config(Marlin, 1 << 16, 1, "marlin", progress, 0)
            record["prover_ns_per_constraint@2^16"] = round(m16["ns_per_constraint"], 1)
            record["vs_baseline@2^16"] = round(
                BASELINE_NS_PER_CONSTRAINT / m16["ns_per_constraint"], 4
            )
            print(json.dumps(record), flush=True)
        except Exception as e:
            progress(f"marlin 2^16 capture failed: {e}")


if __name__ == "__main__":
    main()
