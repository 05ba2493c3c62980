"""Round-5 in-session TPU experiments (exec into the r5_session REPL):

    exec(open("tools/r5_experiments.py").read())

Each function prints one JSON line per measurement; all fencing is by
result-byte fetch (block_until_ready does not fence on the axon tunnel).
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from marlin_tpu.ops import fq as _fq, fr as _fr, ntt as _ntt, msm as _msm
from marlin_tpu.ops.pallas import curve as _pcurve
from marlin_tpu.utils.rand import ZkRng as _ZkRng


def _fence(v):
    if isinstance(v, (tuple, list)):
        v = v[0]
    np.asarray(jax.device_get(jnp.ravel(v)[:1]))


def _rtt(reps=5):
    s = jnp.zeros((), jnp.uint32) + 1
    _fence(s)
    t0 = time.perf_counter()
    for _ in range(reps):
        _fence(s + 1)
    return (time.perf_counter() - t0) / reps


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def fold_rt_sweep(rts=(8, 16, 32), cap=144, lanes=16384, reps=3):
    """Sweep MARLIN_TPU_FOLD_RT on the chip at the 2^14 commit fold shape
    (VERDICT r5 task 3).  Clears the kernel build cache per variant."""
    rng = np.random.default_rng(5)
    n = cap * lanes

    limbs = rng.integers(0, 1 << 16, (2 * n, _fq.L), dtype=np.uint32)
    limbs[:, -1] &= 0x19FF
    X = jnp.asarray(limbs[:n]).reshape(cap, lanes, _fq.L)
    Y = jnp.asarray(limbs[n:]).reshape(cap, lanes, _fq.L)
    mask = jnp.ones((cap, lanes), jnp.uint32)
    mat = _pcurve.pack_points_xy(X, Y)
    rtt = _rtt()
    prev = os.environ.get("MARLIN_TPU_FOLD_RT")
    try:
        for rt in rts:
            if cap % rt or (rt & (rt - 1)):
                _emit(rt=rt, skipped="cap %% rt or non-pow2")
                continue
            os.environ["MARLIN_TPU_FOLD_RT"] = str(rt)
            _pcurve._build_fold.cache_clear()
            t0 = time.perf_counter()
            out = _pcurve.bucket_fold(mat, mask, cap, exact=False)
            _fence(out[1])
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(reps):
                out = _pcurve.bucket_fold(mat, mask, cap, exact=False)
                _fence(out[1])
            per = (time.perf_counter() - t0) / reps - rtt
            madds = (cap - 1) * lanes
            _emit(
                experiment="fold_rt_sweep",
                rt=rt,
                cap=cap,
                lanes=lanes,
                fold_s=round(per, 4),
                ns_per_madd=round(per * 1e9 / madds, 2),
                compile_s=round(compile_s, 1),
            )
    finally:
        if prev is None:
            os.environ.pop("MARLIN_TPU_FOLD_RT", None)
        else:
            os.environ["MARLIN_TPU_FOLD_RT"] = prev
        _pcurve._build_fold.cache_clear()


def ntt_dissect(log2n=14, reps=5):
    """Split a 2^14 transform's cost: full jit vs fused-stage kernel vs
    bitrev gather vs limb-major relayouts (VERDICT r5 task 5 recon)."""
    from marlin_tpu.ops.pallas import ntt as _pntt
    from marlin_tpu.ops.pallas.field import to_lm, from_lm

    n = 1 << log2n
    rng = _ZkRng(9)
    x = _fr.from_ints(rng.rand_fr_list(n))
    rtt = _rtt()

    # full single transform
    e = _ntt.ntt(x, n)
    _fence(e)
    t0 = time.perf_counter()
    y = x
    for _ in range(reps):
        y = _ntt.ntt(y[:n], n)
        _fence(y)
    _emit(experiment="ntt_full", per_s=round((time.perf_counter() - t0) / reps - rtt, 5))

    # fused stages alone (pre-planned)
    planes = [jnp.asarray(p) for p in _ntt._plan_planes(n, False)]
    f = jax.jit(lambda v: _pntt.fused_stages(v, planes, _fr.CTX))
    e = f(x)
    _fence(e)
    t0 = time.perf_counter()
    y = x
    for _ in range(reps):
        y = f(y)
        _fence(y)
    _emit(experiment="ntt_fused_stages_only", per_s=round((time.perf_counter() - t0) / reps - rtt, 5))

    # bitrev gather alone
    rev, stages = _ntt._plan(n, False)
    rev_d = jnp.asarray(rev)
    g = jax.jit(lambda v: v[rev_d])
    e = g(x)
    _fence(e)
    t0 = time.perf_counter()
    y = x
    for _ in range(reps):
        y = g(y)
        _fence(y)
    _emit(experiment="ntt_bitrev_only", per_s=round((time.perf_counter() - t0) / reps - rtt, 5))

    # one cross-block XLA stage (the stage > fused block)
    tw = jnp.asarray(stages[-1])

    def one_stage(v):
        m = tw.shape[0]
        v = v.reshape(n // (2 * m), 2, m, _fr.L)
        e2, o = v[:, 0], v[:, 1]
        t = _fr.mul(o, tw[None, :, :])
        return jnp.stack([_fr.add(e2, t), _fr.sub(e2, t)], axis=1).reshape(n, _fr.L)

    s1 = jax.jit(one_stage)
    e = s1(x)
    _fence(e)
    t0 = time.perf_counter()
    y = x
    for _ in range(reps):
        y = s1(y)
        _fence(y)
    _emit(experiment="ntt_one_xla_stage", per_s=round((time.perf_counter() - t0) / reps - rtt, 5))

    # relayout round-trip
    rl = jax.jit(lambda v: from_lm(to_lm(v)))
    e = rl(x)
    _fence(e)
    t0 = time.perf_counter()
    y = x
    for _ in range(reps):
        y = rl(y)
        _fence(y)
    _emit(experiment="ntt_relayout_roundtrip", per_s=round((time.perf_counter() - t0) / reps - rtt, 5))


def msm_dissect(log2n=14, reps=3):
    """Split the fixed-table commit MSM: digits+layout (argsort path) vs
    gather+fold, at the real commit shapes."""
    pp_points = pk.committer_key.pp.powers_of_g  # noqa: F821  (session scope)
    from marlin_tpu.snark import kzg as _kzg

    table = _kzg._ensure_msm_table(pk.committer_key.pp)  # noqa: F821
    c, W, N = table.c, table.num_windows, table.n_base
    nb = (1 << (c - 1)) + 1
    n_j = 1 << log2n
    rng = _ZkRng(11)
    scal = _fr.from_ints(rng.rand_fr_list(n_j))
    lam = max(1, (n_j * (W - 1)) // (nb - 1))
    cap = int(np.ceil((lam + 6 * np.sqrt(lam) + 8) / 8.0)) * 8
    nb_top, cap_top = _msm._top_fold_shape(n_j, c, W)
    rtt = _rtt()

    layout_fn = jax.jit(
        lambda s: _msm._signed_layout_device(
            __import__("marlin_tpu.ops.bigint", fromlist=["x"]).from_mont(_fr.CTX, s),
            c, W, nb, cap, N, 0, nb_top, cap_top,
        )
    )
    lay = layout_fn(scal)
    _fence(lay[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        lay = layout_fn(scal)
        _fence(lay[0])
    _emit(experiment="msm_layout_only", c=c, cap=cap, per_s=round((time.perf_counter() - t0) / reps - rtt, 4))

    fold_fn = jax.jit(
        lambda l: _msm._single_window_kernel(table.xy, l, 1, nb, cap, False)
    )
    big = lay[0]
    out = fold_fn(big)
    _fence(out[1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fold_fn(big)
        _fence(out[1])
    _emit(experiment="msm_fold_only", per_s=round((time.perf_counter() - t0) / reps - rtt, 4))

    t0 = time.perf_counter()
    for _ in range(reps):
        tot, flag = _msm._fixed_group_kernel(
            table.xy, scal, (n_j,), jnp.zeros((1,), jnp.int32), c, W, nb, int(cap), False
        )
        _fence(flag)
    _emit(experiment="msm_fixed_full", per_s=round((time.perf_counter() - t0) / reps - rtt, 4))


print("[r5 experiments] fold_rt_sweep() ntt_dissect() msm_dissect()", flush=True)
