"""AHP prover: three rounds of oracle polynomials (reference src/ahp/prover.rs).

All per-element work runs on device as batched Fr limb programs (NTTs,
Hadamard combines, batched inversions, segment scatters); the host only
sequences rounds and moves the handful of challenge scalars.

Round structure (call stack in SURVEY.md §3.3):
  init   — Prove-mode synthesis, padding, z_A = Az / z_B = Bz sparse SpMV
  round1 — x̂/w LDEs, blinded ẑ_A/ẑ_B, mask polynomial
  round2 — outer sumcheck: t, g_1, h_1 via the ~3|H| mul-domain combine
  round3 — inner sumcheck over K: g_2, h_2 via batched inversion
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..fields import bls12_381 as P
from ..ops import fr, ntt, poly, sparse
from ..utils.rand import ZkRng
from . import ahp
from .constraint_systems import (
    make_matrices_square,
    pad_input_for_indexer_and_prover,
    unformat_public_input,
)
from .domains import Radix2Domain
from .indexer import Index
from .r1cs import ConstraintSystem, OptimizationGoal, SynthesisMode

R = P.R_MODULUS


class ProvingError(Exception):
    pass


@dataclass
class LabeledPoly:
    """Coefficient-form oracle with PC metadata (ark-poly-commit's
    LabeledPolynomial: label, degree_bound, hiding_bound)."""

    label: str
    coeffs: jnp.ndarray  # [len, 16] Montgomery limbs
    degree_bound: int | None = None
    hiding_bound: int | None = None


@dataclass
class ProverState:
    """Reference src/ahp/prover.rs:27-63."""

    formatted_input: list  # ints
    witness: list  # ints
    z_a: jnp.ndarray  # [|H|, 16] evals
    z_b: jnp.ndarray
    index: Index
    domain_h: Radix2Domain
    domain_k: Radix2Domain
    domain_x: Radix2Domain
    zk_bound: int = ahp.ZK_BOUND
    w_poly: LabeledPoly | None = None
    z_a_poly: LabeledPoly | None = None
    z_b_poly: LabeledPoly | None = None
    mask_poly: LabeledPoly | None = None
    verifier_first_msg: object = None

    def public_input(self) -> list:
        return unformat_public_input(self.formatted_input)


def prover_init(index: Index, circuit) -> ProverState:
    """Reference src/ahp/prover.rs:211-306."""
    cs = ConstraintSystem(mode=SynthesisMode.PROVE, optimization_goal=OptimizationGoal.WEIGHT)
    circuit.generate_constraints(cs)
    pad_input_for_indexer_and_prover(cs)
    cs.finalize()
    make_matrices_square(cs)

    info = index.index_info
    num_vars = cs.num_instance_variables + cs.num_witness_variables
    if cs.num_constraints != info.num_constraints or num_vars != info.num_variables:
        raise ProvingError("instance does not match index")
    if not ahp.num_formatted_inputs_is_admissible(cs.num_instance_variables):
        raise ProvingError("formatted public input length must be a power of two")

    z = fr.from_ints(cs.full_assignment())
    z_a = sparse.spmv(index.a, z, index.domain_h.size)
    z_b = sparse.spmv(index.b, z, index.domain_h.size)

    return ProverState(
        formatted_input=list(cs.instance_assignment),
        witness=list(cs.witness_assignment),
        z_a=z_a,
        z_b=z_b,
        index=index,
        domain_h=index.domain_h,
        domain_k=index.domain_k,
        domain_x=index.domain_x,
    )


def _blind_with_vanishing(p: jnp.ndarray, r_int: int, domain_size: int) -> jnp.ndarray:
    """p + r * v_D  (the zk blinding at reference prover.rs:352,360,366)."""
    n = max(p.shape[0], domain_size + 1)
    out = poly.pad_to(p, n)
    rv = np.zeros((n,), dtype=object)
    rv[0] = (-r_int) % R
    rv[domain_size] = r_int % R
    return fr.add(out, fr.from_ints(list(rv)))


def prover_first_round(state: ProverState, zk_rng: ZkRng):
    """Reference src/ahp/prover.rs:309-409 -> (oracles dict, state)."""
    h = state.domain_h.size
    x_size = state.domain_x.size
    zk = state.zk_bound

    # x̂: interpolate the formatted input over X, then evaluate on H
    x_poly = ntt.intt(fr.from_ints(state.formatted_input))
    x_evals = ntt.ntt(x_poly, h)

    ratio = h // x_size
    w_ext_len = h - x_size
    w_extended = state.witness + [0] * (w_ext_len - len(state.witness))

    k = np.arange(h)
    mask = k % ratio == 0
    widx = np.where(mask, 0, k - k // ratio - 1)
    w_ext_dev = fr.from_ints(w_extended) if w_ext_len else fr.zeros((1,))
    gathered = w_ext_dev[jnp.asarray(widx, dtype=jnp.int32)]
    w_evals = fr.select(jnp.asarray(~mask), fr.sub(gathered, x_evals), fr.zeros((h,)))

    w_over_h = _blind_with_vanishing(ntt.intt(w_evals), zk_rng.rand_fr(), h)
    w_poly, rem = poly.divide_by_vanishing(w_over_h, x_size)

    z_a_poly = _blind_with_vanishing(ntt.intt(state.z_a), zk_rng.rand_fr(), h)
    z_b_poly = _blind_with_vanishing(ntt.intt(state.z_b), zk_rng.rand_fr(), h)

    # mask polynomial: degree 3|H| + 2 zk - 3, Σ_H mask = 0
    # (reference prover.rs:369-381)
    mask_len = 3 * h + 2 * zk - 2  # degree + 1
    mask_ints = zk_rng.rand_fr_list(mask_len)
    r_0 = 0
    for i in range((mask_len - 1) // h + 1):
        if h * i < mask_len:
            r_0 += mask_ints[h * i]
    mask_ints[0] = (mask_ints[0] - r_0) % R
    mask_dev = fr.from_ints(mask_ints)

    oracles = {
        "w": LabeledPoly("w", w_poly, None, 1),
        "z_a": LabeledPoly("z_a", z_a_poly, None, 1),
        "z_b": LabeledPoly("z_b", z_b_poly, None, 1),
        "mask_poly": LabeledPoly("mask_poly", mask_dev, None, None),
    }
    state.w_poly = oracles["w"]
    state.z_a_poly = oracles["z_a"]
    state.z_b_poly = oracles["z_b"]
    state.mask_poly = oracles["mask_poly"]
    return oracles, state


def _batch_eval_bivariate_diff(domain: Radix2Domain, x_int: int) -> jnp.ndarray:
    """u_D(x, y) for all y in D: v_D(x) / (x - y) batched
    (reference src/ahp/mod.rs:311-318)."""
    elems = ntt.domain_elements(domain.size)
    x_dev = fr.from_int(x_int)
    diffs = fr.sub(x_dev[None, :], elems)
    invs = fr.inv(diffs)
    vanish = fr.from_int(domain.evaluate_vanishing_polynomial(x_int))
    return fr.mul(invs, vanish[None, :])


def _calculate_t(index: Index, etas: list, r_alpha_evals: jnp.ndarray) -> jnp.ndarray:
    """t(X) = Σ_M η_M M^T r_α interpolated on H (reference prover.rs:411-428)."""
    h = index.domain_h.size
    idxs, vals = [], []
    for m, eta in zip((index.a, index.b, index.c), etas):
        eta_dev = fr.from_int(eta)
        v = fr.mul(fr.mul(m.vals, eta_dev[None, :]), r_alpha_evals[m.rows])
        idxs.append(m.cols_reindexed)
        vals.append(v)
    t_evals = sparse.scatter_add_mod(
        jnp.concatenate(vals, axis=0), jnp.concatenate(idxs), h
    )
    return ntt.intt(t_evals)


def prover_second_round(ver_msg, state: ProverState, zk_rng: ZkRng):
    """Reference src/ahp/prover.rs:443-570 -> (oracles dict, state)."""
    h = state.domain_h.size
    zk = state.zk_bound
    alpha, eta_a, eta_b, eta_c = ver_msg.alpha, ver_msg.eta_a, ver_msg.eta_b, ver_msg.eta_c

    z_a_p, z_b_p = state.z_a_poly.coeffs, state.z_b_poly.coeffs
    z_c = poly.mul(z_a_p, z_b_p)
    summed_z_m = poly.scale(z_c, fr.from_int(eta_c))
    summed_z_m = poly.add(
        summed_z_m,
        poly.add(
            poly.scale(z_a_p, fr.from_int(eta_a)), poly.scale(z_b_p, fr.from_int(eta_b))
        ),
    )

    r_alpha_evals = _batch_eval_bivariate_diff(state.domain_h, alpha)
    r_alpha_poly = ntt.intt(r_alpha_evals)

    t_poly = _calculate_t(state.index, [eta_a, eta_b, eta_c], r_alpha_evals)

    # z = w * v_X + x̂
    x_poly = ntt.intt(fr.from_ints(state.formatted_input))
    z_poly = poly.add(poly.mul_by_vanishing(state.w_poly.coeffs, state.domain_x.size), x_poly)

    mask = state.mask_poly.coeffs
    mul_size = max(
        mask.shape[0],
        r_alpha_poly.shape[0] + summed_z_m.shape[0],
        t_poly.shape[0] + z_poly.shape[0],
    )
    n_mul = 1 << (mul_size - 1).bit_length()
    ra_e = ntt.ntt(r_alpha_poly, n_mul)
    szm_e = ntt.ntt(summed_z_m, n_mul)
    z_e = ntt.ntt(z_poly, n_mul)
    t_e = ntt.ntt(t_poly, n_mul)
    rhs_evals = fr.sub(fr.mul(ra_e, szm_e), fr.mul(z_e, t_e))
    rhs = ntt.intt(rhs_evals)
    q_1 = poly.add(mask, rhs)

    h_1, x_g_1 = poly.divide_by_vanishing(q_1, h)
    g_1 = x_g_1[1:]

    oracles = {
        "t": LabeledPoly("t", t_poly, None, None),
        "g_1": LabeledPoly("g_1", g_1, h - 2, 1),
        "h_1": LabeledPoly("h_1", h_1, None, None),
    }
    state.w_poly = None
    state.verifier_first_msg = ver_msg
    return oracles, state


def prover_third_round(ver_msg, state: ProverState, zk_rng: ZkRng):
    """Reference src/ahp/prover.rs:588-706 -> oracles dict."""
    k = state.domain_k.size
    fm = state.verifier_first_msg
    alpha, eta_a, eta_b, eta_c = fm.alpha, fm.eta_a, fm.eta_b, fm.eta_c
    beta = ver_msg.beta

    v_h_a = state.domain_h.evaluate_vanishing_polynomial(alpha)
    v_h_b = state.domain_h.evaluate_vanishing_polynomial(beta)
    vv = v_h_a * v_h_b % R
    coeff_a = fr.from_int(eta_a * vv % R)
    coeff_b = fr.from_int(eta_b * vv % R)
    coeff_c = fr.from_int(eta_c * vv % R)

    ja = state.index.joint_arith
    a_poly = fr.add(
        fr.add(
            fr.mul(ja.val_a, coeff_a[None, :]),
            fr.mul(ja.val_b, coeff_b[None, :]),
        ),
        fr.mul(ja.val_c, coeff_c[None, :]),
    )

    ev = ja.evals_on_K
    alpha_dev = fr.from_int(alpha)
    beta_dev = fr.from_int(beta)
    ab_dev = fr.from_int(alpha * beta % R)
    # b on K: αβ - α·row - β·col + row_col
    b_evals = fr.add(
        fr.sub(
            fr.sub(jnp.broadcast_to(ab_dev, ev.row.shape), fr.mul(ev.row, alpha_dev[None, :])),
            fr.mul(ev.col, beta_dev[None, :]),
        ),
        ev.row_col,
    )
    b_poly = ntt.intt(b_evals)

    denom = fr.mul(
        fr.sub(jnp.broadcast_to(beta_dev, ev.row.shape), ev.row),
        fr.sub(jnp.broadcast_to(alpha_dev, ev.col.shape), ev.col),
    )
    inverses = fr.inv(denom)
    vals_combined = fr.add(
        fr.add(fr.mul(ev.val_a, coeff_a[None, :]), fr.mul(ev.val_b, coeff_b[None, :])),
        fr.mul(ev.val_c, coeff_c[None, :]),
    )
    f_evals = fr.mul(inverses, vals_combined)
    f = ntt.intt(f_evals)
    g_2 = f[1:]

    bf = poly.mul(b_poly, f)
    h_2, _rem = poly.divide_by_vanishing(poly.sub(a_poly, bf), k)

    return {
        "g_2": LabeledPoly("g_2", g_2, k - 2, None),
        "h_2": LabeledPoly("h_2", h_2, None, None),
    }
