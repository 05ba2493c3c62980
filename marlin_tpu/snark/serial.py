"""Artifact serialization: SRS, keys, proofs.

The reference's checkpoint story is "every long-lived artifact is
CanonicalSerialize-able" (SURVEY.md §5.4) so setup -> index -> prove can be
split across processes.  Same boundaries here: the SRS and index keys
round-trip through npz archives (device limb arrays + JSON metadata), and
proofs through the byte codec in data_structures.py.
"""

from __future__ import annotations

import io
import json
import os

import jax.numpy as jnp
import numpy as np

from ..fields import active as P
from ..fields import host_curve as hc
from . import kzg


def save_srs(pp: kzg.UniversalParams, path: str) -> None:
    """The archive contains only public SRS material (the setup trapdoor
    is discarded inside kzg.setup and cannot appear here)."""
    meta = {
        "g": list(pp.g),
        "gamma_g": list(pp.gamma_g),
        "h": [list(pp.h[0]), list(pp.h[1])],
        "beta_h": [list(pp.beta_h[0]), list(pp.beta_h[1])],
        "host_gamma_powers": [list(p) if p else None for p in (pp.host_gamma_powers or [])],
    }
    arrays = {}
    for name, pt in (("pg", pp.powers_of_g), ("pgg", pp.powers_of_gamma_g)):
        for i, axis in enumerate("xyz"):
            arrays[f"{name}_{axis}"] = np.asarray(pt[i])
    if pp.neg_powers_of_h is not None:
        arrays["neg_h"] = _g2_list_to_limbs(pp.neg_powers_of_h)
    buf = io.BytesIO()
    np.savez_compressed(buf, meta=json.dumps(meta, default=str), **arrays)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)


def _g2_list_to_limbs(points: list) -> np.ndarray:
    """G2 affine ((x0,x1),(y0,y1)) tuples -> [n, 24] uint64 LE limb array."""
    out = np.zeros((len(points), 24), dtype=np.uint64)
    for i, ((x0, x1), (y0, y1)) in enumerate(points):
        for j, v in enumerate((x0, x1, y0, y1)):
            for k in range(6):
                out[i, 6 * j + k] = (v >> (64 * k)) & 0xFFFFFFFFFFFFFFFF
    return out


def _limbs_to_g2_list(arr: np.ndarray) -> list:
    out = []
    for row in arr:
        vals = []
        for j in range(4):
            v = 0
            for k in range(6):
                v |= int(row[6 * j + k]) << (64 * k)
            vals.append(v)
        out.append(((vals[0], vals[1]), (vals[2], vals[3])))
    return out


def _require_g1(p, what: str, subgroup: bool = False):
    """Range + on-curve (+ optional subgroup) validation for a decoded G1
    point — the reference's CanonicalDeserialize validates on decode, so a
    tampered key archive must not be accepted silently (ADVICE r2)."""
    if p is None:
        return None
    q = P.Q_MODULUS
    if not (0 <= p[0] < q and 0 <= p[1] < q):
        raise ValueError(f"{what}: coordinate out of range")
    if not hc.g1_is_on_curve(p):
        raise ValueError(f"{what}: point not on curve")
    if subgroup and not hc.g1_in_subgroup(p):
        raise ValueError(f"{what}: point not in the prime-order subgroup")
    return p


def _require_g2(p, what: str):
    if p is None:
        return None
    q = P.Q_MODULUS
    for pair in p:
        for c in pair:
            if not (0 <= c < q):
                raise ValueError(f"{what}: coordinate out of range")
    if not hc.g2_is_on_curve(p):
        raise ValueError(f"{what}: point not on curve")
    return p


def load_srs(path: str) -> kzg.UniversalParams:
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        _validate_powers_on_curve(tuple(z[f"pg_{a}"] for a in "xyz"), "srs.powers_of_g")
        _validate_powers_on_curve(
            tuple(z[f"pgg_{a}"] for a in "xyz"), "srs.powers_of_gamma_g"
        )
        pg = tuple(jnp.asarray(z[f"pg_{a}"]) for a in "xyz")
        pgg = tuple(jnp.asarray(z[f"pgg_{a}"]) for a in "xyz")
        neg_h = _limbs_to_g2_list(z["neg_h"]) if "neg_h" in z else None
    to_int = lambda v: int(v)
    pp = kzg.UniversalParams(
        powers_of_g=pg,
        powers_of_gamma_g=pgg,
        g=tuple(to_int(v) for v in meta["g"]),
        gamma_g=tuple(to_int(v) for v in meta["gamma_g"]),
        h=tuple(tuple(to_int(v) for v in c) for c in meta["h"]),
        beta_h=tuple(tuple(to_int(v) for v in c) for c in meta["beta_h"]),
        host_gamma_powers=[
            tuple(to_int(v) for v in p) if p else None for p in meta["host_gamma_powers"]
        ],
        neg_powers_of_h=neg_h,
    )
    _require_g1(pp.g, "srs.g")
    _require_g1(pp.gamma_g, "srs.gamma_g")
    _require_g2(pp.h, "srs.h")
    _require_g2(pp.beta_h, "srs.beta_h")
    for i, hp_ in enumerate(pp.host_gamma_powers or []):
        _require_g1(hp_, f"srs.host_gamma_powers[{i}]")
    for i, nh in enumerate(pp.neg_powers_of_h or []):
        _require_g2(nh, f"srs.neg_powers_of_h[{i}]")
    return pp


def _limb_rows_to_ints(arr: np.ndarray) -> list:
    """[n, L] uint32 arrays of 16-bit limbs -> list of n Python ints.

    Rejects limbs >= 2^16 instead of truncating: the device kernels consume
    the full 32-bit limbs (whose Montgomery overflow analysis assumes
    sub-2^16 limbs), so the archive check must validate the exact
    representation the kernels see (ADVICE r4)."""
    a0 = np.asarray(arr)
    if (a0 >> 16).any():
        raise ValueError("archive limb out of range (>= 2^16)")
    a = np.ascontiguousarray(a0.astype("<u2"))
    L2 = a.shape[1] * 2
    raw = a.tobytes()
    return [int.from_bytes(raw[i : i + L2], "little") for i in range(0, len(raw), L2)]


def _validate_powers_on_curve(pt, what: str) -> None:
    """On-curve check for an archived point batch in affine form
    (Z in {0, one}): y^2 == x^3 + b wherever Z != 0.

    Runs on host Python ints rather than device kernels: archives are
    loaded before any device work, and building the fq Pallas kernels
    just for a load-time guard cost ~4 minutes of per-process
    trace/compile on the tunneled TPU (round-4 capture-economics fix)."""
    q = P.Q_MODULUS
    rinv = pow(P.FQ_MONT_R, -1, q)
    one_mont = P.FQ_MONT_R % q
    b = P.CURVE_B
    xs, ys, zs = (_limb_rows_to_ints(np.asarray(c)) for c in pt)
    for x_m, y_m, z_m in zip(xs, ys, zs):
        if z_m == 0:
            continue
        if z_m != one_mont:
            raise ValueError(f"{what}: non-affine Z in archive")
        if x_m >= q or y_m >= q:
            # non-canonical Montgomery residues would pass the mod-q curve
            # check below while the kernels see a different representation
            raise ValueError(f"{what}: coordinate residue out of range")
        x = x_m * rinv % q
        y = y_m * rinv % q
        if (y * y - (x * x % q) * x - b) % q:
            raise ValueError(f"{what}: off-curve point in archive")


# --------------------------------------------------------------------------
# index keys (reference derives CanonicalSerialize on Index and both keys:
# src/ahp/indexer.rs:113-127, src/data_structures.rs:25-79 — enabling the
# setup -> index -> prove process split, SURVEY.md §5.4)


def _comm_to_meta(c) -> dict:
    return {
        "comm": list(c.comm) if c.comm is not None else None,
        "shifted": list(c.shifted_comm) if c.shifted_comm is not None else None,
    }


def _comm_from_meta(m) -> "kzg.Commitment":
    c = kzg.Commitment(
        comm=tuple(int(v) for v in m["comm"]) if m["comm"] else None,
        shifted_comm=tuple(int(v) for v in m["shifted"]) if m["shifted"] else None,
    )
    # commitments feed pairings: require full subgroup membership on decode
    _require_g1(c.comm, "index_comm", subgroup=True)
    _require_g1(c.shifted_comm, "index_comm.shifted", subgroup=True)
    return c


def _vk_meta(vk) -> dict:
    from . import sonic as sonic_mod

    if isinstance(vk, sonic_mod.SonicVerifierKey):
        return {
            "flavor": "sonic",
            "g": list(vk.g),
            "gamma_g": list(vk.gamma_g),
            "h": [list(vk.h[0]), list(vk.h[1])],
            "beta_h": [list(vk.beta_h[0]), list(vk.beta_h[1])],
            "neg_h_powers": {
                str(b): [list(p[0]), list(p[1])] for b, p in vk.neg_h_powers.items()
            },
            "supported_degree": vk.supported_degree,
            "max_degree": vk.max_degree,
        }
    return {
        "flavor": "marlin",
        "g": list(vk.g),
        "gamma_g": list(vk.gamma_g),
        "h": [list(vk.h[0]), list(vk.h[1])],
        "beta_h": [list(vk.beta_h[0]), list(vk.beta_h[1])],
        "shift_powers": {str(b): list(p) for b, p in vk.shift_powers.items()},
        "supported_degree": vk.supported_degree,
        "max_degree": vk.max_degree,
    }


def _vk_from_meta(m):
    from . import sonic as sonic_mod

    tup = lambda v: tuple(int(x) for x in v)
    g2 = lambda v: (tup(v[0]), tup(v[1]))
    if m["flavor"] == "sonic":
        svk = sonic_mod.SonicVerifierKey(
            g=_require_g1(tup(m["g"]), "vk.g"),
            gamma_g=_require_g1(tup(m["gamma_g"]), "vk.gamma_g"),
            h=_require_g2(g2(m["h"]), "vk.h"),
            beta_h=_require_g2(g2(m["beta_h"]), "vk.beta_h"),
            neg_h_powers={
                int(b): _require_g2(g2(p), f"vk.neg_h_powers[{b}]")
                for b, p in m["neg_h_powers"].items()
            },
            supported_degree=m["supported_degree"],
            max_degree=m["max_degree"],
        )
        return svk
    vk = kzg.VerifierKey(
        g=tup(m["g"]),
        gamma_g=tup(m["gamma_g"]),
        h=g2(m["h"]),
        beta_h=g2(m["beta_h"]),
        shift_powers={int(b): tup(p) for b, p in m["shift_powers"].items()},
        supported_degree=m["supported_degree"],
        max_degree=m["max_degree"],
    )
    _require_g1(vk.g, "vk.g")
    _require_g1(vk.gamma_g, "vk.gamma_g")
    _require_g2(vk.h, "vk.h")
    _require_g2(vk.beta_h, "vk.beta_h")
    for b, p in vk.shift_powers.items():
        _require_g1(p, f"vk.shift_powers[{b}]")
    return vk


def save_index_vk(vk, path: str) -> None:
    """IndexVerifierKey -> small npz (reference data_structures.rs:25-62)."""
    meta = {
        "index_info": {
            "num_variables": vk.index_info.num_variables,
            "num_constraints": vk.index_info.num_constraints,
            "num_non_zero": vk.index_info.num_non_zero,
            "num_instance_variables": vk.index_info.num_instance_variables,
        },
        "index_comms": [_comm_to_meta(c) for c in vk.index_comms],
        "verifier_key": _vk_meta(vk.verifier_key),
    }
    _atomic_savez(path, meta=json.dumps(meta, default=str))


def load_index_vk(path: str):
    from .data_structures import IndexVerifierKey
    from .indexer import IndexInfo

    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
    info = IndexInfo(**{k: int(v) for k, v in meta["index_info"].items()})
    return IndexVerifierKey(
        index_info=info,
        index_comms=[_comm_from_meta(c) for c in meta["index_comms"]],
        verifier_key=_vk_from_meta(meta["verifier_key"]),
    )


def save_index_pk(pk, path: str, include_srs: bool = True) -> None:
    """IndexProverKey -> npz (reference data_structures.rs:70-79).

    The archive is self-contained by default (committer-key powers
    included, as arkworks' derived serializer does); `include_srs=False`
    writes only the index material, for reattaching to a separately-stored
    SRS via `load_index_pk(path, srs=...)`.
    """
    ix = pk.index
    ja = ix.joint_arith
    ev = ja.evals_on_K
    meta = {
        "vk": {
            "index_info": {
                "num_variables": ix.index_info.num_variables,
                "num_constraints": ix.index_info.num_constraints,
                "num_non_zero": ix.index_info.num_non_zero,
                "num_instance_variables": ix.index_info.num_instance_variables,
            },
            "index_comms": [_comm_to_meta(c) for c in pk.index_vk.index_comms],
            "verifier_key": _vk_meta(pk.index_vk.verifier_key),
        },
        "ck": {
            "flavor": type(pk.committer_key).__module__.rsplit(".", 1)[-1],
            "supported_degree": pk.committer_key.supported_degree,
            "degree_bounds": list(pk.committer_key.degree_bounds),
            "hiding_bound": pk.committer_key.hiding_bound,
        },
        "domains": {
            "h": ix.domain_h.size,
            "k": ix.domain_k.size,
            "x": ix.domain_x.size,
        },
        "include_srs": include_srs,
    }
    arrays = {}
    for name, mat in (("a", ix.a), ("b", ix.b), ("c", ix.c)):
        arrays[f"{name}_rows"] = np.asarray(mat.rows)
        arrays[f"{name}_cols"] = np.asarray(mat.cols)
        arrays[f"{name}_vals"] = np.asarray(mat.vals)
        arrays[f"{name}_reidx"] = np.asarray(mat.cols_reindexed)
        meta[f"{name}_shape"] = [mat.num_rows, mat.num_cols]
    for label, arr in (
        ("ja_row", ja.row),
        ("ja_col", ja.col),
        ("ja_val_a", ja.val_a),
        ("ja_val_b", ja.val_b),
        ("ja_val_c", ja.val_c),
        ("ja_row_col", ja.row_col),
        ("ev_row", ev.row),
        ("ev_col", ev.col),
        ("ev_row_col", ev.row_col),
        ("ev_val_a", ev.val_a),
        ("ev_val_b", ev.val_b),
        ("ev_val_c", ev.val_c),
    ):
        arrays[label] = np.asarray(arr)
    if include_srs:
        pp = pk.committer_key.pp
        for name, pt in (("pg", pp.powers_of_g), ("pgg", pp.powers_of_gamma_g)):
            for i, axis in enumerate("xyz"):
                arrays[f"srs_{name}_{axis}"] = np.asarray(pt[i])
        if pp.neg_powers_of_h is not None:
            arrays["srs_neg_h"] = _g2_list_to_limbs(pp.neg_powers_of_h)
        meta["srs"] = {
            "g": list(pp.g),
            "gamma_g": list(pp.gamma_g),
            "h": [list(pp.h[0]), list(pp.h[1])],
            "beta_h": [list(pp.beta_h[0]), list(pp.beta_h[1])],
            "host_gamma_powers": [
                list(p) if p else None for p in (pp.host_gamma_powers or [])
            ],
        }
    _atomic_savez(path, meta=json.dumps(meta, default=str), **arrays)


def load_index_pk(path: str, srs: kzg.UniversalParams | None = None):
    from ..ops.sparse import CooMatrix
    from . import sonic as sonic_mod
    from .constraint_systems import MatrixArithmetization, MatrixEvals
    from .data_structures import IndexProverKey, IndexVerifierKey
    from .domains import domain_of_size
    from .indexer import Index, IndexInfo

    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        data = {k: z[k] for k in z.files if k != "meta"}

    tup = lambda v: tuple(int(x) for x in v)
    if meta["include_srs"]:
        pp = kzg.UniversalParams(
            powers_of_g=tuple(jnp.asarray(data[f"srs_pg_{a}"]) for a in "xyz"),
            powers_of_gamma_g=tuple(jnp.asarray(data[f"srs_pgg_{a}"]) for a in "xyz"),
            g=tup(meta["srs"]["g"]),
            gamma_g=tup(meta["srs"]["gamma_g"]),
            h=(tup(meta["srs"]["h"][0]), tup(meta["srs"]["h"][1])),
            beta_h=(tup(meta["srs"]["beta_h"][0]), tup(meta["srs"]["beta_h"][1])),
            host_gamma_powers=[
                tup(p) if p else None for p in meta["srs"]["host_gamma_powers"]
            ],
            neg_powers_of_h=_limbs_to_g2_list(data["srs_neg_h"])
            if "srs_neg_h" in data
            else None,
        )
    elif srs is not None:
        pp = srs
    else:
        raise ValueError("archive has no SRS; pass srs= to reattach one")

    info = IndexInfo(**{k: int(v) for k, v in meta["vk"]["index_info"].items()})
    mats = {}
    for name in "abc":
        mats[name] = CooMatrix(
            rows=jnp.asarray(data[f"{name}_rows"]),
            cols=jnp.asarray(data[f"{name}_cols"]),
            vals=jnp.asarray(data[f"{name}_vals"]),
            num_rows=int(meta[f"{name}_shape"][0]),
            num_cols=int(meta[f"{name}_shape"][1]),
            cols_reindexed=jnp.asarray(data[f"{name}_reidx"]),
        )
    ja = MatrixArithmetization(
        row=jnp.asarray(data["ja_row"]),
        col=jnp.asarray(data["ja_col"]),
        val_a=jnp.asarray(data["ja_val_a"]),
        val_b=jnp.asarray(data["ja_val_b"]),
        val_c=jnp.asarray(data["ja_val_c"]),
        row_col=jnp.asarray(data["ja_row_col"]),
        evals_on_K=MatrixEvals(
            row=jnp.asarray(data["ev_row"]),
            col=jnp.asarray(data["ev_col"]),
            row_col=jnp.asarray(data["ev_row_col"]),
            val_a=jnp.asarray(data["ev_val_a"]),
            val_b=jnp.asarray(data["ev_val_b"]),
            val_c=jnp.asarray(data["ev_val_c"]),
        ),
    )
    index = Index(
        index_info=info,
        a=mats["a"],
        b=mats["b"],
        c=mats["c"],
        joint_arith=ja,
        domain_h=domain_of_size(int(meta["domains"]["h"])),
        domain_k=domain_of_size(int(meta["domains"]["k"])),
        domain_x=domain_of_size(int(meta["domains"]["x"])),
    )
    ck_meta = meta["ck"]
    ck_cls = sonic_mod.SonicCommitterKey if ck_meta["flavor"] == "sonic" else kzg.CommitterKey
    ck = ck_cls(
        pp=pp,
        supported_degree=int(ck_meta["supported_degree"]),
        degree_bounds=[int(b) for b in ck_meta["degree_bounds"]],
        hiding_bound=int(ck_meta["hiding_bound"]),
    )
    vk = IndexVerifierKey(
        index_info=info,
        index_comms=[_comm_from_meta(c) for c in meta["vk"]["index_comms"]],
        verifier_key=_vk_from_meta(meta["vk"]["verifier_key"]),
    )
    return IndexProverKey(
        index_vk=vk,
        index_comm_rands=[kzg.Randomness.empty() for _ in meta["vk"]["index_comms"]],
        index=index,
        committer_key=ck,
    )


def _atomic_savez(path: str, **kwargs) -> None:
    buf = io.BytesIO()
    np.savez_compressed(buf, **kwargs)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)


def cached_srs(
    max_degree: int, rng, cache_dir: str | None = None, flavor: str = "marlin"
) -> kzg.UniversalParams:
    """Generate-or-load an SRS for `max_degree` (bench/test convenience).

    flavor "sonic" additionally carries the negative G2 power table.
    """
    cache_dir = cache_dir or os.path.expanduser("~/.cache/marlin_tpu_srs")
    os.makedirs(cache_dir, exist_ok=True)
    suffix = "" if flavor == "marlin" else f"_{flavor}"
    # the active curve is part of the key: an SRS is a per-curve artifact
    # (filename keeps the historical "bls12381" spelling for the default
    # curve so pre-warmed caches stay valid)
    curve = getattr(P, "CURVE_NAME", "bls12_381").replace("_", "")
    path = os.path.join(cache_dir, f"srs_{curve}_{max_degree}{suffix}.npz")
    if os.path.exists(path):
        pp = load_srs(path)
        if flavor != "sonic" or pp.neg_powers_of_h is not None:
            return pp
    pp = kzg.setup(max_degree, rng, neg_powers_of_h=(flavor == "sonic"))
    save_srs(pp, path)
    return pp
