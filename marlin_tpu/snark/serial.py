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

from ..fields import bls12_381 as P
from . import kzg


def save_srs(pp: kzg.UniversalParams, path: str) -> None:
    meta = {
        "g": list(pp.g),
        "gamma_g": list(pp.gamma_g),
        "h": [list(pp.h[0]), list(pp.h[1])],
        "beta_h": [list(pp.beta_h[0]), list(pp.beta_h[1])],
        "host_gamma_powers": [list(p) if p else None for p in (pp.host_gamma_powers or [])],
        "tau": pp.tau,
    }
    arrays = {}
    for name, pt in (("pg", pp.powers_of_g), ("pgg", pp.powers_of_gamma_g)):
        for i, axis in enumerate("xyz"):
            arrays[f"{name}_{axis}"] = np.asarray(pt[i])
    buf = io.BytesIO()
    np.savez_compressed(buf, meta=json.dumps(meta, default=str), **arrays)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)


def load_srs(path: str) -> kzg.UniversalParams:
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        pg = tuple(jnp.asarray(z[f"pg_{a}"]) for a in "xyz")
        pgg = tuple(jnp.asarray(z[f"pgg_{a}"]) for a in "xyz")
    to_int = lambda v: int(v)
    return kzg.UniversalParams(
        powers_of_g=pg,
        powers_of_gamma_g=pgg,
        g=tuple(to_int(v) for v in meta["g"]),
        gamma_g=tuple(to_int(v) for v in meta["gamma_g"]),
        h=tuple(tuple(to_int(v) for v in c) for c in meta["h"]),
        beta_h=tuple(tuple(to_int(v) for v in c) for c in meta["beta_h"]),
        host_gamma_powers=[
            tuple(to_int(v) for v in p) if p else None for p in meta["host_gamma_powers"]
        ],
        tau=int(meta["tau"]) if meta.get("tau") else None,
    )


def cached_srs(max_degree: int, rng, cache_dir: str | None = None) -> kzg.UniversalParams:
    """Generate-or-load an SRS for `max_degree` (bench/test convenience)."""
    cache_dir = cache_dir or os.path.expanduser("~/.cache/marlin_tpu_srs")
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"srs_bls12381_{max_degree}.npz")
    if os.path.exists(path):
        return load_srs(path)
    pp = kzg.setup(max_degree, rng)
    save_srs(pp, path)
    return pp
