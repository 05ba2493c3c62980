"""Fused radix-2 NTT butterfly stages as ONE Pallas TPU kernel.

The XLA stage loop (ops/ntt._ntt_core) lowers each butterfly stage to a
field-mul kernel + add/sub kernels with HBM-materialized relayouts
between them — ~40 kernel launches and ~2 ms/stage at 2^14, putting a
single transform near 80 ms when its pure ALU cost is tens of µs.  Here
the first `log2(B)` stages (strides < B, B = 2^13 by default) run inside
one kernel with the block VMEM-resident:

* data layout is the repo-wide limb-major [L, rows, 128] compute form
  (pallas/core.py); butterfly partners at stride m are a lane roll
  (m < 128) or a sublane roll (m >= 128) — no relayouts, no HBM traffic
  between stages;
* twiddles arrive as DATA (one [B]-periodic plane per stage, shared by
  every grid block via a constant index_map), so one compiled kernel per
  (n, L) shape serves forward/inverse/any-root transforms — including
  the mixed-radix inner transforms' ω^{n1} roots;
* strides >= B (cross-block butterflies) stay on the XLA stage path —
  they are pure streamed elementwise passes with no relayout pressure,
  and there are only log2(n/B) of them.

Correctness target: bit-identical Montgomery limbs to ops/ntt._ntt_core
(tests/test_pallas.py::test_fused_ntt_*).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import core
from .field import LANE, from_lm, to_lm

# default fused-block log2: 13 stages resident needs (1 in + S tw + 1 out)
# blocks of 2^13*64B = 0.5 MB each ~= 7.5 MB of VMEM (~16 MB/core)
_BLOCK_LOG2 = 13


def block_size(n: int) -> int:
    import os

    b = 1 << int(os.environ.get("MARLIN_TPU_NTT_BLOCK_LOG2", str(_BLOCK_LOG2)))
    return min(n, b)


def _stages_kernel(x_ref, *refs, n_tuple, np0, num_stages):
    """Unrolled DIT butterfly stages 0..num_stages-1 over one block.

    refs: num_stages twiddle refs then the output ref.  Twiddle plane s
    holds TW_s[i] = w_{2m}^{i mod m} (m = 2^s) at every position i — the
    factor for the odd butterfly member; even members read their
    partner's product via the roll.
    """
    tw_refs = refs[:-1]
    o_ref = refs[-1]
    x = x_ref[:]
    rows = x.shape[1]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
    for s in range(num_stages):
        m = 1 << s
        t = core.mm_mul(x, tw_refs[s][:], n_tuple, np0)
        if m < LANE:
            a = jnp.roll(t, -m, axis=2)
            b = jnp.roll(x, m, axis=2)
            odd = (lane_iota & m) != 0
        else:
            a = jnp.roll(t, -(m // LANE), axis=1)
            b = jnp.roll(x, m // LANE, axis=1)
            odd = (row_iota & (m // LANE)) != 0
        even_out = core.mm_add(x, a, n_tuple)
        odd_out = core.mm_sub(b, t, n_tuple)
        x = core.mm_select(odd, odd_out, even_out)
    o_ref[:] = x


@functools.lru_cache(maxsize=None)
def _build(n: int, b: int, L: int, n_tuple, np0, interpret: bool):
    from jax.experimental import pallas as pl

    num_stages = b.bit_length() - 1
    rows = b // LANE
    nblocks = n // b
    kernel = functools.partial(
        _stages_kernel, n_tuple=n_tuple, np0=np0, num_stages=num_stages
    )
    x_spec = pl.BlockSpec((L, rows, LANE), lambda i: (0, i, 0))
    tw_spec = pl.BlockSpec((L, rows, LANE), lambda i: (0, 0, 0))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, nblocks * rows, LANE), jnp.uint32),
        grid=(nblocks,),
        in_specs=[x_spec] + [tw_spec] * num_stages,
        out_specs=x_spec,
        interpret=interpret,
    )


def fused_stages(
    x: jnp.ndarray, tw_planes, ctx, interpret: bool = False
) -> jnp.ndarray:
    """Run the first log2(B) butterfly stages of a size-n DIT NTT.

    x: [n, L] bit-reversed Montgomery limbs, n a power of two >= LANE*8.
    tw_planes: list of [B, L] per-stage twiddle planes (see ops/ntt._plan_planes).
    Returns [n, L] with in-block stages applied; the caller runs the
    remaining cross-block stages.
    """
    n, L = x.shape
    b = len(tw_planes[0]) if tw_planes else n
    n_tuple, np0 = core.mod_consts(ctx)
    call = _build(n, b, L, n_tuple, np0, interpret)
    planes = [to_lm(tw) for tw in tw_planes]
    return from_lm(call(to_lm(x), *planes))
