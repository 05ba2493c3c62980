"""Fixed-base-table window shapes must re-derive from the ACTIVE curve.

VERDICT r4 weak #8: build_fixed_table hardcoded a 256-bit scalar width
(`-(-256 // c)`), correct for the 254/255-bit live curves but a latent trap
for any wide-Fr curve.  The width now derives from P.FR_BITS
(ops/msm.fixed_table_windows); this regression drives the signed-digit
recoding and the top-window shape over BN254 (254-bit) and
synthetic_lowadic (255-bit, different modulus high bits than BLS12-381) in
per-curve subprocesses (curve selection is process-level, fields/active.py).
"""

import os
import subprocess
import sys

import pytest

_PROG = r"""
import numpy as np

from marlin_tpu.fields import active as P
from marlin_tpu.ops import msm
from marlin_tpu.ops.limbs import ints_to_limbs

r = P.R_MODULUS
for n_base in (4096, 1 << 14):
    c = msm._fixed_c(n_base)
    W = msm.fixed_table_windows(c)
    # the balanced recoding's final carry needs a window to land in
    assert c * W >= P.FR_BITS + 1, (c, W, P.FR_BITS)
    # and the count must not be padded beyond one window past the carry
    assert c * (W - 1) < P.FR_BITS + 1, (c, W, P.FR_BITS)

    rng = np.random.RandomState(1234)
    ints = [int.from_bytes(rng.bytes(40), "little") % r for _ in range(257)]
    ints += [0, 1, r - 1, (1 << P.FR_BITS) - 1 if (1 << P.FR_BITS) - 1 < r else r - 2]
    scal = np.asarray(ints_to_limbs(ints, 16), dtype=np.uint32)
    d = msm._signed_digits_np(scal, c, W)  # asserts carry-out == 0
    # signed digits reconstruct every scalar exactly
    recon = [
        sum(int(d[w, i]) << (c * w) for w in range(W)) for i in range(len(ints))
    ]
    assert recon == ints

    # top-window shape re-derives from the modulus's high bits
    hi = (r - 1) >> (c * (W - 1))
    max_digit, p_max = msm._top_digit_pmax(c, W)
    assert max_digit == hi + 1, (max_digit, hi)
    assert 0.0 < p_max <= 1.0
    nb_top, cap_top = msm._top_fold_shape(n_base, c, W)
    assert nb_top == max_digit + 1
    assert int(d[W - 1].max()) < nb_top
    assert int(d[W - 1].min()) >= 0

print("OK", P.FR_BITS)
"""


@pytest.mark.parametrize("curve", ["bn254", "synthetic_lowadic", "bls12_381"])
def test_fixed_table_shapes_per_curve(curve):
    env = dict(os.environ, MARLIN_TPU_CURVE=curve, JAX_PLATFORMS="cpu",
               PALLAS_AXON_POOL_IPS="", TF_CPP_MIN_LOG_LEVEL="3")
    r = subprocess.run(
        [sys.executable, "-c", _PROG],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "OK" in r.stdout
