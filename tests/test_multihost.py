"""Two-level (dcn, ici) mesh: the multi-host data-parallel topology.

The reference has no multi-node capability (rayon shared memory only —
SURVEY.md §5.8); this is TPU-native surface.  The 8 virtual CPU devices
are arranged as a (2, 4) mesh — a stand-in for 2 hosts x 4 chips — and the
sharded NTT/MSM run with the flattened ("dcn", "ici") data axis, checked
bitwise against single-chip.  On real hardware the same code path lets XLA
route the intra-slice portion of each collective over ICI.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlin_tpu.ops import curve_device as cd
from marlin_tpu.ops import fr, msm as msm_mod, ntt
from marlin_tpu.parallel import context as pctx
from marlin_tpu.parallel.msm_sharded import msm_sharded
from marlin_tpu.parallel.multihost import DATA_AXES, axis_size, make_mesh
from marlin_tpu.parallel.ntt_sharded import ntt_4step
from marlin_tpu.utils.rand import ZkRng


@pytest.fixture(scope="module")
def mesh2d():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(num_hosts=2, devices=devs[:8])


def test_mesh_shape_and_axis_size(mesh2d):
    assert dict(mesh2d.shape) == {"dcn": 2, "ici": 4}
    assert axis_size(mesh2d, DATA_AXES) == 8
    assert axis_size(mesh2d, "ici") == 4


def test_ntt_4step_over_two_level_mesh(mesh2d):
    rng = ZkRng(23)
    n = 4096
    x = fr.from_ints(rng.rand_fr_list(n))
    want = np.asarray(ntt._ntt_jit(x, False))
    got = np.asarray(ntt_4step(x, mesh2d, DATA_AXES))
    assert np.array_equal(got, want)
    back = ntt_4step(ntt_4step(x, mesh2d, DATA_AXES), mesh2d, DATA_AXES, inverse=True)
    assert fr.to_ints(back) == fr.to_ints(x)


def test_msm_sharded_over_two_level_mesh(mesh2d):
    from marlin_tpu.fields import host_curve as hc

    rng = ZkRng(29)
    m = 32
    pts = cd.from_affine_ints(hc.g1_fixed_base_powers(hc.G1_GEN, list(range(1, m + 1))))
    scal = fr.from_ints(rng.rand_fr_list(m))
    got = cd.to_affine_ints(msm_sharded(pts, scal, mesh2d, DATA_AXES))[0]
    want = cd.to_affine_ints(msm_mod.msm(pts, scal))[0]
    assert got == want


def test_context_reports_flattened_device_count(mesh2d):
    with pctx.use_mesh(mesh2d, DATA_AXES) as ctx:
        assert ctx.num_devices == 8
